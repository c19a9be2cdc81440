"""Run the REFERENCE'S OWN test corpus against this engine.

Harvests every `(run-test "expr" expected)` pair from the reference's
builtin_test.cljc at test time (no copied golden files — the corpus stays
whatever the reference ships) and evaluates each expression with the
driver evaluator, comparing against the reference's expected EDN value.

Skips, with reasons:
- expected value "#?" — the reference's own marker for cases IT cannot
  run yet (several of them — fn-valued $replace, $formatInteger 'w' —
  actually work here; they're asserted separately below).
- server/catalog-dependent cases (the reference queries its codelib DB).
File-relative `$get('data/...')` cases are REWRITTEN to the read-only
reference checkout and run for real.
"""

from __future__ import annotations

import re

import pytest

from radmapper_spark import run
from radmapper_spark.lang.values import jflatten
from radmapper_spark.sources.edn import _Parser, _resolve

REF_TEST = "/root/reference/test/rad_mapper/builtin_test.cljc"
REF_QUERY_TEST = "/root/reference/test/rad_mapper/query_test.cljc"

# expression-prefix -> reason
SKIP = {
    # reference query_test.cljc:1040-1052: the DEEP qvar-in-key $reduce
    # expects a VECTOR [{Bob...},{Alice...}] while its own SHALLOW twin
    # (1027-1038) expects a merged map {Alice..., Bob...}. We implement
    # the shallow (merged-map) semantics consistently at every depth —
    # an intentional divergence from the reference's inconsistency.
    "($DBa   := [{'email' : 'bob@example.com', 'name' : 'Bob'},":
        "reference-inconsistent deep qvar-in-key expectation",
}


@pytest.fixture(autouse=True)
def _seeded_catalog(tmp_path, monkeypatch):
    """Seed the codelib catalog (reference libcode.clj content) so the
    `$get(['list_id','cct_bie'])`-class corpus cases run against the same
    library the reference server pre-loads."""
    import radmapper_spark.sources.readers as readers
    from radmapper_spark.sources.libcode import seed_catalog
    path = str(tmp_path / "catalog.json")
    monkeypatch.setattr(readers, "CATALOG_PATH", path)
    seed_catalog(path)


def _excluded_spans(s: str):
    """#_(...) reader-discard spans, string-aware."""
    spans, i = [], 0
    while True:
        j = s.find("#_", i)
        if j < 0:
            return spans
        k = j + 2
        while k < len(s) and s[k] in " \t\n":
            k += 1
        if k < len(s) and s[k] == "(":
            depth, m, instr = 0, k, False
            while m < len(s):
                c = s[m]
                if instr:
                    if c == "\\":
                        m += 1
                    elif c == '"':
                        instr = False
                elif c == '"':
                    instr = True
                elif c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                    if depth == 0:
                        break
                m += 1
            spans.append((j, m + 1))
            i = m + 1
        else:
            i = k


def _clj_string(s: str, i: int):
    assert s[i] == '"'
    out, i = [], i + 1
    while s[i] != '"':
        if s[i] == "\\":
            nxt = s[i + 1]
            out.append({"n": "\n", "t": "\t", '"': '"', "\\": "\\"}.get(nxt, nxt))
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out), i + 1


def harvest(path=REF_TEST):
    src = open(path).read()
    spans = _excluded_spans(src)
    cases = []
    for m in re.finditer(r"\(run-test\s+", src):
        if any(a <= m.start() < b for a, b in spans):
            continue
        i = m.end()
        if src[i] != '"':
            continue  # non-literal first arg (a few def'd symbols)
        expr, i = _clj_string(src, i)
        rest = src[i:].lstrip()
        if rest.startswith("'"):
            rest = rest[1:]  # quoted EDN form: '[...]
        p = _Parser(rest)
        expected = _resolve(p.parse(), key_pos=False)
        cases.append((expr, expected))
    return cases


def _normkeys(x):
    """Clojure renders binding-set keys as quoted qvar symbols ('?id);
    this engine renders them as plain names — same data, one spelling."""
    if isinstance(x, dict):
        return {str(k).lstrip("'?"): _normkeys(v) for k, v in x.items()}
    if isinstance(x, list):
        return [_normkeys(v) for v in x]
    return x


def _eq(a, b) -> bool:
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return abs(float(a) - float(b)) < 1e-9
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return set(a) == set(b) and all(_eq(a[k], b[k]) for k in a)
    return a == b


def test_reference_query_corpus():
    """The reference's query_test.cljc run-test cases (query{}, express{},
    $reduce, $qIdent/$eIdent) through this engine."""
    cases = harvest(REF_QUERY_TEST)
    assert len(cases) >= 25, f"harvest shrank: {len(cases)}"
    ran = 0
    failures = []
    for expr, expected in cases:
        if any(expr.startswith(p) for p in SKIP):
            continue
        run_expr = expr.replace("'data/testing/", "'/root/reference/data/testing/")
        try:
            got = jflatten(run(run_expr))
        except Exception as ex:
            failures.append((expr[:80], f"ERR {type(ex).__name__}: {str(ex)[:60]}"))
            continue
        if _eq(_normkeys(got), _normkeys(expected)):
            ran += 1
        else:
            failures.append((expr[:80],
                             f"got {str(got)[:60]!r} want {str(expected)[:60]!r}"))
    assert not failures, "\n".join(f"{e}: {r}" for e, r in failures)
    assert ran >= 25, f"only {ran} query-corpus cases ran green"


def test_reference_builtin_corpus():
    cases = harvest()
    assert len(cases) >= 200, f"harvest shrank: {len(cases)}"
    ran = skipped = exceeded = 0
    failures = []
    for expr, expected in cases:
        if any(expr.startswith(p) for p in SKIP):
            skipped += 1
            continue
        run_expr = expr.replace("'data/testing/", "'/root/reference/data/testing/")
        if expected == "#?":
            # the reference can't run this one itself; if WE run it without
            # error, that's coverage beyond the reference
            try:
                run(run_expr)
                exceeded += 1
            except Exception:
                skipped += 1
            continue
        try:
            got = jflatten(run(run_expr))
        except Exception as ex:
            failures.append((expr[:80], f"ERR {type(ex).__name__}: {str(ex)[:60]}"))
            continue
        if _eq(got, expected):
            ran += 1
        else:
            failures.append((expr[:80],
                             f"got {str(got)[:60]!r} want {str(expected)[:60]!r}"))
    assert not failures, "\n".join(f"{e}: {r}" for e, r in failures)
    assert ran >= 195, f"only {ran} corpus cases ran green"
    assert exceeded >= 3  # fn-$replace, $formatInteger 'w', format subpics


def test_exceeds_reference_on_its_own_nyi_cases():
    """Cases the reference marks '#?' (cannot run) that this engine
    executes CORRECTLY per docs.jsonata.org."""
    assert run(
        "( $convert := function($m) { ($number($m.groups[0]) - 32) * 5/9 & 'C' };"
        "  $replace('temperature = 68F today', /(\\d+)F/, $convert) )"
    ) == "temperature = 20C today"
    assert run("$formatInteger(123, 'w')") == "one hundred twenty-three"
    # DecimalFormat negative subpictures (reference expects '#?')
    assert run("$formatNumber(-34.555, '#0.00;(#0.00)')") == "(34.55)"
    assert run("$formatNumber(34.555, '#0.00;(#0.00)')") == "34.55"
