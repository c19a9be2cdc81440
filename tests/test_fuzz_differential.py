"""Property-based differential testing: hypothesis generates random RM
scalar expressions; the driver evaluator and the Catalyst column compiler
must agree on every one. Two independent backends, one semantics — any
divergence is a bug in one of them (this is how the column-mode and/or
truthiness and $pad arg-order bugs would have been caught mechanically).
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from radmapper_spark import run

import os as _os
import pytest as _pytest
# deep-fuzz tier (r15 governance): heaviest hypothesis differentials
# run under RM_DEEP=1 as part of the per-round gate batch
_deep_fuzz = _pytest.mark.skipif(
    _os.environ.get("RM_DEEP") != "1",
    reason="deep fuzz tier — RM_DEEP=1 (per-round gates)")
from radmapper_spark.lang.columns import ColumnCompileError, rm_column

# -------------------------------------------------------- expression gen

NUMS = st.one_of(
    st.integers(min_value=-100, max_value=100),
    st.floats(min_value=-100, max_value=100, allow_nan=False,
              allow_infinity=False).map(lambda f: round(f, 3)),
)
#: near-int64-boundary literals (r15 verdict item #6: the old grammar
#: maxed out ~1e16 and could never reach 2^63). -(2^63) itself is not
#: expressible as a literal — the parser reads it as unary minus over
#: 2^63, which BOTH engines now refuse — so the pool stays one inside.
#: Overflowing combinations make the driver raise (skip) and Spark
#: raise ANSI ARITHMETIC_OVERFLOW: consistent refusal; non-overflowing
#: ones must agree exactly (this found the int %-through-fmod fork).
BOUNDARY_INTS = st.sampled_from([
    2 ** 63 - 1, 2 ** 63 - 2, 2 ** 62, 2 ** 62 + 3,
    -(2 ** 63) + 1, -(2 ** 62), 2 ** 31, -(2 ** 31), 10 ** 18 + 7,
])
WORDS = st.sampled_from(["abc", "Hello World", "x,y;z", "", "42", "déjà vu"])


def lit(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "\\'") + "'"
    if isinstance(v, float) and v == int(v):
        return f"{v:.1f}"
    return repr(v)


@st.composite
def num_expr(draw, depth=0):
    if depth >= 3 or draw(st.booleans()):
        if draw(st.integers(0, 7)) == 0:   # ~1/8 boundary leaves
            return lit(draw(BOUNDARY_INTS))
        return lit(draw(NUMS))
    kind = draw(st.sampled_from(["bin", "bin", "bin", "fn"]))
    if kind == "bin":
        # / and % joined the grammar in r14 (after the INT32-overflow
        # find proved the binop path under-fuzzed); division by zero /
        # modulo zero are driver-rejected programs, which the test
        # already skips
        op = draw(st.sampled_from(["+", "-", "*", "/", "%"]))
        a = draw(num_expr(depth + 1))
        b = draw(num_expr(depth + 1))
        return f"({a} {op} {b})"
    fn = draw(st.sampled_from(["$sqrt", "$floor", "$ceil", "$abs"]))
    inner = draw(num_expr(depth + 1))
    if fn == "$sqrt":
        return f"$sqrt($abs({inner}))"
    return f"{fn}({inner})"


@st.composite
def str_expr(draw, depth=0):
    if depth >= 2:
        return lit(draw(WORDS))
    kind = draw(st.sampled_from(["lit", "concat", "upper", "lower", "trim",
                                 "substr", "fn"]))
    if kind == "lit":
        return lit(draw(WORDS))
    if kind == "concat":
        return f"({draw(str_expr(depth + 1))} & {draw(str_expr(depth + 1))})"
    if kind == "upper":
        return f"$uppercase({draw(str_expr(depth + 1))})"
    if kind == "lower":
        return f"$lowercase({draw(str_expr(depth + 1))})"
    if kind == "trim":
        return f"$trim({draw(str_expr(depth + 1))})"
    if kind == "substr":
        start = draw(st.integers(min_value=-5, max_value=5))
        ln = draw(st.integers(min_value=0, max_value=6))
        return f"$substring({draw(str_expr(depth + 1))}, {start}, {ln})"
    n = draw(num_expr(2))
    return f"$string($abs({n}))"


@st.composite
def scalar_expr(draw):
    kind = draw(st.sampled_from(
        ["num", "str", "cmp", "cond", "agg", "round", "pad", "contains",
         "splitjoin", "logic", "not"]))
    if kind == "num":
        return draw(num_expr())
    if kind == "str":
        return draw(str_expr())
    if kind == "cmp":
        op = draw(st.sampled_from(["<", "<=", ">", ">=", "=", "!="]))
        return f"({draw(num_expr(1))} {op} {draw(num_expr(1))})"
    if kind == "cond":
        c = draw(st.sampled_from(["<", ">", "="]))
        return (f"(({draw(num_expr(2))} {c} {draw(num_expr(2))}) ? "
                f"{draw(num_expr(2))} : {draw(num_expr(2))})")
    if kind == "round":
        prec = draw(st.integers(min_value=0, max_value=4))
        return f"$round({draw(num_expr(1))}, {prec})"
    if kind == "pad":
        w = draw(st.integers(min_value=-8, max_value=8))
        return f"$pad({draw(str_expr(1))}, {w})"
    if kind == "contains":
        return f"$contains({draw(str_expr(1))}, {lit(draw(WORDS))})"
    if kind == "splitjoin":
        sep = draw(st.sampled_from([",", ";", " "]))
        return (f"$join($split({draw(str_expr(1))}, {lit(sep)}), "
                f"{lit(draw(st.sampled_from(['-', ''])))})")
    if kind == "logic":
        op = draw(st.sampled_from(["and", "or"]))
        return f"({draw(num_expr(2))} {op} {draw(num_expr(2))})"
    if kind == "not":
        return f"$not({draw(num_expr(2))} > {draw(num_expr(2))})"
    vals = draw(st.lists(st.one_of(NUMS, NUMS, NUMS, BOUNDARY_INTS),
                         min_size=1, max_size=5))
    fn = draw(st.sampled_from(["$sum", "$max", "$min", "$count"]))
    return f"{fn}([{', '.join(lit(v) for v in vals)}])"


def _agree(a, b) -> bool:
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        if math.isnan(a) or math.isnan(b):
            return math.isnan(a) == math.isnan(b)
        return abs(float(a) - float(b)) <= 1e-6 * max(1.0, abs(float(a)))
    return a == b


@pytest.fixture(scope="module")
def one_row_df(spark):
    return spark.createDataFrame([(1,)], ["id"])


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(src=scalar_expr())
@_deep_fuzz
def test_column_twin_agrees_with_driver(one_row_df, src):
    try:
        want = run(src)
    except Exception:
        # driver rejects the program (e.g. arithmetic domain error):
        # nothing to compare — column behavior on invalid programs is
        # allowed to differ in error class
        return
    try:
        col = rm_column(one_row_df, src)
    except ColumnCompileError:
        pytest.fail(f"driver runs but column mode refuses: {src}")
    got = one_row_df.select(col.alias("r")).head()["r"]
    assert _agree(got, want), f"{src}: column={got!r} driver={want!r}"


def test_int64_boundary_both_engines(one_row_df):
    """The int64 boundary is DEFINED, not documented (r15 verdict item
    #6): programs whose integral results stay inside int64 agree
    exactly; programs that leave it are REFUSED BY BOTH ENGINES (driver
    RMError, Spark ANSI ARITHMETIC_OVERFLOW) — matching the reference's
    JVM checked longs."""
    from py4j.protocol import Py4JJavaError

    from radmapper_spark.lang.interp import RMError

    # exactly representable: 2^62 + (2^62 - 1) = 2^63 - 1
    src = "(4611686018427387904 + 4611686018427387903)"
    want = run(src)
    assert want == 9223372036854775807
    assert one_row_df.select(
        rm_column(one_row_df, src).alias("r")).head()["r"] == want

    # exact big-int %: fmod-through-double lost low bits here
    src = "(9223372036854775806 % 9999999967)"
    want = run(src)
    assert want == 9223372036854775806 % 9999999967
    assert one_row_df.select(
        rm_column(one_row_df, src).alias("r")).head()["r"] == want

    # both-refuse cases: +, unary minus of long-min, $sum, $abs,
    # and an integer literal past the boundary
    for bad in ["(4611686018427387904 + 4611686018427387904)",
                "-(0 - 9223372036854775807 - 1)",
                "$sum([9223372036854775807, 1])",
                "$abs(0 - 9223372036854775807 - 1)",
                "9223372036854775808"]:
        with pytest.raises(RMError, match="overflow|int64"):
            run(bad)
        err = None
        got = _SENTINEL = object()
        try:
            got = one_row_df.select(
                rm_column(one_row_df, bad).alias("r")).head()["r"]
        except Exception as e:  # Py4JJavaError, ColumnCompileError, ...
            err = str(e)
        assert got is _SENTINEL, (
            f"column mode computed {bad} -> {got!r} where the driver "
            f"refuses")
        assert err is not None and (
            "ARITHMETIC_OVERFLOW" in err or "overflow" in err
            or "too big" in err or "out of range" in err
            or "LONG" in err or "cannot be represented" in err
            or "DECIMAL" in err or "CAST_" in err
            or "NumberFormatException" in err   # F.lit past long range
            or "literal" in err), (bad, err)

    # just inside on the negative side
    src = "(0 - 9223372036854775807 - 1)"
    want = run(src)
    assert want == -(2 ** 63)
    assert one_row_df.select(
        rm_column(one_row_df, src).alias("r")).head()["r"] == want

    # $abs of INT32 MIN: the literal types as IntegerType and a bare
    # F.abs raised ANSI INTEGER overflow where the driver computes
    # 2^31 — the integral path must run in LONG (fuzz find)
    src = "$abs(-2147483648)"
    want = run(src)
    assert want == 2 ** 31
    assert one_row_df.select(
        rm_column(one_row_df, src).alias("r")).head()["r"] == want


def test_column_int_mul_beyond_int32(one_row_df):
    """Pinned hypothesis find (r14): small int literals left the
    physical column INT32, so an all-integer product past 2^31 threw
    ARITHMETIC_OVERFLOW under ANSI mode while the driver (Python ints)
    computed it — the integral path now runs in LONG."""
    src = "(((71 * 73) + 0) * (70 * (74 * 80)))"
    want = run(src)
    assert want == 2147835200
    got = one_row_df.select(
        rm_column(one_row_df, src).alias("r")).head()["r"]
    assert got == want


# ------------------------------------------- round-6b hypothesis fuzz

_pack_items = st.lists(st.tuples(st.integers(0, 999),
                                 st.integers(0, 300)),
                       min_size=0, max_size=30,
                       unique_by=lambda t: t[0])


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(items=_pack_items, cap=st.sampled_from([64, 256]))
def test_pack_sequences_matches_model_hypothesis(spark, items, cap):
    """Greedy packing vs the python recurrence under hypothesis-driven
    layouts (zero-weight docs, over-capacity docs, empty groups)."""
    from radmapper_spark.operators import chunking
    if not items:
        return
    df = spark.createDataFrame([("g", i, n) for i, n in items],
                               "source string, doc_id long, n_tokens long")
    got = {r.doc_id: (r.n_used, r.pack_id, r.pack_fill)
           for r in chunking.pack_sequences(df, capacity=cap).collect()}
    want, b, fill = {}, 0, 0
    for i, n in sorted(items):
        n = min(n, cap)
        if b > 0 and fill + n <= cap:
            fill += n
        else:
            b, fill = b + 1, n
        want[i] = (n, b, fill)
    assert got == want


_chunk_tokens = st.lists(st.text(alphabet="abcx", min_size=1, max_size=4),
                         min_size=0, max_size=60)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(toks=_chunk_tokens, mod=st.sampled_from([2, 4, 16]))
def test_cdc_chunking_partitions_hypothesis(spark, toks, mod):
    """Content-defined chunks always partition the token stream exactly,
    for any content and boundary density."""
    from radmapper_spark.operators import chunking
    text = " ".join(toks)
    if not text.strip():
        return
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = sorted(chunking.chunk_content_defined(df, mod=mod).collect(),
                 key=lambda r: r.chunk_seq)
    assert " ".join(r.chunk_text for r in out) == text
    assert sum(r.n_chunk_tokens for r in out) == len(toks)


def test_string_double_rendering_parity(one_row_df):
    """$string of a fractional double must render like the driver's
    Python repr, not Java's Double.toString (r16 deep-fuzz find:
    $string($sqrt(2^63-1)) forked '3.037...E9' vs '3037000499.97605').
    Battery spans both Java scientific switchover points (>= 1e7,
    < 1e-3), the repr switchover (< 1e-4), 2- and 3-digit exponents,
    signs, and near-2^53 fractional values."""
    vals = [3037000499.97605, 0.5, 9999999.5, 10000000.5,
            1234567890.123, 999999999999999.9, 0.001, 0.0001, 0.00015,
            0.000999, 1.5e-5, 5e-5, 1.5e-7, 2.5e-11, 7.123e-101,
            1 / 3, 123456789012345.6, -3037000499.97605, -1.5e-5,
            -0.00015, 2.2250738585072014e-308, 0.1 + 0.2,
            4503599627370495.5,
            # INTEGRAL doubles >= 2^53: both engines print the
            # shortest-roundtrip digits positionally (2^63 ->
            # ...776000), NOT the exact binary expansion (...775808)
            9223372036854775808.0, -9223372036854775808.0, 1e16,
            9007199254740994.0, 1.23e20]
    bad = []
    for v in vals:
        src = f"$string({v!r})"
        want = run(src)
        got = one_row_df.select(
            rm_column(one_row_df, src).alias("r")).head()["r"]
        if got != want:
            bad.append((v, got, want))
    assert not bad, bad
