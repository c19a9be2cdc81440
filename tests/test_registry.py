"""Registry-wide invariants: entry determinism, plan-shape locks, window rotation, frozen-surface pins (entrypoints.py).

Consolidated from the per-round test files (r14 governance pass) — test bodies unchanged."""

from __future__ import annotations

import hashlib
import math
import random
import pytest
from pyspark.sql import functions as F
from radmapper_spark.operators import behavior, chunking, similarity, temporal
from radmapper_spark.operators import textstats
import json
import os
import time
import re
import __spark_entry__ as entrymod

# ======================== from test_round6b.py ========
@pytest.mark.parametrize("name", [
    "ann_ivf_topk", "ann_pq_topk", "embedding_kmeans_lloyd",
    "graph_pagerank", "dedup_embedding_cosine", "dedup_minhash_lsh"])
def test_entry_repeat_invocation_identical(spark, name):
    """Entries that carry caches (codebooks, persisted signature/rank
    frames) must return IDENTICAL results on a second invocation in the
    same session — a stale or cross-contaminated cache shows up here."""
    import __spark_entry__ as entrymod
    fn = entrymod.queries()[name]
    sf = "/root/testdata/sf0.001"

    def run_once():
        df = fn(spark, sf)
        rows = sorted(tuple(r) for r in df.collect())
        rel = getattr(df, "rm_release_cache", None)
        rel and rel()
        return rows

    assert run_once() == run_once()


# ======================== from test_round9.py (r14 consolidation) ========
def test_customer_deciles_window_is_partitioned(spark):
    """The decile entry must not run an UNPARTITIONED window over the
    customer dimension (the old global ntile funneled every customer
    through one task). Every Window node in the physical plan must be
    keyed on the range-partition id. (Exchange SinglePartition nodes
    still appear for grand-total aggregates — those reduce 32 one-row
    partials, the normal scalable shape — so we assert on the Window
    nodes, not on exchanges.)"""
    from radmapper_spark import entrypoints as ep
    df = ep.customer_deciles(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert win_lines, "plan lost its window — test is vacuous"
    assert all("_rm_pid" in ln for ln in win_lines), win_lines
    rows = {r.decile: r.n_customers for r in df.collect()}
    assert set(rows) == set(range(1, 11))
    rel = getattr(df, "rm_release_cache", None)
    rel and rel()


# ======================== from test_round13.py (r14 consolidation) ========
SF = "/root/testdata/sf0.001"


def _release(df):
    rel = getattr(df, "rm_release_cache", None)
    if rel is not None:
        rel()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _parquet_relations(plan: str) -> int:
    return len(re.findall(r"Relation.*parquet", plan))


@pytest.mark.parametrize("name", ["nb_quality_score", "nb_pareto_filter"])
def test_nb_entries_single_training_instantiation(spark, name):
    """The NB entries must bench the scale shape their docstrings
    preach (r12 verdict item #1/#4): the training subtree appears ONCE
    in the plan — one aggregate over each class. Concretely the
    optimized plan holds exactly THREE parquet relations: the corpus
    scan plus one scan per class under the vocab aggregate; the consts
    are literals over a 1-row local relation, not a second training
    instantiation (the lazy one-shot form had SEVEN relations — vocab's
    two, consts' re-derived two, two 1-row class counts, the corpus)."""
    df = entrymod.queries()[name](spark, SF)
    plan = _optimized(df)
    n = _parquet_relations(plan)
    assert n == 3, f"{name}: {n} parquet relations (want 3):\n{plan[:3000]}"


def test_rotation_window_invariant():
    """The freshness-debt arithmetic as a TESTED invariant (r12 verdict
    item #2), recomputed INDEPENDENTLY of entrypoints.derive_window from
    the committed CORRECTNESS_r*.json history — since r15 the window is
    derived at import time, so a failure here is a derivation bug or a
    policy violation, never a start-of-round TODO. Definitions:
    last_green(e) = newest round whose driver row for e is fully green
    (rows+schema+hash, no err); N = that maximum + 1 (the round being
    built); urgency(e) = (N - last_green(e)) - tier_bound(e), with
    never-proven entries at +inf. Asserts:

    1. the declared window IS the registered prefix the driver checks;
    2. never-proven entries are in the window (no latecomer debt);
    3. no entry OUTSIDE the window is past its tier bound (a forgotten
       slip fails here the round it would breach, not at judge time);
    4. the window is a priority-order prefix: nothing outside is more
       urgent than anything inside (ties may fall either side);
    5. capacity: sum(1/bound) over the registry fits the 50-row/round
       budget with headroom — the schedulability condition that keeps
       checks 3/4 satisfiable forever (the r14 two-tier policy demanded
       58 rows/round against 50 slots; the sealed tier exists to fix
       exactly this).
    """
    import glob
    import json
    import os
    import re

    import radmapper_spark.entrypoints as ep

    # derive the repo root from THIS file: a hardcoded /root/repo
    # validated a different checkout's history when the suite ran from
    # a clone or worktree (r13 third review, confirmed empirically)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    assert files, f"no CORRECTNESS_r*.json under {repo} — wrong checkout?"
    last, rounds = {}, set()
    for f in files:
        r = int(re.search(r"r(\d+)", f).group(1))
        try:  # mirror _correctness_history: a truncated driver file is
            qs = json.load(open(f))   # skipped, never a raw traceback
        except Exception:
            continue
        rounds.add(r)
        qs = qs.get("queries", qs)
        for k, v in qs.items():
            if (isinstance(v, dict) and v.get("rows_match")
                    and v.get("schema_match")
                    and v.get("hash_match", True) and not v.get("err")):
                last[k] = max(r, last.get(k, 0))
    n_round = max(rounds) + 1
    registry = list(ep.ENTRIES)
    window = list(ep._CURRENT_WINDOW)

    # 1. window == the registered prefix (what the driver gate checks)
    assert window == registry[:len(window)], \
        "declared window is not the registered prefix"
    assert len(set(window)) == len(window) == 50

    def bound(e):
        return ep._ROTATION_TIERS[ep._entry_tier(e)]

    def urgency(e):
        if e not in last:
            return float("inf")
        return (n_round - last[e]) - bound(e)

    inside = set(window)
    # Since r15 the window derives from the history at import time
    # (entrypoints.derive_window), so these checks hold at EVERY
    # checkout including the moment a new CORRECTNESS_rN.json lands —
    # a failure means the derivation or the tier policy broke, or a
    # non-empty _WINDOW_OVERRIDE violates the policy it overrides.
    todo = ("— derivation bug or policy violation (the window is "
            "self-deriving since r15; check entrypoints.derive_window "
            "/ _WINDOW_OVERRIDE)")
    # 2. no latecomer debt
    never = [e for e in registry if e not in last]
    assert set(never) <= inside, (
        f"never-proven entries outside the window (they must land "
        f"first driver rows this round): {never} {todo}")
    # 3. nothing outside may be past its bound
    breaches = [(e, urgency(e)) for e in registry
                if e not in inside and urgency(e) > 0]
    assert not breaches, (
        f"entries breach tier bounds outside the window: {breaches} "
        f"{todo}")
    # 4. priority-prefix: min(inside) >= max(outside)
    min_in = min(urgency(e) for e in window)
    max_out = max(urgency(e) for e in registry if e not in inside)
    assert min_in >= max_out, (
        f"window is not a priority prefix: an inside entry has urgency "
        f"{min_in} < an outside entry's {max_out} — rotate the more "
        f"urgent entry in {todo}")
    # tier sanity: every pinned entry exists, tiers are disjoint,
    # bounds are the policy
    assert ep._SEALED_ENTRIES <= set(registry)
    assert ep._FROZEN_ENTRIES <= set(registry)
    assert not (ep._SEALED_ENTRIES & ep._FROZEN_ENTRIES)
    assert ep._ROTATION_TIERS == {"active": 2, "frozen": 3, "sealed": 5}
    # 5. schedulability: steady-state demand fits the window with
    # headroom for a few never-proven newcomers per round
    demand = sum(1.0 / bound(e) for e in registry)
    assert demand <= len(window) - 2, (
        f"rotation over-subscribed: steady-state demand {demand:.1f} "
        f"rows/round vs {len(window)} slots — seal/freeze more "
        f"long-unchanged entries before adding new ones")
    # 5b. GROWTH PROJECTION (r15 verdict item #4): each round adds
    # 2-5 active entries (+1.0-2.5 rows/round of steady-state demand),
    # so assert NEXT round's worst-case demand also fits — the breach
    # is caught a round early, while there is still time to seal
    # another long-unchanged module instead of scrambling at capacity
    assert demand + 2.5 <= len(window) - 2, (
        f"rotation capacity projected to breach NEXT round: demand "
        f"{demand:.1f} + 2.5 (worst-case new entries) > "
        f"{len(window) - 2} — seal the oldest-unchanged modules now "
        f"(candidates: any module >= 5 rounds untouched; see "
        f"_SEALED_ENTRIES criteria)")
    # the declared window must BE what derive_window computes (guards
    # against a drifting override left behind after an emergency; the
    # sort key ends on the entry name, so input order is irrelevant)
    if not ep._WINDOW_OVERRIDE:
        assert window == ep.derive_window(repo_root=repo)


@pytest.mark.parametrize("name", ["token_budget_select",
                                  "curriculum_order"])
def test_r13_ordering_entries_windows_are_partitioned(spark, name):
    """Entry-level plan lock (the customer_deciles pattern): every
    Window node in the physical plan must be keyed on the
    range-partition id — the budget cut and the curriculum must never
    regress to a single-partition window over the corpus — and the
    plan must actually carry a range exchange (the distributed global
    order; vacuity guard)."""
    df = entrymod.queries()[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert win_lines, f"{name}: plan lost its windows — vacuous"
    assert all("_rm_pid" in ln for ln in win_lines), win_lines
    assert "rangepartitioning" in plan, f"{name}: no range exchange"
    _release(df)


def _freeze_digests():
    """Recompute the frozen-tier source digests: for every frozen
    entry, the entrypoints entry function + each declared surface
    (module or module:symbol)."""
    import hashlib
    import importlib
    import inspect

    import radmapper_spark.entrypoints as ep

    def digest(src: str) -> str:
        return hashlib.sha256(src.encode()).hexdigest()[:16]

    out = {}
    for entry in sorted(ep._PINNED_ENTRIES):
        surfaces = {"entry": digest(inspect.getsource(
            ep.ENTRIES[entry][0])),
            # the DuckDB twin is part of the frozen contract too — a
            # drifting oracle would silently move the goalposts
            "oracle": digest(inspect.getsource(ep.ENTRIES[entry][1]))}
        for spec in ep._FROZEN_SURFACES[entry]:
            if ":" in spec:
                mod, sym = spec.split(":")
                obj = getattr(importlib.import_module(mod), sym)
            else:
                obj = importlib.import_module(spec)
            surfaces[spec] = digest(inspect.getsource(obj))
        out[entry] = surfaces
    return out


def test_frozen_surfaces_unchanged():
    """THE freeze criterion as a forward invariant: a frozen entry's
    pinned operator source must match tests/freeze_manifest.json.
    Editing pinned code while the entry stays frozen fails here —
    either re-activate the entry (remove from _FROZEN_ENTRIES) or
    consciously re-pin with RM_REGEN_FREEZE=1 in the same commit.
    Also asserts every frozen entry HAS a surface declaration (a new
    freeze without pins fails loudly)."""
    import json
    import os

    import radmapper_spark.entrypoints as ep

    path = os.path.join(os.path.dirname(__file__),
                        "freeze_manifest.json")
    # the declaration check must run BEFORE the digest pass: a new
    # freeze without pins would otherwise die as a bare KeyError
    # inside _freeze_digests instead of this message (r13 second
    # review)
    assert set(ep._FROZEN_SURFACES) == set(ep._PINNED_ENTRIES), \
        "every pinned (frozen or sealed) entry needs a " \
        "_FROZEN_SURFACES declaration"
    got = _freeze_digests()
    if os.environ.get("RM_REGEN_FREEZE") == "1":
        with open(path, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
    want = json.load(open(path))
    drifted = {e: {k: (want.get(e, {}).get(k), v)
                   for k, v in s.items()
                   if want.get(e, {}).get(k) != v}
               for e, s in got.items()
               if s != want.get(e)}
    assert not drifted, (
        f"frozen entries' pinned source changed without re-activation "
        f"or re-pin: {drifted}")
