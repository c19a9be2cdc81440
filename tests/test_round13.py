"""Round-13 tests: NB scale-shape plan lock (r12 verdict item #4),
epoch-parameterized shuffle, materialized training shards, and the
rotation-tier freshness invariant (item #2).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _release(df):
    rel = getattr(df, "rm_release_cache", None)
    if rel is not None:
        rel()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


# ------------------------------------------------- NB scale shape lock

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


# ------------------------------------------ epoch-parameterized shuffle

def _epoch_ranks(spark, n, epoch, ids=None):
    from radmapper_spark.operators import sampling
    df = (spark.range(n).selectExpr("id * 7 AS doc_id") if ids is None
          else spark.createDataFrame([(i,) for i in ids], "doc_id long"))
    out = sampling.corpus_shuffle(df, "doc_id", shard_size=10, epoch=epoch)
    rows = {r["doc_id"]: r["shuffle_rank"] for r in out.collect()}
    _release(out)
    return rows


def test_epoch_shuffles_are_distinct_permutations(spark):
    """Each epoch must be a COMPLETE permutation (ranks exactly 1..N of
    the same id set) and pairwise DISTINCT from the others — the whole
    point of reshuffling per epoch."""
    perms = {e: _epoch_ranks(spark, 200, e) for e in (0, 1, 2, 3)}
    ids = set(perms[0])
    for e, p in perms.items():
        assert set(p) == ids, f"epoch {e} changed the id set"
        assert sorted(p.values()) == list(range(1, 201)), \
            f"epoch {e} is not a complete 1..N permutation"
    es = sorted(perms)
    for i, a in enumerate(es):
        for b in es[i + 1:]:
            assert perms[a] != perms[b], f"epochs {a} and {b} collide"


def test_epoch_none_matches_pre_epoch_layout(spark):
    """epoch=None must stay byte-compatible with the un-epoched salt
    (the committed corpus_shuffle oracle depends on it)."""
    from radmapper_spark.operators import sampling
    df = spark.range(50).selectExpr("id AS doc_id")
    a = sampling.corpus_shuffle(df, "doc_id", 10)
    b = sampling.corpus_shuffle(df, "doc_id", 10, epoch=None)
    ra = {r["doc_id"]: r["shuffle_rank"] for r in a.collect()}
    rb = {r["doc_id"]: r["shuffle_rank"] for r in b.collect()}
    _release(a), _release(b)
    assert ra == rb


def test_epoch_shuffle_append_stable(spark):
    """Within one epoch the order is append-stable: adding new ids must
    not reorder existing ones (their permutation keys depend only on
    the id), so a growing corpus keeps already-written shards' relative
    order."""
    base = [i * 3 for i in range(80)]
    grown = base + [1000 + i for i in range(40)]
    small = _epoch_ranks(spark, 0, epoch=2, ids=base)
    big = _epoch_ranks(spark, 0, epoch=2, ids=grown)
    order_small = sorted(base, key=lambda i: small[i])
    order_big = [i for i in sorted(grown, key=lambda i: big[i])
                 if i in set(base)]
    assert order_small == order_big


def test_epoch_rejects_negative(spark):
    from radmapper_spark.operators import sampling
    df = spark.range(5).selectExpr("id AS doc_id")
    with pytest.raises(ValueError):
        sampling.corpus_shuffle(df, "doc_id", 10, epoch=-1)


# ------------------------------------------ materialized training shards

def test_training_shards_layout_and_roundtrip(spark):
    """The materialized artifact must honor every layout invariant a
    sequential-reading trainer depends on: exact shard sizes,
    contiguous rank ranges per shard, ONE file per shard directory,
    rows physically ordered by shard_pos inside each file — and the
    read-back values must equal an independent recomputation of the
    composition (write->read is lossless)."""
    import glob
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    import radmapper_spark.entrypoints as ep

    df = entrymod.queries()["materialize_training_shards"](spark, SF)
    p = df.toPandas()
    n, size = len(p), ep._TRAIN_SHARD
    assert n > 0
    # complete permutation + shard arithmetic
    assert sorted(p["shuffle_rank"]) == list(range(1, n + 1))
    assert ((p["shuffle_rank"] - 1) // size == p["shard"]).all()
    assert ((p["shuffle_rank"] - 1) % size == p["shard_pos"]).all()
    sizes = p.groupby("shard").size()
    assert (sizes.drop(sizes.index.max()) == size).all(), \
        "a non-final shard is not exactly shard_size rows"
    # read-back equals recompute (the files hold the exact values)
    rec = ep._training_chunks(spark, SF)
    q = rec.select(*ep._TRAIN_COLS).toPandas()
    rec.rm_release_cache()
    key = ["shuffle_rank"]
    pd.testing.assert_frame_equal(
        p.sort_values(key).reset_index(drop=True)[list(ep._TRAIN_COLS)],
        q.sort_values(key).reset_index(drop=True)[list(ep._TRAIN_COLS)],
        check_dtype=False)
    # on-disk layout: one parquet file per shard dir, physical
    # shard_pos order 0..k-1 inside each file
    path = next(v for k, (_fp, v) in ep._PROBE_INDEX_CACHE.items()
                if k[2] == "train_shards")
    shard_dirs = sorted(glob.glob(os.path.join(path, "shard=*")))
    assert len(shard_dirs) == p["shard"].nunique()
    for d in shard_dirs:
        parts = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(parts) == 1, f"{d}: {len(parts)} files (want 1)"
    for d in (shard_dirs[0], shard_dirs[len(shard_dirs) // 2],
              shard_dirs[-1]):
        f = [os.path.join(d, x) for x in os.listdir(d)
             if x.endswith(".parquet")][0]
        pos = pq.read_table(f, columns=["shard_pos"])["shard_pos"] \
            .to_pylist()
        assert pos == list(range(len(pos))), \
            f"{f}: rows not physically ordered by shard_pos"


# -------------------------------------------- rotation-tier invariant

def test_rotation_window_invariant():
    """The freshness-debt arithmetic as a TESTED invariant (r12 verdict
    item #2), recomputed from the committed CORRECTNESS_r*.json history
    instead of trusted to a hand-maintained comment. Definitions:
    last_green(e) = newest round whose driver row for e is fully green
    (rows+schema+hash, no err); N = that maximum + 1 (the round being
    built); urgency(e) = (N - last_green(e)) - tier_bound(e), with
    never-proven entries at +inf. Asserts:

    1. the declared window IS the registered prefix the driver checks;
    2. never-proven entries are in the window (no latecomer debt);
    3. no entry OUTSIDE the window is past its tier bound (a forgotten
       slip fails here the round it would breach, not at judge time);
    4. the window is a priority-order prefix: nothing outside is more
       urgent than anything inside (ties may fall either side).
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
        rounds.add(r)
        qs = json.load(open(f))
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
        return ep._ROTATION_TIERS[
            "frozen" if e in ep._FROZEN_ENTRIES else "active"]

    def urgency(e):
        if e not in last:
            return float("inf")
        return (n_round - last[e]) - bound(e)

    inside = set(window)
    # 2. no latecomer debt
    never = [e for e in registry if e not in last]
    assert set(never) <= inside, f"never-proven entries outside: {never}"
    # 3. nothing outside may be past its bound
    breaches = [(e, urgency(e)) for e in registry
                if e not in inside and urgency(e) > 0]
    assert not breaches, f"entries breach tier bounds outside the " \
                         f"window: {breaches}"
    # 4. priority-prefix: min(inside) >= max(outside)
    min_in = min(urgency(e) for e in window)
    max_out = max(urgency(e) for e in registry if e not in inside)
    assert min_in >= max_out, (
        f"window is not a priority prefix: an inside entry has urgency "
        f"{min_in} < an outside entry's {max_out} — rotate the more "
        f"urgent entry in")
    # tier sanity: every frozen entry exists, bounds are the policy
    assert ep._FROZEN_ENTRIES <= set(registry)
    assert ep._ROTATION_TIERS == {"frozen": 3, "active": 2}


def test_epoch_salt_encoding_is_injective(spark):
    """A bare salt that already carries the epoch suffix must be
    rejected: salt='run:e2'+epoch=None would otherwise collide with
    salt='run'+epoch=2 (r13 review)."""
    from radmapper_spark.operators import sampling
    df = spark.range(5).selectExpr("id AS doc_id")
    with pytest.raises(ValueError, match="epoch suffix"):
        sampling.corpus_shuffle(df, "doc_id", 10, salt="run:e2")
    with pytest.raises(ValueError, match="epoch suffix"):
        sampling.duck_corpus_shuffle_sql("doc_id", 10, salt="run:e2")


def test_probe_index_cache_revalidates_fingerprint(spark, tmp_path):
    """_probe_index_path must rebuild when the sf_dir fingerprint
    changes (r13 review: it was the one derived cache still assuming
    immutable fixtures). Simulated with a writable corpus dir."""
    import shutil

    import radmapper_spark.entrypoints as ep

    d = str(tmp_path / "sf")
    shutil.copytree(SF, d)
    builds = []
    p1 = ep._probe_index_path(spark, d, "fprobe",
                              lambda p: builds.append(p))
    p2 = ep._probe_index_path(spark, d, "fprobe",
                              lambda p: builds.append(p))
    assert p1 == p2 and len(builds) == 1, "memo must hold while static"
    # touch one parquet file -> fingerprint changes -> rebuild
    import os
    f = os.path.join(d, "documents.parquet")
    with open(f, "ab") as fh:
        fh.write(b"\x00")
    p3 = ep._probe_index_path(spark, d, "fprobe",
                              lambda p: builds.append(p))
    assert len(builds) == 2, "rewritten corpus must invalidate the memo"
    assert p3 != p1
    # the stale tree is RETIRED, not deleted in place: DataFrames from
    # earlier calls still lazily reference it (r13 third review; the
    # old `not exists(p1) or p3 != p1` assert was vacuous — p3 is a
    # fresh mkdtemp, so the disjunct always passed)
    assert os.path.exists(p1), "stale tree must survive until purge"
    assert p1 in ep._RETIRED_INDEX_TREES
    # a FAILED build must not leak its partial tree outside the cache
    with open(f, "ab") as fh:
        fh.write(b"\x00")
    with pytest.raises(RuntimeError, match="boom"):
        ep._probe_index_path(spark, d, "fprobe",
                             lambda p: (_ for _ in ()).throw(
                                 RuntimeError("boom")))
    # purge reclaims both the live and the retired trees
    ep.purge_probe_indexes()
    assert not os.path.exists(p1) and not os.path.exists(p3)


# ----------------------------------- r13 second batch: training-mix ops

def test_global_cumsum_exact_vs_python(spark):
    """global_cumsum must equal the Python prefix-sum in the same total
    order, with every Window node keyed on the range-partition id
    (never an empty partition spec)."""
    from radmapper_spark.operators.ranking import global_cumsum
    rows = [(i, (i * 37) % 101 + 1) for i in range(5000)]
    df = (spark.createDataFrame(rows, "id long, w long")
          .repartition(13))
    out = global_cumsum(df, [F.col("w").asc(), F.col("id").asc()], "w",
                        cum_col="cum", rank_col="rk")
    got = {r["id"]: (r["rk"], r["cum"]) for r in out.collect()}
    plan = out._jdf.queryExecution().executedPlan().toString()
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert win_lines, "plan lost its windows — test is vacuous"
    assert all("_rm_pid" in ln for ln in win_lines), win_lines
    acc = 0
    for rank, (i, w) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])),
                                  start=1):
        acc += w
        assert got[i] == (rank, acc), (i, got[i], (rank, acc))
    _release(out)


def test_global_cumsum_rejects_float_weights(spark):
    from radmapper_spark.operators.ranking import global_cumsum
    df = spark.createDataFrame([(1, 1.5)], "id long, w double")
    with pytest.raises(ValueError, match="integral"):
        global_cumsum(df, [F.col("id")], "w")
    with pytest.raises(ValueError, match="not in frame"):
        global_cumsum(df.select("id"), [F.col("id")], "w")


def test_token_budget_select_prefix_property(spark):
    """Kept set = the maximal quality-ordered prefix within budget:
    every kept row's running total <= budget, and the best dropped
    row would overflow it. Edges: budget 0 keeps nothing; a budget
    >= the corpus total keeps everything."""
    from radmapper_spark.operators import sampling
    rows = [(i, (i * 13) % 50 + 1, (i * 7) % 40 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, score long, w long")
    order = [F.col("score").desc(), F.col("id").asc()]
    out = sampling.token_budget_select(df, 900, order, "w")
    kept = [(r["id"], r["cum_tokens"]) for r in out.collect()]
    _release(out)
    ordered = sorted(rows, key=lambda t: (-t[1], t[0]))
    acc, want = 0, []
    for i, s, w in ordered:
        acc += w
        if acc > 900:
            break
        want.append((i, acc))
    assert sorted(kept) == sorted(want)
    assert want and want[-1][1] <= 900
    empty = sampling.token_budget_select(df, 0, order, "w")
    assert empty.count() == 0
    _release(empty)
    total = sum(w for _, _, w in rows)
    full = sampling.token_budget_select(df, total, order, "w")
    assert full.count() == len(rows)
    _release(full)
    with pytest.raises(ValueError, match="budget"):
        sampling.token_budget_select(df, -1, order, "w")


def test_mixture_temperature_allocation(spark):
    """Exact largest-remainder allocation: targets sum to k when every
    group can fill its quota; alpha < 1 boosts small groups relative
    to their proportional share; a group smaller than its target keeps
    all its rows; invalid alpha raises."""
    from radmapper_spark.operators import sampling
    rows = ([(i, "big") for i in range(800)]
            + [(i + 1000, "mid") for i in range(150)]
            + [(i + 2000, "small") for i in range(50)])
    df = spark.createDataFrame(rows, "doc_id long, g string")
    out = sampling.mixture_temperature(df, "g", "doc_id", 100, alpha=0.5)
    got = out.collect()
    targets = {r["g"]: r["target_n"] for r in got}
    kept = {}
    for r in got:
        kept[r["g"]] = kept.get(r["g"], 0) + 1
    assert sum(targets.values()) == 100
    assert kept == targets  # every group filled its quota
    # proportional shares would be 80/15/5; sqrt-temperature flattens
    assert targets["big"] < 80 and targets["small"] > 5
    # per-group kept rows are the hash-order prefix: ranks contiguous
    ranks = sorted(r["mix_rank"] for r in got if r["g"] == "small")
    assert ranks == list(range(1, targets["small"] + 1))
    with pytest.raises(ValueError, match="alpha"):
        sampling.mixture_temperature(df, "g", "doc_id", 100, alpha=0.3)
    with pytest.raises(ValueError, match="k must be positive"):
        sampling.mixture_temperature(df, "g", "doc_id", 0)
    # a tiny group cannot fill an upsampled quota: keeps all its rows
    tiny = spark.createDataFrame(
        [(i, "a") for i in range(99)] + [(500, "b")],
        "doc_id long, g string")
    out2 = sampling.mixture_temperature(tiny, "g", "doc_id", 50,
                                        alpha=0.25)
    kept2 = {}
    for r in out2.collect():
        kept2[r["g"]] = kept2.get(r["g"], 0) + 1
    assert kept2["b"] == 1  # capped at the group size


def test_curriculum_order_stage_contiguity(spark):
    """The global order walks stages in sequence: every stage-s rank
    precedes every stage-(s+1) rank, stage sizes follow the exact
    ntile rule, and within a stage the order is the salted hash (not
    the difficulty)."""
    from radmapper_spark.functions import portable_hash as PH
    from radmapper_spark.operators import sampling
    rows = [(i, (i * 31) % 997) for i in range(503)]
    df = spark.createDataFrame(rows, "doc_id long, diff long")
    out = sampling.curriculum_order(
        df, [F.col("diff").asc(), F.col("doc_id").asc()], 4, "doc_id",
        shard_size=50)
    got = out.select("doc_id", "stage", "curriculum_rank", "shard",
                     "shard_pos").collect()
    _release(out)
    assert len(got) == 503
    by_stage = {}
    for r in got:
        by_stage.setdefault(r["stage"], []).append(r)
    # ntile(4) over 503 rows: 126, 126, 126, 125
    assert {s: len(v) for s, v in by_stage.items()} == {
        1: 126, 2: 126, 3: 126, 4: 125}
    for s in (1, 2, 3):
        assert (max(r["curriculum_rank"] for r in by_stage[s])
                < min(r["curriculum_rank"] for r in by_stage[s + 1]))
    # within-stage order is the salted portable hash, ties on id
    h = {r["doc_id"]: r for r in got}
    hdf = df.select(
        "doc_id",
        PH.ph60(F.concat(F.lit("curriculum:"),
                         F.col("doc_id").cast("string"))).alias("h"))
    hv = {r["doc_id"]: r["h"] for r in hdf.collect()}
    s1 = sorted(by_stage[1], key=lambda r: r["curriculum_rank"])
    assert [r["doc_id"] for r in s1] == [
        d for d, _ in sorted(((r["doc_id"], hv[r["doc_id"]]) for r in s1),
                             key=lambda t: (t[1], t[0]))]
    # shard layout rides the rank
    for r in got:
        assert r["shard"] == (r["curriculum_rank"] - 1) // 50
        assert r["shard_pos"] == (r["curriculum_rank"] - 1) % 50


def test_keep_best_max_score_with_ties(spark):
    """keep_best keeps the highest-scored member per component (ties ->
    lowest id) and counts only SCORED members."""
    from radmapper_spark.operators import dedup
    groups = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6)],
        "doc_id long, component long")
    scored = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 7), (6, -2)],
        "doc_id long, score_micro long")  # doc 5 unscored
    got = {r["component"]: (r["doc_id"], r["score_micro"], r["n_members"])
           for r in dedup.keep_best(groups, scored).collect()}
    assert got == {1: (2, 30, 3),   # tie 2 vs 3 -> lowest id
                   4: (4, 7, 1),    # doc 5 unscored: not counted
                   6: (6, -2, 1)}


def test_mixture_temperature_allocation_fuzz_vs_python():
    """Property fuzz of the largest-remainder allocation arithmetic
    against a pure-Python IEEE reference (the engine-exactness family
    pattern, cf. the NB fuzz): for random group counts, k, and alpha,
    DuckDB computes the identical weights, quotas, and seat
    assignments — sqrt is correctly rounded and everything after it is
    BIGINT arithmetic, so all three engines (Python/DuckDB/Spark, the
    last pinned by the unit test + 3-SF oracle) must agree exactly."""
    import math

    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from radmapper_spark.operators.sampling import WGRID

    roots = {0.5: math.sqrt, 0.25: lambda x: math.sqrt(math.sqrt(x))}

    @settings(max_examples=60, deadline=None)
    @given(st.dictionaries(st.integers(0, 40),
                           st.integers(1, 10 ** 12),
                           min_size=1, max_size=10),
           st.integers(1, 10 ** 6),
           st.sampled_from([1.0, 0.5, 0.25]))
    def check(counts, k, alpha):
        # pure-Python reference: one IEEE root + multiply, then ints
        # (alpha=1 skips the grid — counts are already exact BIGINTs,
        # and a uniform factor cancels in the integer quotients)
        w = (dict(counts) if alpha == 1.0 else
             {g: math.floor(roots[alpha](float(c)) * float(WGRID))
              for g, c in counts.items()})
        tw = sum(w.values())
        base = {g: (k * wg) // tw for g, wg in w.items()}
        rem = {g: (k * wg) % tw for g, wg in w.items()}
        leftover = k - sum(base.values())
        seats = sorted(counts, key=lambda g: (-rem[g], g))[:leftover]
        want = {g: base[g] + (1 if g in seats else 0) for g in counts}
        assert sum(want.values()) == k

        from radmapper_spark.operators.sampling import _duck_temp_weight
        w_sql = _duck_temp_weight("c", alpha)
        values = ", ".join(f"({g}, {c})" for g, c in counts.items())
        got = dict(duckdb.sql(f"""
            WITH mtw AS (SELECT g, {w_sql} AS w
                         FROM (VALUES {values}) AS t(g, c)),
            mtq AS (SELECT g,
                           ({k}::BIGINT * w) // (SELECT sum(w) FROM mtw)
                               AS base,
                           ({k}::BIGINT * w) % (SELECT sum(w) FROM mtw)
                               AS rem
                    FROM mtw)
            SELECT g, base + CASE WHEN row_number() OVER (
                                      ORDER BY rem DESC, g ASC)
                                  <= {k} - (SELECT sum(base) FROM mtq)
                             THEN 1 ELSE 0 END
            FROM mtq
        """).fetchall())
        assert got == want, (counts, k, alpha)

    check()


def test_split_expr_matches_hash_split(spark):
    """split_expr must stamp the identical split hash_split assigns —
    the lock that keeps the inline (join-free) form and the canonical
    assignment from forking (split_leakage depends on it)."""
    from radmapper_spark.operators import sampling
    df = spark.range(2000).selectExpr("id AS doc_id")
    via_split = {r["doc_id"]: r["split"]
                 for r in sampling.hash_split(df, "doc_id").collect()}
    via_expr = {r["doc_id"]: r["s"]
                for r in df.select(
                    "doc_id",
                    sampling.split_expr("doc_id").alias("s")).collect()}
    assert via_split == via_expr
    # and under a NON-DEFAULT splits dict (the ladder must agree on
    # every threshold, not just the 800/100/100 defaults)
    alt = {"a": 0.25, "b": 0.5, "c": 0.25}
    via_split2 = {r["doc_id"]: r["split"]
                  for r in sampling.hash_split(df, "doc_id",
                                               splits=alt).collect()}
    via_expr2 = {r["doc_id"]: r["s"]
                 for r in df.select(
                     "doc_id",
                     sampling.split_expr("doc_id", splits=alt)
                     .alias("s")).collect()}
    assert via_split2 == via_expr2
    assert set(via_split2.values()) == {"a", "b", "c"}
    counts = {}
    for s in via_split.values():
        counts[s] = counts.get(s, 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"]  # 0.8/0.1/0.1 sanity


def test_split_leakage_semantics(spark):
    """Only pairs whose endpoints land in different splits survive,
    splits are stamped correctly per endpoint, and the op is map-only
    (no Exchange in the plan — zero added shuffles)."""
    from radmapper_spark.operators import sampling
    ids = spark.range(300).selectExpr("id AS doc_id")
    split_of = {r["doc_id"]: r["split"]
                for r in sampling.hash_split(ids, "doc_id").collect()}
    pairs = spark.createDataFrame(
        [(a, a + 150) for a in range(150)], "id_a long, id_b long")
    out = sampling.split_leakage(pairs)
    assert "Exchange" not in \
        out._jdf.queryExecution().executedPlan().toString()
    got = {(r["id_a"], r["id_b"]): (r["split_a"], r["split_b"])
           for r in out.collect()}
    want = {(a, a + 150): (split_of[a], split_of[a + 150])
            for a in range(150)
            if split_of[a] != split_of[a + 150]}
    assert got == want and 0 < len(want) < 150


def test_clean_holdout_removes_exactly_leaked_test_docs(spark):
    """clean_holdout = holdout-split docs minus those with a near-dup
    pair into the against-split — recomputed independently from
    hash_split + the pair list."""
    from radmapper_spark.operators import sampling
    docs = spark.range(400).selectExpr("id AS doc_id",
                                       "concat('s', id % 3) AS source")
    split_of = {r["doc_id"]: r["split"]
                for r in sampling.hash_split(docs, "doc_id").collect()}
    pair_rows = [(a, a + 200) for a in range(0, 200, 3)]
    pairs = spark.createDataFrame(pair_rows, "id_a long, id_b long")
    got = sorted(r["doc_id"] for r in
                 sampling.clean_holdout(docs, pairs).collect())
    leaked = set()
    for a, b in pair_rows:
        if split_of[a] == "test" and split_of[b] == "train":
            leaked.add(a)
        if split_of[b] == "test" and split_of[a] == "train":
            leaked.add(b)
    want = sorted(d for d, s in split_of.items()
                  if s == "test" and d not in leaked)
    assert got == want
    # non-vacuity: the fixture must exercise the val-pair path — at
    # least one test-doc has a val near-twin and NO train near-twin,
    # and that doc must SURVIVE (only the against split disqualifies)
    val_only = [a for a, b in pair_rows
                if split_of[a] == "test" and split_of[b] == "val"
                and a not in leaked]
    val_only += [b for a, b in pair_rows
                 if split_of[b] == "test" and split_of[a] == "val"
                 and b not in leaked]
    assert val_only, "fixture lost its test<->val pair — re-seed"
    assert set(val_only) <= set(got)


def test_score_calibration_counts(spark):
    """Exact tile sizes (ntile rule) and per-tile positive counts,
    recomputed in Python over the same deterministic ordering."""
    from radmapper_spark.operators import classifier
    rows = [(i, (i * 17) % 200, 1 if i % 3 == 0 else 0)
            for i in range(103)]
    scored = spark.createDataFrame(
        [(i, s) for i, s, _ in rows], "doc_id long, score_micro long")
    labels = spark.createDataFrame(
        [(i, p) for i, _, p in rows], "doc_id long, is_pos int")
    out = classifier.score_calibration(scored, labels, k=5)
    got = {r["tile"]: (r["n_docs"], r["n_pos"]) for r in out.collect()}
    _release(out)
    ordered = sorted(rows, key=lambda t: (-t[1], t[0]))
    base, rem = divmod(len(rows), 5)
    want, pos = {}, 0
    idx = 0
    for tile in range(1, 6):
        size = base + (1 if tile <= rem else 0)
        chunk = ordered[idx:idx + size]
        want[tile] = (size, sum(p for _, _, p in chunk))
        idx += size
    assert got == want


def test_token_budget_matches_model_hypothesis(spark):
    """Hypothesis differential: random (score, weight) multisets and
    budgets through token_budget_select must equal the Python prefix
    model under adversarial partitioning (the offsets bookkeeping must
    not depend on how rows land in partitions)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from radmapper_spark.operators import sampling

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(rows=st.lists(st.tuples(st.integers(-50, 50),
                                   st.integers(1, 30)),
                         min_size=1, max_size=120),
           budget=st.integers(0, 600),
           parts=st.sampled_from([1, 3, 17]))
    def check(rows, budget, parts):
        data = [(i, s, w) for i, (s, w) in enumerate(rows)]
        df = (spark.createDataFrame(data, "id long, s long, w long")
              .repartition(parts))
        out = sampling.token_budget_select(
            df, budget, [F.col("s").desc(), F.col("id").asc()], "w")
        got = sorted((r["id"], r["select_rank"], r["cum_tokens"])
                     for r in out.collect())
        _release(out)
        acc, want = 0, []
        for rank, (i, s, w) in enumerate(
                sorted(data, key=lambda t: (-t[1], t[0])), start=1):
            acc += w
            if acc > budget:
                break
            want.append((i, rank, acc))
        assert got == sorted(want)

    check()


def test_mixture_temperature_null_group_keeps_seats(spark):
    """A NULL group key is a first-class mixture component (r13
    review): it gets counted, allocated, and JOINED back null-safely —
    a plain equi-join would silently drop its allocated seats."""
    from radmapper_spark.operators import sampling
    rows = ([(i, "a") for i in range(300)]
            + [(i + 1000, None) for i in range(100)])
    df = spark.createDataFrame(rows, "doc_id long, g string")
    got = sampling.mixture_temperature(df, "g", "doc_id", 40, alpha=0.5)
    kept = {}
    for r in got.collect():
        kept[r["g"]] = kept.get(r["g"], 0) + 1
    assert sum(kept.values()) == 40
    assert kept.get(None, 0) > 0, "null group lost its seats"


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


def test_token_budget_per_group_matches_python(spark):
    """Per-group budget cut vs the Python per-group prefix model; the
    plan's windows are ordinary PARTITIONED windows (group-keyed, not
    pid-keyed — no global machinery), and float weights are rejected."""
    from radmapper_spark.operators import sampling
    rows = [(i, f"g{i % 5}", (i * 13) % 40, (i * 7) % 20 + 1)
            for i in range(300)]
    df = spark.createDataFrame(rows, "id long, g string, s long, w long")
    out = sampling.token_budget_select_per_group(
        df, "g", 150, [F.col("s").desc(), F.col("id").asc()], "w")
    plan = out._jdf.queryExecution().executedPlan().toString()
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert win_lines and all("g#" in ln for ln in win_lines), win_lines
    got = sorted((r["id"], r["select_rank"], r["cum_tokens"])
                 for r in out.collect())
    want = []
    for g in {r[1] for r in rows}:
        acc = 0
        grp = sorted((r for r in rows if r[1] == g),
                     key=lambda t: (-t[2], t[0]))
        for rank, (i, _, s, w) in enumerate(grp, start=1):
            acc += w
            if acc > 150:
                break
            want.append((i, rank, acc))
    assert got == sorted(want)
    with pytest.raises(ValueError, match="integral"):
        sampling.token_budget_select_per_group(
            df.withColumn("w", F.col("w").cast("double")), "g", 150,
            [F.col("s")], "w")


def test_dedup_rate_report_counts(spark):
    """The report's three counters recomputed independently on a tiny
    synthetic near-dup universe via the operator pieces."""
    from radmapper_spark.operators import dedup
    docs = spark.createDataFrame(
        [(i, f"s{i % 2}") for i in range(10)], "doc_id long, source string")
    pairs = spark.createDataFrame(
        [(0, 2), (2, 4), (1, 3), (5, 7)], "id_a long, id_b long")
    groups = dedup.dedup_groups(
        docs.withColumnRenamed("doc_id", "doc_id"), pairs)
    sizes = {r["component"]: 0 for r in groups.collect()}
    comp_of = {r["doc_id"]: r["component"] for r in groups.collect()}
    for c in comp_of.values():
        sizes[c] = sizes.get(c, 0) + 1
    want = {}
    for d in range(10):
        src = f"s{d % 2}"
        n, dup, comps = want.get(src, (0, 0, set()))
        n += 1
        dup += 1 if sizes[comp_of[d]] > 1 else 0
        comps = comps | {comp_of[d]}
        want[src] = (n, dup, comps)
    got = {r["source"]: (r["n_docs"], r["n_dup_docs"], r["n_groups"])
           for r in dedup.rate_report(groups, docs).collect()}
    assert got == {s: (n, dup, len(comps))
                   for s, (n, dup, comps) in want.items()}


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
    for entry in sorted(ep._FROZEN_ENTRIES):
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
    assert set(ep._FROZEN_SURFACES) == set(ep._FROZEN_ENTRIES), \
        "every frozen entry needs a _FROZEN_SURFACES declaration"
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


def test_mixture_temperature_null_tiebreak_nulls_last(spark):
    """The remainder-seat tiebreak is NULLS LAST on both engines (r13
    second review: Spark's bare asc() is nulls-first, DuckDB's is
    nulls-last — two equal-weight groups, one NULL, with one leftover
    seat would diverge). With equal counts and odd k, the seat must go
    to the NON-null group."""
    from radmapper_spark.operators import sampling
    rows = ([(i, "x") for i in range(100)]
            + [(i + 1000, None) for i in range(100)])
    df = spark.createDataFrame(rows, "doc_id long, g string")
    got = sampling.mixture_temperature(df, "g", "doc_id", 31, alpha=1.0)
    kept = {}
    for r in got.collect():
        kept[r["g"]] = kept.get(r["g"], 0) + 1
    assert kept == {"x": 16, None: 15}, kept
