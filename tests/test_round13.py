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
    import re

    import radmapper_spark.entrypoints as ep

    last, rounds = {}, set()
    for f in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
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
    assert not os.path.exists(p1) or p3 != p1, "stale tree must be dropped"
    # cleanup
    ep._PROBE_INDEX_CACHE.pop((ep.session_key(spark), d, "fprobe"), None)
    shutil.rmtree(p3, ignore_errors=True)
