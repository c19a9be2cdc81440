"""CDC merge_latest: latest-wins semantics, tombstones, tie resolution,
and the map-side-partial plan shape."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from radmapper_spark.operators import cdc


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def base_changes(spark):
    base = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), "a", 10.0),
         (2, _ts("2024-01-01T00:00:00"), "b", 20.0),
         (3, _ts("2024-01-01T00:00:00"), "c", 30.0)],
        "k long, ts timestamp, status string, amount double")
    changes = spark.createDataFrame(
        [(1, _ts("2024-01-02T00:00:00"), "a2", 11.0, False),   # update
         (2, _ts("2024-01-02T00:00:00"), "b2", 21.0, True),    # delete
         (4, _ts("2024-01-02T00:00:00"), "d", 40.0, False)],   # insert
        "k long, ts timestamp, status string, amount double, "
        "_deleted boolean")
    return base, changes


def test_merge_semantics(spark, base_changes):
    base, changes = base_changes
    out = {r["k"]: r for r in cdc.merge_latest(
        base, changes, keys=["k"], ts_col="ts").collect()}
    assert set(out) == {1, 3, 4}              # 2 tombstoned
    assert out[1]["status"] == "a2" and out[1]["amount"] == 11.0
    assert out[3]["status"] == "c"            # untouched base row
    assert out[4]["status"] == "d"            # pure insert
    assert "_deleted" not in cdc.merge_latest(
        base, changes, keys=["k"], ts_col="ts").columns


def test_merge_tie_goes_to_change_side(spark):
    base = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), "old")],
        "k long, ts timestamp, status string")
    changes = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), "new", False)],  # SAME ts
        "k long, ts timestamp, status string, _deleted boolean")
    out = cdc.merge_latest(base, changes, keys=["k"], ts_col="ts").collect()
    assert out[0]["status"] == "new"


def test_merge_stale_change_loses(spark):
    base = spark.createDataFrame(
        [(1, _ts("2024-01-05T00:00:00"), "current")],
        "k long, ts timestamp, status string")
    changes = spark.createDataFrame(
        [(1, _ts("2024-01-02T00:00:00"), "late-arriving", False)],
        "k long, ts timestamp, status string, _deleted boolean")
    out = cdc.merge_latest(base, changes, keys=["k"], ts_col="ts").collect()
    assert out[0]["status"] == "current"
    # a stale TOMBSTONE must not delete the newer base row either
    changes_del = changes.withColumn("_deleted", F.lit(True))
    out2 = cdc.merge_latest(base, changes_del, keys=["k"],
                            ts_col="ts").collect()
    assert len(out2) == 1 and out2[0]["status"] == "current"


def test_merge_missing_columns_raises(spark, base_changes):
    base, changes = base_changes
    with pytest.raises(ValueError, match="missing"):
        cdc.merge_latest(base, changes.drop("amount"), keys=["k"],
                         ts_col="ts")


def test_merge_is_aggregate_not_window(spark, base_changes):
    """The reduce must be a hash aggregate with map-side partials (one
    exchange), not a row_number window (which sorts every key group)."""
    base, changes = base_changes
    plan = (cdc.merge_latest(base, changes, keys=["k"], ts_col="ts")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan
    assert "partial_max" in plan or "HashAggregate" in plan, plan[:2000]
    assert plan.count("Exchange") <= 2  # key agg (+AQE coalesce at most)

def test_pagerank_hand_computed_star(spark):
    """3-node undirected star (center a): exact scaled-integer values
    after 3 iterations, hand-derived."""
    from radmapper_spark.operators import graph
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")], ["src", "dst"])
    out = {r["node"]: r["rank"] for r in graph.pagerank(edges, 3).collect()}
    assert out == {"a": 1_741_625_000_000,
                   "b": 629_187_500_000,
                   "c": 629_187_500_000}
    # bit-identical on re-execution (integer arithmetic: no float drift)
    out2 = {r["node"]: r["rank"] for r in graph.pagerank(edges, 3).collect()}
    assert out2 == out


def test_pagerank_rank_mass_bounded(spark, tables):
    """On the real bipartite trade graph, ranks are positive and the
    total rank mass stays near N*SCALE (conserved up to damping leak
    and integer truncation)."""
    from pyspark.sql import functions as F
    from radmapper_spark.operators import graph
    t = tables
    pairs = (t["orders"].join(t["lineitem"],
                              t["orders"].o_orderkey
                              == t["lineitem"].l_orderkey)
             .select(F.concat(F.lit("c"), F.col("o_custkey")).alias("c"),
                     F.concat(F.lit("s"), F.col("l_suppkey")).alias("s"))
             .distinct())
    edges = (pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
             .unionByName(pairs.select(F.col("s").alias("src"),
                                       F.col("c").alias("dst"))))
    pr = graph.pagerank(edges, 3)
    n = pr.count()
    stats = pr.agg(F.min("rank").alias("mn"), F.sum("rank").alias("s")).first()
    assert stats["mn"] > 0
    assert abs(stats["s"] - n * graph.SCALE) / (n * graph.SCALE) < 0.02


def test_pagerank_bad_damping(spark):
    import pytest as _pytest
    from radmapper_spark.operators import graph
    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with _pytest.raises(ValueError):
        graph.pagerank(edges, damping_pct=0)



# ======================== from test_round6b.py (r14 consolidation) ========
import hashlib
import math
import random
import pytest
from pyspark.sql import functions as F
from radmapper_spark.operators import behavior, chunking, similarity, temporal
from radmapper_spark.operators import textstats

def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cdc_edit_stability(spark):
    """The CDC property: prepending tokens re-chunks only the head —
    every chunk after the first surviving boundary is byte-identical,
    while fixed sliding windows shift everywhere."""
    rng = random.Random(60_008)
    words = [f"w{rng.randrange(10_000)}" for _ in range(400)]
    original = " ".join(words)
    edited = " ".join(["inserted", "prefix", "tokens"] + words)
    df = _mk_docs(spark, [(1, original), (2, edited)])
    out = chunking.chunk_content_defined(df, mod=16).collect()
    c1 = [r.chunk_text for r in sorted(
        (r for r in out if r.doc_id == 1), key=lambda r: r.chunk_seq)]
    c2 = [r.chunk_text for r in sorted(
        (r for r in out if r.doc_id == 2), key=lambda r: r.chunk_seq)]
    # all original chunks except the first are recovered verbatim
    assert len(c1) > 3, "fixture produced too few chunks to test"
    assert set(c1[1:]) <= set(c2)
    # and the fixed-window chunker does NOT have this property
    fx = chunking.chunk_documents(df, 32, 8).collect()
    f1 = {r.chunk_text for r in fx if r.doc_id == 1}
    f2 = {r.chunk_text for r in fx if r.doc_id == 2}
    assert len(f1 - f2) > len(c1) // 2


def test_cdc_partition_reassembles(spark):
    """Chunks partition the token stream: concatenating chunk texts in
    order reproduces the trimmed document."""
    rng = random.Random(60_009)
    text = " ".join(f"t{rng.randrange(50)}" for _ in range(150))
    df = _mk_docs(spark, [(1, text)])
    out = sorted(chunking.chunk_content_defined(df, mod=8).collect(),
                 key=lambda r: r.chunk_seq)
    assert " ".join(r.chunk_text for r in out) == text
    assert [r.chunk_seq for r in out] == list(range(1, len(out) + 1))
    starts = [r.chunk_start for r in out]
    assert starts[0] == 0
    for prev, cur in zip(out, out[1:]):
        assert cur.chunk_start == prev.chunk_start + prev.n_chunk_tokens


def test_cdc_xxhash_mode_same_shape(spark):
    df = _mk_docs(spark, [(1, "a b c d e f g h i j")])
    out = chunking.chunk_content_defined(df, mod=4, hash_mode="xxhash64") \
        .collect()
    assert " ".join(r.chunk_text for r in
                    sorted(out, key=lambda r: r.chunk_seq)) \
        == "a b c d e f g h i j"
