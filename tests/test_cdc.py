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
