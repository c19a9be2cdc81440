"""Write-side bucketing -> co-located (exchange-free) joins: the sink
layout knob that removes the shuffle from every downstream join on the
bucket key (SURVEY §2.1 sink scale story)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from radmapper_spark.sources.writers import write_result


@pytest.fixture()
def bucketed_pair(spark, tables):
    spark.sql("DROP TABLE IF EXISTS rm_b_orders")
    spark.sql("DROP TABLE IF EXISTS rm_b_lineitem")
    write_result(tables["orders"].select("o_orderkey", "o_totalprice"),
                 "rm_b_orders", bucket_by=(4, ["o_orderkey"]))
    write_result(tables["lineitem"].select("l_orderkey", "l_quantity"),
                 "rm_b_lineitem", bucket_by=(4, ["l_orderkey"]))
    yield spark.table("rm_b_orders"), spark.table("rm_b_lineitem")
    spark.sql("DROP TABLE IF EXISTS rm_b_orders")
    spark.sql("DROP TABLE IF EXISTS rm_b_lineitem")


def test_bucketed_join_has_no_exchange(spark, tables, bucketed_pair):
    """Joining two tables bucketed on the join key (same bucket count)
    must plan with ZERO Exchange operators — the co-location replaces the
    shuffle. Broadcast is disabled for the check so the plan can't dodge
    the question with a broadcast join."""
    bo, bl = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and it computes the right thing
        expected = (tables["orders"].select("o_orderkey")
                    .join(tables["lineitem"],
                          F.col("o_orderkey") == F.col("l_orderkey"))
                    .count())
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_agg_has_no_exchange(spark, bucketed_pair):
    """groupBy on the bucket key also skips the shuffle."""
    _, bl = bucketed_pair
    agg = bl.groupBy("l_orderkey").agg(F.sum("l_quantity"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_cluster_by_produces_disjoint_file_ranges(spark, tables, tmp_path):
    """cluster_by: each parquet file must cover a narrow value range of
    the cluster key (footer min/max verified with pyarrow), so selective
    reads skip most files; an unclustered write of the same data has
    overlapping whole-range files."""
    import glob

    import pyarrow.parquet as pq

    ev = tables["events"].select("event_id", "ts", "user_id")
    clustered = str(tmp_path / "clustered")
    plain = str(tmp_path / "plain")
    write_result(ev, clustered, cluster_by=["user_id"],
                 cluster_partitions=8)
    write_result(ev.repartition(8), plain)

    def ranges(path):
        out = []
        for f in sorted(glob.glob(path + "/*.parquet")):
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                col = next(md.row_group(rg).column(i)
                           for i in range(md.num_columns)
                           if md.row_group(rg).column(i).path_in_schema
                           == "user_id")
                mins.append(col.statistics.min)
                maxs.append(col.statistics.max)
            out.append((min(mins), max(maxs)))
        return out

    cr = sorted(ranges(clustered))
    assert len(cr) > 1, "range repartition should produce several files"
    # clustered: file ranges are non-overlapping (ends meet at most)
    for (lo1, hi1), (lo2, hi2) in zip(cr, cr[1:]):
        assert hi1 <= lo2, f"overlapping clustered ranges {cr}"
    # plain: at least two files span overlapping ranges
    pr = sorted(ranges(plain))
    overlaps = sum(1 for (a, b), (c, d) in zip(pr, pr[1:]) if b > c)
    assert overlaps > 0, "control write unexpectedly clustered"
    # and the data is unchanged
    assert spark.read.parquet(clustered).count() == ev.count()
