"""Incremental rollup maintenance: affected-partition recompute with
dynamic partition overwrite — correct after every incremental run,
idempotent on an empty/replayed run."""

from __future__ import annotations

from pyspark.sql import functions as F

from radmapper_spark.streaming.incremental import (hourly_rollup_frame,
                                                   incremental_hourly_rollup)


def _rows_sorted(df):
    return sorted(
        (str(r["hour_start"]), r["event_type"], r["n_events"],
         str(r["sum_value"]))
        for r in df.collect())


def test_incremental_equals_batch_after_each_run(spark, tables, tmp_path):
    ev = tables["events"].select("event_id", "ts", "user_id", "event_type",
                                 "value").orderBy("event_id").limit(600).cache()
    rows = ev.collect()
    src = str(tmp_path / "raw")
    out = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = incremental_hourly_rollup(spark, src, out, ckpt)
        q.awaitTermination(120)

    # run 1: 400 rows in 2 files
    spark.createDataFrame(rows[:200], ev.schema).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    spark.createDataFrame(rows[200:400], ev.schema).coalesce(1) \
        .write.mode("append").parquet(src)
    run()
    got = spark.read.parquet(out)
    want = hourly_rollup_frame(
        spark.createDataFrame(rows[:400], ev.schema))
    assert _rows_sorted(got) == _rows_sorted(want)

    # run 2: nothing new -> table unchanged (idempotent empty run)
    run()
    assert _rows_sorted(spark.read.parquet(out)) == _rows_sorted(want)

    # run 3: 200 more rows -> equals full-batch rollup
    spark.createDataFrame(rows[400:600], ev.schema).coalesce(1) \
        .write.mode("append").parquet(src)
    run()
    want_all = hourly_rollup_frame(ev)
    assert _rows_sorted(spark.read.parquet(out)) == _rows_sorted(want_all)
    # partitioned layout exists (day=... directories)
    import glob
    assert glob.glob(f"{out}/day=*"), "expected day partitions"
    ev.unpersist()
