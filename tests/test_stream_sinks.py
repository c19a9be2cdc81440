"""Checkpointed file sink: exactly-once across restarts — an incremental
pipeline run on a schedule must process each record exactly once."""

from __future__ import annotations

from pyspark.sql import functions as F

from radmapper_spark.streaming.sinks import start_parquet_sink


def _write_chunk(spark, schema, rows, src, first):
    spark.createDataFrame(rows, schema).coalesce(1) \
        .write.mode("overwrite" if first else "append").parquet(src)


def test_exactly_once_across_restarts(spark, tables, tmp_path):
    ev = tables["events"].select("event_id", "ts", "user_id", "value") \
        .orderBy("event_id").limit(300)
    rows = ev.collect()
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = (spark.readStream.schema(ev.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = start_parquet_sink(stream.withColumn(
            "v2", F.col("value") * 2), out, ckpt)
        q.awaitTermination(120)

    # run 1: two source files
    _write_chunk(spark, ev.schema, rows[:100], src, first=True)
    _write_chunk(spark, ev.schema, rows[100:200], src, first=False)
    run_once()
    n1 = spark.read.parquet(out).count()
    assert n1 == 200

    # run 2: no new data -> nothing reprocessed, nothing duplicated
    run_once()
    assert spark.read.parquet(out).count() == 200

    # run 3: one new file -> exactly the new rows appended
    _write_chunk(spark, ev.schema, rows[200:300], src, first=False)
    run_once()
    got = spark.read.parquet(out)
    assert got.count() == 300
    assert got.select("event_id").distinct().count() == 300  # no dups
    # and the transformation applied
    bad = got.filter(F.col("v2") != F.col("value") * 2).count()
    assert bad == 0
