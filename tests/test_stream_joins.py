"""Streaming joins: stream-static enrichment and the watermarked
stream-stream range join vs its batch twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from radmapper_spark.session import load_tables
from radmapper_spark.streaming import joins as J


def test_stream_static_enrich_batch_shape(spark, tables):
    ev = tables["events"].limit(200)
    dim = tables["customer"].select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment")
    out = J.stream_static_enrich(ev, dim)
    assert out.count() == 200
    assert "c_mktsegment" in out.columns
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # dimension broadcast, no shuffle of the stream


def test_attribution_batch_semantics(spark, tables):
    """Inclusive window edges and the user constraint, against a naive
    python check on sf0.001."""
    ev = tables["events"]
    out = J.purchase_click_attribution(ev, lookback="1 hour").collect()
    rows = ev.select("event_id", "user_id", "event_type", "ts").collect()
    purchases = [r for r in rows if r["event_type"] == "purchase"]
    clicks = [r for r in rows if r["event_type"] == "click"]
    expected = set()
    for p in purchases:
        for c in clicks:
            if (c["user_id"] == p["user_id"]
                    and 0 <= (p["ts"] - c["ts"]).total_seconds() <= 3600):
                expected.add((p["event_id"], c["event_id"]))
    got = {(r["purchase_id"], r["click_id"]) for r in out}
    assert got == expected


def test_attribution_stream_matches_batch(spark, tables, tmp_path):
    """Stream-stream join over a 3-file stream (3 micro-batches, so
    matches CROSS batch boundaries must come from the join state store)
    equals the batch twin."""
    ev = tables["events"].select("event_id", "ts", "user_id", "event_type",
                                 "value").orderBy("event_id").limit(600).cache()
    rows = ev.collect()
    src = str(tmp_path / "attr_in")
    for i in range(3):
        chunk = rows[i * 200:(i + 1) * 200]
        spark.createDataFrame(chunk, ev.schema).coalesce(1) \
            .write.mode("append" if i else "overwrite").parquet(src)
    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = J.purchase_click_attribution(stream, lookback="1 hour",
                                       watermark="10 days", streaming=True)
    q = (out.writeStream.format("memory").queryName("rm_attr_join")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["purchase_id"], r["click_id"]) for r in
           spark.sql("SELECT purchase_id, click_id FROM rm_attr_join").collect()}
    want = {(r["purchase_id"], r["click_id"]) for r in
            J.purchase_click_attribution(ev, lookback="1 hour").collect()}
    assert got == want
    ev.unpersist()
