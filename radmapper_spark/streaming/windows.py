"""Streaming operators over the events stream (north-star additions —
SURVEY.md §2.11: the reference has no streaming; these are extensions).

Each operator is written against the *unbounded* contract: the same plan
works on `spark.readStream` (rate/kafka/file source) and on the batch
events table. Tests run the batch shape and a socket-free streaming smoke
via the rate source; the oracle for correctness uses the batch equivalence
(a windowed agg over a bounded table equals the final state of the same
streaming agg in complete mode).

- tumbling / sliding / session windows: F.window / F.session_window
- watermarking for late data: withWatermark before the window agg
- custom stateful op (running per-user counter) via applyInPandasWithState
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def _ensure_ltz(df: DataFrame, col: str = "ts") -> DataFrame:
    """withWatermark requires a TIMESTAMP (LTZ) event-time column. Newer
    driver parquet surfaces micros-no-UTC-adjust as TIMESTAMP_NTZ; the
    session runs UTC (session.py pins it), so the cast is wall-clock
    identical. Applied in every streaming path before withWatermark."""
    if dict(df.dtypes).get(col) == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def tumbling_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours", streaming: bool = False) -> DataFrame:
    """Tumbling-window per-type counts + value sums. On a stream, the
    watermark bounds state: windows older than max(event_time)-watermark
    are finalized and dropped."""
    src = events
    if streaming:
        src = _ensure_ltz(src).withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n_events", "sum_value")
    )


def sliding_counts(events: DataFrame, window: str = "2 hours", slide: str = "1 hour",
                   watermark: str = "4 hours", streaming: bool = False) -> DataFrame:
    src = (_ensure_ltz(events).withWatermark("ts", watermark)
           if streaming else events)
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), "event_type", "n_events")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes",
                    watermark: str = "2 hours", streaming: bool = False) -> DataFrame:
    """Per-user session windows (gap-based)."""
    src = (_ensure_ltz(events).withWatermark("ts", watermark)
           if streaming else events)
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"))
        .select(F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "user_id", "n_events", "sum_value")
    )


def running_user_totals_stateful(events: DataFrame) -> DataFrame:
    """Batch twin of the stateful running totals: a window-function
    cumulative sum. Oracle-checkable; the streaming form with arbitrary
    per-key state is running_user_totals_stream below."""
    from pyspark.sql import Window
    w = (
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "user_id", "event_id", "ts",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("running_value"),
        F.count(F.lit(1)).over(w).alias("running_events"),
    )


def running_user_totals_stream(events_stream: DataFrame) -> DataFrame:
    """CUSTOM STATEFUL streaming operator: per-user running totals via
    applyInPandasWithState — per-key state (n_events, total_value)
    persisted in the state store across micro-batches, emitting the
    updated totals for every user seen in a batch.

    State is O(distinct users) and each batch touches only the keys it
    contains — the shape that scales to 1000 executors (state is
    hash-partitioned by key alongside the shuffle). The decimal-summed
    batch twin above is the oracle for the final state."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [total]})

    return events_stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, total_value double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_events(events: DataFrame, key_cols=("event_id",),
                 watermark: str = "2 hours", streaming: bool = False) -> DataFrame:
    """Exact dedup as a STREAM operator: first occurrence per key wins.
    Streaming uses dropDuplicatesWithinWatermark so per-key state expires
    once the watermark passes — bounded state on an unbounded stream (the
    property plain dropDuplicates lacks). Batch twin: dropDuplicates, the
    map-side-combine exact dedup."""
    if streaming:
        return (_ensure_ltz(events).withWatermark("ts", watermark)
                .dropDuplicatesWithinWatermark(list(key_cols)))
    return events.dropDuplicates(list(key_cols))


def streaming_smoke(spark, seconds: int = 3) -> int:
    """End-to-end Structured Streaming check without external sources:
    rate source -> tumbling agg with watermark -> memory sink. Returns the
    number of result rows observed."""
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 100).load()
        .withColumn("event_type",
                    F.element_at(F.array(F.lit("a"), F.lit("b"), F.lit("c")),
                                 (F.col("value") % 3 + 1).cast("int")))
        .withColumnRenamed("timestamp", "ts")
        .withColumn("value", F.col("value").cast("double"))
    )
    agg = tumbling_counts(stream, window="1 second", watermark="2 seconds",
                          streaming=True)
    q = (
        agg.writeStream.format("memory").queryName("rm_stream_smoke")
        .outputMode("append").start()
    )
    import time
    time.sleep(seconds)
    q.processAllAvailable()
    n = spark.sql("select count(*) from rm_stream_smoke").collect()[0][0]
    q.stop()
    return int(n)


def rolling_anomalies_stream(events_stream: DataFrame, lookback: int = 20,
                             z_threshold: float = 3.0) -> DataFrame:
    """STREAMING rolling z-score anomalies: the per-user ring buffer of
    the last ``lookback`` integer-scaled values lives in the state store
    (applyInPandasWithState), so flags stream out as events arrive —
    state is O(users * lookback) bigints, hash-partitioned by key like
    every stateful operator here.

    Exact twin of operators.behavior.rolling_anomalies (same floor-
    scaled micro-units, same integer sums, same round/threshold): on an
    event-time-ordered stream the flagged set is IDENTICAL to the batch
    operator — asserted by the differential test. Out-of-order arrivals
    are scored against the state at arrival (documented deviation:
    late data would need a watermarked reorder buffer upstream).
    """
    import math

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        buf = list(state.get[0]) if state.exists else []
        out = {"event_id": [], "user_id": [], "ts": [], "value": [],
               "zscore": []}
        # materialize the WHOLE group's micro-batch before sorting: the
        # Arrow chunk iterator carries shuffle order, so sorting each
        # chunk independently would fold rows into state in per-chunk
        # order whenever a group's batch spans chunks, diverging from
        # the batch operator this function mirrors exactly
        chunks = list(pdfs)
        batch = (pd.concat(chunks, ignore_index=True) if chunks
                 else pd.DataFrame(columns=["event_id", "ts", "value"]))
        if len(batch):
            batch = batch.sort_values(["ts", "event_id"])
            for eid, ts, v in zip(batch["event_id"], batch["ts"],
                                  batch["value"]):
                sv = math.floor(float(v) * 1e6)
                n = len(buf)
                if n >= 2:
                    s1 = sum(buf)
                    s2 = sum(x * x for x in buf)
                    if s2 * n != s1 * s1:
                        mean = s1 / n
                        var = s2 / n - mean * mean
                        z = round((sv - mean)
                                  / math.sqrt(max(var, 0.0)), 6)
                        if abs(z) > z_threshold:
                            out["event_id"].append(int(eid))
                            out["user_id"].append(int(key[0]))
                            out["ts"].append(ts)
                            out["value"].append(float(v))
                            out["zscore"].append(z)
                buf.append(sv)
                if len(buf) > lookback:
                    buf.pop(0)
        state.update((buf,))
        yield pd.DataFrame(out)

    return events_stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=("event_id bigint, user_id bigint, ts timestamp, "
                          "value double, zscore double"),
        stateStructType="svs array<bigint>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
