"""Streaming joins (SURVEY §2.11 extension tier, like windows.py).

- ``stream_static_enrich``: stream x static dimension — Spark broadcasts
  the static side per micro-batch; no state store involved.
- ``purchase_click_attribution``: stream-stream INNER join with an
  event-time range condition (click within `lookback` BEFORE the
  purchase, same user). With watermarks on BOTH sides plus the time-range
  predicate, Spark bounds the join state: click rows are dropped from the
  state store once watermark passes click_ts + lookback, purchase rows
  once watermark passes purchase_ts — the property an unconstrained
  stream-stream join lacks (unbounded state). The same plan runs in batch
  mode (streaming=False) and is the oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import _ensure_ltz


def stream_static_enrich(events: DataFrame, dim: DataFrame,
                         on: str = "user_id") -> DataFrame:
    """Enrich an event stream with a static dimension (broadcast per
    micro-batch; works identically in batch)."""
    return events.join(F.broadcast(dim), on, "left")


def purchase_click_attribution(events: DataFrame, lookback: str = "1 hour",
                               watermark: str = "2 hours",
                               streaming: bool = False) -> DataFrame:
    """Attribute each purchase to the same user's clicks within
    ``lookback`` before it (inclusive on both ends): one output row per
    (purchase, qualifying click).

    Streaming mode watermarks BOTH sides; the range predicate lets Spark
    compute per-side state expiry. Batch mode is the exact twin the
    driver oracle checks."""
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"))
    c = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"))
    if streaming:
        p = _ensure_ltz(p, "p_ts").withWatermark("p_ts", watermark)
        c = _ensure_ltz(c, "c_ts").withWatermark("c_ts", watermark)
    cond = ((F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") <= F.col("p_ts"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}")))
    return (p.join(c, cond, "inner")
            .select("purchase_id", F.col("p_user").alias("user_id"),
                    "p_ts", "click_id", "c_ts"))
