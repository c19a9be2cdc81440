"""Behavioral analytics over an event stream: ordered-funnel stages and
cohort retention — the product-analytics pair every event pipeline ships.

Scale shapes:
- ``funnel_stages``: everything happens inside ONE partitioning by user —
  the staged "first qualifying timestamp" columns are min-over-window
  expressions on the same window spec, so Catalyst plans a single
  Exchange (reused across the stage columns) and no joins at all. At
  100 TB the cost is one shuffle of (user, ts, type).
- ``cohort_retention``: per-user first-activity bucket via the same
  window trick (no groupBy+join-back: the min-over-partition window
  avoids materializing a user dimension), then one map-side distinct
  count per (cohort, offset) cell. Two shuffles total: user window +
  cell aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_stages(events: DataFrame, steps: list,
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type",
                  tolerance_sec: int | None = None) -> DataFrame:
    """Ordered-funnel reach: how many users completed the first k steps
    IN ORDER, for each k. A user reaches stage k when there exist events
    e1 < e2 < ... < ek (strictly increasing timestamps) with the given
    types, each within ``tolerance_sec`` of the previous stage's time
    when set — computed as staged "first qualifying timestamp" columns:
    t1 = min ts of step1, t2 = min ts of step2 AFTER t1, and so on.

    Greedy-optimality caveat: with no tolerance, taking the earliest
    qualifying event per stage is exactly the existence semantics. WITH a
    tolerance the greedy chain is a deterministic, industry-standard
    conversion definition (each stage within T of the greedy previous
    stage), not an exhaustive search over all event chains.

    Returns (stage, step, n_users), stage 1-based, monotone n_users."""
    if not steps:
        raise ValueError("funnel_stages needs at least one step")
    w = Window.partitionBy(user_col)
    df = events.select(F.col(user_col), F.col(ts_col).alias("_ts"),
                       F.col(type_col).alias("_tp"))
    prev = None
    for i, step in enumerate(steps):
        qual = F.col("_tp") == step
        if prev is not None:
            qual = qual & (F.col("_ts") > F.col(prev))
            if tolerance_sec is not None:
                qual = qual & (F.col("_ts") <= F.col(prev)
                               + F.expr(f"INTERVAL {int(tolerance_sec)} "
                                        f"SECOND"))
        cur = f"_t{i + 1}"
        df = df.withColumn(cur, F.min(F.when(qual, F.col("_ts"))).over(w))
        prev = cur
    per_user = df.groupBy(user_col).agg(
        *[F.max(f"_t{i + 1}").alias(f"_t{i + 1}")
          for i in range(len(steps))])
    counts = per_user.agg(*[
        F.count(F.col(f"_t{i + 1}")).alias(f"_n{i + 1}")
        for i in range(len(steps))])
    stages = F.array(*[
        F.struct(F.lit(i + 1).alias("stage"), F.lit(s).alias("step"),
                 F.col(f"_n{i + 1}").cast("long").alias("n_users"))
        for i, s in enumerate(steps)])
    return (counts.select(F.explode(stages).alias("s"))
            .select("s.stage", "s.step", "s.n_users"))


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts",
                     bucket: str = "week") -> DataFrame:
    """Cohort retention table: users grouped by the bucket of their FIRST
    event; for each (cohort_start, offset) cell, how many of them were
    active in the bucket `offset` periods later, plus the retention rate
    against the cohort's size (offset 0 row = cohort size, rate 1.0)."""
    w = Window.partitionBy(user_col)
    first_b = F.date_trunc(bucket, F.min(F.col(ts_col)).over(w))
    cur_b = F.date_trunc(bucket, F.col(ts_col))
    diff_expr = {
        "week": (F.unix_timestamp(cur_b) - F.unix_timestamp(first_b))
        / (7 * 86400),
        "day": (F.unix_timestamp(cur_b) - F.unix_timestamp(first_b)) / 86400,
    }
    if bucket not in diff_expr:
        raise ValueError(f"unsupported bucket {bucket!r} (week/day)")
    offs = F.floor(diff_expr[bucket]).cast("long")
    act = (events.select(F.col(user_col).alias("_u"),
                         first_b.alias("cohort_start"),
                         offs.alias("period_offset"))
           .groupBy("cohort_start", "period_offset")
           .agg(F.countDistinct("_u").alias("n_active")))
    size = (act.filter(F.col("period_offset") == 0)
            .select("cohort_start", F.col("n_active").alias("_n0")))
    return (act.join(F.broadcast(size), "cohort_start")
            .select("cohort_start", "period_offset", "n_active",
                    F.round(F.col("n_active") / F.col("_n0"), 6)
                    .alias("retention")))


def event_transitions(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts", type_col: str = "event_type",
                      id_col: str = "event_id") -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for each (from_type, to_type) pair of CONSECUTIVE events
    of the same user, the transition count and row-normalized
    probability.  The sequence order is (ts, event_id) — the id
    tiebreak makes simultaneous events deterministic.

    Plan: one window shuffle on user (lead) -> one map-side-partial
    groupBy on the pair -> the per-from totals folded back with a
    second small aggregate joined on from_type (|event types| rows —
    broadcast).  The probability is a single integer division rounded
    once, so it is bit-identical across engines.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc())
    pairs = (events
             .select(F.col(type_col).alias("from_type"),
                     F.lead(type_col).over(w).alias("to_type"))
             .filter(F.col("to_type").isNotNull()))
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n"))
    totals = counts.groupBy("from_type").agg(
        F.sum("n").alias("_tot"))
    return (counts.join(F.broadcast(totals), "from_type")
            .select("from_type", "to_type", "n",
                    F.round(F.col("n") / F.col("_tot"), 6).alias("prob")))


def rolling_anomalies(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts", val_col: str = "value",
                      id_col: str = "event_id", lookback: int = 20,
                      z_threshold: float = 3.0) -> DataFrame:
    """Rolling z-score anomaly flags: each event's value against the
    mean/std of the user's previous ``lookback`` events (the current row
    EXCLUDED — an anomaly must not dilute its own baseline).  Rows with
    fewer than 2 prior events have no defined std and are never flagged.

    Determinism at the bit level: the rolling mean/variance are computed
    from integer sums — each value is scaled to micro-units with
    floor(v * 1e6) (floor, not round: no rounding-mode divergence
    between engines) and the window sums run over BIGINT /
    DECIMAL(38,0), so the double math happens exactly once per row on
    exact integer inputs.  One window shuffle on user; emits only the
    flagged rows.
    """
    w = (Window.partitionBy(user_col)
         .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
         .rowsBetween(-lookback, -1))
    sv = F.floor(F.col(val_col) * 1e6).cast("long")
    base = events.select(
        F.col(id_col), F.col(user_col), F.col(ts_col), F.col(val_col),
        sv.alias("_sv"),
        (sv.cast("decimal(38,0)") * sv).alias("_sv2"))
    n = F.count("_sv").over(w)
    s1 = F.sum("_sv").over(w)
    s2 = F.sum("_sv2").over(w)
    stats = base.select(
        id_col, user_col, ts_col, val_col,
        "_sv", n.alias("_n"), s1.alias("_s1"), s2.alias("_s2"))
    nn = F.col("_n").cast("double")
    mean = F.col("_s1").cast("double") / nn
    var = (F.col("_s2").cast("double") / nn) - mean * mean
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = (F.col("_sv").cast("double") - mean) / std
    return (stats
            .filter((F.col("_n") >= 2) & (F.col("_s2") * F.col("_n")
                                          != F.col("_s1").cast("decimal(38,0)")
                                          * F.col("_s1")))
            .select(id_col, user_col, ts_col, val_col,
                    F.round(z / 1.0, 6).alias("zscore"))
            .filter(F.abs(F.col("zscore")) > z_threshold))
