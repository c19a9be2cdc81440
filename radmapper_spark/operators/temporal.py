"""Temporal join + rollup operators (training-data/feature-pipeline
extensions; the reference has no temporal operators — SURVEY.md §2 scope
is extended here the same way as dedup/ANN/streaming).

Spark lacks a native as-of join and executes non-equi time-range joins as
BroadcastNestedLoopJoin (quadratic). Both are re-expressed as compositions
of shuffle-friendly primitives:

- ``asof_join``: the union+window formulation — tag both sides, union,
  single shuffle on the key, sort by (ts, side) within partitions, carry
  the most recent right row forward with ``last(..., ignorenulls=True)``.
  O(n log n) per partition, no join explosion, state O(1) per row. At
  100 TB this is one shuffle of left+right and AQE handles key skew.
- ``range_join_bucketed``: map each right row to ONE time bucket and
  explode each left interval to the buckets it covers, equi-join on the
  bucket, then refine with the exact range predicate. Each matching pair
  meets in exactly one bucket (the one containing the right timestamp), so
  no post-join dedup is needed. Candidate volume is
  O(|right| + |left| * interval/bucket) instead of |left| x |right|.
- ``time_rollup``: hierarchical multi-granularity aggregation — hour from
  raw, day from the hourly partials, week from the daily partials. The raw
  table is scanned ONCE; coarser grains reduce the (tiny) finer partials.
  Decimal partial sums keep the reduction exact and order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: tuple = (), suffix: str = "_right",
              tolerance_sec: int | None = None) -> DataFrame:
    """Backward as-of join: for every left row, attach the most recent
    right row with ``right.ts <= left.ts`` for the same key (inclusive).

    Returns the left rows plus ``<right_ts><suffix>`` and each requested
    right column renamed ``<col><suffix>``; unmatched left rows keep NULLs
    (left-join semantics). When several right rows share (key, ts), the
    carried columns themselves are part of the window sort, so the row
    with the greatest carried-column tuple wins — deterministic whenever
    the carried columns distinguish the duplicates (and value-identical
    otherwise). This matches sliced_asof_join's max-struct carry-in
    tie-break exactly.

    Implementation: union both sides with a side tag (right=0, left=1) so
    a right row at exactly the left timestamp sorts FIRST and is visible
    to the carry-forward (inclusive semantics), then one window pass.

    Skew note: the window sorts each KEY's rows in one task, so a single
    hot key (one user owning a large share of all rows) serializes on one
    core — AQE's skew handling splits shuffle partitions, not window
    groups. For hot-key workloads, pre-split the timeline per key into
    coarse time slices, run the as-of within each slice, and patch slice
    boundaries with a per-(key, slice) carry-in join of each slice's last
    right row — O(slices) extra rows, restoring parallelism within a key.
    Not implemented here: the fixture and typical key cardinalities keep
    per-key volumes far below a task's capacity.
    """
    carry = [right_ts] + list(right_cols)
    l_payload = [c for c in left.columns if c not in (on, left_ts)]
    rtypes = dict(right.dtypes)
    null_struct = F.lit(None).cast(
        "struct<" + ", ".join(f"{c}: {rtypes[c]}" for c in carry) + ">")
    lrows = left.select(
        F.col(on).alias("_k"), F.col(left_ts).alias("_t"), F.lit(1).alias("_side"),
        *[F.col(c) for c in l_payload],
        null_struct.alias("_r"),
    )
    rrows = right.select(
        F.col(on).alias("_k"), F.col(right_ts).alias("_t"), F.lit(0).alias("_side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in l_payload],
        F.struct(*[F.col(c) for c in carry]).alias("_r"),
    )
    # the carried columns travel as ONE struct: the carry-forward picks a
    # whole right ROW atomically (a per-column last(ignorenulls) could
    # stitch fields from DIFFERENT tied right rows when some carried
    # column is NULL). The struct is also in the sort: among right rows
    # tied on ts, the greatest carried tuple sorts last and wins —
    # deterministic, and exactly sliced_asof_join's max-struct tie-break
    # (left rows sort after ALL right rows at the same ts via _side, so
    # inclusive semantics are unaffected).
    w = (Window.partitionBy("_k")
         .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_r").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = lrows.unionByName(rrows).select(
        "*", F.last(F.col("_r"), ignorenulls=True).over(w).alias("_m"))
    out = carried.filter(F.col("_side") == 1)
    if tolerance_sec is not None:
        in_tol = (F.unix_timestamp(F.col("_t"))
                  - F.unix_timestamp(F.col("_m")[right_ts])) <= F.lit(tolerance_sec)
        out = out.select(
            "_k", "_t", *l_payload,
            F.when(in_tol, F.col("_m")).alias("_m"))
    return out.select(
        F.col("_k").alias(on), F.col("_t").alias(left_ts), *l_payload,
        *[F.col("_m")[c].alias(f"{c}{suffix}") for c in carry])


def sliced_asof_join(left: DataFrame, right: DataFrame, on: str,
                     slice_sec: int, left_ts: str = "ts",
                     right_ts: str = "ts", right_cols: tuple = (),
                     suffix: str = "_right") -> DataFrame:
    """Hot-key-safe backward as-of join: identical semantics to
    ``asof_join`` (inclusive, left NULLs), but the per-key window runs
    over (key, time-slice) so a key owning a huge share of the rows
    parallelizes across its slices instead of serializing one task.

    Boundary correctness: a left row whose slice contains an
    at-or-before right row needs nothing else (an in-slice match is
    always >= any earlier-slice right ts). Only left rows with NO
    in-slice match take the carry-in — the last right row BEFORE their
    slice start — computed from the tiny per-(key, slice) last-right
    table with a running last over slice order (O(slices) rows per key,
    not O(rows)), then broadcast-joined back. Two shuffles of the data
    (slice window + carry join) instead of one: the price of breaking
    the hot key, so prefer plain asof_join when keys are well-behaved.
    """
    sl = F.lit(int(slice_sec)).cast("long")
    carry = [right_ts] + list(right_cols)
    l_payload = [c for c in left.columns if c not in (on, left_ts)]
    rtypes = dict(right.dtypes)
    null_struct = F.lit(None).cast(
        "struct<" + ", ".join(f"{c}: {rtypes[c]}" for c in carry) + ">")
    # synthetic unique row id: the carry-in path groupBys unmatched left
    # rows on (key, ts, slice, payload), which would collapse
    # fully-duplicate left rows — the id keeps each physical row a group
    lrows = left.select(
        F.col(on).alias("_k"), F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.monotonically_increasing_id().alias("_rid"),
        *[F.col(c) for c in l_payload],
        null_struct.alias("_r"))
    rrows = right.select(
        F.col(on).alias("_k"), F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast("long").alias("_rid"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in l_payload],
        F.struct(*[F.col(c) for c in carry]).alias("_r"))
    both = lrows.unionByName(rrows).withColumn(
        "_slice", F.floor(F.unix_timestamp(F.col("_t")).cast("long") / sl))
    # the carried columns travel as ONE struct (atomic whole-row pick,
    # same as asof_join) and the struct is in the in-slice sort, so
    # duplicate (key, ts) right rows resolve to the max carried tuple —
    # consistent with the carry-in max-struct below
    w = (Window.partitionBy("_k", "_slice")
         .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_r").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = both.select(
        "*", F.last(F.col("_r"), ignorenulls=True).over(w).alias("_m"))
    lefts = carried.filter(F.col("_side") == 1)

    # per-(key, slice) last right row -> running last over earlier slices
    # (the struct's first field IS right_ts, so max(_r) orders by ts
    # first — identical tie-break to the in-slice window)
    last_in_slice = (rrows.withColumn(
        "_slice", F.floor(F.unix_timestamp(F.col("_t")).cast("long") / sl))
        .groupBy("_k", "_slice")
        .agg(F.max(F.col("_r")).alias("_b")))
    # a right row in slice s is a candidate carry-in for any left slice
    # > s; the max-struct aggregation below picks the latest one, so no
    # running-last window is needed (the carry table is O(slices) rows)
    carry_tab = last_in_slice.select(
        "_k", (F.col("_slice") + 1).alias("_cslice"), F.col("_b").alias("_cb"))
    unmatched = lefts.filter(F.col("_m").isNull())
    matched = lefts.filter(F.col("_m").isNotNull())
    um = (unmatched.alias("u")
          .join(carry_tab.alias("ct"),
                (F.col("u._k") == F.col("ct._k"))
                & (F.col("ct._cslice") <= F.col("u._slice")), "left")
          .groupBy(*[F.col(f"u.{c}") for c in
                     ["_k", "_t", "_slice", "_rid"] + l_payload])
          .agg(F.max(F.col("ct._cb")).alias("_m")))
    um_sel = um.select("_k", "_t", *l_payload, "_m")
    m_sel = matched.select("_k", "_t", *l_payload, "_m")
    out = m_sel.unionByName(um_sel)
    return out.select(
        F.col("_k").alias(on), F.col("_t").alias(left_ts), *l_payload,
        *[F.col("_m")[c].alias(f"{c}{suffix}") for c in carry])


def range_join_bucketed(left: DataFrame, right: DataFrame,
                        left_start, left_end, right_ts: str,
                        bucket_sec: int) -> DataFrame:
    """Non-equi time-range join ``right.ts in [left.start, left.end)``
    without a cross product: equi-join on a time bucket, then refine.

    left_start / left_end: Column expressions over `left` (end exclusive).
    ``bucket_sec`` should be ~the typical interval length: each left row
    explodes to ``interval/bucket_sec + 1`` bucket rows; each right row
    maps to exactly one bucket, and every qualifying pair meets in exactly
    one bucket — no dedup needed. Output: all left columns + the matching
    right rows' columns (inner semantics; aggregate + join back onto the
    left table for left semantics).
    """
    b = F.lit(int(bucket_sec)).cast("long")
    ls = F.unix_timestamp(left_start).cast("long")
    le = F.unix_timestamp(left_end).cast("long")
    lb = left.select(
        "*", ls.alias("_start_s"), le.alias("_end_s"),
        F.explode(F.sequence(F.floor(ls / b),
                             F.floor((le - F.lit(1)) / b))).alias("_bucket"))
    rb = right.select(
        "*", F.unix_timestamp(F.col(right_ts)).cast("long").alias("_ts_s"),
        F.floor(F.unix_timestamp(F.col(right_ts)).cast("long") / b).alias("_bucket"))
    joined = lb.join(rb, "_bucket").filter(
        (F.col("_ts_s") >= F.col("_start_s")) & (F.col("_ts_s") < F.col("_end_s")))
    return joined.drop("_bucket", "_start_s", "_end_s", "_ts_s")


def range_agg_bucketed(left: DataFrame, right: DataFrame, id_col: str,
                       left_start, left_end, right_ts: str,
                       bucket_sec: int, sum_col: str | None = None,
                       count_name: str = "n_matches",
                       sum_name: str = "sum_match") -> DataFrame:
    """Aggregation-shaped time-range join: per left row, count (and
    decimal-sum) the right rows with ``ts in [start, end)`` — WITHOUT
    materializing the pairs.

    ``range_join_bucketed`` produces the actual matching pairs, which is
    what you want when the pairs are the output — but when the query only
    AGGREGATES the matches, the pair stream is pure waste: per bucket it
    is |left_in_bucket| x |right_in_bucket| rows, quadratic in the data
    per fixed time window (measured: 74 s vs 2 s at sf0.1 on the
    orders-x-lineitem entry). This operator instead:

    1. pre-aggregates the right side into per-bucket partials —
       O(time_span/bucket) rows, tiny, broadcastable;
    2. explodes each left interval to its FULLY-COVERED buckets and
       broadcast-joins the partials (left never shuffles);
    3. touches raw right rows only for the <= 2 partially-covered EDGE
       buckets of each interval (empty when intervals are bucket-aligned,
       as day-aligned dates with a day bucket are);
    4. sums partial + edge contributions per left id.

    Bucket sizing: for bucket-ALIGNED intervals pick the alignment grain
    (edges are then empty and bucket size is free). For UNALIGNED
    intervals pick bucket_sec ≈ interval/30..50, NOT ≈ interval: each
    interval's <= 2 edge buckets join right_density * bucket_sec RAW rows,
    so coarse buckets make the edge path dominate (measured 50 s at
    bucket == interval vs 7.6 s at interval/36 on 100k x 2M; see
    tests/test_scale_stress.py). Smaller buckets only grow the (tiny)
    partials table and the per-interval explode, both linear and cheap.

    Requires ``id_col`` to be unique in `left`. Returns
    (id_col, count_name[, sum_name]) with zero rows preserved."""
    b = int(bucket_sec)
    bl = F.lit(b).cast("long")
    ls = F.unix_timestamp(left_start).cast("long")
    le = F.unix_timestamp(left_end).cast("long")
    rsec = F.unix_timestamp(F.col(right_ts)).cast("long")

    aggs = [F.count(F.lit(1)).alias("_cnt")]
    if sum_col is not None:
        aggs.append(F.sum(F.col(sum_col).cast(DEC)).alias("_sum"))
    partials = right.groupBy(F.floor(rsec / bl).alias("_bucket")).agg(*aggs)

    full0 = F.floor((ls + bl - F.lit(1)) / bl)       # ceil(start/b)
    full1 = F.floor(le / bl)                          # full buckets [full0, full1)
    lkeyed = left.select(F.col(id_col).alias("_lid"),
                         ls.alias("_s"), le.alias("_e"),
                         full0.alias("_f0"), full1.alias("_f1"))
    full = lkeyed.select(
        "_lid",
        F.explode_outer(F.when(F.col("_f1") > F.col("_f0"),
                               F.sequence(F.col("_f0"), F.col("_f1") - 1))
                        ).alias("_bucket"))
    fsel = ["_lid", F.coalesce(F.col("_cnt"), F.lit(0)).alias("_cnt")]
    esel_zero = [F.lit(0).cast("long").alias("_cnt")]
    if sum_col is not None:
        fsel.append(F.coalesce(F.col("_sum"), F.lit(0).cast(DEC)).alias("_sum"))
        esel_zero.append(F.lit(0).cast(DEC).alias("_sum"))
    full_part = full.join(F.broadcast(partials), "_bucket", "left").select(*fsel)

    # edge buckets: the first and last TOUCHED buckets, minus any that
    # are fully covered. Deriving edges from alignment conditions alone
    # is wrong: an interval that STARTS aligned but ends inside the same
    # bucket (e.g. [0, 1) with bucket 3) touches a bucket that is neither
    # full nor start/end-unaligned-edge under those conditions — found by
    # the hypothesis differential (test_asof_fuzz.py). Computed over the
    # materialized _s/_e columns of lkeyed, not the caller's expressions
    # (which reference columns lkeyed no longer carries).
    s_, e_ = F.col("_s"), F.col("_e")
    b_first = F.floor(s_ / bl)
    b_last = F.floor((e_ - 1) / bl)

    def _is_full(j):
        return (j >= F.col("_f0")) & (j < F.col("_f1"))

    start_edge = F.when(~_is_full(b_first), b_first)
    end_edge = F.when((b_last != b_first) & ~_is_full(b_last), b_last)
    edges = lkeyed.select(
        "_lid", "_s", "_e",
        F.explode(F.array_compact(F.array(start_edge, end_edge))).alias("_bucket"))
    redge = right.select(rsec.alias("_ts_s"),
                         F.floor(rsec / bl).alias("_bucket"),
                         *([F.col(sum_col)] if sum_col is not None else []))
    eaggs = [F.count(F.lit(1)).alias("_cnt")]
    if sum_col is not None:
        eaggs.append(F.sum(F.col(sum_col).cast(DEC)).alias("_sum"))
    edge_part = (edges.join(redge, "_bucket")
                 .filter((F.col("_ts_s") >= F.col("_s"))
                         & (F.col("_ts_s") < F.col("_e")))
                 .groupBy("_lid").agg(*eaggs))

    combined = full_part.unionByName(edge_part)
    out_aggs = [F.sum("_cnt").alias(count_name)]
    if sum_col is not None:
        out_aggs.append(F.sum("_sum").alias(sum_name))
    return combined.groupBy("_lid").agg(*out_aggs) \
        .withColumnRenamed("_lid", id_col)


def time_rollup(events: DataFrame, ts_col: str = "ts", key_col: str = "event_type",
                value_col: str = "value") -> DataFrame:
    """Hierarchical hour -> day -> week rollup of counts + exact decimal
    sums per key. Day reduces the hourly partials, week reduces the daily
    partials — the continuous-aggregate pattern at 100 TB: coarse grains
    never touch raw. At runtime AQE's ReusedExchange dedupes the shared
    hourly shuffle across the union branches (test-asserted), so raw is
    physically scanned once without an explicit persist.

    Returns the union of the three grains with a ``granularity`` column;
    sums surface as rounded doubles (stable across partitioning because
    the reduction is decimal all the way)."""
    hourly = (
        events.groupBy(F.date_trunc("hour", F.col(ts_col)).alias("bucket_start"),
                       F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col(value_col).cast(DEC)).alias("_sum"))
    )

    def _coarsen(df: DataFrame, grain: str) -> DataFrame:
        return (df.groupBy(F.date_trunc(grain, F.col("bucket_start")).alias("bucket_start"),
                           F.col(key_col))
                .agg(F.sum("n_events").alias("n_events"),
                     F.sum("_sum").alias("_sum")))

    daily = _coarsen(hourly, "day")
    weekly = _coarsen(daily, "week")

    def _out(df: DataFrame, name: str) -> DataFrame:
        return df.select(F.lit(name).alias("granularity"), "bucket_start",
                         F.col(key_col),
                         "n_events",
                         F.round(F.col("_sum").cast("double"), 2).alias("sum_value"))

    return _out(hourly, "hour").unionByName(_out(daily, "day")).unionByName(
        _out(weekly, "week"))


def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_sec: int = 1800,
               order_col: str = "event_id") -> DataFrame:
    """Assign a session id to every event: a new session starts when the
    gap since the user's previous event exceeds ``gap_sec``. The classic
    lag + cumulative-sum formulation — ONE shuffle on the user key, two
    window passes over the same partitioning (Catalyst runs them in one
    sort), no join. session_id = (user_id, session_seq) with session_seq
    dense per user starting at 1."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(),
                                            F.col(order_col).asc())
    prev = F.lag(F.col(ts_col)).over(w)
    new_sess = (prev.isNull()
                | (F.unix_timestamp(F.col(ts_col))
                   - F.unix_timestamp(prev) > gap_sec)).cast("int")
    seq = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return events.withColumn("session_seq", seq)


def gapfill_daily(events: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", val_col: str = "value") -> DataFrame:
    """Regularize an irregular event stream onto a dense per-user DAILY
    grid: every day between the user's first and last event gets a row,
    with the day's event count, the day's decimal value total (0 on gap
    days), and the running cumulative total.

    Plan shape: one groupBy on (user, day) for the observed totals ->
    one tiny per-user min/max aggregate -> the grid generated with
    ``sequence`` + explode (the generator runs distributed, one row per
    user BEFORE the explode — no driver loop, no cross join against a
    calendar table) -> left join observed onto the grid (both sides
    pre-partitioned on user from their aggregates) -> cumulative window.
    All sums are DECIMAL, so gap-filled cumulative totals are exact and
    partition-order-independent.  Scale: output is |users| x |days| —
    at 100 TB you bound the grid with an explicit date range; grid rows
    carry only (user, day) so the explode is bytes-cheap.
    """
    day = F.date_trunc("day", F.col(ts_col))
    observed = (events
                .groupBy(F.col(user_col).alias("user_id"),
                         day.alias("day"))
                .agg(F.count(F.lit(1)).alias("n_events"),
                     F.sum(F.col(val_col).cast(DEC)).alias("_day_sum")))
    span = observed.groupBy("user_id").agg(
        F.min("day").alias("_d0"), F.max("day").alias("_d1"))
    grid = span.select(
        "user_id",
        F.explode(F.sequence(
            F.col("_d0"), F.col("_d1"),
            F.expr("INTERVAL 1 DAY"))).alias("day"))
    filled = (grid.join(observed, ["user_id", "day"], "left")
              .select("user_id", "day",
                      F.coalesce("n_events", F.lit(0)).alias("n_events"),
                      F.coalesce(F.col("_day_sum"),
                                 F.lit(0).cast(DEC)).alias("_day_sum")))
    w = (Window.partitionBy("user_id").orderBy(F.col("day").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return filled.select(
        "user_id", "day", "n_events",
        F.round(F.col("_day_sum").cast("double"), 2).alias("day_total"),
        F.round(F.sum("_day_sum").over(w).cast("double"), 2)
        .alias("cum_total"))
