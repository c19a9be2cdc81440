"""Property-based differential test: asof_join vs a python reference
model over randomized key/time layouts (duplicate left timestamps,
boundary-equal matches, keys missing from either side, tolerance)."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F  # noqa: F401 (parity with suite style)

from radmapper_spark.operators import temporal

import os as _os
import pytest as _pytest
# deep-fuzz tier (r15 governance): heaviest hypothesis differentials
# run under RM_DEEP=1 as part of the per-round gate batch
_deep_fuzz = _pytest.mark.skipif(
    _os.environ.get("RM_DEEP") != "1",
    reason="deep fuzz tier — RM_DEEP=1 (per-round gates)")

BASE = dt.datetime(2024, 1, 1)

# (key, seconds) pairs; keys 0-2, times 0-50 with repeats likely
_left = st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)),
                 min_size=1, max_size=8)
# right side: unique (key, ts) by construction (dict) for determinism
_right = st.dictionaries(st.tuples(st.integers(0, 2), st.integers(0, 50)),
                         st.just(None), min_size=0, max_size=8)


def _model(left, right_keys, tol=None):
    """Reference: for each left row, the max right ts <= left ts (same
    key), inclusive; None if absent or outside tolerance."""
    out = []
    for i, (k, t) in enumerate(left):
        cands = [rt for (rk, rt) in right_keys if rk == k and rt <= t]
        best = max(cands) if cands else None
        if best is not None and tol is not None and t - best > tol:
            best = None
        out.append((i, k, t, best))
    return sorted(out)


@settings(max_examples=12, deadline=None)
@given(left=_left, right=_right, tol=st.one_of(st.none(), st.integers(0, 20)))
@_deep_fuzz
def test_asof_matches_model(spark, left, right, tol):
    right_keys = list(right.keys())
    ldf = spark.createDataFrame(
        [(i, k, BASE + dt.timedelta(seconds=t)) for i, (k, t) in enumerate(left)],
        "lid long, k long, ts timestamp")
    rdf = spark.createDataFrame(
        [(1000 + j, k, BASE + dt.timedelta(seconds=t))
         for j, (k, t) in enumerate(right_keys)],
        "rid long, k long, ts timestamp") if right_keys else \
        spark.createDataFrame([], "rid long, k long, ts timestamp")
    out = temporal.asof_join(ldf, rdf, on="k", right_cols=("rid",),
                             tolerance_sec=tol)
    got = sorted(
        (r["lid"], r["k"], int((r["ts"] - BASE).total_seconds()),
         None if r["ts_right"] is None
         else int((r["ts_right"] - BASE).total_seconds()))
        for r in out.collect())
    assert got == _model(left, right_keys, tol)


_intervals = st.lists(
    st.tuples(st.integers(0, 100), st.integers(1, 40)),  # (start, length)
    min_size=1, max_size=6, unique_by=lambda iv: iv)
_points = st.lists(st.integers(0, 150), min_size=0, max_size=12)


@settings(max_examples=12, deadline=None)
@given(intervals=_intervals, points=_points,
       bucket=st.sampled_from([1, 3, 7, 10]))
@_deep_fuzz
def test_range_agg_matches_model(spark, intervals, points, bucket):
    """range_agg_bucketed's full/edge bucket split must equal a direct
    per-interval count over arbitrary (unaligned) intervals and bucket
    widths — including sub-bucket intervals and empty-overlap cases."""
    ldf = spark.createDataFrame(
        [(i, BASE + dt.timedelta(seconds=s),
          BASE + dt.timedelta(seconds=s + ln))
         for i, (s, ln) in enumerate(intervals)],
        "lid long, s timestamp, e timestamp")
    rdf = spark.createDataFrame(
        [(j, BASE + dt.timedelta(seconds=p)) for j, p in enumerate(points)],
        "rid long, ts timestamp") if points else \
        spark.createDataFrame([], "rid long, ts timestamp")
    out = temporal.range_agg_bucketed(
        ldf, rdf, id_col="lid", left_start=F.col("s"), left_end=F.col("e"),
        right_ts="ts", bucket_sec=bucket, count_name="n")
    got = sorted((r["lid"], r["n"]) for r in out.collect())
    want = sorted(
        (i, sum(1 for p in points if s <= p < s + ln))
        for i, (s, ln) in enumerate(intervals))
    assert got == want


@settings(max_examples=10, deadline=None)
@given(times=st.lists(st.integers(0, 200), min_size=1, max_size=12),
       gap=st.sampled_from([5, 20, 60]))
def test_sessionize_matches_model(spark, times, gap):
    ev = spark.createDataFrame(
        [(i, 1, BASE + dt.timedelta(seconds=t))
         for i, t in enumerate(sorted(times))],
        "event_id long, user_id long, ts timestamp")
    got = {r["event_id"]: r["session_seq"] for r in
           temporal.sessionize(ev, gap_sec=gap).collect()}
    want, seq, prev = {}, 0, None
    for i, t in enumerate(sorted(times)):
        if prev is None or t - prev > gap:
            seq += 1
        want[i] = seq
        prev = t
    assert got == want


@settings(max_examples=10, deadline=None)
@given(left=_left, right=_right, slice_sec=st.sampled_from([3, 10, 60]))
@_deep_fuzz
def test_sliced_asof_matches_model(spark, left, right, slice_sec):
    """The hot-key-safe sliced variant against the same reference model —
    narrow slices force left rows onto the carry-in path."""
    right_keys = list(right.keys())
    ldf = spark.createDataFrame(
        [(i, k, BASE + dt.timedelta(seconds=t)) for i, (k, t) in enumerate(left)],
        "lid long, k long, ts timestamp")
    rdf = spark.createDataFrame(
        [(1000 + j, k, BASE + dt.timedelta(seconds=t))
         for j, (k, t) in enumerate(right_keys)],
        "rid long, k long, ts timestamp") if right_keys else \
        spark.createDataFrame([], "rid long, k long, ts timestamp")
    out = temporal.sliced_asof_join(ldf, rdf, on="k", slice_sec=slice_sec,
                                    right_cols=("rid",))
    got = sorted(
        (r["lid"], r["k"], int((r["ts"] - BASE).total_seconds()),
         None if r["ts_right"] is None
         else int((r["ts_right"] - BASE).total_seconds()))
        for r in out.collect())
    assert got == _model(left, right_keys, None)
