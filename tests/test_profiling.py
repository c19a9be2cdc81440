"""Profiling operators: quantile ordering/bounds, histogram mass, and the
sketch path."""

from __future__ import annotations

from pyspark.sql import functions as F

from radmapper_spark.operators import profiling


def test_group_quantiles_exact(tables):
    ev = tables["events"]
    rows = profiling.group_quantiles(ev, "event_type", "value").collect()
    counts = {r["event_type"]: r["n"] for r in
              ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert {r["event_type"] for r in rows} == set(counts)
    for r in rows:
        assert r["n"] == counts[r["event_type"]]
        assert (r["min_value"] <= r["p25"] <= r["p50"]
                <= r["p75"] <= r["p95"] <= r["max_value"])


def test_group_quantiles_sketch_path(tables):
    """approx_percentile path runs and lands near the exact values."""
    ev = tables["events"]
    exact = {r["event_type"]: r["p50"] for r in
             profiling.group_quantiles(ev, "event_type", "value").collect()}
    approx = {r["event_type"]: r["p50"] for r in
              profiling.group_quantiles(ev, "event_type", "value",
                                        exact=False).collect()}
    for k, v in exact.items():
        spread = abs(v) + 1.0
        assert abs(approx[k] - v) < 0.2 * spread


def test_histogram_mass_and_edges(tables):
    ev = tables["events"]
    h = profiling.histogram(ev, "event_type", "value", bin_width=25.0)
    rows = h.collect()
    assert sum(r["n"] for r in rows) == ev.count()
    for r in rows:
        assert r["bin_lo"] == r["bin"] * 25.0
    # every value falls in its bin
    joined = (ev.join(h, "event_type")
              .filter((F.col("value") >= F.col("bin_lo"))
                      & (F.col("value") < F.col("bin_lo") + 25.0)))
    assert joined.select("event_id").distinct().count() == ev.count()


def test_iqr_outliers_planted(spark):
    """Planted distribution: quartiles and the single outlier are exact."""
    from pyspark.sql import functions as F
    from radmapper_spark.operators import profiling
    rows = [("a", float(v)) for v in range(1, 12)] + [("a", 1000.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = profiling.iqr_outliers(df, "g", "v").collect()[0]
    assert out["n"] == 12
    assert out["n_outliers"] == 1           # the 1000.0
    assert out["q1"] == 3.75 and out["q3"] == 9.25
    assert abs(out["outlier_frac"] - round(1 / 12, 6)) < 1e-9
