"""Column profiling operators: exact quantiles and fixed-width histograms
per group (the distribution-stats step of a data pipeline: outlier
thresholds, drift checks, bin summaries).

Scale notes:
- ``group_quantiles`` uses Spark's exact ``percentile`` aggregate
  (interpolated, same definition as SQL ``quantile_cont``): per-group
  sort-based, deterministic — unlike double-summed moments, quantiles of
  a fixed multiset are partition-order independent, so they hash-match an
  oracle bit-for-bit after rounding. For 100 TB profiles where an exact
  per-group sort is too hot, the same call sites take
  ``approx_percentile`` (t-digest-style sketch, mergeable, single pass) —
  exposed via ``exact=False``; the entry pins ``exact=True`` because the
  correctness gate needs determinism.
- ``histogram`` is a pure map-side agg: bin = floor(value/width), then
  groupBy(group, bin) count — one shuffle of (group, bin) partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_quantiles(df: DataFrame, group_col: str, value_col: str,
                    quantiles=(0.25, 0.5, 0.75, 0.95),
                    exact: bool = True) -> DataFrame:
    """Per-group min/max/count plus the requested quantiles (exact by
    default; sketch-based when exact=False)."""
    qarr = "array(" + ", ".join(str(float(q)) for q in quantiles) + ")"
    fn = "percentile" if exact else "approx_percentile"
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min(value_col), 6).alias("min_value"),
        F.round(F.max(value_col), 6).alias("max_value"),
        F.expr(f"{fn}({value_col}, {qarr})").alias("_qs"),
    )
    qcols = [F.round(F.col("_qs")[i], 6).alias(f"p{int(q * 100)}")
             for i, q in enumerate(quantiles)]
    return agg.select(group_col, "n", "min_value", "max_value", *qcols)


def histogram(df: DataFrame, group_col: str, value_col: str,
              bin_width: float) -> DataFrame:
    """Fixed-width histogram per group: bin index, inclusive lower edge,
    count. Map-side partial agg; output is O(groups x bins)."""
    b = F.floor(F.col(value_col) / F.lit(float(bin_width))).cast("long")
    return (df.groupBy(F.col(group_col), b.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(group_col, "bin",
                    F.round(F.col("bin") * F.lit(float(bin_width)), 6)
                    .alias("bin_lo"), "n"))


def source_mixture(docs: DataFrame, group_col: str = "source",
                   text_col: str = "text") -> DataFrame:
    """Domain-mixture table for training-data sampling: per source, doc
    count, token count, and the source's share of all tokens (weights sum
    to 1) — the input to mixture-weighted samplers. One scan with a
    map-side token count, one tiny groupBy, totals folded in as a
    broadcast 1-row aggregate (the plan stays a single lazy job)."""
    ntok = F.size(F.filter(F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
                           lambda t: t != ""))
    per = (docs.select(F.col(group_col), ntok.alias("_n"))
           .groupBy(group_col)
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("_n").alias("n_tokens")))
    tot = per.agg(F.sum("n_tokens").alias("_tot"))
    return (per.crossJoin(F.broadcast(tot))
            .select(group_col, "n_docs", "n_tokens",
                    F.round(F.col("n_tokens") / F.col("_tot"), 9)
                    .alias("weight")))


def iqr_outliers(df: DataFrame, group_col: str, value_col: str,
                 k: float = 1.5) -> DataFrame:
    """Per-group IQR outlier summary: exact quartiles, Tukey fences at
    k*IQR, and the count/fraction of rows outside them — the standard
    distribution-drift tripwire. The tiny per-group bounds frame is
    broadcast back onto the fact scan (one exact-percentile shuffle + one
    map-side count; for 100 TB profiles swap percentile for the
    approx_percentile sketch exactly as in group_quantiles)."""
    bounds = (df.groupBy(group_col)
              .agg(F.expr(f"percentile({value_col}, 0.25)").alias("_q1"),
                   F.expr(f"percentile({value_col}, 0.75)").alias("_q3")))
    lo = F.col("_q1") - k * (F.col("_q3") - F.col("_q1"))
    hi = F.col("_q3") + k * (F.col("_q3") - F.col("_q1"))
    b = bounds.select(group_col, lo.alias("_lo"), hi.alias("_hi"),
                      "_q1", "_q3")
    out = (df.join(F.broadcast(b), group_col)
           .groupBy(group_col)
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.when((F.col(value_col) < F.col("_lo"))
                             | (F.col(value_col) > F.col("_hi")), 1)
                      .otherwise(0)).alias("n_outliers"),
                F.first("_q1").alias("q1d"), F.first("_q3").alias("q3d")))
    return out.select(
        group_col, "n", "n_outliers",
        F.round(F.col("n_outliers") / F.col("n"), 6).alias("outlier_frac"),
        F.round(F.col("q1d"), 6).alias("q1"),
        F.round(F.col("q3d"), 6).alias("q3"))
