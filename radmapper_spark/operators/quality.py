"""Data-quality expectation checks over keyed tables — the validation
pass a production pipeline runs before publishing a dataset: key
uniqueness, referential integrity, null fractions, and domain checks,
each expressed as ONE aggregate so the whole suite is a handful of
map-side-partial scans regardless of table size.

Output contract: one row per check — (check, table_name, n_violations,
n_checked, ok) — so the result is tiny and alert-able no matter how big
the inputs are. Every check is a plain DataFrame aggregate (no driver
iteration over rows), and the fact-side joins are LEFT ANTI joins (the
canonical orphan-detection plan: one shuffle, no row multiplication).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _one(name: str, table_name: str, viol, checked) -> DataFrame:
    return (viol.crossJoin(checked) if checked is not None else viol).select(
        F.lit(name).alias("check"),
        F.lit(table_name).alias("table_name"),
        F.col("_v").cast("long").alias("n_violations"),
        F.col("_n").cast("long").alias("n_checked"),
        (F.col("_v") == 0).alias("ok"))


def unique_key_check(df: DataFrame, key_cols: list,
                     table_name: str) -> DataFrame:
    """Violations = rows beyond the first per key (sum(cnt) - distinct).
    One groupBy with map-side partials; never materializes dup lists."""
    agg = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_c")).agg(
        F.sum(F.col("_c") - 1).alias("_v"),
        F.sum("_c").alias("_n"))
    return _one(f"unique({','.join(key_cols)})", table_name, agg, None)


def not_null_check(df: DataFrame, col: str, table_name: str) -> DataFrame:
    agg = df.agg(
        F.count(F.when(F.col(col).isNull(), 1)).alias("_v"),
        F.count(F.lit(1)).alias("_n"))
    return _one(f"not_null({col})", table_name, agg, None)


def foreign_key_check(fact: DataFrame, fact_key: str, dim: DataFrame,
                      dim_key: str, table_name: str) -> DataFrame:
    """Orphans via LEFT ANTI join — one shuffle (or broadcast when the
    dim is small), counts only."""
    orphans = (fact.select(F.col(fact_key))
               .join(dim.select(F.col(dim_key).alias(fact_key)),
                     on=fact_key, how="left_anti")
               .agg(F.count(F.lit(1)).alias("_v")))
    total = fact.agg(F.count(F.lit(1)).alias("_n"))
    return _one(f"fk({fact_key}->{dim_key})", table_name, orphans, total)


def domain_check(df: DataFrame, cond, name: str,
                 table_name: str) -> DataFrame:
    """Violations = rows where `cond` (a boolean Column) is false/null."""
    agg = df.agg(
        F.count(F.when(~F.coalesce(cond, F.lit(False)), 1)).alias("_v"),
        F.count(F.lit(1)).alias("_n"))
    return _one(name, table_name, agg, None)


def run_checks(checks: list) -> DataFrame:
    """Union the one-row check frames into the report table."""
    if not checks:
        raise ValueError("run_checks needs at least one check")
    return reduce(lambda a, b: a.unionByName(b), checks)
