"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps each
implemented SURVEY.md §2 operator to a (spark, sf_dir) -> DataFrame callable;
``oracle_sql()`` gives the DuckDB-equivalent SQL for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from radmapper_spark import headline
from radmapper_spark.session import load_tables


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    t = load_tables(spark, "/root/testdata/sf0.001")
    return headline.pricing_summary(t)


def _wrap(fn) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(load_tables(spark, sf_dir))

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "pricing_summary": _wrap(headline.pricing_summary),
        "top_revenue_orders": _wrap(headline.top_revenue_orders),
        "region_nation_revenue": _wrap(headline.region_nation_revenue),
        "events_by_type": _wrap(headline.events_by_type),
    }
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per queries() key (tables pre-registered)."""
    return {
        "pricing_summary": headline.pricing_summary_sql(),
        "top_revenue_orders": headline.top_revenue_orders_sql(),
        "region_nation_revenue": headline.region_nation_revenue_sql(),
        "events_by_type": headline.events_by_type_sql(),
    }
