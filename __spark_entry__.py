"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps each
implemented SURVEY.md §2 operator (plus the training-data extensions) to a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the DuckDB
equivalent for the correctness gate. Registry lives in
radmapper_spark/entrypoints.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from radmapper_spark import headline
from radmapper_spark.entrypoints import ENTRIES
from radmapper_spark.session import load_tables


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    t = load_tables(spark, "/root/testdata/sf0.001")
    return headline.pricing_summary(t)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in ENTRIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per queries() key (omitted for hash-seeded
    operators -> driver records the weaker rows-only check)."""
    return {name: sql() for name, (_fn, sql) in ENTRIES.items() if sql is not None}
