"""Bridge between the driver-side evaluator and Spark-backed values.

Values that represent distributed data stay lazy inside the evaluator:

- ``SparkDB``: a queryable source backed by a DataFrame (flat table ->
  direct-column query compilation; nested -> EAV shred, operators/eav.py).
- ``SparkBindingSets``: a binding-set DataFrame (columns = query vars) —
  the Spark realization of the reference's b-set vectors
  (reference builtin.cljc:1737-1759).

``force_value`` materializes them only at the program boundary.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional


@dataclass
class SparkDB:
    df: Any               # pyspark DataFrame
    name: str = "db"

    @property
    def columns(self):
        return self.df.columns


@dataclass
class SparkBindingSets:
    df: Any               # pyspark DataFrame; columns are qvar names

    def collect(self):
        return [r.asDict(recursive=True) for r in self.df.collect()]

    def __rm_force__(self):
        """Materialize for sequence-level builtins: one column -> list of
        scalars, else list of binding dicts."""
        if len(self.df.columns) == 1:
            c = self.df.columns[0]
            return [r[c] for r in self.df.collect()]
        return self.collect()

    def project(self, name: str) -> "SparkBindingSets":
        return SparkBindingSets(self.df.select(name))


def maybe_spark_db(ip, data) -> Optional[SparkDB]:
    try:
        from pyspark.sql import DataFrame
    except Exception:  # pragma: no cover
        return None
    if isinstance(data, SparkDB):
        return data
    if isinstance(data, DataFrame):
        return SparkDB(data)
    return None


def force_value(ip, v):
    """Materialize lazy Spark values for return to the caller."""
    if isinstance(v, SparkBindingSets):
        return v.collect()
    try:
        from pyspark.sql import DataFrame
        if isinstance(v, DataFrame):
            return [r.asDict(recursive=True) for r in v.collect()]
    except Exception:  # pragma: no cover
        pass
    if isinstance(v, SparkDB):
        return v
    return v
