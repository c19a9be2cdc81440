"""Skew mitigation for joins on hot keys (100 TB hardening).

AQE's skew-join split (enabled in session.py) handles most cases at
runtime; `salted_join` is the explicit fallback for EXTREME skew it can't
fix — e.g. joining events on a user_id where one user is 10% of the table:

    fact ⋈ dim on k   →   fact + salt(0..S-1)  ⋈  dim × replicate(S) on (k, salt)

The hot key's rows spread over S reducers instead of one. Correct for
inner/left joins on equi-keys; the dim side is replicated S× so choose S
to keep S × |dim| broadcastable or modest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(fact: DataFrame, dim: DataFrame, on: str, salt: int = 8,
                how: str = "inner") -> DataFrame:
    """Equi-join fact⋈dim on `on`, salting the fact side to spread hot keys."""
    f = fact.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = f.join(d, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def top_keys(df: DataFrame, key: str, n: int = 10) -> list:
    """Diagnose skew: heaviest keys with their row counts."""
    rows = (df.groupBy(key).count().orderBy(F.col("count").desc()).limit(n)
            .collect())
    return [(r[key], r["count"]) for r in rows]
