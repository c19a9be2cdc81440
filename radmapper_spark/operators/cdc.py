"""CDC merge (lakehouse upsert): apply a change stream onto a base table
with latest-record-wins per key and tombstone deletes — the MERGE INTO /
compaction primitive of every incremental ingestion pipeline.

Scale shape: ONE shuffle on the merge key, and the reduce is
``max(struct(ts, src, payload))`` — an aggregate with MAP-SIDE PARTIALS,
not a row_number window (a window must sort every key group; the
max-struct partial keeps only one row per key per partition before the
exchange, which at 100 TB with mostly-cold keys is the difference between
shuffling the table and shuffling near-distinct keys). Ties on ts resolve
to the change side (src=1 > base src=0); remaining ties resolve by the
payload struct comparison — deterministic for any input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_latest(base: DataFrame, changes: DataFrame, keys: list,
                 ts_col: str, deleted_col: str = "_deleted") -> DataFrame:
    """Merge ``changes`` into ``base``: per key tuple, the row with the
    greatest (ts, source) wins, where changes outrank base on equal ts;
    a winning change row with ``deleted_col`` true removes the key.
    ``changes`` must have base's columns plus the boolean tombstone
    column. Returns base's columns (tombstone dropped)."""
    payload = [c for c in base.columns if c not in keys and c != ts_col]
    missing = [c for c in payload + [ts_col] if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing base columns: {missing}")
    b = base.select(*keys, F.col(ts_col), F.lit(0).alias("_src"),
                    F.lit(False).alias(deleted_col), *payload)
    c = changes.select(*keys, F.col(ts_col), F.lit(1).alias("_src"),
                       F.col(deleted_col).cast("boolean").alias(deleted_col),
                       *payload)
    merged = (b.unionByName(c)
              .groupBy(*keys)
              .agg(F.max(F.struct(F.col(ts_col), F.col("_src"),
                                  F.col(deleted_col).alias("_del"),
                                  *payload)).alias("_w")))
    return (merged.filter(~F.col("_w._del"))
            .select(*keys, F.col(f"_w.{ts_col}").alias(ts_col),
                    *[F.col(f"_w.{p}").alias(p) for p in payload]))
