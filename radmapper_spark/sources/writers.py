"""Sinks (SURVEY.md §2.1): the reference language *returns* its final
value; at table scale the engine's results are DataFrames, so the sink is a
parquet/json write. Partitioning knobs are first-class because at 100 TB
the sink layout IS the next job's read performance.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame


def write_result(df: DataFrame, path: str, fmt: str = "parquet",
                 mode: str = "overwrite",
                 partition_by: Optional[list] = None,
                 bucket_by: Optional[tuple] = None,
                 cluster_by: Optional[list] = None,
                 cluster_partitions: Optional[int] = None,
                 max_records_per_file: Optional[int] = None) -> None:
    """Write a result frame.

    - partition_by: hive-style directory partitioning (prunable on read)
    - bucket_by: (n, cols) — co-locates future joins on cols without a
      shuffle (requires saveAsTable semantics; used with a metastore path)
    - cluster_by: range-repartition + sort-within-partitions on these
      columns before writing. Each output file then covers a narrow,
      (near-)disjoint range of the cluster key, so parquet row-group
      min/max statistics skip most files on selective reads — the poor
      man's Z-order, and at 100 TB the difference between scanning a
      table and scanning a slice (file-footer ranges test-asserted).
    - max_records_per_file: bounds file sizes so downstream scans
      parallelize evenly
    """
    if cluster_by:
        # explicit partition count pins the file count (AQE otherwise
        # coalesces small writes to one file, defeating the layout)
        args = ([cluster_partitions] if cluster_partitions else []) \
            + list(cluster_by)
        df = (df.repartitionByRange(*args)
              .sortWithinPartitions(*cluster_by))
    w = df.write.format(fmt).mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        w = w.bucketBy(n, *cols).sortBy(*cols)
        w.saveAsTable(path)
        return
    w.save(path)


def write_document(value, path: str) -> None:
    """Sink for driver-side document results (the RM program's return
    value): one JSON file."""
    import json
    with open(path, "w") as f:
        json.dump(value, f, indent=2, default=str)
