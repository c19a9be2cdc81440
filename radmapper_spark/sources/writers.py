"""Sinks (SURVEY.md §2.1): the reference language *returns* its final
value; at table scale the engine's results are DataFrames, so the sink is a
parquet/json write. Partitioning knobs are first-class because at 100 TB
the sink layout IS the next job's read performance.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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


def write_training_shards(df: DataFrame, path: str,
                          shard_col: str = "shard",
                          pos_col: str = "shard_pos") -> None:
    """Materialize a shuffled+sharded frame (operators.sampling's
    layout contract: shard = (rank-1) div size, shard_pos = (rank-1)
    mod size) as the on-disk artifact a training run actually reads:
    one hive directory per shard (``shard=K/``) holding ONE parquet
    file whose rows are physically ordered by ``pos_col`` — ingestion
    is then a sequential scan of shard directories in numeric order,
    no sorting, no random access (the webdataset/TFRecord shard-layout
    recipe on parquet).

    Plan shape: one hash exchange on the shard id co-locates each
    shard's rows in a single task (shards are FIXED-SIZE by the
    upstream arithmetic, so tasks are byte-balanced by construction), a
    task-local sort by (shard, pos) puts them in physical order, and
    partitionBy(shard) splits each task's run into one file per shard
    directory. No global sort here — the upstream rank already paid the
    pipeline's one legitimate global sort on an 8-byte key. The layout
    is append-friendly at 100 TB: a grown corpus or another epoch
    writes NEW shard directories without rewriting existing files.

    The one-file-per-shard contract is PINNED, not inherited: the
    write sets maxRecordsPerFile=0 (no per-file row cap) explicitly,
    because a session-level spark.sql.files.maxRecordsPerFile (a common
    production setting) would otherwise split a shard across files and
    break the physical-order contract mid-shard (r13 review). Shard
    SIZE is the caller's file-size knob — it bounds every file by
    construction, which is the honest control at this layout."""
    (df.repartition(F.col(shard_col))
       .sortWithinPartitions(shard_col, pos_col)
       .write.mode("overwrite")
       .option("maxRecordsPerFile", 0)
       .partitionBy(shard_col)
       .parquet(path))


def write_document(value, path: str) -> None:
    """Sink for driver-side document results (the RM program's return
    value): one JSON file."""
    import json
    with open(path, "w") as f:
        json.dump(value, f, indent=2, default=str)
