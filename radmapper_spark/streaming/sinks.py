"""Streaming sinks with checkpoint recovery (SURVEY §2.1/§2.11 tier).

The file sink + checkpoint pair is Spark's exactly-once story: offsets
and sink-committed batch ids live in the checkpoint, so a crashed or
stopped query RESUMES where it left off — re-running it neither skips
nor duplicates data (test-asserted by restarting a query over a grown
source against the same checkpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def start_parquet_sink(df: DataFrame, path: str, checkpoint: str,
                       available_now: bool = True,
                       output_mode: str = "append"):
    """Start (or RESTART — same checkpoint resumes exactly-once) a
    parquet file sink for a streaming DataFrame. available_now=True
    drains everything currently available and terminates: the batch-job
    shape of an incremental pipeline (run it on a schedule; each run
    processes exactly the new data)."""
    w = (df.writeStream.format("parquet")
         .option("path", path)
         .option("checkpointLocation", checkpoint)
         .outputMode(output_mode))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
