"""Streaming CRAWL ADMISSION — the web tier's incremental loop (r15:
closes the batch/streaming asymmetry for the crawl side the way
streaming/ingest.py closed it for the text side in r14). Per
micro-batch of fetched pages (doc_id, url, html):

    URL canonicalization (web.canonicalize_urls; schemeless dropped)
    -> within-batch first-fetch-wins per canonical URL
    -> cross-batch URL dedup (persisted url-hash index, anti-join)
    -> cross-batch PER-HOST VOLUME CAP (persisted per-batch host
       counts: a host's budget is consumed in ARRIVAL order across the
       whole stream, never re-ranked)
    -> HTML main-text extraction + C4 token floor + Gopher quality
       gate (web.html_extract / web.gopher_quality — map-only)
    -> admitted pages appended to ``out_path``.

Ordering contract: the batch pipeline (entrypoints.pipeline_web_crawl)
caps each host in HASH order — append-stable for a fixed corpus but
not incrementally computable (a later page may hash smaller and
displace an earlier admit). An unbounded stream can only honor
ARRIVAL order, so this loop admits the first ``host_cap`` pages per
host by (batch, doc_id) — the same distinction as hash shards vs the
offline permutation layout in the text-ingest loop. The batch twin
entry (entrypoints.stream_crawl_ingest) ranks by doc_id to match.

Scale shape per micro-batch: canonicalization and extraction are
map-only projections; the URL probe is one anti-join whose batch side
is micro-batch-sized; the host-cap join reads the long-skinny
(host, n, _rm_batch_id) counts table — an aggregate bounded by
(#hosts x #batches) rows; streaming/compaction.py rewrites old
partitions into the seed out-of-band so the per-probe file-listing
cost stays O(batches since last compaction) for the stream's whole
lifetime. The Gopher gate runs AFTER the
cap, so the expensive string work touches only surviving pages.

Replay safety — the same foreachBatch idempotence pattern as
streaming/ingest.py (r14 verdict item #2): every sink is keyed by
``_rm_batch_id`` and written with dynamic partition OVERWRITE, and
both state reads EXCLUDE the batch's own partition, so a replayed
batch recomputes exactly its own output and state from exactly the
pre-crash view — kill-and-restart is byte-identical (test-proven).

Reference: the reference repo has no streaming and no web operators —
this module composes the repo's own oracle-gated crawl stages
(operators/web.py) behind the incremental admission contract of
streaming/ingest.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import portable_hash as PH
from ..operators import web

#: salt for the canonical-URL dedup hash (both engines)
URL_SALT = "crawlurl"
#: persisted state schemas — read with EXPLICIT schemas so empty seeds
#: (zero files) load and the partition column types as LONG
_URL_IDX_SCHEMA = "url_hash long, _rm_batch_id long"
_HOST_CNT_SCHEMA = "host string, n long, _rm_batch_id long"
_SEED_BATCH_ID = -1


def url_hash(canonical_url_col) -> F.Column:
    """60-bit portable hash of the canonical URL — the dedup key (NULL
    canonical urls never reach it: schemeless rows are dropped before
    the probe)."""
    return PH.ph60(F.concat(F.lit(f"{URL_SALT}:"), canonical_url_col))


def duck_url_hash(expr: str) -> str:
    return PH.duck_ph60(f"'{URL_SALT}:' || ({expr})")


def build_url_index(pages: DataFrame, path: str,
                    url_col: str = "url") -> None:
    """Seed the URL dedup index from an already-fetched page set:
    canonicalize, hash, distinct, under the seed's ``_rm_batch_id=-1``
    partition. Overwrites ``path``; pass an empty frame to start from
    nothing."""
    canon = web.canonicalize_urls(pages, url_col=url_col)
    (canon.filter(F.col("canonical_url").isNotNull())
     .select(url_hash(F.col("canonical_url")).alias("url_hash"))
     .distinct()
     .withColumn("_rm_batch_id", F.lit(_SEED_BATCH_ID).cast("long"))
     .write.mode("overwrite").partitionBy("_rm_batch_id").parquet(path))


def build_host_counts(path: str, spark) -> None:
    """Initialize an EMPTY per-batch host-counts table (the seed
    partition carries no rows — a fresh stream owes every host its
    full budget)."""
    (spark.createDataFrame([], _HOST_CNT_SCHEMA)
     .write.mode("overwrite").partitionBy("_rm_batch_id").parquet(path))


def start_crawl_ingest(pages_stream: DataFrame, url_index_path: str,
                       host_counts_path: str, out_path: str,
                       checkpoint: str, host_cap: int = 10,
                       min_tokens: int = 60,
                       id_col: str = "doc_id"):
    """Start the composed crawl-admission loop on a fetched-pages
    stream (columns: id_col, url, html). Returns the StreamingQuery
    (availableNow trigger). ``build_url_index`` and
    ``build_host_counts`` must have created the state tables (possibly
    empty)."""

    # LOUD legacy/flat-layout guard for BOTH state tables (same
    # contract as streaming/ingest.py, r15 review: rows without a
    # _rm_batch_id partition read as NULL under the explicit schema and
    # the != batch_id probe filter silently DROPS them — the whole seed
    # would be ignored and every URL re-admitted / every host budget
    # reset). One limit(1) job per table at stream START, never per
    # batch.
    spark0 = pages_stream.sparkSession
    for path, schema, what in ((url_index_path, _URL_IDX_SCHEMA,
                                "url index"),
                               (host_counts_path, _HOST_CNT_SCHEMA,
                                "host counts")):
        flat = (spark0.read.schema(schema).parquet(path)
                .filter(F.col("_rm_batch_id").isNull()).limit(1)
                .count())
        if flat:
            raise ValueError(
                f"{what} at {path} has rows without a _rm_batch_id "
                f"partition (flat layout). The batch-excluding probe "
                f"would silently ignore them and re-admit the whole "
                f"fetched history. Rebuild via build_url_index / "
                f"build_host_counts (they write the partitioned "
                f"layout), then restart.")

    def ingest_batch(batch_df, batch_id):
        spark = batch_df.sparkSession
        bid = F.lit(int(batch_id)).cast("long")
        canon = (web.canonicalize_urls(batch_df)
                 .filter(F.col("canonical_url").isNotNull())
                 .withColumn("_rm_uh",
                             url_hash(F.col("canonical_url"))))
        # within-batch dedup keyed on the HASH, not the raw url, so all
        # three dedup layers — this window, the persisted index probe,
        # and the batch twin's window — share ONE key (r15 advice: a
        # raw-url window admitted two pages on an in-batch 60-bit
        # collision where the twin admits one)
        wurl = Window.partitionBy("_rm_uh").orderBy(F.col(id_col).asc())
        first = (canon
                 .withColumn("_rm_cr_rn", F.row_number().over(wurl))
                 .filter(F.col("_rm_cr_rn") == 1).drop("_rm_cr_rn"))
        # both state reads EXCLUDE the batch's own partition so a
        # replay sees exactly the pre-crash view (see module docstring)
        idx = (spark.read.schema(_URL_IDX_SCHEMA)
               .parquet(url_index_path)
               .filter(F.col("_rm_batch_id") != int(batch_id)))
        fresh = (first.join(
            idx, first["_rm_uh"] == idx["url_hash"], "left_anti")
            .persist())
        prior = (spark.read.schema(_HOST_CNT_SCHEMA)
                 .parquet(host_counts_path)
                 .filter(F.col("_rm_batch_id") != int(batch_id))
                 .groupBy("host")
                 .agg(F.sum("n").alias("_rm_prior_n")))
        whost = Window.partitionBy("host").orderBy(F.col(id_col).asc())
        admitted = (fresh
                    .withColumn("_rm_hr", F.row_number().over(whost))
                    .join(prior, "host", "left")
                    .withColumn("_rm_prior_n",
                                F.coalesce(F.col("_rm_prior_n"),
                                           F.lit(0)))
                    .filter(F.col("_rm_prior_n") + F.col("_rm_hr")
                            <= host_cap)
                    # persisted: the out write AND the host-counts
                    # write both consume it — without the cache the
                    # second job re-reads the growing counts table and
                    # re-runs the window (r15 third review)
                    .persist())
        gated = web.extract_floor_gate(admitted,
                                       min_tokens=min_tokens)
        out = gated.select(
            id_col, "canonical_url", "host", "n_lines_kept",
            "n_extracted_tokens", "extracted_text").withColumn(
            "_rm_batch_id", bid)
        (out.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("_rm_batch_id").parquet(out_path))
        # state updates, both replay-deterministic: the host counts
        # record CAP-ADMITTED pages (the cap governs fetch volume, not
        # extraction quality); the URL index claims EVERY fresh
        # canonical url (first fetch wins even when the cap or the
        # quality gate rejects the page — a later re-fetch of the same
        # resource is never "first").
        #
        # ORDER MATTERS: the url-index write must come LAST. Writing a
        # path invalidates every cached plan that reads it
        # (CacheManager recache-by-path), so an index write before the
        # host-counts job would force `admitted` to RECOMPUTE the
        # anti-join against a REFRESHED file listing — and when the
        # seed index had zero files, the relation resolved with an
        # empty partition schema, so re-reading files that now sit
        # under _rm_batch_id= dirs trips Spark's partition-values
        # assertion (found by the differential test; ingest.py's loop
        # has the same index-write-last shape for the same reason).
        (admitted.groupBy("host")
         .agg(F.count(F.lit(1)).cast("long").alias("n"))
         .withColumn("_rm_batch_id", bid)
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("_rm_batch_id").parquet(host_counts_path))
        (fresh.select(F.col("_rm_uh").alias("url_hash"))
         .withColumn("_rm_batch_id", bid)
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("_rm_batch_id").parquet(url_index_path))
        admitted.unpersist()
        fresh.unpersist()

    return (pages_stream.writeStream
            .foreachBatch(ingest_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
