"""Streaming sinks with checkpoint recovery (SURVEY §2.1/§2.11 tier).

The file sink + checkpoint pair is Spark's exactly-once story: offsets
and sink-committed batch ids live in the checkpoint, so a crashed or
stopped query RESUMES where it left off — re-running it neither skips
nor duplicates data (test-asserted by restarting a query over a grown
source against the same checkpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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


def start_cdc_apply(changes: DataFrame, base_path: str, out_path: str,
                    checkpoint: str, keys: list, ts_col: str,
                    deleted_col: str = "_deleted"):
    """Streaming CDC apply: drain a change STREAM and merge it onto the
    keyed table at base_path with latest-wins + tombstones
    (operators.cdc.merge_latest), rewriting out_path atomically per
    micro-batch via foreachBatch.

    Exactly-once shape: the checkpoint dedupes change batches across
    restarts, and the merge itself is idempotent (applying the same
    change twice yields the same winner), so replays are harmless.
    On a real lakehouse the foreachBatch body would be a MERGE INTO on a
    table format with upsert support (the whole-table rewrite here is the
    plain-parquet stand-in); merge_latest's max-struct reduce — one key
    shuffle, map-side partials — is the part that carries to 100 TB.
    availableNow trigger: each run drains the currently-available
    changes, the scheduled-incremental shape."""
    from ..operators.cdc import merge_latest

    def apply_batch(batch_df, batch_id):
        spark = batch_df.sparkSession
        base = spark.read.parquet(base_path)
        merged = merge_latest(base, batch_df, keys=keys, ts_col=ts_col,
                              deleted_col=deleted_col)
        # stage-then-swap: write to a batch-scoped dir, then overwrite the
        # base non-atomically only after the write succeeded (plain
        # parquet has no atomic swap; a table format would MERGE instead)
        merged.write.mode("overwrite").parquet(out_path)

    return (changes.writeStream
            .foreachBatch(apply_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


def start_neardup_probe(docs_stream: DataFrame, index_path: str,
                        out_path: str, checkpoint: str,
                        text_col: str = "text", id_col: str = "doc_id",
                        num_hashes: int = 32, bands: int = 8,
                        shingle_k: int = 5,
                        jaccard_threshold: float = 0.5,
                        hash_mode: str = "xxhash64"):
    """Streaming near-dup admission control: each micro-batch of incoming
    documents is probed against the PERSISTED minhash index
    (dedup.neardup_vs_index — signatures computed for the batch only,
    equi-join on the banded index, corpus text never read) and the hits
    are appended to out_path. The checkpoint dedupes batches across
    restarts; the probe itself is a pure function of (batch, index), so
    replays append identical rows at worst into distinct batch files.

    This is the ingest-pipeline shape: new crawl data streams in, the
    index answers "have we seen this before" incrementally, and the
    index itself is refreshed out-of-band (build_minhash_index) on
    whatever cadence the corpus grows."""
    from ..operators.dedup import neardup_vs_index

    def probe_batch(batch_df, batch_id):
        hits = neardup_vs_index(
            batch_df, index_path, text_col=text_col, id_col=id_col,
            num_hashes=num_hashes, bands=bands, shingle_k=shingle_k,
            jaccard_threshold=jaccard_threshold, hash_mode=hash_mode)
        hits.write.mode("append").parquet(out_path)

    return (docs_stream.writeStream
            .foreachBatch(probe_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


def start_neardup_admission(docs_stream: DataFrame, index_path: str,
                            out_path: str, checkpoint: str,
                            text_col: str = "text", id_col: str = "doc_id",
                            num_hashes: int = 32, bands: int = 8,
                            shingle_k: int = 5,
                            jaccard_threshold: float = 0.5,
                            hash_mode: str = "xxhash64"):
    """The FULL streaming admission loop: for each micro-batch of
    incoming documents,

    1. PROBE the persisted minhash index (neardup_vs_index — batch
       signatures only, corpus text never read);
    2. write the AUDIT TRAIL of every rejection to ``out_path``: index
       duplicates as (new_id, index_id, est_jaccard), and intra-batch
       losers as (new_id=loser, index_id=the batch sibling that won,
       est_jaccard) — a rejected document always leaves a record;
    3. ADMIT the batch's surviving documents into the index
       (append_to_minhash_index), so every FUTURE batch sees them.

    A document survives unless it near-duplicates an indexed one, or it
    near-duplicates a SMALLER-id sibling inside its own micro-batch
    (first-writer-wins — checked with the batch operator
    minhash_lsh_pairs over the micro-batch; without this, two identical
    docs arriving together would both be admitted because neither is in
    the index yet). Deterministic given the micro-batch contents.

    Restart caveat: unlike the pure probe sink, neither the index
    append NOR the audit write is idempotent under batch replay — a
    replayed batch appends duplicate index rows and duplicate audit
    rows. Probes stay CORRECT (candidate pairs are dropDuplicates'd on
    (new_id, index_id) and duplicate signatures carry identical
    estimates), so replay costs storage, not answers; compact the index
    out-of-band (and dedupe the audit on read) if replays accumulate."""
    from ..operators.dedup import (append_to_minhash_index,
                                   minhash_lsh_pairs, neardup_vs_index)

    def admit_batch(batch_df, batch_id):
        batch_df = batch_df.persist()
        hits = neardup_vs_index(
            batch_df, index_path, text_col=text_col, id_col=id_col,
            num_hashes=num_hashes, bands=bands, shingle_k=shingle_k,
            jaccard_threshold=jaccard_threshold,
            hash_mode=hash_mode).persist()
        intra = minhash_lsh_pairs(
            batch_df, text_col=text_col, id_col=id_col,
            num_hashes=num_hashes, bands=bands, shingle_k=shingle_k,
            jaccard_threshold=jaccard_threshold, hash_mode=hash_mode)
        # intra-batch losers: the larger side of each pair (id_a < id_b
        # by construction -> smaller id wins). Audited in the same
        # (new_id, index_id, est) shape: index_id is the sibling that
        # won (which IS about to be indexed below).
        intra_rej = intra.select(F.col("id_b").alias("new_id"),
                                 F.col("id_a").alias("index_id"),
                                 F.col("est_jaccard"))
        hits.unionByName(intra_rej).write.mode("append").parquet(out_path)
        rejected = (hits.select(F.col("new_id").alias("rid"))
                    .unionByName(intra.select(F.col("id_b").alias("rid")))
                    .distinct())
        survivors = batch_df.join(
            rejected, batch_df[id_col] == F.col("rid"), "left_anti")
        append_to_minhash_index(
            survivors, index_path, text_col=text_col, id_col=id_col,
            num_hashes=num_hashes, bands=bands, shingle_k=shingle_k,
            hash_mode=hash_mode)
        rel = getattr(intra, "rm_release_cache", None)
        rel and rel()
        hits.unpersist()
        batch_df.unpersist()

    return (docs_stream.writeStream
            .foreachBatch(admit_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


def start_embedding_probe(vec_stream: DataFrame, index_path: str,
                          out_path: str, checkpoint: str,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id",
                          threshold: float = 0.45,
                          bands: int = 192, planes_per_band: int = 8,
                          sketch_planes: int = 512, seed: int = 42):
    """Streaming embedding near-dup admission control — the sign-LSH twin
    of start_neardup_probe: each micro-batch of incoming vectors is
    probed against the PERSISTED sign-LSH index
    (dedup.neardup_embedding_vs_index — signatures computed for the
    batch only, corpus vectors served from the index) and the hits
    (new_id, index_id, cosine) append to out_path. Same checkpoint /
    replay contract as the minhash probe."""
    from ..operators.dedup import neardup_embedding_vs_index

    def probe_batch(batch_df, batch_id):
        hits = neardup_embedding_vs_index(
            batch_df, index_path, vec_col=vec_col, id_col=id_col,
            threshold=threshold, bands=bands,
            planes_per_band=planes_per_band,
            sketch_planes=sketch_planes, seed=seed)
        hits.write.mode("append").parquet(out_path)
        rel = getattr(hits, "rm_release_cache", None)
        if rel is not None:
            rel()

    return (vec_stream.writeStream
            .foreachBatch(probe_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


def start_embedding_admission(vec_stream: DataFrame, index_path: str,
                              out_path: str, checkpoint: str,
                              vec_col: str = "embedding",
                              id_col: str = "vec_id",
                              threshold: float = 0.45,
                              bands: int = 192, planes_per_band: int = 8,
                              sketch_planes: int = 512, seed: int = 42):
    """The sign-LSH twin of start_neardup_admission — the full streaming
    ingest loop for vectors: per micro-batch, probe the persisted
    embedding index, write the audit trail of EVERY rejection to
    ``out_path`` (index duplicates AND intra-batch losers, the latter
    recorded against the batch sibling that won), then ADMIT the
    surviving vectors (append_to_signlsh_index) so future batches see
    them. Intra-batch duplicates resolve first-writer-wins via the
    batch operator embedding_cosine_pairs (id_a < id_b — the larger id
    loses). Same restart caveat as the minhash loop: replays append
    duplicate index AND audit rows (probe answers unaffected; compact /
    dedupe out-of-band)."""
    from ..operators.dedup import (append_to_signlsh_index,
                                   embedding_cosine_pairs,
                                   neardup_embedding_vs_index)

    def admit_batch(batch_df, batch_id):
        batch_df = batch_df.persist()
        hits = neardup_embedding_vs_index(
            batch_df, index_path, vec_col=vec_col, id_col=id_col,
            threshold=threshold, bands=bands,
            planes_per_band=planes_per_band,
            sketch_planes=sketch_planes, seed=seed)
        hits = hits.persist()
        intra = embedding_cosine_pairs(
            batch_df, vec_col=vec_col, id_col=id_col,
            threshold=threshold, bands=bands,
            planes_per_band=planes_per_band,
            sketch_planes=sketch_planes, seed=seed)
        intra_rej = intra.select(F.col("id_b").alias("new_id"),
                                 F.col("id_a").alias("index_id"),
                                 F.col("cosine"))
        hits.unionByName(intra_rej).write.mode("append").parquet(out_path)
        rejected = (hits.select(F.col("new_id").alias("rid"))
                    .unionByName(intra.select(F.col("id_b").alias("rid")))
                    .distinct())
        survivors = batch_df.join(
            rejected, batch_df[id_col] == F.col("rid"), "left_anti")
        append_to_signlsh_index(
            survivors, index_path, vec_col=vec_col, id_col=id_col,
            bands=bands, planes_per_band=planes_per_band,
            sketch_planes=sketch_planes, seed=seed)
        for df in (intra, hits):
            rel = getattr(df, "rm_release_cache", None)
            rel and rel()
        hits.unpersist()
        batch_df.unpersist()

    return (vec_stream.writeStream
            .foreachBatch(admit_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
