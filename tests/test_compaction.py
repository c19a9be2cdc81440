"""Streaming state-table compaction (streaming/compaction.py): folding
old per-batch partitions into the seed must leave every probe answer
unchanged, bound the partition count, and keep kill-and-restart replay
byte-identical when a compaction lands BETWEEN the crash and the
restart — the r15 verdict's 'done' bar."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from radmapper_spark.streaming import compaction, crawl, ingest


def _batch_parts(path):
    return sorted(int(d.split("=")[1]) for d in os.listdir(path)
                  if d.startswith("_rm_batch_id="))


def _write_state(spark, path, schema, rows_by_batch):
    rows = [(*r, b) for b, rs in rows_by_batch.items() for r in rs]
    (spark.createDataFrame(rows, schema)
     .write.mode("overwrite").partitionBy("_rm_batch_id").parquet(path))


def test_compact_url_index_preserves_membership(spark, tmp_path):
    """Distinct-membership fold: duplicate hashes across old partitions
    collapse, the partition count drops to {seed, max}, and the probe
    view (the set of hashes visible to any future batch) is unchanged."""
    path = str(tmp_path / "uidx")
    _write_state(spark, path, crawl._URL_IDX_SCHEMA, {
        -1: [(10,), (11,)],
        0: [(12,), (10,)],       # 10 replay-duplicates the seed
        1: [(13,), (12,)],       # 12 duplicates batch 0
        2: [(14,)],
    })
    before = {r["url_hash"] for r in
              spark.read.parquet(path).select("url_hash").collect()}
    res = compaction.compact_url_index(spark, path)
    assert res["batches_folded"] == 3  # -1, 0, 1 (max=2 kept)
    assert res["rows_removed"] == 2    # the two duplicate hashes
    assert _batch_parts(path) == [-1, 2]
    after = spark.read.schema(crawl._URL_IDX_SCHEMA).parquet(path)
    assert {r["url_hash"] for r in after.collect()} == before
    # the folded rows all live in the seed partition; the kept max
    # partition is untouched
    assert after.filter(F.col("_rm_batch_id") == 2).count() == 1


def test_compact_host_counts_preserves_sums(spark, tmp_path):
    """Pre-sum fold: per-host totals (the probe reduction) are exact
    before and after, including a host that only appears in folded
    partitions."""
    path = str(tmp_path / "hcnt")
    _write_state(spark, path, crawl._HOST_CNT_SCHEMA, {
        0: [("a.com", 3), ("b.com", 1)],
        1: [("a.com", 2)],
        2: [("c.com", 5)],
        3: [("a.com", 1)],
    })
    want = {("a.com", 6), ("b.com", 1), ("c.com", 5)}
    res = compaction.compact_host_counts(spark, path)
    assert res["batches_folded"] == 3 and _batch_parts(path) == [-1, 3]
    got = {(r["host"], r["n"]) for r in
           spark.read.schema(crawl._HOST_CNT_SCHEMA).parquet(path)
           .groupBy("host").agg(F.sum("n").alias("n")).collect()}
    assert got == want


def test_compact_explicit_upto_keeps_tail(spark, tmp_path):
    """An explicit watermark folds strictly below it and carries every
    later partition over untouched."""
    path = str(tmp_path / "nidx")
    _write_state(spark, path, ingest._IDX_SCHEMA, {
        -1: [(1,)], 0: [(2,)], 1: [(3,)], 2: [(4,)], 3: [(5,)],
    })
    res = compaction.compact_normhash_index(spark, path, upto=2)
    assert res["batches_folded"] == 3  # -1, 0, 1
    assert _batch_parts(path) == [-1, 2, 3]
    after = spark.read.schema(ingest._IDX_SCHEMA).parquet(path)
    assert {r["norm_hash"] for r in after.collect()} == {1, 2, 3, 4, 5}


def test_compact_upto_above_max_refused_without_optin(spark, tmp_path):
    """A watermark above the max present batch id would fold a
    possibly-uncommitted (about-to-replay) tail partition into the seed;
    that is refused unless allow_uncommitted_tail=True opts in."""
    path = str(tmp_path / "tidx")
    _write_state(spark, path, ingest._IDX_SCHEMA, {
        -1: [(1,)], 0: [(2,)], 1: [(3,)],
    })
    with pytest.raises(ValueError, match="allow_uncommitted_tail"):
        compaction.compact_normhash_index(spark, path, upto=5)
    # nothing was touched by the refusal
    assert _batch_parts(path) == [-1, 0, 1]
    # the explicit opt-in folds everything below the watermark
    res = compaction.compact_normhash_index(
        spark, path, upto=5, allow_uncommitted_tail=True)
    assert res["batches_folded"] == 3
    assert _batch_parts(path) == [-1]
    after = spark.read.schema(ingest._IDX_SCHEMA).parquet(path)
    assert {r["norm_hash"] for r in after.collect()} == {1, 2, 3}


def test_compact_noop_cases(spark, tmp_path):
    """Empty table and nothing-below-watermark are no-ops (no swap, no
    rewrite) — and the umbrella helper reports per-table results."""
    hcnt = str(tmp_path / "h")
    crawl.build_host_counts(hcnt, spark)  # empty seedless table
    res = compaction.compact_host_counts(spark, hcnt)
    assert res == {"rows_before": 0, "rows_after": 0,
                   "rows_removed": 0, "batches_folded": 0}
    uidx = str(tmp_path / "u")
    _write_state(spark, uidx, crawl._URL_IDX_SCHEMA, {-1: [(7,)]})
    both = compaction.compact_stream_state(
        spark, url_index_path=uidx, host_counts_path=hcnt)
    assert both["url_index"]["batches_folded"] == 0
    assert spark.read.schema(crawl._URL_IDX_SCHEMA).parquet(uidx) \
        .count() == 1


def test_compact_flat_layout_refused(spark, tmp_path):
    """A flat (un-partitioned) table is refused, mirroring the loops'
    start-time guard — compacting it would launder the broken layout
    into a 'valid-looking' seed whose history the probes then trust."""
    path = str(tmp_path / "flat")
    (spark.range(3).select(F.col("id").alias("url_hash"))
     .write.mode("overwrite").parquet(path))
    with pytest.raises(ValueError, match="flat layout"):
        compaction.compact_url_index(spark, path)


def _order_files_by_min_id(spark, src):
    now = time.time()
    files = sorted(os.path.join(src, n) for n in os.listdir(src)
                   if n.endswith(".parquet"))
    keyed = []
    for p in files:
        lo = spark.read.parquet(p).agg(F.min("doc_id")).collect()[0][0]
        keyed.append((lo, p))
    for rank, (_, p) in enumerate(sorted(keyed)):
        os.utime(p, (now - 600 + rank * 60,) * 2)


def _drop_newest_commit(ckpt):
    commits = os.path.join(ckpt, "commits")
    newest = max((n for n in os.listdir(commits) if n.isdigit()),
                 key=int)
    os.remove(os.path.join(commits, newest))
    crc = os.path.join(commits, f".{newest}.crc")
    if os.path.exists(crc):
        os.remove(crc)


def test_crawl_kill_compact_restart_byte_identical(spark, tmp_path):
    """THE contract test (r15 verdict item #1): kill the crawl stream
    before its final commit, compact BOTH state tables at the default
    watermark, restart — the replayed batch must see exactly the
    pre-crash probe view through the folded seed, so admitted output
    rows are byte-identical and probe views (url membership, host
    sums) unchanged."""
    # varied words: a repeated trigram body would (correctly) fail the
    # r16 Gopher repetition rules inside the extraction gate
    body = " ".join(f"science{i} data{i} knowledge{i}" for i in range(25))
    html = ("<p>" + body + " It must be of the data and that will "
            "have merge with scan.</p>")
    batches = [
        [(0, "https://h0.com/a", html), (1, "https://h0.com/b", html)],
        [(10, "https://h0.com/c", html), (11, "https://h1.com/a", html)],
        # 20 duplicates batch 0's resource (must stay rejected via the
        # FOLDED index); 21 hits h0's last budget slot (cap=3 means the
        # folded counts must still show 3 consumed -> rejected)
        [(20, "https://H0.com/a?utm_source=x", html),
         (21, "https://h0.com/d", html),
         (22, "https://h1.com/b", html)],
    ]
    schema = "doc_id long, url string, html string"
    src = str(tmp_path / "in")
    for i, rows in enumerate(batches):
        (spark.createDataFrame(rows, schema).coalesce(1)
         .write.mode("append" if i else "overwrite").parquet(src))
    _order_files_by_min_id(spark, src)

    uidx, hcnt = str(tmp_path / "uidx"), str(tmp_path / "hcnt")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    crawl.build_url_index(spark.createDataFrame([], schema), uidx)
    crawl.build_host_counts(hcnt, spark)

    def run():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = crawl.start_crawl_ingest(stream, uidx, hcnt, out, ckpt,
                                     host_cap=3, min_tokens=5)
        try:
            assert q.awaitTermination(180), "stream did not finish"
        finally:
            q.stop()

    run()
    out_cols = ["doc_id", "canonical_url", "host", "extracted_text",
                "_rm_batch_id"]
    out_before = sorted(map(tuple, spark.read.parquet(out)
                            .select(*out_cols).collect()))
    assert {r[0] for r in out_before} == {0, 1, 10, 11, 22}
    idx_before = {r["url_hash"] for r in
                  spark.read.parquet(uidx).collect()}
    cnt_before = {(r["host"], r["n"]) for r in
                  spark.read.parquet(hcnt).groupBy("host")
                  .agg(F.sum("n").alias("n")).collect()}

    # kill (drop the final commit), THEN compact, THEN restart
    _drop_newest_commit(ckpt)
    res = compaction.compact_stream_state(
        spark, url_index_path=uidx, host_counts_path=hcnt)
    # the to-be-replayed batch (the max id, 2) must have been kept as
    # its own standalone partition — folding it would let the replay
    # see its own half-written state as "prior"
    assert res["url_index"]["batches_folded"] >= 2
    assert _batch_parts(uidx) == [-1, 2]
    assert _batch_parts(hcnt) == [-1, 2]
    run()

    assert sorted(map(tuple, spark.read.parquet(out)
                      .select(*out_cols).collect())) == out_before
    assert {r["url_hash"] for r in
            spark.read.parquet(uidx).collect()} == idx_before
    assert {(r["host"], r["n"]) for r in
            spark.read.parquet(hcnt).groupBy("host")
            .agg(F.sum("n").alias("n")).collect()} == cnt_before
    # and the state tables are actually SMALLER in partitions now
    assert len(_batch_parts(uidx)) <= 3


def test_ingest_kill_compact_restart_byte_identical(spark, tmp_path):
    """Same contract for the text-ingest loop's norm-hash index: a
    compaction between crash and restart must not change the replayed
    batch's admitted set (the folded seed carries every earlier
    committed batch's hashes, the replayed batch's own partition stays
    excluded)."""
    from radmapper_spark.operators import classifier, tokenizer

    prose = "good clean prose about science and knowledge"
    rows = [
        (0, f"{prose} alpha zero"), (1, f"{prose} beta one"),
        (10, f"{prose} gamma two"), (11, f"  {prose}   alpha zero "),
        (20, f"{prose} gamma two"), (21, f"{prose} delta three"),
    ]
    schema = "doc_id long, text string"
    docs = spark.createDataFrame(rows, schema)
    vocab, consts = classifier.nb_model(
        docs, spark.createDataFrame(
            [(100, "buy now spam offer cheap pills")], schema))
    vocab = vocab.persist()
    try:
        params = classifier.nb_model_params(consts)
        merges = tokenizer.bpe_train(docs, n_merges=4, top_words=16)
        src = str(tmp_path / "in")
        for i in range(3):
            (spark.createDataFrame(rows[2 * i:2 * i + 2], schema)
             .coalesce(1)
             .write.mode("append" if i else "overwrite").parquet(src))
        _order_files_by_min_id(spark, src)
        idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
        ckpt = str(tmp_path / "ck")
        ingest.build_normhash_index(docs.limit(0), idx)

        def run():
            stream = (spark.readStream.schema(schema)
                      .option("maxFilesPerTrigger", 1).parquet(src))
            q = ingest.start_training_ingest(
                stream, idx, out, ckpt, merges, vocab, params,
                chunk_tokens=8, n_shards=4)
            try:
                assert q.awaitTermination(180), "stream did not finish"
            finally:
                q.stop()

        run()
        before = sorted(map(tuple, spark.read.parquet(out).collect()))
        # dedup semantics (the part compaction must preserve): only the
        # 4 DISTINCT texts claim index slots — 11 and 20 are cross/in-
        # batch duplicates; the NB/Pareto gate then admits a subset
        # (which subset is the classifier tests' business, not this
        # one's)
        kept = {r[0] for r in before}
        assert kept and kept <= {0, 1, 10, 21} and 20 not in kept
        assert spark.read.schema(ingest._IDX_SCHEMA).parquet(idx) \
            .select("norm_hash").distinct().count() == 4
        _drop_newest_commit(ckpt)
        res = compaction.compact_normhash_index(spark, idx)
        assert res["batches_folded"] >= 2
        run()
        assert sorted(map(tuple,
                          spark.read.parquet(out).collect())) == before
        # seed + the replayed batch only — everything earlier folded
        assert _batch_parts(idx) == [-1, 2]
    finally:
        vocab.unpersist()
