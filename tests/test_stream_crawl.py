"""Streaming crawl admission (streaming/crawl.py): the composed loop —
persisted-URL-index dedup -> cross-batch host cap -> extraction ->
C4 floor -> Gopher gate — equals the batch twin entry across multiple
micro-batches, cross-batch URL rejections and host budgets actually
land, and a kill-and-restart replay is byte-identical."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from radmapper_spark import entrypoints as ep
from radmapper_spark.operators import web
from radmapper_spark.streaming import crawl

SF = "/root/testdata/sf0.001"


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


def _rows_of(spark, path, cols):
    return sorted(tuple(str(x) for x in r) for r in
                  spark.read.parquet(path).select(*cols).collect())


def test_stream_crawl_differential_vs_batch_twin(spark, tmp_path):
    """Four id-ordered micro-batches of synthesized fetched pages
    through the full admission loop == the stream_crawl_ingest batch
    entry, row for row — the host budget and the canonical-URL dedup
    must both hold ACROSS batch boundaries (the synth_url fixture's
    3-variant resources and 7 hosts straddle every batch split)."""
    docs = ep.load_tables(spark, SF)["documents"]
    pages = docs.select(
        "doc_id",
        web.synth_url(F.col("doc_id")).alias("url"),
        web.synth_html(F.col("doc_id"), F.col("text"),
                       F.col("source")).alias("html"))
    src = str(tmp_path / "pages_in")
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    for b in range(4):
        lo, hi = b * n // 4, (b + 1) * n // 4
        (pages.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
         .coalesce(1).write
         .mode("append" if b else "overwrite").parquet(src))
    _order_files_by_min_id(spark, src)

    url_idx = str(tmp_path / "url_idx")
    host_cnt = str(tmp_path / "host_cnt")
    out_path = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    crawl.build_url_index(pages.limit(0), url_idx)
    crawl.build_host_counts(host_cnt, spark)
    stream = (spark.readStream.schema(pages.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = crawl.start_crawl_ingest(
        stream, url_idx, host_cnt, out_path, ckpt,
        host_cap=ep._STREAM_CRAWL_CAP, min_tokens=60)
    try:
        assert q.awaitTermination(300), "stream did not finish"
        n_batches = len([p for p in q.recentProgress
                         if p["numInputRows"] > 0])
    finally:
        q.stop()
    assert n_batches >= 4, f"expected >= 4 micro-batches, {n_batches}"

    cols = ["doc_id", "canonical_url", "host", "n_lines_kept",
            "n_extracted_tokens", "extracted_text"]
    got = _rows_of(spark, out_path, cols)
    want = sorted(tuple(str(x) for x in r) for r in
                  ep.stream_crawl_ingest(spark, SF)
                  .select(*cols).collect())
    assert got == want and len(got) > 0
    # the url index holds one hash per DISTINCT canonical url (every
    # fetched resource claims its slot even when the cap or the gate
    # rejects the page), spread across batch partitions
    idx = spark.read.parquet(url_idx)
    n_canon = (web.canonicalize_urls(pages)
               .filter(F.col("canonical_url").isNotNull())
               .select("canonical_url").distinct().count())
    assert idx.count() == n_canon
    assert idx.select("url_hash").distinct().count() == n_canon
    # host budgets were actually consumed across batches: total
    # admitted per host == min(cap, distinct resources on that host)
    cnt = (spark.read.parquet(host_cnt).groupBy("host")
           .agg(F.sum("n").alias("n")).collect())
    assert cnt and all(r["n"] <= ep._STREAM_CRAWL_CAP for r in cnt)

    # ---- kill-and-restart REPLAY: drop the newest commit marker so
    # the final micro-batch replays; output AND both state tables must
    # be byte-identical (dynamic-partition-overwrite idempotence with
    # self-partition-excluded state reads)
    out_before = _rows_of(spark, out_path,
                          cols + ["_rm_batch_id"])
    idx_before = _rows_of(spark, url_idx,
                          ["url_hash", "_rm_batch_id"])
    cnt_before = _rows_of(spark, host_cnt,
                          ["host", "n", "_rm_batch_id"])
    commits = os.path.join(ckpt, "commits")
    newest = max((x for x in os.listdir(commits) if x.isdigit()),
                 key=int)
    os.remove(os.path.join(commits, newest))
    crc = os.path.join(commits, f".{newest}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    stream2 = (spark.readStream.schema(pages.schema)
               .option("maxFilesPerTrigger", 1).parquet(src))
    q2 = crawl.start_crawl_ingest(
        stream2, url_idx, host_cnt, out_path, ckpt,
        host_cap=ep._STREAM_CRAWL_CAP, min_tokens=60)
    try:
        assert q2.awaitTermination(180), "replay run did not finish"
    finally:
        q2.stop()
    assert _rows_of(spark, out_path, cols + ["_rm_batch_id"]) \
        == out_before
    assert _rows_of(spark, url_idx,
                    ["url_hash", "_rm_batch_id"]) == idx_before
    assert _rows_of(spark, host_cnt,
                    ["host", "n", "_rm_batch_id"]) == cnt_before


def test_stream_crawl_cross_batch_url_and_host_budget(spark, tmp_path):
    """Hand-built two-batch case: a later batch's noisy variant of an
    earlier batch's resource is rejected by the persisted URL index,
    and a host whose budget was partially consumed in batch 0 only
    admits the REMAINDER in batch 1 (arrival order)."""
    # varied words (a repeated trigram would fail the r16 repetition
    # rules in the gate)
    body = " ".join(f"science{i} data{i} knowledge{i}"
                    for i in range(25))  # > 50 words so
    # the Gopher word floor passes and dedup/cap are the only filters
    html = ("<p>" + body + " It must be of the data and that will "
            "have merge with scan.</p>")
    rows0 = [(0, "https://h0.com/a?x=1", html),
             (1, "https://h0.com/b", html),
             (2, "https://h1.com/a", html)]
    rows1 = [
        # 10: variant of doc 0's resource (case + fragment + utm) —
        # canonicalizes identically, must be rejected by the INDEX
        (10, "HTTPS://H0.com/a?utm_source=z&x=1#frag", html),
        # 11: fresh resource on h0 — h0's budget (cap=3) has 2 consumed
        # in batch 0, so exactly ONE of 11/12 is admitted (doc order)
        (11, "https://h0.com/c", html),
        (12, "https://h0.com/d", html),
        # 13: fresh on h1 (1 consumed, fits)
        (13, "https://h1.com/b", html),
    ]
    schema = "doc_id long, url string, html string"
    src = str(tmp_path / "in")
    spark.createDataFrame(rows0, schema).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    spark.createDataFrame(rows1, schema).coalesce(1) \
        .write.mode("append").parquet(src)
    _order_files_by_min_id(spark, src)

    url_idx = str(tmp_path / "uidx")
    host_cnt = str(tmp_path / "hcnt")
    crawl.build_url_index(
        spark.createDataFrame([], schema), url_idx)
    crawl.build_host_counts(host_cnt, spark)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = crawl.start_crawl_ingest(
        stream, url_idx, host_cnt, str(tmp_path / "out"),
        str(tmp_path / "ck"), host_cap=3, min_tokens=5)
    try:
        assert q.awaitTermination(180), "stream did not finish"
    finally:
        q.stop()
    kept = {r["doc_id"] for r in
            spark.read.parquet(str(tmp_path / "out")).collect()}
    # 10 rejected by the URL index; 12 by the exhausted h0 budget
    # (0, 1 in batch 0 + 11 in batch 1 = cap 3); everything else in
    assert kept == {0, 1, 2, 11, 13}
