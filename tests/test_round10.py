"""Round-10 verification: the lm.py wiring (VERDICT r9 item #1) and the
round's robustness fixes. The lm entries' full-corpus oracle equality at
sf0.001 runs in test_headline's parametrized sweep; the tests here pin
the EDGES the sweep can't reach (empty reference, short docs, tie
determinism) and the engine-exactness contract (lp_micro is a BIGINT
micro-nat sum — parallelism-independent)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from radmapper_spark.operators import lm
from tests.conftest import SF_SMOKE
from tests.oracle import assert_matches_oracle, duck_conn

REF_PRED = "source IN ('src0', 'src1', 'src2')"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------------------ lm edges

def test_lm_score_empty_reference(spark):
    """An empty reference slice must not crash (coalesce guards in the
    consts aggregate): every position falls to the OOV floor with
    n_uni=1, v=1."""
    docs = _docs(spark, [(1, "alpha beta gamma")])
    ref = _docs(spark, []).filter(F.lit(False))
    out = lm.lm_score(docs, ref).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_scored, r.n_hit, r.n_backoff, r.n_oov) == (2, 0, 0, 2)
    # OOV floor with empty model: ln(0.4 / (1 + 1)) per position
    import math
    expect = math.floor(math.log(0.4 / 2.0) * 1e6) * 2
    assert r.lp_micro == expect


def test_lm_score_short_docs_excluded(spark):
    """Docs with < 2 tokens contribute no positions and emit NO row —
    mirrored by the oracle's len(t) >= 2 guard."""
    docs = _docs(spark, [(1, "solo"), (2, ""), (3, "two tokens"),
                         (4, "numbers 123 only 456")])
    ref = _docs(spark, [(9, "two tokens two tokens")])
    got = {r.doc_id for r in lm.lm_score(docs, ref).collect()}
    assert got == {3, 4}


def test_lm_score_branch_accounting(spark):
    """hit / backoff / oov partition the positions exactly."""
    ref = _docs(spark, [(9, "the cat sat the cat ran")])
    docs = _docs(spark, [(1, "the cat sat zzz")])
    r = lm.lm_score(docs, ref, min_bigram=2).collect()[0]
    # positions: (the,cat) c_ab=2 -> hit; (cat,sat) c_ab=1 < min_bigram
    # -> backoff (sat in vocab); (sat,zzz) -> oov (zzz unseen)
    assert (r.n_scored, r.n_hit, r.n_backoff, r.n_oov) == (3, 1, 1, 1)


def test_lm_score_parallelism_independent(spark):
    """lp_micro is a BIGINT sum of per-position floored micro-nats —
    repartitioning the corpus must not change a single bit."""
    docs = entrymod.load_tables(spark, SF_SMOKE)["documents"]
    ref = docs.filter(F.expr(REF_PRED))
    a = {r.doc_id: r.lp_micro
         for r in lm.lm_score(docs, ref).collect()}
    b = {r.doc_id: r.lp_micro
         for r in lm.lm_score(docs.repartition(17), ref).collect()}
    assert a == b


def test_lm_bucket_tercile_vs_duckdb_ntile(spark):
    """head/middle/tail equality against DuckDB's ntile — the bucket
    boundary is where a distributed ntile diverges first. Run at
    sf0.001 via the entry itself (full-path check incl. release)."""
    df = entrymod.queries()["lm_bucket"](spark, SF_SMOKE)
    assert_matches_oracle(df, entrymod.oracle_sql()["lm_bucket"],
                          SF_SMOKE)
    rel = getattr(df, "rm_release_cache", None)
    assert rel is not None, "lm_bucket lost the ntile cache release handle"
    rel()


def test_lm_bucket_tie_determinism(spark):
    """Identical docs (identical lp_micro/n_scored keys) must bucket by
    doc_id order — the tercile is deterministic, never partition-luck."""
    rows = [(i, "same words repeated here") for i in range(1, 10)]
    docs = _docs(spark, rows)
    ref = _docs(spark, [(0, "same words repeated here same words")])
    out = lm.lm_bucket(lm.lm_score(docs, ref))
    got = {r.doc_id: r.bucket for r in out.collect()}
    rel = getattr(out, "rm_release_cache", None)
    if rel is not None:
        rel()
    assert got == {1: "head", 2: "head", 3: "head",
                   4: "middle", 5: "middle", 6: "middle",
                   7: "tail", 8: "tail", 9: "tail"}


def test_lm_vocab_cut_is_integer_ordered(spark):
    """The top_v vocabulary cut orders on (count desc, term asc) —
    deterministic under ties, never a float rank."""
    ref = _docs(spark, [(9, "bb aa bb aa cc")])
    docs = _docs(spark, [(1, "aa bb cc")])
    # top_v=2 keeps {aa, bb} (tie on count=2 breaks alphabetically
    # irrelevant here; cc count=1 is cut) -> (bb,cc) position is OOV
    r = lm.lm_score(docs, ref, top_v=2, min_bigram=1).collect()[0]
    assert r.n_oov == 1


def test_lm_score_matches_oracle_sf001(spark):
    """Belt-and-braces: the lm_score entry's oracle equality (also run
    by test_headline's sweep — kept here so the round-10 file fails
    standalone if the wiring regresses)."""
    df = entrymod.queries()["lm_score"](spark, SF_SMOKE)
    assert_matches_oracle(df, entrymod.oracle_sql()["lm_score"],
                          SF_SMOKE)


# ------------------------------------------- substring hash-first join key

def _span_modes(spark, sf_dir, span_mode="arrow"):
    from radmapper_spark.operators import dedup
    t = entrymod.load_tables(spark, sf_dir)
    return {mode: dedup.repeated_span_pairs(t["documents"], key_mode=mode,
                                            span_mode=span_mode)
            for mode in ("hash", "text")}


def test_span_key_modes_value_identical(spark):
    """All four (key_mode x span_mode) combinations must produce
    identical pairs — neither the join key nor the window-explode
    implementation ever reaches the output. sf0.001 here; sf0.01/0.1
    in the gated sweep via the entry (hash+arrow) vs the string-keyed
    pure-SQL oracle."""
    ref = None
    for sm in ("arrow", "catalyst"):
        for mode, df in _span_modes(spark, SF_SMOKE, sm).items():
            rows = sorted(map(tuple, df.collect()))
            if ref is None:
                ref = rows
            assert rows and rows == ref, f"{mode}/{sm} diverged"


def test_span_hash_key_plan_shape(spark):
    """Hash mode must (1) actually key on xxhash64 and (2) not buy an
    extra exchange over text mode — the materialized-column trick is
    what keeps the subset rule satisfied (one span-keyed exchange
    serving distinct + df-count + self-join). Asserted for BOTH
    window-explode implementations: the arrow path is what production
    runs, and a regression in its mapInPandas/repartition subset-rule
    interaction must not hide behind a catalyst-only guard."""
    for sm in ("arrow", "catalyst"):
        dfs = _span_modes(spark, SF_SMOKE, sm)
        plans = {m: df._jdf.queryExecution().executedPlan().toString()
                 for m, df in dfs.items()}
        assert "xxhash64" in plans["hash"], sm
        assert "xxhash64" not in plans["text"], sm
        assert (plans["hash"].count("Exchange")
                == plans["text"].count("Exchange")), sm


def test_span_key_mode_validation(spark):
    from radmapper_spark.operators import dedup
    t = entrymod.load_tables(spark, SF_SMOKE)
    with pytest.raises(ValueError, match="key_mode"):
        dedup.repeated_span_pairs(t["documents"], key_mode="bogus")


# -------------------------------------- index-meta sidecar fingerprint

def test_sidecar_fingerprint_differs_across_rewrites(spark, tmp_path):
    """The cache-validity fingerprint must change on EVERY rewrite even
    when the directory mtime does not move (coarse-granularity
    filesystems — the r9 advisory finding). The structural guarantee:
    Spark part-file names carry a fresh per-write UUID, and the
    fingerprint includes child names, so equal mtimes cannot alias two
    sidecar generations."""
    from radmapper_spark.operators import index_meta as im
    p = str(tmp_path / "idx")
    im.write_index_meta(spark, p, "k", {"bands": 8})
    fp1 = im._meta_fingerprint(spark, f"{p}/_meta")
    im.write_index_meta(spark, p, "k", {"bands": 16})
    fp2 = im._meta_fingerprint(spark, f"{p}/_meta")
    names1 = {n for n, _l, _m in fp1[1]}
    names2 = {n for n, _l, _m in fp2[1]}
    # even if mtimes collided, the part-file name sets differ
    assert names1 != names2
    assert fp1 != fp2
    # and the cache actually re-reads: external rewrite visible
    assert im.read_index_meta(spark, p)["bands"] == 16


# -------------------------------------------------- r10 advisory fixes

def test_graph_broadcast_count_memoized_across_fresh_frames(spark):
    """_resolve_broadcast must not pay a count job on REPEATED
    constructions over semantically-equal (but fresh) node frames —
    the semanticHash memo keeps construction job-free after the first
    auto-path resolve."""
    from radmapper_spark.operators import graph
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def fresh_nodes():
        return spark.range(500).select(
            F.col("id").cast("string").alias("node"))

    graph._NODE_COUNT_CACHE.clear()
    assert graph._resolve_broadcast(None, fresh_nodes()) is True  # pays
    sc.setJobGroup("g_memo", "g_memo")
    try:
        assert graph._resolve_broadcast(None, fresh_nodes()) is True
    finally:
        sc.setJobGroup(None, None)
    assert len(tracker.getJobIdsForGroup("g_memo")) == 0, (
        "second construction over an equivalent node table ran a job")


def test_gram_nan_element_raises_by_name(spark):
    """A NaN/null ELEMENT inside a vector must fail with a message
    naming the input problem, not an opaque int-conversion error from
    the chunk-size computation (NaN silently skips the magnitude
    guard)."""
    from radmapper_spark.operators import linalg
    bad = spark.createDataFrame(
        [(1, [1.0, None]), (2, [0.5, 0.5])],
        "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="NaN or null ELEMENT"):
        linalg.gram_matrix(bad, "embedding").collect()
    with pytest.raises(Exception, match="NaN or null ELEMENT"):
        linalg.column_sums(bad, "embedding").collect()


def test_guarded_bigint_overflow_raises_not_nulls(spark):
    """The embedding_gram entry's decimal->BIGINT boundary must raise
    loudly on overflow (default-mode Spark silently NULLs the cast)."""
    from radmapper_spark.entrypoints import _guarded_bigint
    df = spark.createDataFrame(
        [("1", "99999999999999999999"),
         ("2", "42")], "i string, v string").select(
        "i", F.col("v").cast("decimal(38,0)").alias("v"))
    ok = df.filter(F.col("i") == "2").select(
        _guarded_bigint(F.col("v"), F.lit("boom")).alias("b")).collect()
    assert ok[0].b == 42
    with pytest.raises(Exception, match="boom"):
        df.select(_guarded_bigint(F.col("v"), F.lit("boom"))).collect()


def test_opq_fit_never_evicts_plain_pq_books(spark):
    """VERDICT r9 watch item: the OPQ entry's codebook-cache traffic
    must not evict the plain-PQ books between bench passes. Structural
    guarantee under test: _CODEBOOK_CACHE has NO implicit eviction —
    only release_codebooks(cache_key) removes entries — and the OPQ
    keys (rotated '_rv' vec_col + 'opq_rot' kind) can never collide
    with plain-PQ keys under the same corpus key."""
    import numpy as np
    from radmapper_spark.operators import similarity
    t = entrymod.load_tables(spark, SF_SMOKE)
    q = (t["embeddings"].orderBy("vec_id").limit(3)
         .select(F.col("vec_id").alias("qid"), "embedding"))
    ck = "pq-evict-probe"
    similarity.release_codebooks(ck)
    similarity.pq_topk(t["embeddings"], q, k=5, m=16, ksub=16,
                       rerank=8, cache_key=ck).collect()
    pq_keys = {k for k in similarity._CODEBOOK_CACHE if k[0] == ck}
    pq_books = {k: similarity._CODEBOOK_CACHE[k] for k in pq_keys}
    assert pq_keys, "plain-PQ fit did not populate the cache"
    similarity.opq_topk(t["embeddings"], q, k=5, m=16, ksub=16,
                        rerank=8, cache_key=ck).collect()
    after = set(similarity._CODEBOOK_CACHE)
    assert pq_keys <= after, "OPQ fit evicted plain-PQ codebooks"
    for k in pq_keys:  # same objects — not refit, not replaced
        assert similarity._CODEBOOK_CACHE[k] is pq_books[k]
    assert {k for k in after if k[0] == ck} - pq_keys, \
        "OPQ fit cached nothing of its own"
    similarity.release_codebooks(ck)


# ------------------------------------------------ Moore-Lewis selection

def test_moore_lewis_prefers_in_domain(spark):
    """Cross-entropy difference must rank documents that look like the
    in-domain reference ABOVE fluent-but-generic ones — the property
    raw-perplexity selection lacks (Moore & Lewis 2010)."""
    from radmapper_spark.operators import lm
    in_ref = _docs(spark, [(100, "the quantum flux capacitor aligns "
                                 "the quantum flux field")])
    out_ref = _docs(spark, [(200, "the cat sat on the mat and the dog "
                                  "ran in the park")])
    docs = _docs(spark, [
        (1, "the quantum flux capacitor aligns nicely"),   # in-domain
        (2, "the cat sat on the mat"),                     # out-domain
        (3, "the quantum field aligns the flux"),          # in-domain
    ])
    got = {r.doc_id: r.sel_rank
           for r in lm.moore_lewis_select(docs, in_ref, out_ref,
                                          k=3).collect()}
    assert got[2] == 3, "generic doc must rank last"
    assert set(got) == {1, 2, 3}


def test_moore_lewis_k_validation(spark):
    from radmapper_spark.operators import lm
    docs = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError, match="k must be positive"):
        lm.moore_lewis_select(docs, docs, docs, k=0)


def test_moore_lewis_matches_oracle_sf001(spark):
    df = entrymod.queries()["moore_lewis_select"](spark, SF_SMOKE)
    assert_matches_oracle(
        df, entrymod.oracle_sql()["moore_lewis_select"], SF_SMOKE)


# ------------------------------------------- substring removal spans

def test_removal_spans_semantics(spark):
    """Hand-built corpus: a shared 6-token run produces exactly its
    char interval in both docs; overlapping duplicated spans merge
    into ONE island; text unique to a doc is never cut."""
    from radmapper_spark.operators import dedup
    shared = "one two three four five six"          # 6 shared tokens
    d1 = f"alpha {shared} omega"
    d2 = f"{shared} zulu"
    docs = _docs(spark, [(1, d1), (2, d2)])
    out = {(r.doc_id): (r.cut_start, r.cut_end, r.n_spans)
           for r in dedup.substring_removal_spans(
               docs, span_tokens=6, min_doc_freq=2).collect()}
    # doc 1: 'alpha ' is 6 chars -> shared run at [6, 6+len(shared))
    assert out[1] == (6, 6 + len(shared), 1)
    # doc 2: run starts at 0
    assert out[2] == (0, len(shared), 1)


def test_removal_spans_merge_overlapping(spark):
    """Two overlapping duplicated windows merge into one cut range
    with n_spans = 2; a doc-unique middle never splits it."""
    from radmapper_spark.operators import dedup
    run = "a b c d"                                  # 4 tokens
    docs = _docs(spark, [(1, f"{run} x"), (2, f"{run} x"),
                         (3, "q w e r t")])
    out = {r.doc_id: (r.cut_start, r.cut_end, r.n_spans)
           for r in dedup.substring_removal_spans(
               docs, span_tokens=3, min_doc_freq=2).collect()}
    # docs 1/2 share 'a b c', 'b c d', 'c d x' -> one merged interval
    # covering the whole 'a b c d x' string, 3 overlapping spans
    full = len("a b c d x")
    assert out[1] == (0, full, 3) and out[2] == (0, full, 3)
    assert 3 not in out


def test_removal_spans_self_repetition_not_cut(spark):
    """min_doc_freq counts DISTINCT docs: a span repeated inside ONE
    document only is not duplication across the corpus."""
    from radmapper_spark.operators import dedup
    docs = _docs(spark, [(1, "p q r p q r"), (2, "x y z w v u")])
    out = dedup.substring_removal_spans(
        docs, span_tokens=3, min_doc_freq=2).collect()
    assert out == []


def test_removal_spans_matches_oracle_sf001(spark):
    df = entrymod.queries()["substring_removal_spans"](spark, SF_SMOKE)
    assert_matches_oracle(
        df, entrymod.oracle_sql()["substring_removal_spans"], SF_SMOKE)
