"""Round-11 verification: the three r10 ADVICE fixes (span-kernel id
typing, signature-base parameter validation, graph node-count TTL
stamping), plus the round's new operators — tests for those live in
their own sections below as they land."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from radmapper_spark.operators import chunking, dedup, graph
from radmapper_spark.operators import multimodal as mm
from radmapper_spark.operators import tokenizer as tk


def _docs(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema)


DUPTXT = ("the quick brown fox jumps over the lazy dog again and again "
          "until the fence falls and the farmer wakes to chase it away")


# -------------------------------------------- advice 1: span-kernel id type

def test_span_ops_accept_string_doc_ids(spark):
    """r10 advice: the Arrow span kernel hardcoded 'id long'; a corpus
    with STRING doc ids must behave identically to the Catalyst path
    instead of failing with an Arrow cast error."""
    rows = [("a1", DUPTXT), ("b2", DUPTXT), ("c3", "short unrelated")]
    docs = _docs(spark, rows, "doc_id string, text string")
    arrow = dedup.repeated_span_pairs(docs, span_tokens=5,
                                      span_mode="arrow").collect()
    cat = dedup.repeated_span_pairs(docs, span_tokens=5,
                                    span_mode="catalyst").collect()
    key = lambda r: (r.id_a, r.id_b, r.n_shared_spans)
    assert sorted(map(key, arrow)) == sorted(map(key, cat))
    assert arrow and arrow[0].id_a == "a1"
    cuts = dedup.substring_removal_spans(docs, span_tokens=5,
                                         min_doc_freq=2).collect()
    assert cuts and {r.doc_id for r in cuts} == {"a1", "b2"}
    assert all(isinstance(r.doc_id, str) for r in cuts)


def test_span_ops_long_ids_unchanged(spark):
    """Bigint ids keep the exact pre-fix schema (no regression)."""
    docs = _docs(spark, [(1, DUPTXT), (2, DUPTXT)])
    out = dedup.repeated_span_pairs(docs, span_tokens=5)
    assert dict(out.dtypes)["id_a"] == "bigint"
    assert out.collect()[0].n_shared_spans > 0


# ----------------------------------------- advice 2: base param validation

def test_minhash_base_param_mismatch_raises(spark):
    docs = _docs(spark, [(1, DUPTXT), (2, DUPTXT)])
    base = dedup.minhash_base(docs, num_hashes=16)
    with pytest.raises(ValueError, match="num_hashes.*base=16"):
        dedup.minhash_lsh_pairs(docs, num_hashes=32, base=base)
    # matching params pass through
    ok = dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=8, base=base)
    assert ok.count() == 1


def test_minhash_attrless_base_sample_check(spark):
    """A base frame that lost its attr (round-tripped through a select)
    still fails loudly via the one-row signature-length probe."""
    docs = _docs(spark, [(1, DUPTXT), (2, DUPTXT)])
    stripped = dedup.minhash_base(docs, num_hashes=16).select("id", "minhash")
    assert getattr(stripped, "rm_base_params", None) is None
    with pytest.raises(ValueError, match="16-hash"):
        dedup.minhash_lsh_pairs(docs, num_hashes=32, base=stripped)


def test_simhash_base_param_mismatch_raises(spark):
    docs = _docs(spark, [(1, DUPTXT), (2, DUPTXT)])
    base = dedup.simhash_base(docs, hash_mode="portable", nbits=60)
    with pytest.raises(ValueError, match="hash_mode"):
        dedup.simhash_pairs(docs, hash_mode="xxhash64", base=base)


def test_sign_lsh_base_param_mismatch_raises(spark):
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.5, -0.25]) for i in range(4)],
        "vec_id long, embedding array<float>")
    base = dedup.sign_lsh_base(emb, bands=32, planes_per_band=8)
    with pytest.raises(ValueError, match="bands"):
        dedup.embedding_cosine_pairs(emb, bands=64, planes_per_band=8,
                                     base=base)


# ------------------------------------------- advice 3: node-count TTL stamp

def test_plain_int_node_count_attr_expires(spark, monkeypatch):
    """r10 advice: a caller-set plain-int rm_node_count must be stamped
    ONCE (TTL clock starts at first observation), not re-stamped per
    call — else it never expires for legacy int-attr callers."""
    nodes = spark.range(3).select(F.col("id").alias("node"))
    nodes.rm_node_count = 3  # legacy caller-set plain int
    assert graph._resolve_broadcast(None, nodes) is True
    stamped = nodes.rm_node_count
    assert isinstance(stamped, tuple) and stamped[1] == 3
    # second resolve must NOT refresh the stamp
    graph._resolve_broadcast(None, nodes)
    assert nodes.rm_node_count[0] == stamped[0]
    # age the stamp past the TTL: the resolve re-counts and re-stamps
    nodes.rm_node_count = (stamped[0] - graph._NODE_COUNT_TTL_S - 1, 3)
    graph._NODE_COUNT_CACHE.clear()
    assert graph._resolve_broadcast(None, nodes) is True
    assert nodes.rm_node_count[0] > stamped[0] - 1  # fresh stamp after recount
    assert nodes.rm_node_count[1] == 3


# -------------------------------------------- apply_removal_spans (scrub)

def test_apply_removal_spans_semantics(spark):
    """Cuts remove exactly [cut_start, cut_end) from the NORMALIZED
    text; docs without ranges pass through normalized-intact."""
    docs = _docs(spark, [(1, "  AA bb   cc dd  "), (2, "keep me whole")])
    spans = spark.createDataFrame([(1, 3, 8)],
                                  "doc_id long, cut_start long, cut_end long")
    out = {r.doc_id: r for r in
           dedup.apply_removal_spans(docs, spans).collect()}
    # normalized doc 1 = "aa bb cc dd"; cutting [3, 8) removes "bb cc"
    assert (out[1].clean_text, out[1].n_cut, out[1].n_chars_cut) \
        == ("aa  dd", 1, 5)
    assert (out[2].clean_text, out[2].n_cut) == ("keep me whole", 0)


def test_apply_removal_spans_full_and_multi_cut(spark):
    docs = _docs(spark, [(1, "gone entirely"), (2, "a b c d e f")])
    spans = spark.createDataFrame(
        [(1, 0, 13), (2, 0, 3), (2, 6, 9)],
        "doc_id long, cut_start long, cut_end long")
    out = {r.doc_id: r for r in
           dedup.apply_removal_spans(docs, spans).collect()}
    assert (out[1].clean_text, out[1].n_chars_cut) == ("", 13)
    # "a b c d e f" minus [0,3)="a b" and [6,9)="d e": kept pieces are
    # s[3:6]=" c " and s[9:]=" f" (cuts are literal intervals — the
    # surrounding separators survive)
    assert (out[2].n_cut, out[2].n_chars_cut) == (2, 6)
    assert out[2].clean_text == " c  f"


def test_scrub_roundtrip_removes_duplicated_runs(spark):
    """End-to-end: the scrubbed corpus has NO remaining k-token run
    shared by >= 2 docs (the Lee et al. fixpoint property on docs whose
    duplicated material is contiguous)."""
    k = 6
    docs = _docs(spark, [
        (1, DUPTXT), (2, DUPTXT + " unique tail one"),
        (3, "prefix three " + DUPTXT), (4, "totally unrelated text here")])
    spans = dedup.substring_removal_spans(docs, span_tokens=k,
                                          min_doc_freq=2)
    clean = dedup.apply_removal_spans(docs, spans).select(
        "doc_id", F.col("clean_text").alias("text"))
    again = dedup.substring_removal_spans(clean, span_tokens=k,
                                          min_doc_freq=2).collect()
    assert again == []


def test_scrub_chains_into_doc_chunks(spark):
    """Composability (r10 verdict item #2): the scrubbed corpus feeds
    chunking directly — chunk text comes from clean_text only."""
    docs = _docs(spark, [(1, DUPTXT + " alpha beta gamma delta"),
                         (2, DUPTXT)])
    spans = dedup.substring_removal_spans(docs, span_tokens=6,
                                          min_doc_freq=2)
    clean = dedup.apply_removal_spans(docs, spans)
    chunks = chunking.chunk_documents(
        clean.select("doc_id", F.col("clean_text").alias("text")),
        chunk_tokens=4, overlap=0)
    got = chunks.filter(F.col("doc_id") == 1).orderBy("chunk_seq").collect()
    assert got and all("quick" not in c.chunk_text for c in got)
    assert "alpha" in got[0].chunk_text


# ------------------------------------------- perceptual-hash image near-dup

def _media(spark, rows):
    return spark.createDataFrame(rows, "media_id long, text string") \
        .select("media_id", F.encode("text", "UTF-8").alias("payload"))


def _ref_phash(text, pixels=61, bits=60):
    """Independent pure-Python reference of the fake-decode dHash."""
    cp = [ord(c) for c in text]
    L = len(cp)
    px = [sum(cp[(i * L) // pixels:((i + 1) * L) // pixels]) % 256
          for i in range(pixels)]
    return sum((1 << i) for i in range(bits) if px[i + 1] > px[i])


def test_perceptual_hash_matches_reference(spark):
    texts = ["some sample document text here", "x", "aa " * 100]
    media = _media(spark, list(enumerate(texts)))
    got = {r.media_id: r.phash for r in mm.perceptual_hash(media).collect()}
    assert got == {i: _ref_phash(t) for i, t in enumerate(texts)}
    # non-negative 60-bit: the portable-hash convention
    assert all(0 <= h < (1 << 60) for h in got.values())


def test_phash_banding_recall_exact_under_max_hamming(spark):
    """Pigeonhole recall: EVERY pair within hamming <= 3 must be found
    by the banded join — compare against a brute-force popcount over
    all pairs of hashes."""
    from itertools import combinations
    base = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed "
            "do eiusmod tempor incididunt ut labore et dolore magna")
    # perturbations: same length (chunk boundaries stable) with small
    # character nudges -> small, varied hamming distances
    texts = [base]
    for i, ch in [(3, "f"), (9, "t"), (17, "z"), (30, "q"), (55, "m")]:
        texts.append(base[:i] + ch + base[i + 1:])
    texts += ["totally different content here entirely unrelated words",
              base[::-1]]
    media = _media(spark, list(enumerate(texts)))
    hashes = {r.media_id: r.phash
              for r in mm.perceptual_hash(media).collect()}
    brute = {(a, b): bin(hashes[a] ^ hashes[b]).count("1")
             for a, b in combinations(sorted(hashes), 2)
             if bin(hashes[a] ^ hashes[b]).count("1") <= 3}
    assert brute, "fixture must produce at least one near pair"
    got = {(r.id_a, r.id_b): r.hamming
           for r in mm.phash_neardup_pairs(media, max_hamming=3).collect()}
    assert got == brute


def test_perceptual_hash_drops_empty_payloads(spark):
    media = spark.createDataFrame(
        [(1, b""), (2, None), (3, b"real content here")],
        "media_id long, payload binary")
    got = mm.perceptual_hash(media).collect()
    assert [r.media_id for r in got] == [3]


def test_perceptual_hash_raises_without_fake_decode(spark, monkeypatch):
    """Production contract: no PIL + RM_MM_FAKE_DECODE unset -> the task
    raises instead of silently faking (same boundary as
    extract_features)."""
    monkeypatch.setenv("RM_MM_FAKE_DECODE", "0")
    media = _media(spark, [(1, "text")])
    try:
        import PIL  # noqa: F401
        pytest.skip("pillow installed; the raise path is unreachable")
    except ImportError:
        pass
    with pytest.raises(Exception, match="pillow|NotImplemented"):
        mm.perceptual_hash(media).collect()


def test_perceptual_hash_param_guards(spark):
    media = _media(spark, [(1, "text")])
    with pytest.raises(ValueError, match="bits"):
        mm.perceptual_hash(media, bits=64, pixels=65)
    with pytest.raises(ValueError, match="pixels"):
        mm.perceptual_hash(media, bits=60, pixels=60)
    with pytest.raises(ValueError, match="pigeonhole"):
        mm.phash_neardup_pairs(media, max_hamming=4, bands=4)
    with pytest.raises(ValueError, match="fit"):
        mm.phash_neardup_pairs(media, bands=5, band_bits=15, bits=60)


def test_phash_pairs_base_contract(spark):
    """The persist-the-base contract (r11 review): owned bases are
    persisted and released via rm_release_cache; caller-supplied bases
    are param-validated and never released by the operator."""
    media = _media(spark, [(1, DUPTXT), (2, DUPTXT)])
    out = mm.phash_neardup_pairs(media)
    assert out.count() == 1
    out.rm_release_cache()  # owned base: handle releases the persist
    base = mm.perceptual_hash(media, bits=50, pixels=51)
    assert base.rm_base_params == {"bits": 50}  # builder stamps
    with pytest.raises(ValueError, match="bits"):
        mm.phash_neardup_pairs(media, bits=60, base=base)
    ok = mm.phash_neardup_pairs(media, bits=50, bands=3, band_bits=15,
                                max_hamming=2, base=base)
    assert ok.count() == 1
    ok.rm_release_cache()  # caller-owned base: a no-op


# ------------------------------------------------------- BPE tokenizer

def _ref_bpe_apply(word, merges):
    """Independent pure-Python APPLY (the trainer itself is already
    pure Python; this re-implements application without the '|'
    encoding — list-based greedy left-to-right merging)."""
    toks = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def test_bpe_train_classic_example(spark):
    """The Sennrich toy corpus shape: frequent pairs merge first, ties
    break lexicographically."""
    docs = _docs(spark, [(1, "low low low lower lowest"),
                         (2, "low newer newer new")])
    merges = tk.bpe_train(docs, n_merges=4, top_words=10)
    assert merges[0] == ("l", "o")      # 'lo' appears in every word of max freq
    assert merges[1] == ("lo", "w")
    assert len(merges) == 4


def test_bpe_tokenize_matches_python_reference(spark):
    docs = _docs(spark, [
        (1, "low lower lowest newer new knowledge"),
        (2, "the low bridge is lower than the new one"),
        (3, "Mixed CASE and punct-uation, 123 numbers!")])
    merges = tk.bpe_train(docs, n_merges=10, top_words=64)
    got = {r.doc_id: r.tokens
           for r in tk.bpe_tokenize(docs, merges).collect()}
    import re
    for doc_id, text in [(1, "low lower lowest newer new knowledge"),
                         (2, "the low bridge is lower than the new one"),
                         (3, "Mixed CASE and punct-uation, 123 numbers!")]:
        words = [w for w in re.sub("[^a-z0-9]+", " ", text.lower()).split()
                 if w]
        expect = [t for w in words for t in _ref_bpe_apply(w, merges)]
        assert got[doc_id] == expect
    # counts agree with the token arrays
    counts = {r.doc_id: r.n_tokens
              for r in tk.bpe_token_counts(docs, merges).collect()}
    assert counts == {d: len(t) for d, t in got.items()}


def test_bpe_train_early_stop(spark):
    """Single-char words exhaust pairs: the merge list stops early."""
    docs = _docs(spark, [(1, "a b c a b a")])
    merges = tk.bpe_train(docs, n_merges=8, top_words=10)
    assert merges == []


def test_bpe_counts_skip_wordless_docs(spark):
    docs = _docs(spark, [(1, "real words"), (2, "!!! ??? ..."), (3, None)])
    merges = tk.bpe_train(docs, n_merges=2, top_words=10)
    assert {r.doc_id for r in tk.bpe_token_counts(docs, merges).collect()} \
        == {1}


def test_bpe_packing_budget_exactness(spark):
    """The r10 verdict 'packing test showing budget exactness': packing
    on EXACT BPE counts — every bin's fill is the exact sum of its
    members' token counts and never exceeds capacity (no estimate
    slack)."""
    docs = _docs(spark, [
        (i, f"{'low lower lowest ' * (i % 5 + 1)}document number {i}")
        for i in range(1, 21)])
    merges = tk.bpe_train(docs, n_merges=8, top_words=64)
    counts = tk.bpe_token_counts(docs, merges)
    packed = chunking.pack_sequences(
        counts.select("doc_id", F.lit("all").alias("source"), "n_tokens"),
        capacity=24)
    rows = packed.collect()
    exact = {r.doc_id: r.n_tokens for r in counts.collect()}
    assert rows and all(r.n_used == min(exact[r.doc_id], 24) for r in rows)
    fills: dict = {}
    for r in sorted(rows, key=lambda r: (r.pack_id, r.doc_id)):
        fills[r.pack_id] = fills.get(r.pack_id, 0) + r.n_used
        assert r.pack_fill == fills[r.pack_id]  # fill IS the exact sum
        assert r.pack_fill <= 24


# ------------------------------------------- composed loops (second batch)

def test_bpe_chunk_documents_windows(spark):
    """Chunk boundaries are exact token windows: every chunk except the
    ragged tail is exactly chunk_tokens long, chunk text re-concatenates
    to the full token stream, starts are multiples of chunk_tokens."""
    docs = _docs(spark, [(1, "low lower lowest newer new " * 4),
                         (2, "tiny"), (3, "!!!")])
    merges = tk.bpe_train(docs, n_merges=6, top_words=32)
    toks = {r.doc_id: r.tokens
            for r in tk.bpe_tokenize(docs, merges).collect()}
    chunks = tk.bpe_chunk_documents(docs, merges, chunk_tokens=7).collect()
    assert {r.doc_id for r in chunks} == {1, 2}  # wordless doc 3 absent
    by_doc: dict = {}
    for r in sorted(chunks, key=lambda r: (r.doc_id, r.chunk_seq)):
        assert r.chunk_start == (r.chunk_seq - 1) * 7
        by_doc.setdefault(r.doc_id, []).extend(r.chunk_text.split(" "))
        tail = r.chunk_seq * 7 >= len(toks[r.doc_id])
        assert r.n_chunk_tokens == (7 if not tail
                                    else len(toks[r.doc_id]) - r.chunk_start)
    for d, stream in by_doc.items():
        assert stream == toks[d]  # chunks re-concatenate to the stream


def test_image_dedup_groups_composition(spark):
    """The composed loop: phash pairs -> connected components. A trio of
    identical payloads collapses to one min-id component; unrelated
    media stay singletons labeled by themselves. (Transitive closure
    itself is proven in the dedup CC tests; this pins the composition.)"""
    t = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
         "eiusmod tempor incididunt ut labore et dolore magna aliqua ok")
    media = _media(spark, [(1, t), (2, t), (3, t), (9, "unrelated words "
                                                       "here entirely")])
    pairs = mm.phash_neardup_pairs(media, max_hamming=3)
    comp = dedup.dedup_groups(
        media.select(F.col("media_id").alias("doc_id")), pairs,
        id_col="doc_id").collect()
    pairs.rm_release_cache()
    got = {r.doc_id: r.component for r in comp}
    assert got[1] == got[2] == got[3] == 1
    assert got[9] == 9  # singleton keeps itself


def test_image_dedup_groups_entry_releases_its_base(spark, monkeypatch):
    """The entrypoint consumes the pairs eagerly (connected components
    checkpoints at construction) and releases its own persisted phash
    base before returning — no handle to forward, nothing for bench to
    leak (r11 second review: the forwarded handle was dead weight a
    caller had to know to release). The base is captured through the
    release handle's bound self (a global persistent-RDD count is NOT
    usable here: connected_components' internal localCheckpoint
    legitimately registers a GC-bounded persisted RDD)."""
    import radmapper_spark.entrypoints as E
    from tests.conftest import SF_SMOKE

    captured = {}
    orig = E.multimodal.phash_neardup_pairs

    def wrapper(*a, **k):
        out = orig(*a, **k)
        captured["base"] = out.rm_release_cache.__self__
        return out

    monkeypatch.setattr(E.multimodal, "phash_neardup_pairs", wrapper)
    out = E.ENTRIES["image_dedup_groups"][0](spark, SF_SMOKE)
    assert captured["base"].is_cached is False  # released by the entry
    assert getattr(out, "rm_release_cache", None) is None
    assert out.count() > 0


# ---------------------------------------- session-cache staleness contract

def test_cached_frames_rebuild_on_input_change(spark, tmp_path):
    """r10 verdict item #5: the derived-frame caches revalidate the
    sf_dir parquet fingerprint on every hit — a rewritten input file
    (even same-size) triggers a rebuild instead of serving frames
    pinned over stale data."""
    import shutil

    from radmapper_spark import entrypoints as E

    sfd = tmp_path / "sf"
    shutil.copytree("/root/testdata/sf0.001", sfd)
    calls = []

    def build(tables):
        calls.append(1)
        # derive a FRESH frame (load_tables memoizes the raw table
        # object per (session, sf_dir), so persisting it directly would
        # hand every build the same object)
        return {"docs": tables["documents"].select("doc_id").persist()}

    cache: dict = {}
    a = E._cached_frames(cache, spark, str(sfd), build)["docs"]
    n_before = a.count()
    b = E._cached_frames(cache, spark, str(sfd), build)["docs"]
    assert len(calls) == 1 and a is b  # hit: no rebuild, same frame
    # REAL rewrite — different content AND size (the r11 review case:
    # the rebuild must not read through the table memo's pinned file
    # listing, which would scan the new file with stale offsets)
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE TABLE t AS SELECT * FROM "
                f"'{sfd}/documents.parquet' LIMIT 100")
    con.execute(f"COPY t TO '{sfd}/documents.parquet' (FORMAT PARQUET)")
    c = E._cached_frames(cache, spark, str(sfd), build)["docs"]
    assert len(calls) == 2 and c is not a  # fingerprint miss: rebuilt
    assert not a.is_cached  # stale entry was unpersisted
    assert c.count() == 100 and n_before != 100  # fresh data, not memoized
    # cleanup
    cache.pop((E.session_key(spark), str(sfd)))["docs"].unpersist()


# ------------------------------------------------- BPE property fuzzing

def test_bpe_fold_matches_reference_on_random_corpora(spark):
    """Property test: for random small corpora, the Catalyst replace
    fold tokenizes every word exactly like an independent list-based
    greedy merger, under merges trained by the pure-Python trainer —
    two implementations of BPE application, one semantics. Covers
    repeated-char words (the overlap edge: 'aaaa' -> 'aa aa'),
    single-char words, and words made of merged symbols' substrings."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abcd01", min_size=1, max_size=8)
    corpus = st.lists(st.lists(word, min_size=1, max_size=6),
                      min_size=1, max_size=4)

    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(corpus=corpus, n_merges=st.integers(min_value=0, max_value=8))
    def check(corpus, n_merges):
        docs = _docs(spark, [(i, " ".join(ws))
                             for i, ws in enumerate(corpus)])
        merges = tk.bpe_train(docs, n_merges=n_merges, top_words=64)
        got = {r.doc_id: r.tokens
               for r in tk.bpe_tokenize(docs, merges).collect()}
        for i, ws in enumerate(corpus):
            expect = [t for w in ws for t in _ref_bpe_apply(w, merges)]
            assert got[i] == expect, (ws, merges)

    check()


# ----------------------------------------------- streaming media dedup

def test_stream_media_dedup_state_across_batches(spark, tmp_path):
    """media_dedup(streaming=True) on a file stream: perceptual-hash
    duplicates arriving in a LATER micro-batch are dropped against
    state carried across batches; survivors' phash set equals the batch
    twin's."""
    import datetime

    from radmapper_spark.operators import multimodal as mm2

    t0 = datetime.datetime(2024, 1, 1)
    texts = [f"document number {i} with some distinct words {i * 7}"
             for i in range(30)]
    rows1 = [(i, texts[i].encode(), t0) for i in range(30)]
    # echo batch: same payloads, new ids, later ts -> same phash
    rows2 = [(1000 + i, texts[i].encode(),
              t0 + datetime.timedelta(minutes=5)) for i in range(0, 30, 3)]
    schema = "media_id long, payload binary, ts timestamp"
    src = str(tmp_path / "media_in")
    spark.createDataFrame(rows1, schema).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    spark.createDataFrame(rows2, schema).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = mm2.media_dedup(stream, streaming=True, watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("rm_media_dedup")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT media_id, phash FROM rm_media_dedup").collect()
    batch = mm2.media_dedup(
        spark.createDataFrame(rows1 + rows2, schema)).collect()
    # every echo (id >= 1000) was dropped against batch-1 state
    assert all(r.media_id < 1000 for r in got)
    assert {r.phash for r in got} == {r.phash for r in batch}
    assert len(got) == len({r.phash for r in got})  # one row per phash


def test_stream_media_dedup_custom_id_and_ntz_ts(spark, tmp_path):
    """r11 third review: the streaming path must honor a non-default
    id_col (the hash pass always emits 'media_id' internally) and a
    TIMESTAMP_NTZ event-time column (the newer driver-parquet surface —
    _ensure_ltz casts before withWatermark, like every other streaming
    path)."""
    import datetime

    from radmapper_spark.operators import multimodal as mm2

    t0 = datetime.datetime(2024, 1, 1)
    variants = ["lorem ipsum dolor sit amet " * 4,
                "a completely different document body here " * 3,
                "third unique content with other words entirely " * 3]
    rows = [(i, variants[i % 3].encode(), t0) for i in range(9)]
    schema = "doc_id long, payload binary, ts timestamp_ntz"
    src = str(tmp_path / "media_ntz")
    spark.createDataFrame(rows, schema).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(schema).parquet(src))
    out = mm2.media_dedup(stream, id_col="doc_id", streaming=True,
                          watermark="1 hour")
    assert set(out.columns) == {"doc_id", "phash", "ts"}
    q = (out.writeStream.format("memory").queryName("rm_media_ntz")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT doc_id, phash FROM rm_media_ntz").collect()
    assert len(got) == 3  # 3 distinct payload variants -> 3 phashes
    assert len({r.phash for r in got}) == 3


def test_perceptual_hash_carry_cols_passthrough(spark):
    """carry_cols ride the Arrow pass untouched with schema-derived
    types, and empty-payload rows drop their carried values too."""
    import datetime
    t0 = datetime.datetime(2024, 6, 1, 12, 0, 0)
    media = spark.createDataFrame(
        [(1, b"abc", t0, "x"), (2, b"", t0, "y")],
        "media_id long, payload binary, ts timestamp, tag string")
    out = mm.perceptual_hash(media, carry_cols=("ts", "tag")).collect()
    assert len(out) == 1
    assert (out[0].media_id, out[0].ts, out[0].tag) == (1, t0, "x")
