"""Corpus-trained BPE: train/tokenize/chunk (operators/tokenizer.py).

Consolidated from the per-round test files (r14 governance pass) — test bodies unchanged."""

from __future__ import annotations

import time
import pytest
from pyspark.sql import functions as F
from radmapper_spark.operators import chunking, dedup, graph
from radmapper_spark.operators import multimodal as mm
from radmapper_spark.operators import tokenizer as tk

# ======================== from test_round11.py ========
def _docs(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema)


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


def test_bpe_doc_fold_never_merges_across_word_boundary(spark):
    """The r17 doc-level fold runs the merge fold ONCE over the
    document's space-joined symbol sequence instead of once per word;
    the wrapped space symbol must block a merge whose pair straddles two
    words, and the pipe-count token arithmetic must agree with the
    materialized token arrays."""
    docs = _docs(spark, [(1, "ab ab ab a b"), (2, "!!! ???")])
    merges = tk.bpe_train(docs, n_merges=1, top_words=10)
    assert merges == [("a", "b")]
    got = {r.doc_id: r.tokens
           for r in tk.bpe_tokenize(docs, merges).collect()}
    # the 'ab' words fuse; the trailing 'a b' (pair split across the
    # word boundary) must NOT fuse through the joined fold
    assert got == {1: ["ab", "ab", "ab", "a", "b"]}
    counts = {r.doc_id: r.n_tokens
              for r in tk.bpe_token_counts(docs, merges).collect()}
    assert counts == {1: 5}  # wordless doc 2 absent, count = len(tokens)


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
