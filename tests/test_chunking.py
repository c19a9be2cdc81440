"""Sliding-window chunking and sequence packing (operators/chunking.py).

Consolidated from the per-round test files (r14 governance pass) — test bodies unchanged."""

from __future__ import annotations

import hashlib
import math
import random
import pytest
from pyspark.sql import functions as F
from radmapper_spark.operators import behavior, chunking, similarity, temporal
from radmapper_spark.operators import textstats

# ======================== from test_round6b.py ========
def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_short_doc_single_chunk(spark):
    df = _mk_docs(spark, [(1, "a b c")])
    out = chunking.chunk_documents(df, chunk_tokens=32, overlap=8).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.chunk_seq, r.chunk_start, r.n_chunk_tokens, r.chunk_text) == \
        (1, 0, 3, "a b c")


def test_chunk_blank_and_null_drop(spark):
    df = _mk_docs(spark, [(1, ""), (2, "   "), (3, None), (4, "x")])
    out = chunking.chunk_documents(df).collect()
    assert [r.doc_id for r in out] == [4]


def test_chunk_exact_coverage_and_overlap(spark):
    # 80 tokens, windows of 32 every 24: starts 0,24,48,72 -> last short
    toks = [f"t{i}" for i in range(80)]
    df = _mk_docs(spark, [(1, " ".join(toks))])
    out = sorted(chunking.chunk_documents(df, 32, 8).collect(),
                 key=lambda r: r.chunk_seq)
    assert [r.chunk_start for r in out] == [0, 24, 48, 72]
    assert [r.n_chunk_tokens for r in out] == [32, 32, 32, 8]
    # every token covered, consecutive chunks agree on the overlap
    covered = set()
    for r in out:
        words = r.chunk_text.split(" ")
        assert words == toks[r.chunk_start:r.chunk_start + 32]
        covered.update(range(r.chunk_start, r.chunk_start + len(words)))
    assert covered == set(range(80))


def test_chunk_overlap_must_be_smaller(spark):
    df = _mk_docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        chunking.chunk_documents(df, chunk_tokens=8, overlap=8)


def _greedy_pack(items, cap):
    """Python twin: items = [(id, n)] sorted by id; returns
    {id: (n_used, bin, fill_after)} with 1-based bins."""
    out, b, fill = {}, 0, 0
    for i, n in items:
        n = min(n, cap)
        if b > 0 and fill + n <= cap:
            fill += n
        else:
            b, fill = b + 1, n
        out[i] = (n, b, fill)
    return out


def test_pack_matches_python_greedy_randomized(spark):
    rng = random.Random(60_001)
    rows = []
    for g in range(6):
        for i in range(rng.randint(0, 40)):
            rows.append((f"g{g}", g * 1000 + i, rng.randint(0, 300)))
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    got = {(r.source, r.doc_id): (r.n_used, r.pack_id, r.pack_fill)
           for r in chunking.pack_sequences(df, capacity=256).collect()}
    want = {}
    for g in sorted({r[0] for r in rows}):
        items = sorted((i, n) for s, i, n in rows if s == g)
        for i, (n, b, fill) in _greedy_pack(items, 256).items():
            want[(g, i)] = (n, b, fill)
    assert got == want


def test_pack_bin_invariants(spark):
    rng = random.Random(60_002)
    rows = [("s", i, rng.randint(1, 300)) for i in range(200)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    out = sorted(chunking.pack_sequences(df, capacity=256).collect(),
                 key=lambda r: r.doc_id)
    by_bin = {}
    for r in out:
        by_bin.setdefault(r.pack_id, []).append(r)
    for b, members in by_bin.items():
        total = sum(m.n_used for m in members)
        assert total <= 256
        assert members[-1].pack_fill == total
    # bins are dense 1..max and in doc order
    assert sorted(by_bin) == list(range(1, max(by_bin) + 1))
    assert [r.pack_id for r in out] == sorted(r.pack_id for r in out)


def test_pack_sharded_equals_pure_when_one_shard(spark):
    rng = random.Random(60_006)
    rows = [("s", i, rng.randint(1, 300)) for i in range(150)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    a = {r.doc_id: (r.n_used, r.pack_id, r.pack_fill)
         for r in chunking.pack_sequences(df, 256).collect()}
    b = {r.doc_id: (r.n_used, r.pack_id, r.pack_fill)
         for r in chunking.pack_sequences_sharded(
             df, 256, shard_docs=10_000).collect()}
    assert a == b


def test_pack_sharded_invariants_small_shards(spark):
    rng = random.Random(60_007)
    rows = []
    for g in range(4):
        for i in range(rng.randint(5, 120)):
            rows.append((f"g{g}", g * 1000 + i, rng.randint(1, 300)))
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    out = sorted(chunking.pack_sequences_sharded(df, 256, shard_docs=7)
                 .collect(), key=lambda r: (r.source, r.doc_id))
    assert len(out) == len(rows)
    by_bin = {}
    for r in out:
        by_bin.setdefault((r.source, r.pack_id), []).append(r)
    for (_, _), members in by_bin.items():
        total = sum(m.n_used for m in members)
        assert total <= 256
        assert members[-1].pack_fill == total
    # dense 1..max bins per group, bin ids non-decreasing in doc order
    per_grp = {}
    for (g, p) in by_bin:
        per_grp.setdefault(g, set()).add(p)
    for g, bins in per_grp.items():
        assert sorted(bins) == list(range(1, len(bins) + 1))
        seq = [r.pack_id for r in out if r.source == g]
        assert seq == sorted(seq)


def test_chunk_matches_python_randomized(spark):
    rng = random.Random(60_010)
    rows = []
    for i in range(60):
        n = rng.randint(0, 90)
        rows.append((i, " ".join(f"x{rng.randrange(100)}"
                                 for _ in range(n)) if n else ""))
    df = _mk_docs(spark, rows)
    ct, ov = 32, 8
    got = {}
    for r in chunking.chunk_documents(df, ct, ov).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_seq, r.chunk_start, r.n_chunk_tokens, r.chunk_text))
    want = {}
    for i, txt in rows:
        toks = txt.split(" ") if txt.strip() else []
        if not toks:
            continue
        chunks = []
        for seq, s in enumerate(range(0, len(toks), ct - ov)):
            win = toks[s:s + ct]
            chunks.append((seq + 1, s, len(win), " ".join(win)))
        want[i] = chunks
    got = {k: sorted(v) for k, v in got.items()}
    assert got == want
