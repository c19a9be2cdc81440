"""Text-analysis operators: PII scrub, inverted index, BM25 (operators/textstats.py).

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
def test_pii_scrub_crafted(spark):
    rows = [
        (1, "mail me at jo.doe+spam@ex-ample.co.uk or call +1 (555) 123-4567"),
        (2, "server 192.168.0.1 and 10.0.0.255 went down"),
        (3, "no pii here, just words and the number 7"),
        (4, "two mails: a@b.io c@d.org; phone 0049 171 1234567"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in textstats.pii_scrub(df).collect()}
    assert (out[1].n_emails, out[1].n_ipv4, out[1].n_phones) == (1, 0, 1)
    assert (out[2].n_emails, out[2].n_ipv4, out[2].n_phones) == (0, 2, 0)
    assert (out[3].n_emails, out[3].n_ipv4, out[3].n_phones) == (0, 0, 0)
    assert (out[4].n_emails, out[4].n_ipv4, out[4].n_phones) == (2, 0, 1)
    # scrub hash witnesses the exact redacted text
    expect1 = "mail me at [EMAIL] or call [PHONE]"
    assert out[1].scrub_hash == hashlib.md5(expect1.encode()).hexdigest()
    assert out[1].scrub_len == len(expect1)
    expect2 = "server [IPV4] and [IPV4] went down"
    assert out[2].scrub_hash == hashlib.md5(expect2.encode()).hexdigest()


def test_inverted_index_small(spark):
    rows = [(1, "alpha beta gamma"), (2, "beta gamma"), (3, "gamma alpha"),
            (4, "beta beta beta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.term: r for r in
           textstats.inverted_index(df, min_df=2, postings_cap=2).collect()}
    assert set(out) == {"alpha", "beta", "gamma"}
    assert (out["alpha"].n_docs, out["alpha"].postings) == (2, "1,3")
    # df counts distinct docs (doc 4 repeats beta in-doc)
    assert (out["beta"].n_docs, out["beta"].postings) == (3, "1,2")
    assert (out["gamma"].n_docs, out["gamma"].postings) == (3, "1,2")


def _bm25_python(docs, query, k1=1.2, b=0.75):
    import re
    toks = {i: [t for t in re.split(r"[^a-z]+", txt.lower()) if t]
            for i, txt in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    scores = {}
    for term in sorted(set(query)):
        df = sum(1 for t in toks.values() if term in t)
        if df == 0:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for i, t in toks.items():
            tf = t.count(term)
            if tf == 0:
                continue
            part = idf * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * len(t) / avgdl))
            micro = round(part * 1e6)
            hits, tot = scores.get(i, (0, 0))
            scores[i] = (hits + 1, tot + micro)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))
    return [(rank + 1, i, hits, tot / 1e6)
            for rank, (i, (hits, tot)) in enumerate(ranked)]


def test_bm25_matches_python_randomized(spark):
    rng = random.Random(60_003)
    vocab = ["spark", "join", "filter", "vector", "scan", "row", "agg"]
    docs = [(i, " ".join(rng.choices(vocab, k=rng.randint(3, 30))))
            for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [(r.rank, r.doc_id, r.n_terms_hit, r.bm25) for r in
           textstats.bm25_score(df, ["spark", "join", "vector"],
                                top_k=15).collect()]
    want = _bm25_python(docs, ["spark", "join", "vector"])[:15]
    assert sorted(got) == [(r, i, h, pytest.approx(s, abs=2e-6))
                           for r, i, h, s in want]
