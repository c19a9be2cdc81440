"""Vocabulary / tf-idf operators: python-twin expected values and rank
determinism."""

from __future__ import annotations

import math
import re
from collections import Counter

from radmapper_spark.operators import textstats


def _py_tokens(text: str) -> list:
    return [t for t in re.split(r"[^a-z]+", text.lower()) if t]


def test_vocabulary_counts_and_rank(tables):
    docs = tables["documents"]
    out = textstats.vocabulary(docs, top_n=50).collect()
    raw = docs.select("doc_id", "text").collect()
    n_docs_total = len(raw)
    totals: Counter = Counter()
    doc_freq: Counter = Counter()
    for r in raw:
        toks = _py_tokens(r["text"])
        totals.update(toks)
        doc_freq.update(set(toks))
    expected = sorted(totals.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    got = sorted(out, key=lambda r: r["rank"])
    assert [(r["term"], r["n_total"]) for r in got] == expected
    for r in got:
        assert r["n_docs"] == doc_freq[r["term"]]
        assert abs(r["idf"] - round(math.log((n_docs_total + 1)
                                             / (r["n_docs"] + 1)), 6)) < 1e-9
    # ranks are 1..n with no gaps
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))


def test_tfidf_topk_shape_and_determinism(tables):
    docs = tables["documents"]
    out = textstats.tf_idf_topk(docs, k=3)
    rows = out.collect()
    per_doc: dict = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    n_docs = docs.count()
    assert len(per_doc) == n_docs          # every doc appears
    for doc_rows in per_doc.values():
        ranks = sorted(r["term_rank"] for r in doc_rows)
        assert ranks == list(range(1, len(ranks) + 1))
        assert len(doc_rows) <= 3
    # run twice -> identical (no nondeterministic ordering in the cut)
    again = sorted(map(tuple, out.collect()))
    assert sorted(map(tuple, rows)) == again


def test_bigram_pmi_python_twin(spark, tables):
    """PMI values against a pure-python twin on a tiny planted corpus."""
    rows = [(1, "big data big data systems"),
            (2, "big data pipelines move big data"),
            (3, "small data")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {(r["w1"], r["w2"]): r for r in
           textstats.bigram_pmi(df, min_count=2, top_n=10).collect()}
    # python twin
    toks = [_py_tokens(t) for _, t in rows]
    uni = Counter(w for ts in toks for w in ts)
    bi = Counter((a, b) for ts in toks for a, b in zip(ts, ts[1:]))
    bi = {k: v for k, v in bi.items() if v >= 2}
    n_uni = sum(uni.values())
    n_bi = sum(bi.values())
    assert set(out) == set(bi)
    for (a, b), c_ab in bi.items():
        want = math.log((c_ab / n_bi) / ((uni[a] / n_uni) * (uni[b] / n_uni)))
        assert abs(out[(a, b)]["pmi"] - round(want, 6)) < 1e-9


def test_bigram_pmi_empty_corpus_no_crash(spark):
    """Empty / blank-only corpus: the totals aggregate to NULL — must
    return an empty frame, not raise (round-5 ADVICE: the old eager
    float(n_uni) collect raised TypeError on None)."""
    df = spark.createDataFrame([(1, ""), (2, "   "), (3, "!!!")],
                               ["doc_id", "text"])
    assert textstats.bigram_pmi(df).count() == 0
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert textstats.bigram_pmi(empty).count() == 0
