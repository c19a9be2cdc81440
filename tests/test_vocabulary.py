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
