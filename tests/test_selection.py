"""DSIR-shaped importance selection (operators/selection.py): integer-
exact scoring, determinism across parallelism, scale-shape plan checks,
and the RM builtin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from radmapper_spark.operators import selection


def _corpus(spark):
    target = spark.createDataFrame(
        [(100 + i, "the quick brown fox jumps over the lazy dog") for i in range(4)]
        + [(200 + i, "machine learning models train on curated data") for i in range(3)],
        "doc_id long, text string")
    raw = spark.createDataFrame(
        [(1, "the quick brown fox likes curated data"),
         (2, "machine learning models train quickly"),
         (3, "completely unrelated text about cooking pasta recipes"),
         (4, "zzz"),                      # single token: no bigrams
         (5, "the quick brown fox jumps over the lazy dog")],  # verbatim target
        "doc_id long, text string")
    return raw, target


def test_dsir_score_exact_and_parallelism_invariant(spark):
    """Scores are integers, reproducible at any partitioning, and rank
    target-like docs above unrelated ones."""
    raw, target = _corpus(spark)
    a = {r.doc_id: r.score
         for r in selection.dsir_score(raw, target).collect()}
    b = {r.doc_id: r.score
         for r in selection.dsir_score(raw.repartition(13),
                                       target.repartition(7)).collect()}
    assert a == b
    assert set(a) == {1, 2, 3, 4, 5}
    assert a[4] == 0                       # featureless doc scores 0
    assert a[5] > a[3]                     # verbatim target >> unrelated
    assert a[1] > a[3] and a[2] > a[3]


def test_dsir_select_deterministic_cut(spark):
    raw, target = _corpus(spark)
    rows = selection.dsir_select(raw, target, k=3).collect()
    assert [r.sel_rank for r in rows] == [1, 2, 3]
    ranked = sorted(rows, key=lambda r: r.sel_rank)
    assert ranked[0].doc_id == 5           # verbatim target copy wins
    scores = [r.score for r in ranked]
    assert scores == sorted(scores, reverse=True)
    with pytest.raises(ValueError, match="k must be positive"):
        selection.dsir_select(raw, target, k=0)


def test_dsir_constant_factor_rank_invariance(spark):
    """Doubling the target sample (same distribution) must not change
    the induced ordering — the dropped normalizing constants really do
    factor out of the per-doc sums."""
    raw, target = _corpus(spark)
    base = sorted(
        (r.score, r.doc_id)
        for r in selection.dsir_score(raw, target).collect())
    doubled = target.union(target.withColumn(
        "doc_id", F.col("doc_id") + 1000))
    twice = sorted(
        (r.score, r.doc_id)
        for r in selection.dsir_score(raw, doubled).collect())
    order_a = [d for _, d in sorted(base, reverse=True)]
    order_b = [d for _, d in sorted(twice, reverse=True)]
    assert order_a == order_b


def test_dsir_plan_shape(spark):
    """Scale discipline: the weight table joins the corpus occurrences
    as a BROADCAST (never a corpus-sized shuffle), and the top-k cut
    plans as TakeOrderedAndProject, not a global sort."""
    raw, target = _corpus(spark)
    sel = selection.dsir_select(raw, target, k=3)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_dsir_xxhash_mode_consistent(spark):
    """The production hash path produces the same SHAPE of result
    (integer scores, zero for featureless docs); values differ from the
    portable family by construction."""
    raw, target = _corpus(spark)
    rows = {r.doc_id: r.score
            for r in selection.dsir_score(
                raw, target, hash_mode="xxhash64").collect()}
    assert rows[4] == 0 and rows[5] > rows[3]
    with pytest.raises(ValueError, match="hash_mode"):
        selection.dsir_score(raw, target, hash_mode="sha9").collect()


def test_dsir_builtin(spark):
    from radmapper_spark.lang.interp import Interp
    from radmapper_spark.operators.spark_bridge import SparkDB
    raw, target = _corpus(spark)
    out = Interp(spark).run_raw(
        "$dsirSelect($db($raw), $db($tgt), 2)",
        bindings={"$raw": raw, "$tgt": target})
    assert isinstance(out, SparkDB)
    rows = sorted(out.df.collect(), key=lambda r: r.sel_rank)
    assert len(rows) == 2 and rows[0].doc_id == 5



# ======================== from test_round10.py (r14 consolidation) ========
import pytest
from pyspark.sql import functions as F
import __spark_entry__ as entrymod
from radmapper_spark.operators import lm
from tests.conftest import SF_SMOKE
from tests.oracle import assert_matches_oracle, duck_conn

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


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
