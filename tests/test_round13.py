"""Round-13 tests: NB scale-shape plan lock (r12 verdict item #4),
epoch-parameterized shuffle, materialized training shards, and the
rotation-tier freshness invariant (item #2).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _release(df):
    rel = getattr(df, "rm_release_cache", None)
    if rel is not None:
        rel()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


# ------------------------------------------------- NB scale shape lock

def _parquet_relations(plan: str) -> int:
    return len(re.findall(r"Relation.*parquet", plan))


@pytest.mark.parametrize("name", ["nb_quality_score", "nb_pareto_filter"])
def test_nb_entries_single_training_instantiation(spark, name):
    """The NB entries must bench the scale shape their docstrings
    preach (r12 verdict item #1/#4): the training subtree appears ONCE
    in the plan — one aggregate over each class. Concretely the
    optimized plan holds exactly THREE parquet relations: the corpus
    scan plus one scan per class under the vocab aggregate; the consts
    are literals over a 1-row local relation, not a second training
    instantiation (the lazy one-shot form had SEVEN relations — vocab's
    two, consts' re-derived two, two 1-row class counts, the corpus)."""
    df = entrymod.queries()[name](spark, SF)
    plan = _optimized(df)
    n = _parquet_relations(plan)
    assert n == 3, f"{name}: {n} parquet relations (want 3):\n{plan[:3000]}"


# ------------------------------------------ epoch-parameterized shuffle

def _epoch_ranks(spark, n, epoch, ids=None):
    from radmapper_spark.operators import sampling
    df = (spark.range(n).selectExpr("id * 7 AS doc_id") if ids is None
          else spark.createDataFrame([(i,) for i in ids], "doc_id long"))
    out = sampling.corpus_shuffle(df, "doc_id", shard_size=10, epoch=epoch)
    rows = {r["doc_id"]: r["shuffle_rank"] for r in out.collect()}
    _release(out)
    return rows


def test_epoch_shuffles_are_distinct_permutations(spark):
    """Each epoch must be a COMPLETE permutation (ranks exactly 1..N of
    the same id set) and pairwise DISTINCT from the others — the whole
    point of reshuffling per epoch."""
    perms = {e: _epoch_ranks(spark, 200, e) for e in (0, 1, 2, 3)}
    ids = set(perms[0])
    for e, p in perms.items():
        assert set(p) == ids, f"epoch {e} changed the id set"
        assert sorted(p.values()) == list(range(1, 201)), \
            f"epoch {e} is not a complete 1..N permutation"
    es = sorted(perms)
    for i, a in enumerate(es):
        for b in es[i + 1:]:
            assert perms[a] != perms[b], f"epochs {a} and {b} collide"


def test_epoch_none_matches_pre_epoch_layout(spark):
    """epoch=None must stay byte-compatible with the un-epoched salt
    (the committed corpus_shuffle oracle depends on it)."""
    from radmapper_spark.operators import sampling
    df = spark.range(50).selectExpr("id AS doc_id")
    a = sampling.corpus_shuffle(df, "doc_id", 10)
    b = sampling.corpus_shuffle(df, "doc_id", 10, epoch=None)
    ra = {r["doc_id"]: r["shuffle_rank"] for r in a.collect()}
    rb = {r["doc_id"]: r["shuffle_rank"] for r in b.collect()}
    _release(a), _release(b)
    assert ra == rb


def test_epoch_shuffle_append_stable(spark):
    """Within one epoch the order is append-stable: adding new ids must
    not reorder existing ones (their permutation keys depend only on
    the id), so a growing corpus keeps already-written shards' relative
    order."""
    base = [i * 3 for i in range(80)]
    grown = base + [1000 + i for i in range(40)]
    small = _epoch_ranks(spark, 0, epoch=2, ids=base)
    big = _epoch_ranks(spark, 0, epoch=2, ids=grown)
    order_small = sorted(base, key=lambda i: small[i])
    order_big = [i for i in sorted(grown, key=lambda i: big[i])
                 if i in set(base)]
    assert order_small == order_big


def test_epoch_rejects_negative(spark):
    from radmapper_spark.operators import sampling
    df = spark.range(5).selectExpr("id AS doc_id")
    with pytest.raises(ValueError):
        sampling.corpus_shuffle(df, "doc_id", 10, epoch=-1)
