"""Distributed linear algebra: Gram, PCA, ridge, linear probes (operators/linalg.py).

Consolidated from the per-round test files (r14 governance pass) — test bodies unchanged."""

from __future__ import annotations

import json
import math
import os
import random
import time
import pytest
from pyspark.sql import functions as F
import __spark_entry__ as entrymod
from radmapper_spark.operators import lm
from tests.conftest import SF_SMOKE
from tests.oracle import assert_matches_oracle, duck_conn

# ======================== from test_round9.py ========
def _rand_emb(spark, n=300, d=16, parts=7, seed=2):
    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(d)])
            for i in range(n)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").repartition(parts)


def test_gram_matrix_exact_and_parallelism_invariant(spark):
    """Scaled-integer gram is bit-exact vs a local numpy reference and
    identical at 1 vs 13 partitions (the engine-exact contract)."""
    import numpy as np
    from radmapper_spark.operators import linalg
    emb = _rand_emb(spark)
    E = np.stack([np.asarray(r.embedding)
                  for r in emb.orderBy("vec_id").collect()])
    want = {}
    for i in range(E.shape[1]):
        for j in range(i, E.shape[1]):
            want[(i + 1, j + 1)] = int(
                np.floor(E[:, i] * E[:, j] * 1e12).astype(np.int64).sum())
    for parts in (1, 13):
        got = {(r.i, r.j): int(r.gram_scaled) for r in
               linalg.gram_matrix(emb.repartition(parts),
                                  "embedding").collect()}
        assert got == want


def test_gram_matrix_skips_nulls_raises_on_ragged(spark):
    from radmapper_spark.operators import linalg
    ok = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [0.5, -1.0])],
        "vec_id long, embedding array<double>")
    rows = {(r.i, r.j): int(r.gram_scaled)
            for r in linalg.gram_matrix(ok, "embedding").collect()}
    # only rows 1 and 3 contribute: g11 = floor(1e12) + floor(0.25e12)
    assert rows[(1, 1)] == 10 ** 12 + 25 * 10 ** 10
    bad = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>").coalesce(1)
    with pytest.raises(Exception, match="ragged"):
        linalg.gram_matrix(bad, "embedding").collect()


def test_pca_project_matches_numpy(spark):
    """Distributed fit (gram + mean) and map-only projection equal a
    local numpy PCA on the same data, and whitened projections have
    identity covariance."""
    import numpy as np
    from radmapper_spark.operators import linalg
    emb = _rand_emb(spark, n=400, d=12)
    E = np.stack([np.asarray(r.embedding)
                  for r in emb.orderBy("vec_id").collect()])
    fit = linalg.fit_pca(emb, 5, "embedding")
    comp, vals, mean, n = fit
    assert n == 400
    # basis spans the same top-5 subspace as numpy's eigh on the
    # population covariance (compare projectors, not vectors)
    C = np.cov(E.T, bias=True)
    w, v = np.linalg.eigh(C)
    top = v[:, np.argsort(w)[::-1][:5]]
    P_ref = top @ top.T
    P_got = comp.T @ comp
    assert np.abs(P_got - P_ref).max() < 1e-6
    got = {r.vec_id: np.array(r.proj) for r in
           linalg.pca_project(emb, 5, fit=fit).collect()}
    want = (E - mean) @ comp.T
    err = max(np.abs(got[i] - want[i]).max() for i in range(400))
    assert err < 1e-9
    # whitened covariance == I
    pw = linalg.pca_project(emb, 5, whiten=True, fit=fit)
    g = linalg.gram_matrix(pw, "proj").collect()
    W = np.zeros((5, 5))
    for r in g:
        W[r.i - 1, r.j - 1] = W[r.j - 1, r.i - 1] = (
            float(r.gram_scaled) / 1e12 / n)
    assert np.abs(W - np.eye(5)).max() < 1e-8


def test_fit_pca_bad_k_raises(spark):
    from radmapper_spark.operators import linalg
    emb = _rand_emb(spark, n=20, d=4)
    with pytest.raises(ValueError, match="k must be"):
        linalg.fit_pca(emb, 0, "embedding")
    with pytest.raises(ValueError, match="k must be"):
        linalg.fit_pca(emb, 5, "embedding")


def test_gram_matrix_cross_partition_ragged_raises(spark):
    """Partitions internally consistent but dims differing ACROSS
    partitions (one source file per dimension): per-partition inference
    cannot see it, so the combine-stage d-guard must raise instead of
    merging the partials into a silently wrong gram."""
    from radmapper_spark.operators import linalg
    a = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(5)],
        "vec_id long, embedding array<double>").coalesce(1)
    b = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0]) for i in range(5)],
        "vec_id long, embedding array<double>").coalesce(1)
    u = a.union(b)  # union concatenates partitions: no partition mixes
    with pytest.raises(Exception, match="ragged"):
        linalg.gram_matrix(u, "embedding").collect()
    with pytest.raises(Exception, match="ragged"):
        linalg.column_sums(u, "embedding").collect()


def test_gram_matrix_overflow_safe_beyond_int64(spark):
    """Scaled cells summing past int64 (numpy wraps SILENTLY): the
    chunked object-dtype fold must return the exact value. One cell
    here is floor(2000^2 * 1e12) = 4e18 per row; five rows = 2e19,
    past the 9.2e18 int64 ceiling."""
    from radmapper_spark.operators import linalg
    df = spark.createDataFrame(
        [(i, [2000.0, 0.5]) for i in range(5)],
        "vec_id long, embedding array<double>").coalesce(1)
    rows = {(r.i, r.j): int(r.gram_scaled)
            for r in linalg.gram_matrix(df, "embedding").collect()}
    assert rows[(1, 1)] == 5 * 4 * 10 ** 18  # > 2^63-1: exact, no wrap
    assert rows[(1, 2)] == 5 * 10 ** 15
    assert rows[(2, 2)] == 5 * 25 * 10 ** 10
    s = {r.i: int(r.sum_scaled)
         for r in linalg.column_sums(df, "embedding").collect()}
    assert s[1] == 5 * 2 * 10 ** 15


def test_gram_matrix_magnitude_too_large_raises(spark):
    """Coordinates whose single-row scaled cell cannot fit the exact-
    int64 chunk bound raise a clear error instead of degrading."""
    from radmapper_spark.operators import linalg
    df = spark.createDataFrame(
        [(1, [3000.0])], "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="too large"):
        linalg.gram_matrix(df, "embedding").collect()


def test_fit_pca_empty_corpus_clear_error(spark):
    """All-null corpus: column_sums emits ZERO rows, which must surface
    as the intended 'no non-null vectors' error, not a bare max()."""
    from radmapper_spark.operators import linalg
    empty = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no non-null vectors"):
        linalg.fit_pca(empty, 2, "embedding")


def test_fit_ridge_matches_local_reference(spark):
    """The distributed fit equals a local numpy replay of the SAME
    scaled-integer moment pipeline, bit for bit, at any partitioning."""
    import numpy as np
    from radmapper_spark.operators import linalg
    rng = random.Random(3)
    rows = [(rng.uniform(0, 5), rng.uniform(0, 3),
             1.0 if rng.random() < 0.4 else 0.0) for _ in range(500)]
    df = spark.createDataFrame(rows, "f1 double, f2 double, y double")
    w1, n1 = linalg.fit_ridge(df, ["f1", "f2"], "y", lam=1e-6)
    w2, n2 = linalg.fit_ridge(df.repartition(11), ["f1", "f2"], "y",
                              lam=1e-6)
    assert np.array_equal(w1, w2) and n1 == n2 == 500
    X = np.array([[a, b, 1.0, y] for a, b, y in rows])
    M = np.zeros((4, 4))
    for i in range(4):
        for j in range(4):
            M[i, j] = np.floor(X[:, i] * X[:, j] * 1e12).sum() / 1e12
    A, b = M[:3, :3], M[:3, 3]
    w_ref = np.linalg.solve(A + 1e-6 * 500 * np.eye(3), b)
    assert np.array_equal(w1, w_ref)
    # the probe actually separates: scores correlate with the label
    sc = linalg.linear_score(w1, ["f1", "f2"])
    got = df.select(F.avg(F.when(F.col("y") == 1.0, sc)).alias("p"),
                    F.avg(F.when(F.col("y") == 0.0, sc)).alias("q")
                    ).collect()[0]
    assert got.p is not None and got.q is not None


def test_linear_score_stays_in_catalyst(spark):
    """Scoring is a literal-coefficient projection: NO Python eval
    operator in the plan (the 100 TB scoring pass must stay inside
    whole-stage codegen)."""
    import numpy as np
    from radmapper_spark.operators import linalg
    df = spark.range(100).select(
        (F.col("id") * 0.5).alias("f1"), (F.col("id") % 7).cast("double")
        .alias("f2"), (F.col("id") % 2).cast("double").alias("y"))
    scored = df.withColumn(
        "s", linalg.linear_score(np.array([0.3, -0.2, 1.5]),
                                 ["f1", "f2"]))
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "ArrowEval" not in plan
    assert scored.filter(F.col("s").isNotNull()).count() == 100


def test_quality_probe_certificate_zero(spark):
    """The entry's residual certificate rows are exactly '0.0' — the
    driver solve is consistent with the engine-exact moments."""
    from radmapper_spark import entrypoints as E
    out = E.quality_probe(spark, "/root/testdata/sf0.001")
    rrows = [r for r in out.collect() if r.kind == "r"]
    assert len(rrows) == 4
    assert all(r.val == "0.0" for r in rrows)


def test_linear_probe_builtin(spark):
    from radmapper_spark.lang.interp import Interp
    from radmapper_spark.operators.spark_bridge import SparkDB
    df = spark.range(200).select(
        (F.col("id") % 10).cast("double").alias("f1"),
        F.when(F.col("id") % 10 >= 5, 1.0).otherwise(0.0).alias("y"))
    out = Interp(spark).run_raw(
        "$linearProbe($db($t), ['f1'], 'y')", bindings={"$t": df})
    assert isinstance(out, SparkDB)
    assert "probe_score" in out.df.columns
    m = out.df.groupBy("y").agg(F.avg("probe_score").alias("s")).collect()
    s = {r.y: r.s for r in m}
    assert s[1.0] > s[0.0]  # the probe orders the classes correctly


# ======================== from test_round10.py (r14 consolidation) ========
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
