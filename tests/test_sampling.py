"""Deterministic sampling/split operators: reproducibility, append
stability, stratified caps, and the map-only plan property."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from radmapper_spark.operators import sampling


def _py_bucket(salt: str, ident, buckets: int) -> int:
    """Python twin of the portable 60-bit bucket hash (engine-independent
    expected values)."""
    return int(hashlib.md5(f"{salt}:{ident}".encode()).hexdigest()[:15], 16) % buckets


def test_split_disjoint_exhaustive_and_expected(tables):
    docs = tables["documents"]
    out = sampling.hash_split(docs, "doc_id").select("doc_id", "bucket", "split")
    rows = out.collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert r["bucket"] == _py_bucket("split", r["doc_id"], 1000)
        expected = ("train" if r["bucket"] < 800
                    else "val" if r["bucket"] < 900 else "test")
        assert r["split"] == expected


def test_split_append_stable(tables):
    """Assignments must not depend on which other rows are present."""
    docs = tables["documents"]
    full = {r["doc_id"]: r["split"]
            for r in sampling.hash_split(docs, "doc_id").collect()}
    subset = {r["doc_id"]: r["split"]
              for r in sampling.hash_split(
                  docs.filter(F.col("doc_id") % 7 == 0), "doc_id").collect()}
    for k, v in subset.items():
        assert full[k] == v


def test_split_map_only_plan(tables):
    """hash_split must add NO exchange: at 100 TB the split is a free
    projection fused into the scan."""
    plan = (sampling.hash_split(tables["documents"], "doc_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_deterministic_sample_reproducible(tables):
    docs = tables["documents"]
    a = sorted(r["doc_id"] for r in
               sampling.deterministic_sample(docs, "doc_id", 0.3).collect())
    b = sorted(r["doc_id"] for r in
               sampling.deterministic_sample(docs, "doc_id", 0.3).collect())
    assert a == b
    n = docs.count()
    assert 0.15 * n < len(a) < 0.45 * n  # ~rate, loose bound for small n


def test_sample_rate_monotone(tables):
    """A row kept at rate r must be kept at any rate r' > r (nested
    samples — the property hash-bucket sampling has and rand() lacks)."""
    docs = tables["documents"]
    small = set(r["doc_id"] for r in
                sampling.deterministic_sample(docs, "doc_id", 0.2).collect())
    big = set(r["doc_id"] for r in
              sampling.deterministic_sample(docs, "doc_id", 0.5).collect())
    assert small <= big


def test_cap_per_group(tables):
    docs = tables["documents"]
    out = sampling.cap_per_group(docs, "lang", "doc_id", 10)
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    orig = {r["lang"]: r["n"] for r in
            docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in counts.items():
        assert n == min(10, orig[lang])
    # kept set = the n smallest by (hash, id) — verify against python twin
    kept = {(r["lang"], r["doc_id"]) for r in out.collect()}
    all_rows = docs.select("lang", "doc_id").collect()
    by_lang: dict = {}
    for r in all_rows:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    expected = set()
    for lang, ids in by_lang.items():
        ranked = sorted(ids, key=lambda i: (_py_bucket("cap", i, 1 << 40), i))
        expected |= {(lang, i) for i in ranked[:10]}
    assert kept == expected


def test_mixture_sample_rates_and_determinism(spark, tables):
    """mixture_sample keeps ~rate of each group, deterministically, and
    drops groups missing from the rate table."""
    from pyspark.sql import functions as F
    from radmapper_spark.operators import sampling
    docs = tables["documents"]
    rates = spark.createDataFrame(
        [("src0", 1.0), ("src1", 0.5), ("src2", 0.0)],
        ["source", "rate"])
    out = sampling.mixture_sample(docs, "source", rates, "doc_id")
    per = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    totals = {r["source"]: r["n"] for r in
              docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    assert set(per) <= {"src0", "src1"}          # src2 and others dropped
    assert per["src0"] == totals["src0"]          # rate 1.0 keeps all
    frac = per.get("src1", 0) / totals["src1"]
    assert 0.2 < frac < 0.8                       # ~0.5, small-n tolerance
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in
               sampling.mixture_sample(docs, "source", rates,
                                       "doc_id").collect())
    assert a == b                                 # deterministic


def test_weighted_sample_statistical_bias(spark):
    """Heavier rows must be sampled more often: plant one group where a
    few rows carry 100x weight; over the deterministic draw they should
    dominate the selection."""
    from pyspark.sql import functions as F
    from radmapper_spark.operators import sampling
    rows = [("g", i, 1000 if i < 20 else 10) for i in range(400)]
    df = spark.createDataFrame(rows, "source string, doc_id long, w long")
    out = sampling.weighted_sample_per_group(
        df, "source", "doc_id", "w", k=20).collect()
    heavy = sum(1 for r in out if r.doc_id < 20)
    assert len(out) == 20
    # 20 rows at 100x weight vs 380 at 1x: expected heavy share >> half
    assert heavy >= 12


def test_weighted_sample_zero_weight_never_wins(spark):
    from radmapper_spark.operators import sampling
    rows = [("g", i, 0 if i % 2 else 5) for i in range(40)]
    df = spark.createDataFrame(rows, "source string, doc_id long, w long")
    out = sampling.weighted_sample_per_group(
        df, "source", "doc_id", "w", k=15).collect()
    assert all(r.w > 0 for r in out)


def test_negative_weight_rejected_global(spark):
    """r13 advice: a negative weight breaks the contiguous-prefix
    contract silently (the running total dips back under budget) and
    BOTH engines compute the same arithmetic, so only an engine-side
    guard can catch it. global_cumsum (token_budget_select's core)
    raises at execution via the P-row offset aggregate."""
    import pytest

    df = spark.createDataFrame(
        [(1, 10), (2, -3), (3, 10)], "doc_id long, w long")
    out = sampling.token_budget_select(df, 15, [F.col("doc_id").asc()],
                                       "w")
    with pytest.raises(Exception, match="negative"):
        out.collect()


def test_negative_weight_rejected_per_group(spark):
    import pytest

    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, -3), ("a", 3, 10)],
        "g string, doc_id long, w long")
    out = sampling.token_budget_select_per_group(
        df, "g", 15, [F.col("doc_id").asc()], "w")
    with pytest.raises(Exception, match="negative"):
        out.collect()


def test_nonnegative_weights_unaffected_by_guard(spark):
    """The guard must be invisible for valid input: zero weights are
    fine and the kept set is the exact budget prefix."""
    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, 5), (4, 5), (5, 1)], "doc_id long, w long")
    kept = sorted(r.doc_id for r in sampling.token_budget_select(
        df, 10, [F.col("doc_id").asc()], "w").collect())
    assert kept == [1, 2, 3]
    kept_g = sorted(r.doc_id for r in sampling.token_budget_select_per_group(
        df.withColumn("g", F.lit("x")), "g", 10,
        [F.col("doc_id").asc()], "w").collect())
    assert kept_g == [1, 2, 3]


def test_duck_mixture_sql_computed_exprs():
    """r13 advice: duck_mixture_temperature_sql silently emitted invalid
    SQL for computed group/id expressions (the outer query re-selected
    the raw expression text outside its scope). With explicit names the
    aliased form must execute; without them a computed expression must
    be rejected loudly, not emitted broken."""
    import duckdb
    import pytest

    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT i AS doc_id, "
                "chr(97 + (i % 3)::INT) AS lang "
                "FROM range(100) t(i)")
    sql = sampling.duck_mixture_temperature_sql(
        "upper(lang)", "doc_id + 0", 30, alpha=0.5,
        group_name="lang_u", id_name="doc_id")
    out = con.execute(sql).fetchall()
    assert len(out) == 30
    cols = [d[0] for d in con.execute(sql).description]
    assert cols == ["doc_id", "lang_u", "mix_rank", "target_n"]
    with pytest.raises(ValueError, match="bare identifier"):
        sampling.duck_mixture_temperature_sql("lower(lang)", "doc_id", 10)


def test_weighted_sample_append_stability(spark):
    """Adding rows never reshuffles the survivors arbitrarily: every
    evicted row is replaced only by a newcomer with a stronger key
    (subset property of A-ES under a fixed hash draw)."""
    from radmapper_spark.operators import sampling
    rows = [("g", i, (i % 7) + 1) for i in range(100)]
    more = rows + [("g", 1000 + i, (i % 7) + 1) for i in range(50)]
    df1 = spark.createDataFrame(rows, "source string, doc_id long, w long")
    df2 = spark.createDataFrame(more, "source string, doc_id long, w long")
    s1 = {r.doc_id for r in sampling.weighted_sample_per_group(
        df1, "source", "doc_id", "w", k=10).collect()}
    s2 = {r.doc_id for r in sampling.weighted_sample_per_group(
        df2, "source", "doc_id", "w", k=10).collect()}
    # survivors of the bigger set that are old rows must be a subset of
    # the original selection (keys are fixed per id)
    assert {d for d in s2 if d < 1000} <= s1
