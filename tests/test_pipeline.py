"""Composed corpus-cleaning pipeline entry: single-plan property and
stage-composition equivalence."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from radmapper_spark import entrypoints
from radmapper_spark.operators import textstats

SF = "/root/testdata/sf0.001"


def test_pipeline_single_scan(spark):
    """The composition must stay ONE lazy plan reading the source once —
    no joins, one parquet relation."""
    df = entrypoints.pipeline_corpus_clean(spark, SF)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Relation") == 1


def test_pipeline_equals_staged_execution(spark, tables):
    """Running the stages eagerly (materializing between steps) must give
    the same result as the fused single plan."""
    fused = sorted(map(tuple,
                       entrypoints.pipeline_corpus_clean(spark, SF).collect()))

    docs = tables["documents"]
    scored = textstats.lang_id(textstats.quality_score(docs)).cache()
    scored.count()  # materialize stage 1
    filtered = scored.filter((F.col("quality") >= 0.6)
                             & (F.col("lang_pred") != "und")).cache()
    filtered.count()  # materialize stage 2
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    w = Window.partitionBy(norm).orderBy(F.col("doc_id").asc())
    kept = (filtered.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1))
    n_tok = F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    staged = (kept.groupBy("source", "lang_pred")
              .agg(F.count(F.lit(1)).alias("n_docs"),
                   F.sum(n_tok.cast("long")).alias("n_tokens"),
                   F.sum(F.col("quality").cast("decimal(18,2)")).alias("_qsum"))
              .select("source", "lang_pred", "n_docs", "n_tokens",
                      F.round(F.col("_qsum").cast("double") / F.col("n_docs"),
                              6).alias("avg_quality")))
    assert sorted(map(tuple, staged.collect())) == fused
    scored.unpersist()
    filtered.unpersist()
