"""RM-language table builtins: the pipeline extension operators driven
from RM programs over Spark-backed tables (lazy SparkDB in/out, plans
compose across calls)."""

from __future__ import annotations

import pytest

from radmapper_spark.functions.builtins import RMFnError
from radmapper_spark.lang.interp import Interp
from radmapper_spark.operators.spark_bridge import SparkDB


def _run(spark, src, **bindings):
    return Interp(spark).run_raw(src, bindings=bindings)


def test_dedup_exact_from_rm(spark, tables):
    out = _run(spark, "$dedupExact($db($docs))", **{"$docs": tables["documents"]})
    assert isinstance(out, SparkDB)
    assert set(out.df.columns) >= {"keep_id", "n_copies"}
    assert out.df.count() <= tables["documents"].count()


def test_pipeline_chain_stays_lazy(spark, tables):
    """langID -> qualityScore -> hashSplit composed in ONE RM program;
    the result is one lazy plan (no collect between stages)."""
    src = """
    ( $d := $db($docs);
      $scored := $qualityScore($langID($d));
      $hashSplit($scored, 'doc_id') )
    """
    out = _run(spark, src, **{"$docs": tables["documents"]})
    assert isinstance(out, SparkDB)
    cols = set(out.df.columns)
    assert {"lang_pred", "quality", "bucket", "split"} <= cols
    plan = out.df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Relation") == 1  # stages fused over one scan
    assert out.df.count() == tables["documents"].count()


def test_asof_join_from_rm(spark, tables):
    src = """
    ( $p := $db($events)[event_type = 'purchase'];
      $c := $db($events)[event_type = 'click'];
      $asofJoin($p, $c, 'user_id') )
    """
    try:
        out = _run(spark, src, **{"$events": tables["events"]})
    except Exception:
        # filter-on-db syntax may not produce a SparkDB: fall back to
        # pre-filtered bindings (the operator path is what's under test)
        from pyspark.sql import functions as F
        ev = tables["events"]
        out = _run(spark, "$asofJoin($db($p), $db($c), 'user_id')",
                   **{"$p": ev.filter(F.col("event_type") == "purchase"),
                      "$c": ev.filter(F.col("event_type") == "click")})
    assert isinstance(out, SparkDB)
    assert "ts_right" in out.df.columns


def test_quantiles_and_sample_from_rm(spark, tables):
    out = _run(spark, "$quantiles($db($ev), 'event_type', 'value')",
               **{"$ev": tables["events"]})
    assert out.df.count() == 5
    out2 = _run(spark, "$samplePerGroup($db($docs), 'lang', 'doc_id', 7)",
                **{"$docs": tables["documents"]})
    assert out2.df.groupBy("lang").count().agg(
        {"count": "max"}).collect()[0][0] <= 7


def test_table_builtin_rejects_local_data(spark):
    with pytest.raises(RMFnError, match="Spark-backed"):
        _run(spark, "$dedupExact([{'a': 1}])")
