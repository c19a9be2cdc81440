"""Data-quality expectation checks (operators/quality.py).

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
def test_dq_checks_crafted_violations(spark):
    from radmapper_spark.operators import quality as Q
    dim = spark.createDataFrame([(1,), (2,)], "k long")
    fact = spark.createDataFrame(
        [(1, 1, 5.0), (2, 1, None), (3, 9, -1.0), (3, 9, 2.0)],
        "id long, fk long, v double")
    rep = {r.check: r for r in Q.run_checks([
        Q.unique_key_check(fact, ["id"], "fact"),
        Q.foreign_key_check(fact, "fk", dim, "k", "fact"),
        Q.not_null_check(fact, "v", "fact"),
        Q.domain_check(fact, F.col("v") >= 0, "domain(v>=0)", "fact"),
    ]).collect()}
    assert rep["unique(id)"].n_violations == 1          # id=3 twice
    assert rep["fk(fk->k)"].n_violations == 2           # fk=9 twice
    assert rep["not_null(v)"].n_violations == 1
    # NULL v counts as a domain violation too (coalesce false)
    assert rep["domain(v>=0)"].n_violations == 2
    assert not rep["unique(id)"].ok


def test_dq_checks_all_green_on_clean_table(spark):
    from radmapper_spark.operators import quality as Q
    t = spark.createDataFrame([(1, 2.0), (2, 3.0)], "id long, v double")
    rep = Q.run_checks([
        Q.unique_key_check(t, ["id"], "t"),
        Q.not_null_check(t, "v", "t"),
        Q.domain_check(t, F.col("v") > 0, "domain(v>0)", "t"),
    ]).collect()
    assert all(r.ok and r.n_violations == 0 for r in rep)
