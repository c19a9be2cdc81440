"""Window-tie determinism under repartitioning (VERDICT r6 item 9).

A window whose ORDER BY admits ties produces partition-order-dependent
row_number/ntile output — green on one shuffle layout, red on the next.
Every ranked entry must therefore order on a UNIQUE tiebreaker; these
tests prove it by running each operator under three adversarial input
partitionings (1 partition, 32 hash partitions, range-partitioned) and
asserting bit-identical output.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from radmapper_spark.entrypoints import ENTRIES
from radmapper_spark.operators import sampling
from radmapper_spark.session import load_tables

SF = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def _layouts(df, key):
    return [df.coalesce(1),
            df.repartition(32),
            df.repartitionByRange(7, F.col(key))]


def test_cap_per_group_stable_across_partitionings(spark):
    ev = load_tables(spark, SF)["events"]
    outs = [_canon(sampling.cap_per_group(d, "user_id", "event_id", 5))
            for d in _layouts(ev, "ts")]
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) > 0


def test_weighted_sample_stable_across_partitionings(spark):
    docs = load_tables(spark, SF)["documents"]
    with_w = docs.select("source", "doc_id",
                         (F.length("text") + 1).cast("double").alias("w"))
    outs = [_canon(sampling.weighted_sample_per_group(
                d, "source", "doc_id", "w", k=10))
            for d in _layouts(with_w, "doc_id")]
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) > 0


@pytest.mark.parametrize("entry", [
    "customer_deciles",     # global ntile(10) over (spend desc, custkey)
    "sample_per_group",     # per-group row_number over (hash, id)
    "weighted_sample",      # per-group row_number over (A-ES key, id)
    "window_battery",       # lag/lead/dense_rank/ntile over (ts, event_id)
    "temporal_sessionize",  # cumulative-sum session ids over (ts, event_id)
])
def test_ranked_entry_stable_across_shuffle_partition_counts(spark, entry):
    """Registry-level: the driver runs entries under ITS OWN session conf,
    so ranked entries must not depend on spark.sql.shuffle.partitions."""
    fn, _sql = ENTRIES[entry]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        a = _canon(fn(spark, SF))
        spark.conf.set("spark.sql.shuffle.partitions", "37")
        b = _canon(fn(spark, SF))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b
    assert len(a) > 0
