"""Skew-handling utilities for the 100 TB path.

AQE's skew-join splitting (enabled in session.py) handles most skew by
splitting oversized partitions at runtime. These utilities cover the
cases AQE can't:

- salted_join: a SINGLE hot key (power-law key, null-ish default key)
  concentrates one hash partition on one executor even after AQE splits —
  salting spreads the hot key's rows across `num_salts` partitions by
  replicating the other side. Deterministic (hash-of-row salt, no rand()),
  so retries/speculative tasks reproduce identical output.
- salted_two_phase_agg: groupBy on a hot key where the per-key combine is
  heavy (collect_set/approx sketches). Algebraic aggs (sum/count/min/max)
  already combine map-side; for those plain groupBy is optimal and this
  helper just costs an extra shuffle.

Cost model (document for planners): salting multiplies the REPLICATED
side's shuffle volume by num_salts. Use when straggler time >> replicated
shuffle time — i.e. genuinely hot keys, not mild skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "_rm_salt"


def top_keys(df: DataFrame, col: str, n: int = 10) -> list:
    """Skew diagnosis: the n hottest values of `col` as (value, count)
    tuples, hottest first — run this on a sample before deciding whether
    a join needs salting (one groupBy-count, map-side combined)."""
    return [(r[col], r["count"]) for r in
            df.groupBy(col).count().orderBy(F.desc("count")).limit(n).collect()]


def salted_join(big: DataFrame, other: DataFrame, on: list[str] | str,
                num_salts: int = 8, how: str = "inner",
                salt: int | None = None) -> DataFrame:
    """Equi-join where `big`'s join keys are skewed: `big` rows get a
    deterministic salt in [0, num_salts); `other` is replicated once per
    salt value; the join adds the salt to the equi-keys, so a hot key's
    rows land on `num_salts` reducers instead of one.

    `other` is typically the smaller (but not broadcastable) side —
    replication multiplies its shuffle volume by num_salts."""
    if how not in ("inner", "left", "left_outer", "leftsemi", "left_semi",
                   "leftanti", "left_anti"):
        # an outer join on the REPLICATED side would duplicate its
        # unmatched rows num_salts times
        raise ValueError(f"salted_join cannot preserve the replicated side "
                         f"(how={how!r}); swap the sides")
    if salt is not None:  # accepted alias
        num_salts = salt
    on = [on] if isinstance(on, str) else list(on)
    # salt from the whole row hash: deterministic under retries, and
    # spreads rows of the SAME hot key (a key-derived salt would not)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                  F.lit(num_salts)).cast("int")
    l = big.withColumn(SALT, salt)
    r = other.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(num_salts)])))
    return l.join(r, on=on + [SALT], how=how).drop(SALT)


def salted_two_phase_agg(df: DataFrame, keys: list[str] | str,
                         aggs: dict, num_salts: int = 8) -> DataFrame:
    """Two-phase aggregation for hot grouping keys: phase 1 aggregates on
    (keys + salt) — the hot key's rows combine on num_salts reducers —
    phase 2 combines the partials on keys alone (tiny input).

    `aggs` maps output column -> ('sum'|'count'|'min'|'max'|'collect_set',
    input column). Each agg must be decomposable into (partial, combine):
    count combines by sum, collect_set by flatten+distinct."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                  F.lit(num_salts)).cast("int")
    partial_exprs, combine_exprs = [], []
    for out, (kind, col) in aggs.items():
        p = f"_p_{out}"
        if kind == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            combine_exprs.append(F.sum(p).alias(out))
        elif kind == "count":
            partial_exprs.append(F.count(col).alias(p))
            combine_exprs.append(F.sum(p).cast("long").alias(out))
        elif kind == "min":
            partial_exprs.append(F.min(col).alias(p))
            combine_exprs.append(F.min(p).alias(out))
        elif kind == "max":
            partial_exprs.append(F.max(col).alias(p))
            combine_exprs.append(F.max(p).alias(out))
        elif kind == "collect_set":
            partial_exprs.append(F.collect_set(col).alias(p))
            combine_exprs.append(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list(p))))
                .alias(out))
        else:
            raise ValueError(f"unsupported agg kind {kind!r}")
    phase1 = df.withColumn(SALT, salt).groupBy(*keys, SALT).agg(*partial_exprs)
    return phase1.groupBy(*keys).agg(*combine_exprs)
