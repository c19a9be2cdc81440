"""Iterative graph algorithms as fixed-iteration DataFrame loops.

PageRank here runs in SCALED-INTEGER arithmetic (ranks are BIGINTs scaled
by 1e12; contributions use integer division): every operation is exact
and order-independent, so the result is bit-identical at any parallelism
AND reproducible by any other engine — the property float PageRank can
never have (double summation is partition-order dependent). The rounding
the integer division introduces is the same rounding a fixed-point HW
implementation makes; for ranking purposes it is far below rank gaps.

Scale shape per iteration: one shuffle join of edges⋈ranks on src (at
100 TB, pre-partition both on src so the join is co-located), one
groupBy(dst) with map-side partial sums. Fixed iterations -> lineage is
bounded; for many iterations checkpoint every ~5 to cut the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10 ** 12


def pagerank(edges: DataFrame, iters: int = 3,
             damping_pct: int = 85) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (src, dst) —
    pass both directions for an undirected graph. Returns (node, rank)
    with rank a BIGINT scaled by 1e12 (initial rank 1.0 per node; the
    classic r = (1-d) + d * sum(r_in/deg_out) formulation, nodes with
    edges only)."""
    if not (0 < damping_pct < 100):
        raise ValueError("damping_pct must be in (1, 99)")
    e = edges.select("src", "dst")
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct())
    base = ((100 - damping_pct) * SCALE) // 100
    ranks = nodes.select("node", F.lit(SCALE).cast("long").alias("rank"))
    for _ in range(iters):
        contrib = (e.join(ranks, e.src == ranks.node)
                   .join(deg, "src")
                   .select(F.col("dst").alias("node"),
                           F.expr("rank div _d").alias("_c")))
        sums = contrib.groupBy("node").agg(F.sum("_c").alias("_s"))
        ranks = (nodes.join(sums, "node", "left")
                 .select("node",
                         (F.lit(base)
                          + F.expr(f"({damping_pct} * coalesce(_s, 0)) "
                                   f"div 100")).cast("long").alias("rank")))
    return ranks
