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
             damping_pct: int = 85,
             broadcast_ranks: bool = True) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (src, dst) —
    pass both directions for an undirected graph. Returns (node, rank)
    with rank a BIGINT scaled by 1e12 (initial rank 1.0 per node; the
    classic r = (1-d) + d * sum(r_in/deg_out) formulation, nodes with
    edges only).

    broadcast_ranks=True broadcasts the (node, rank) and degree tables
    into the per-iteration edge join — each iteration is then a MAP-ONLY
    pass over the edges plus one small aggregate, no edge shuffle.
    Right for |nodes| << |edges| (the common web/trade-graph shape).
    Disable when the node set itself is huge; then pre-partition edges
    and ranks on src so the iteration join is co-located."""
    if not (0 < damping_pct < 100):
        raise ValueError("damping_pct must be in (1, 99)")
    # LAZY persists break the O(iters^2) lineage blowup: without them,
    # iteration i's plan re-executes every earlier iteration AND the
    # caller's (possibly expensive) edge derivation once per reference —
    # measured 8.7s -> ~3s at sf0.1 with 3 iterations. No action is
    # triggered here (construction stays job-free); each cache fills on
    # the first action that uses it. rm_release_cache on the result
    # unpersists everything.
    # skip the re-persist when the caller already caches the edge table
    # (the registry's shared _trade_edges does): a second materialized
    # copy of the same 1.17M rows buys nothing and costs a full pass +
    # executor memory per invocation
    e = edges.select("src", "dst")
    cached = []
    if not edges.is_cached:
        e = e.persist()
        cached.append(e)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_d")).persist()
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct().persist())
    cached += [deg, nodes]
    base = ((100 - damping_pct) * SCALE) // 100
    ranks = nodes.select("node", F.lit(SCALE).cast("long").alias("rank"))
    for i in range(iters):
        # per-source contribution (rank div out-degree) is computed on
        # the SMALL side before it meets the edges: one node-sized
        # (node, _rc) table per iteration instead of separate rank and
        # degree joins against the edge stream. With broadcast_ranks the
        # edge pass is then map-only with ONE broadcast (measured 2x
        # over broadcasting ranks and deg separately: 6.9 s -> 3.5 s for
        # 3 iterations over 1.17M edges at sf0.1).
        rd = (ranks.join(deg, ranks.node == deg.src)
              .select("src", F.expr("rank div _d").alias("_rc")))
        r_in = F.broadcast(rd) if broadcast_ranks else rd
        contrib = (e.join(r_in, "src")
                   .select(F.col("dst").alias("node"),
                           F.col("_rc").alias("_c")))
        sums = contrib.groupBy("node").agg(F.sum("_c").alias("_s"))
        if broadcast_ranks:
            # |sums| <= |nodes| (small by the broadcast_ranks contract):
            # broadcasting it makes the rank-update join map-only too —
            # the only shuffle left per iteration is the contrib groupBy
            sums = F.broadcast(sums)
        ranks = (nodes.join(sums, "node", "left")
                 .select("node",
                         (F.lit(base)
                          + F.expr(f"({damping_pct} * coalesce(_s, 0)) "
                                   f"div 100")).cast("long").alias("rank")))
        if i < iters - 1:  # intermediate ranks feed the next iteration
            ranks = ranks.persist()
            cached.append(ranks)

    def _release(frames=tuple(cached)):
        for f in frames:
            f.unpersist()

    ranks.rm_release_cache = _release
    return ranks


def label_propagation(edges: DataFrame, iters: int = 2,
                      broadcast_labels: bool = True) -> DataFrame:
    """Synchronous label propagation for community detection, made
    DETERMINISTIC (the classic algorithm's random tie-break makes runs
    incomparable): every node starts with its own label; each iteration
    it adopts the most frequent label among in-neighbors, ties broken by
    the SMALLEST label; isolated-in nodes keep their label. Fixed
    iterations, engine-exact — the same reproducibility contract as the
    scaled-integer PageRank above.

    Per iteration: one broadcast of the (node, label) table into a
    map-only edge pass, a (dst, label) count aggregate with map-side
    partials, and a min-struct argmax — the label table is node-sized
    (broadcast_labels contract; disable and pre-partition on src when
    the node set itself is huge). Lazy persists bound the lineage.
    Returns (node, label).
    """
    e = edges.select("src", "dst")
    cached = []
    if not edges.is_cached:
        e = e.persist()
        cached.append(e)
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct().persist())
    cached.append(nodes)
    labels = nodes.select("node", F.col("node").alias("label"))
    for i in range(iters):
        lab = labels.select(F.col("node").alias("src"), "label")
        l_in = F.broadcast(lab) if broadcast_labels else lab
        # ONE exchange for both aggregates: hash-partitioning the joined
        # edge stream on dst satisfies ClusteredDistribution for BOTH the
        # (dst, label) count and the per-dst argmax (subset rule), so
        # neither groupBy re-shuffles — measured 2 full-volume exchanges
        # -> 1 per iteration (iteration 1's (dst, label) partials don't
        # reduce at all: with self-labels every edge is a distinct pair)
        votes = (e.join(l_in, "src")
                 .repartition(F.col("dst"))
                 .groupBy(F.col("dst").alias("node"), "label")
                 .agg(F.count(F.lit(1)).alias("_c")))
        # deterministic argmax: highest count, then SMALLEST label —
        # expressed as min over (-count, label)
        best = (votes.groupBy("node")
                .agg(F.min(F.struct((-F.col("_c")).alias("nc"),
                                    F.col("label").alias("l")))
                     .alias("_b"))
                .select("node", F.col("_b.l").alias("_new")))
        upd = F.broadcast(best) if broadcast_labels else best
        labels = (labels.join(upd, "node", "left")
                  .select("node", F.coalesce("_new", "label")
                          .alias("label")))
        if i < iters - 1:
            labels = labels.persist()
            cached.append(labels)

    def _release(frames=tuple(cached)):
        for f in frames:
            f.unpersist()

    labels.rm_release_cache = _release
    return labels
