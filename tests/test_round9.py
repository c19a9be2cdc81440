"""Round-9 hardening tests, one per r8 advisory finding:

- probe-broadcast gate sizes a SINGLE relation, not the join product;
- index compaction swaps via rename-aside (crash keeps a live index);
- _META_CACHE validates against the sidecar fingerprint (cross-process rebuilds
  seen; corrupt sidecars fail loudly);
- streaming admission resolves intra-batch duplicates TRANSITIVELY and
  every audit row references a document that is in the index after the
  batch commits;
- graph auto path selection uses a node-count heuristic and negative
  iters raise.
"""

from __future__ import annotations

import json
import math
import os
import random
import time

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------- graph: negative iters

def _toy_edges(spark):
    pairs = [(i, (i + 1) % 6) for i in range(6)] + [(0, 3), (2, 5)]
    both = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(both, "src long, dst long")


def test_pagerank_negative_iters_raises(spark):
    from radmapper_spark.operators import graph
    with pytest.raises(ValueError, match="iters"):
        graph.pagerank(_toy_edges(spark), iters=-1)


def test_label_propagation_negative_iters_raises(spark):
    from radmapper_spark.operators import graph
    with pytest.raises(ValueError, match="iters"):
        graph.label_propagation(_toy_edges(spark), iters=-3)


# ------------------------------------- graph: node-count auto heuristic

def test_graph_auto_broadcasts_small_nodes_on_large_edge_scan(spark, tmp_path):
    """The |nodes| << |edges| shape the broadcast path exists for: a
    20k-row parquet edge table over 50 nodes. Catalyst's size-only
    stats propagate roughly the edge-scan size through the node-set
    distinct (no aggregate-reduction modeling), so a sizeInBytes-based
    auto gate would refuse to broadcast here; the node-COUNT heuristic
    (50 * BROADCAST_ROW_BYTES = 8 KB vs a 16 KB cap) must pick the
    broadcast path."""
    from radmapper_spark.operators import graph
    rng = random.Random(11)
    rows = [(rng.randrange(50), rng.randrange(50)) for _ in range(20000)]
    spark.createDataFrame(rows, "src long, dst long") \
        .write.mode("overwrite").parquet(str(tmp_path / "bige"))
    e = spark.read.parquet(str(tmp_path / "bige"))
    # sanity: the edge SCAN estimate really is above the cap we set, so
    # a size-propagating gate would have gone partitioned
    from radmapper_spark.operators.plan_stats import est_plan_bytes
    assert est_plan_bytes(e) > 16384
    spark.conf.set("rm.graph.broadcastMaxBytes", "16384")
    try:
        pr = graph.pagerank(e, iters=1)
        assert pr.rm_broadcast_path is True
        pr.rm_release_cache()
    finally:
        spark.conf.unset("rm.graph.broadcastMaxBytes")


# ------------------------------------ probe gate: single-side estimate

def test_probe_broadcast_gate_sizes_single_side(spark, tmp_path):
    """A mid-size stats-bearing probe batch must KEEP the broadcast:
    each join child here is ~300 KB, so the former join-PRODUCT
    estimate (~90 GB) silently lost the broadcast while the honest
    single-side size is far under the 256 MiB default cap."""
    from radmapper_spark.operators import dedup
    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)])
            for i in range(600)]
    spark.createDataFrame(rows, "vec_id long, embedding array<double>") \
        .write.mode("overwrite").parquet(str(tmp_path / "emb"))
    emb = spark.read.parquet(str(tmp_path / "emb"))
    from radmapper_spark.operators.plan_stats import est_plan_bytes
    one_side = est_plan_bytes(emb)
    assert one_side is not None and one_side > 16384, \
        "fixture too small for the product-vs-side distinction"
    path = str(tmp_path / "slidx")
    dedup.build_signlsh_index(emb, path, bands=16, planes_per_band=4)
    out = dedup.neardup_embedding_vs_index(
        emb, path, bands=16, planes_per_band=4, threshold=0.9)
    assert out.rm_probe_broadcast is True
    assert out.count() >= 600  # self-probe: every vector hits itself
    out.rm_release_cache()


# ----------------------------------------- compaction: crash-safe swap

def _tiny_docs(spark):
    rows = [(i, f"the quick brown fox jumps over dog number {i % 3} "
                f"with some shared text body for shingles")
            for i in range(20)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_compact_swap_failure_keeps_live_index(spark, tmp_path,
                                               monkeypatch):
    """A failure moving the compacted copy into place must leave the
    ORIGINAL index readable under its canonical path (the old
    delete-then-move ordering left no index at all)."""
    import shutil
    from radmapper_spark.operators import dedup
    docs = _tiny_docs(spark)
    path = str(tmp_path / "mh")
    dedup.build_minhash_index(docs, path)
    dedup.append_to_minhash_index(docs.limit(3), path)  # replay dups
    before = spark.read.parquet(path).count()

    real_move = shutil.move

    def boom(src, dst):
        raise OSError("simulated crash during swap")

    monkeypatch.setattr(shutil, "move", boom)
    with pytest.raises(OSError, match="simulated crash"):
        dedup.compact_minhash_index(spark, path)
    monkeypatch.setattr(shutil, "move", real_move)
    # live index restored under the canonical path, old-copy debris gone
    assert spark.read.parquet(path).count() == before
    assert not os.path.exists(path + "__old")
    # and a subsequent compaction (move works again) succeeds
    removed = dedup.compact_minhash_index(spark, path)
    assert removed > 0
    assert not os.path.exists(path + "__old")
    assert not os.path.exists(path + "__compact")


def _rewrite_sidecar(path: str, meta: dict) -> None:
    """Simulate ANOTHER PROCESS rewriting <path>/_meta: write the text
    file directly and push the directory mtime forward (local-FS mtime
    is millisecond-granular; successive writes in the same tick would
    hide the change)."""
    d = os.path.join(path, "_meta")
    for f in os.listdir(d):
        if f.endswith(".txt") or f.startswith("part-"):
            os.remove(os.path.join(d, f))
    with open(os.path.join(d, "part-00000-external.txt"), "w") as fh:
        fh.write(json.dumps(meta, sort_keys=True) + "\n")
    future = time.time() + 5
    os.utime(d, (future, future))


def test_index_meta_cache_sees_external_rewrite(spark, tmp_path):
    """A long-lived session must NOT validate probes against a stale
    cached sidecar: after an external rebuild writes new parameters,
    the old-parameter probe must raise (the memoized meta is
    mtime-validated and re-read)."""
    from radmapper_spark.operators import dedup
    from radmapper_spark.operators.index_meta import IndexParamMismatch
    docs = _tiny_docs(spark)
    path = str(tmp_path / "mhx")
    dedup.build_minhash_index(docs, path, num_hashes=32, bands=8)
    # warm the cache with the build-time parameters
    dedup.neardup_vs_index(docs.limit(2), path,
                           num_hashes=32, bands=8).collect()
    _rewrite_sidecar(path, {"kind": "minhash", "num_hashes": 64,
                            "bands": 16, "shingle_k": 5,
                            "hash_mode": "xxhash64"})
    with pytest.raises(IndexParamMismatch):
        dedup.neardup_vs_index(docs.limit(2), path,
                               num_hashes=32, bands=8).collect()


def test_compact_corrupt_sidecar_missing_kind_raises(spark, tmp_path):
    from radmapper_spark.operators import dedup
    from radmapper_spark.operators.index_meta import IndexParamMismatch
    docs = _tiny_docs(spark)
    path = str(tmp_path / "mhk")
    dedup.build_minhash_index(docs, path)
    _rewrite_sidecar(path, {"num_hashes": 32, "bands": 8,
                            "shingle_k": 5, "hash_mode": "xxhash64"})
    with pytest.raises(IndexParamMismatch, match="kind"):
        dedup.compact_minhash_index(spark, path)


# ------------------------------- streaming admission: transitive rule

def _plane_vec(angle, dim=32):
    """Unit vector at ``angle`` radians in the (e1, e2) plane — exact
    pairwise cosines: cos(a - b)."""
    v = [0.0] * dim
    v[0], v[1] = math.cos(angle), math.sin(angle)
    return v


def test_resolve_admission_clean_chain_keeps_representative(spark):
    """Chain A~B, B~C, not A~C: transitive clustering admits only A;
    B audits against A with the direct pair estimate, C audits against
    A (the ADMITTED representative — never the rejected B) with a NULL
    estimate since it only chains transitively."""
    from radmapper_spark.streaming.sinks import _resolve_admission
    batch = spark.createDataFrame(
        [(1,), (2,), (3,), (9,)], "doc_id long")
    hits = spark.createDataFrame(
        [], "new_id long, index_id long, est_jaccard double")
    intra = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.8)],
        "id_a long, id_b long, est_jaccard double")
    audit, rejected = _resolve_admission(
        batch, "doc_id", hits, intra, "est_jaccard")
    got = {(r.new_id, r.index_id): r.est_jaccard for r in audit.collect()}
    assert got == {(2, 1): 0.9, (3, 1): None}
    assert {r.rid for r in rejected.collect()} == {2, 3}


def test_resolve_admission_tainted_cluster_rejected_wholesale(spark):
    """A cluster with an index-hit member is rejected wholesale; the
    loser that did NOT itself hit the index audits against the INDEX
    document the cluster chains to (which is in the index — the old
    pairwise rule recorded the rejected sibling as the 'winner')."""
    from radmapper_spark.streaming.sinks import _resolve_admission
    batch = spark.createDataFrame([(4,), (5,), (6,)], "doc_id long")
    hits = spark.createDataFrame(
        [(4, 100, 0.95)], "new_id long, index_id long, est_jaccard double")
    intra = spark.createDataFrame(
        [(4, 5, 0.9)], "id_a long, id_b long, est_jaccard double")
    audit, rejected = _resolve_admission(
        batch, "doc_id", hits, intra, "est_jaccard")
    got = {(r.new_id, r.index_id): r.est_jaccard for r in audit.collect()}
    assert got == {(5, 100): None}
    assert {r.rid for r in rejected.collect()} == {4, 5}


def test_resolve_admission_pair_cap_raises(spark):
    from radmapper_spark.streaming.sinks import _resolve_admission
    batch = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
    hits = spark.createDataFrame(
        [], "new_id long, index_id long, est_jaccard double")
    intra = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.8)],
        "id_a long, id_b long, est_jaccard double")
    spark.conf.set("rm.stream.intraPairsMax", "1")
    try:
        with pytest.raises(RuntimeError, match="intraPairsMax"):
            _resolve_admission(batch, "doc_id", hits, intra, "est_jaccard")
    finally:
        spark.conf.unset("rm.stream.intraPairsMax")


def test_embedding_admission_chain_end_to_end(spark, tmp_path):
    """End-to-end chained intra-batch dups through the streaming loop:
    batch 1 carries A~B, B~C (not A~C) — only A admitted, C audited
    against A; batch 2 carries D (index dup of A) ~ E (similar to D but
    NOT to A) — both rejected, E audited against A (the index doc), and
    the index gains nothing from batch 2."""
    from radmapper_spark.operators import dedup
    from radmapper_spark.streaming import sinks
    kw = dict(bands=32, planes_per_band=4)
    thr = 0.9
    # exact cosines in the (e1,e2) plane: A-B = cos(.3)=.955, B-C =
    # cos(.3)=.955, A-C = cos(.6)=.825 < thr. D at .37 rad from A
    # (cos=.932 -> index hit), E at .37+.32 rad: E-D cos(.32)=.949
    # (intra pair), E-A cos(.69)=.771 (no hit).
    corpus = spark.createDataFrame(
        [(0, _plane_vec(math.pi / 2))],  # unrelated seed doc
        "vec_id long, embedding array<double>")
    idx = str(tmp_path / "chidx")
    dedup.build_signlsh_index(corpus, idx, **kw)
    b1 = [(1, _plane_vec(0.0)), (2, _plane_vec(0.3)),
          (3, _plane_vec(0.6))]
    b2 = [(4, _plane_vec(0.37)), (5, _plane_vec(0.69))]
    schema = "vec_id long, embedding array<double>"
    src = str(tmp_path / "chin")
    out, ckpt = str(tmp_path / "chout"), str(tmp_path / "chck")
    spark.createDataFrame(b1, schema).coalesce(1) \
        .write.mode("overwrite").parquet(src)

    def run():
        stream = (spark.readStream.schema(corpus.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = sinks.start_embedding_admission(
            stream, idx, out, ckpt, threshold=thr, **kw)
        q.awaitTermination(120)

    run()
    spark.createDataFrame(b2, schema).coalesce(1) \
        .write.mode("append").parquet(src)
    run()
    audit = {(r.new_id, r.index_id): r.cosine
             for r in spark.read.parquet(out).collect()}
    assert (2, 1) in audit and audit[(2, 1)] == pytest.approx(
        math.cos(0.3), abs=1e-9)
    assert (3, 1) in audit and audit[(3, 1)] is None, \
        "chained loser must audit against the ADMITTED representative"
    assert (4, 1) in audit, "index dup missing from audit"
    assert (5, 1) in audit and audit[(5, 1)] is None, \
        "tainted-cluster loser must audit against the INDEX doc"
    assert not any(i in (2, 3, 4, 5) for _, i in audit), \
        "audit references a never-admitted sibling"
    indexed = {r.id for r in spark.read.parquet(f"{idx}/vectors")
               .select("id").distinct().collect()}
    assert indexed == {0, 1}


# ------------------------------- distributed global rank / ntile

@pytest.mark.parametrize("n,k", [(1, 10), (7, 10), (100, 10),
                                 (1003, 10), (64, 7)])
def test_global_ntile_matches_window_ntile(spark, n, k):
    """global_ntile (range shuffle + partition offsets) must assign the
    EXACT same buckets as the single-partition window ntile it
    replaces, including the uneven-remainder sizing, at n<k, n%k==0
    and n%k!=0."""
    from pyspark.sql import Window
    from radmapper_spark.operators.ranking import global_ntile
    rng = random.Random(n * 31 + k)
    rows = [(i, rng.randrange(10**6)) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(8)
    order = [F.col("v").desc(), F.col("id").asc()]
    got = global_ntile(df, k, order, tile_col="tile")
    want = df.withColumn(
        "tile", F.ntile(k).over(Window.orderBy(*order)))
    g = {(r.id, r.tile) for r in got.collect()}
    w = {(r.id, r.tile) for r in want.collect()}
    assert g == w
    got.rm_release_cache()


def test_global_rank_matches_window_rank(spark):
    from pyspark.sql import Window
    from radmapper_spark.operators.ranking import global_rank
    rng = random.Random(5)
    rows = [(i, rng.randrange(50)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(8)
    order = [F.col("v").asc(), F.col("id").asc()]
    got = global_rank(df, order, rank_col="r")
    want = df.withColumn("r", F.row_number().over(Window.orderBy(*order)))
    assert ({(r.id, r.r) for r in got.collect()}
            == {(r.id, r.r) for r in want.collect()})
    got.rm_release_cache()


def test_customer_deciles_window_is_partitioned(spark):
    """The decile entry must not run an UNPARTITIONED window over the
    customer dimension (the old global ntile funneled every customer
    through one task). Every Window node in the physical plan must be
    keyed on the range-partition id. (Exchange SinglePartition nodes
    still appear for grand-total aggregates — those reduce 32 one-row
    partials, the normal scalable shape — so we assert on the Window
    nodes, not on exchanges.)"""
    from radmapper_spark import entrypoints as ep
    df = ep.customer_deciles(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert win_lines, "plan lost its window — test is vacuous"
    assert all("_rm_pid" in ln for ln in win_lines), win_lines
    rows = {r.decile: r.n_customers for r in df.collect()}
    assert set(rows) == set(range(1, 11))
    rel = getattr(df, "rm_release_cache", None)
    rel and rel()


# ------------------------------- distributed embedding linear algebra

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


def test_bounded_global_rank_matches(spark):
    from radmapper_spark.operators.ranking import bounded_global_rank
    df = spark.range(1000).withColumn("v", (F.col("id") * 37) % 101)
    order = [F.col("v").desc(), F.col("id").asc()]
    top = df.orderBy(*order).limit(25)
    got = {(r.id, r.rank) for r in
           bounded_global_rank(top, order, "rank").collect()}
    want_rows = sorted(((r.v, r.id) for r in df.collect()),
                       key=lambda t: (-t[0], t[1]))[:25]
    want = {(vid, i + 1) for i, (_, vid) in enumerate(want_rows)}
    assert got == want


# ------------------ round-9 self-review fixes (one test per finding)

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


def test_global_ntile_preserves_caller_rm_columns(spark):
    """withColumn REPLACES a same-named column, so the internal
    bookkeeping names must dodge the caller's schema instead of
    clobbering (and then dropping) the user's data."""
    from radmapper_spark.operators.ranking import global_ntile
    df = (spark.range(100)
          .withColumn("_rm_pid", F.col("id") * 2)
          .withColumn("_rm_tot", F.col("id") + 7)
          .withColumn("_rm_r", F.col("id") % 3)
          .withColumn("_rm_off", F.lit(9)))
    out = global_ntile(df, 4, [F.col("id")])
    assert {"_rm_pid", "_rm_tot", "_rm_r", "_rm_off"} <= set(out.columns)
    rows = out.orderBy("id").collect()
    assert [r["_rm_pid"] for r in rows] == [i * 2 for i in range(100)]
    assert [r["_rm_tot"] for r in rows] == [i + 7 for i in range(100)]
    assert [r["tile"] for r in rows] == [i // 25 + 1 for i in range(100)]
    out.rm_release_cache()


def test_index_meta_stat_error_keeps_guard(spark, tmp_path, monkeypatch):
    """A transient filesystem stat failure must NOT disable the
    mismatch guard: the cached meta stays enforced, and with a cold
    cache the sidecar is still read (stat-error != absent)."""
    from radmapper_spark.operators import index_meta as im
    p = str(tmp_path / "idx")
    im.write_index_meta(spark, p, "test_kind", {"bands": 8})
    assert im.read_index_meta(spark, p)["bands"] == 8
    monkeypatch.setattr(im, "_meta_fingerprint",
                        lambda s, k: im._STAT_ERROR)
    meta = im.read_index_meta(spark, p)  # warm cache: last-known meta
    assert meta is not None and meta["bands"] == 8
    with pytest.raises(im.IndexParamMismatch, match="bands"):
        im.check_index_meta(spark, p, "test_kind", {"bands": 9}, "probe")
    im._META_CACHE.clear()  # cold cache: falls through to the read
    meta = im.read_index_meta(spark, p)
    assert meta is not None and meta["bands"] == 8


# ---------------------------------------- OPQ rotation + rotated PQ ANN

def test_opq_rotation_orthonormal_deterministic(spark):
    """The rotation is orthonormal (cosine-preserving by construction)
    and BIT-identical at any partitioning — it derives from the
    engine-exact gram aggregate plus driver-side eigh, so parallelism
    cannot perturb it."""
    import numpy as np
    from radmapper_spark.operators import similarity
    emb = _rand_emb(spark, n=300, d=16, parts=5)
    R1, n1 = similarity.opq_rotation(emb, m=8)
    R2, n2 = similarity.opq_rotation(emb.repartition(13), m=8)
    d = R1.shape[0]
    assert np.abs(R1 @ R1.T - np.eye(d)).max() < 1e-9
    assert np.array_equal(R1, R2) and n1 == n2 == 300


def test_opq_rotation_preserves_exact_topk(spark):
    """Rotating corpus AND queries with the shared R leaves the exact
    cosine top-k unchanged — the property that keeps opq_topk's rerank
    stage exact."""
    import numpy as np
    from pyspark.sql import functions as F
    from radmapper_spark.operators import similarity
    from radmapper_spark.operators.linalg import pca_project
    emb = _rand_emb(spark, n=300, d=16, parts=5)
    q = emb.orderBy("vec_id").limit(4).select(
        F.col("vec_id").alias("qid"), "embedding")
    R, n = similarity.opq_rotation(emb, m=8)
    fit = (R, np.ones(16), np.zeros(16), n)
    rc = pca_project(emb, 16, id_col="vec_id", out_col="embedding", fit=fit)
    rq = pca_project(q, 16, id_col="qid", out_col="embedding", fit=fit)
    plain = sorted((r.qid, r.cid, r.rank) for r in
                   similarity.brute_force_topk(emb, q, k=10).collect())
    rot = sorted((r.qid, r.cid, r.rank) for r in
                 similarity.brute_force_topk(rc, rq, k=10).collect())
    assert plain == rot


def test_opq_topk_recall_clears_entry_bar(spark):
    """At the entry's parameters every query's rotated-PQ recall clears
    the driver oracle's 0.85 gate on the fixture embeddings (the entry
    then emits exact rows for gated queries, so boundary-tie candidate
    differences cannot leak into the hash)."""
    from pyspark.sql import functions as F
    from radmapper_spark.operators import similarity
    from radmapper_spark.entrypoints import load_tables
    t = load_tables(spark, "/root/testdata/sf0.001")
    emb = t["embeddings"]
    q = emb.orderBy("vec_id").limit(5).select(
        F.col("vec_id").alias("qid"), "embedding")
    exact = {(r.qid, r.cid) for r in
             similarity.brute_force_topk(emb, q, k=10).collect()}
    opq = {(r.qid, r.cid) for r in
           similarity.opq_topk(emb, q, k=10, m=16, ksub=16,
                               rerank=24).collect()}
    per_q = {}
    for qid, cid in exact:
        per_q.setdefault(qid, [0, 0])[1] += 1
        if (qid, cid) in opq:
            per_q[qid][0] += 1
    recalls = {qid: hit / tot for qid, (hit, tot) in per_q.items()}
    assert min(recalls.values()) >= 0.85, recalls


def test_opq_allocation_balances_eigen_products(spark):
    """The greedy eigenvalue allocation spreads principal directions so
    subspace log-variance products are tighter than grouping the SAME
    sorted eigen-directions contiguously (the naive split it replaces)."""
    import numpy as np
    from radmapper_spark.operators import similarity
    from radmapper_spark.operators.linalg import GRAM_SCALE, gram_matrix
    rng = __import__("random").Random(5)
    # anisotropic: coordinate j scaled by 2^-j/3 — a skewed spectrum
    rows = [(i, [rng.uniform(-1, 1) * (2.0 ** (-j / 3.0))
                 for j in range(16)]) for i in range(400)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").repartition(5)
    R, n = similarity.opq_rotation(emb, m=4)
    G = np.zeros((16, 16))
    for r in gram_matrix(emb, "embedding", dim=16).collect():
        G[r.i - 1, r.j - 1] = G[r.j - 1, r.i - 1] = (
            float(r.gram_scaled) / GRAM_SCALE)
    vals = np.sort(np.linalg.eigvalsh(G / n))[::-1]
    logs = np.log(np.maximum(vals, 1e-12))
    # R's rows are grouped by subspace; recover each row's eigenvalue
    # via the Rayleigh quotient r M2 r^T
    M2 = G / n
    rv = np.array([row @ M2 @ row for row in R])
    alloc = [np.log(np.maximum(rv[j * 4:(j + 1) * 4], 1e-12)).sum()
             for j in range(4)]
    contig = [logs[j * 4:(j + 1) * 4].sum() for j in range(4)]
    assert (max(alloc) - min(alloc)) <= (max(contig) - min(contig)) + 1e-9


def test_opq_error_cases(spark):
    from radmapper_spark.operators import similarity
    emb = _rand_emb(spark, n=50, d=10)
    with pytest.raises(ValueError, match="divisible"):
        similarity.opq_rotation(emb, m=3)
    empty = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no non-null vectors"):
        similarity.opq_rotation(empty, m=2)


def test_opq_codebooks_evicted_by_release(spark):
    """release_codebooks(cache_key) must evict the OPQ rotation AND the
    rotated-space PQ codebooks fitted under that key (a nested tuple
    key would silently dodge the key[0] match and leak)."""
    from pyspark.sql import functions as F
    from radmapper_spark.operators import similarity
    emb = _rand_emb(spark, n=120, d=8)
    q = emb.limit(2).select(F.col("vec_id").alias("qid"), "embedding")
    similarity.opq_topk(emb, q, k=5, m=4, ksub=4, rerank=2,
                        cache_key="evict-me").collect()
    mine = [k for k in similarity._CODEBOOK_CACHE if k[0] == "evict-me"]
    assert len(mine) >= 2  # the rotation and the PQ books
    assert similarity.release_codebooks("evict-me") == len(mine)
    assert not [k for k in similarity._CODEBOOK_CACHE
                if k[0] == "evict-me"]


# ------------------------- ridge linear probe (closed-form classifier)

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
