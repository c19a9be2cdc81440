"""Round-8 hardening tests: session-cache identity, persisted-index
metadata guards, probe schema/broadcast fixes, graph auto path
selection, pagerank iters=0, and the document-shaped spill path."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_SMOKE = "/root/testdata/sf0.001"


# --------------------------------------------------- session cache identity

def test_table_cache_survives_session_restart():
    """Stop a session, build a new one, and assert fresh usable plans:
    the table cache must key by (applicationId, startTime), never
    id(spark) (CPython reuses freed addresses, so a new session can
    alias a dead one's id and get plans bound to a stopped context).
    Runs in a subprocess so the suite's shared session is untouched."""
    script = r"""
import os, sys
sys.path.insert(0, %r)
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
from radmapper_spark.session import get_spark, load_tables, session_key, _TABLE_CACHE
a = get_spark("restart-a")
key_a = session_key(a)
t = load_tables(a, %r)
assert t["region"].count() > 0
a.stop()
b = get_spark("restart-b")
key_b = session_key(b)
assert key_a != key_b, "restarted session must get a fresh cache key"
t2 = load_tables(b, %r)
# fresh plans: these frames must be bound to the LIVE session
assert t2["region"].count() > 0
assert t2["orders"].select("o_orderkey").limit(1).collect()
assert all(k[0] == key_b for k in _TABLE_CACHE), "dead-session entries not evicted"
b.stop()
print("RESTART_OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", script % (REPO, SF_SMOKE, SF_SMOKE)],
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-4000:]
    assert "RESTART_OK" in out.stdout


# --------------------------------------------------- index metadata guards

def _tiny_docs(spark):
    rows = [(i, f"the quick brown fox jumps over dog number {i % 3} "
                f"with some shared text body for shingles") for i in range(20)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _tiny_emb(spark, ids=None):
    import random
    rng = random.Random(7)
    ids = ids if ids is not None else list(range(30))
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in ids]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_minhash_index_meta_mismatch_raises(spark, tmp_path):
    from radmapper_spark.operators import dedup
    from radmapper_spark.operators.index_meta import IndexParamMismatch
    docs = _tiny_docs(spark)
    path = str(tmp_path / "mh")
    dedup.build_minhash_index(docs, path)
    # matched probe runs
    dedup.neardup_vs_index(docs, path).collect()
    with pytest.raises(IndexParamMismatch, match="num_hashes"):
        dedup.neardup_vs_index(docs, path, num_hashes=16, bands=4)
    with pytest.raises(IndexParamMismatch, match="hash_mode"):
        dedup.neardup_vs_index(docs, path, hash_mode="portable")


def test_signlsh_index_meta_mismatch_raises(spark, tmp_path):
    from radmapper_spark.operators import dedup
    from radmapper_spark.operators.index_meta import IndexParamMismatch
    emb = _tiny_emb(spark)
    path = str(tmp_path / "sl")
    dedup.build_signlsh_index(emb, path, bands=24, planes_per_band=8)
    got = dedup.neardup_embedding_vs_index(
        emb, path, bands=24, planes_per_band=8)
    got.collect()
    got.rm_release_cache()
    with pytest.raises(IndexParamMismatch, match="seed"):
        dedup.neardup_embedding_vs_index(emb, path, bands=24,
                                         planes_per_band=8, seed=43)
    with pytest.raises(IndexParamMismatch, match="bands"):
        dedup.neardup_embedding_vs_index(emb, path)  # default bands=192


def test_ivf_search_rejects_wrong_index_kind(spark, tmp_path):
    from radmapper_spark.operators import dedup, similarity
    from radmapper_spark.operators.index_meta import IndexParamMismatch
    emb = _tiny_emb(spark)
    path = str(tmp_path / "sl2")
    dedup.build_signlsh_index(emb, path, bands=8, planes_per_band=8)
    q = emb.limit(2).select(F.col("vec_id").alias("qid"), "embedding")
    with pytest.raises(IndexParamMismatch, match="kind"):
        similarity.search_ivf_index(spark, path, q, k=3)


def test_index_meta_invisible_to_parquet_reader(spark, tmp_path):
    """The _meta sidecar must not pollute the index data scan (underscore
    paths are hidden from Hadoop input listings)."""
    from radmapper_spark.operators import dedup
    docs = _tiny_docs(spark)
    path = str(tmp_path / "mh2")
    dedup.build_minhash_index(docs, path)
    cols = set(spark.read.parquet(path).columns)
    assert cols == {"band", "bhash", "id", "minhash"}


# ------------------------------------------- embedding probe schema/broadcast

def test_embedding_probe_string_ids(spark, tmp_path):
    """$probeEmbeddingIndex is exposed to arbitrary tables: the probe's
    output id columns must carry the INPUT id types, not hardcoded
    bigint."""
    from radmapper_spark.operators import dedup
    vecs = {"a": [1.0, 0.0, 0.0, 0.5], "b": [0.0, 1.0, 0.0, 0.5],
            "c": [0.0, 0.0, 1.0, 0.5]}
    corpus = spark.createDataFrame(
        [(k, v) for k, v in vecs.items()],
        "vec_id string, embedding array<double>")
    path = str(tmp_path / "slstr")
    dedup.build_signlsh_index(corpus, path, bands=16, planes_per_band=4)
    probe = spark.createDataFrame(
        [("p1", vecs["a"])], "vec_id string, embedding array<double>")
    out = dedup.neardup_embedding_vs_index(
        probe, path, bands=16, planes_per_band=4, threshold=0.99)
    dt = dict(out.dtypes)
    assert dt["new_id"] == "string" and dt["index_id"] == "string"
    rows = out.collect()
    out.rm_release_cache()
    assert {(r.new_id, r.index_id) for r in rows} == {("p1", "a")}
    assert abs(rows[0].cosine - 1.0) < 1e-12


def test_embedding_probe_broadcast_gated_by_size(spark, tmp_path):
    """With rm.index.probeBroadcastMaxBytes=1 the probe side must NOT be
    broadcast (fall back to a shuffled join) — and results must be
    identical to the broadcast path. The probe comes from parquet so
    the optimizer has REAL size stats: stats-less frames (local
    relations, streaming micro-batches) carry the no-stats sentinel and
    deliberately KEEP the broadcast."""
    from radmapper_spark.operators import dedup
    _tiny_emb(spark).write.parquet(str(tmp_path / "embp"))
    emb = spark.read.parquet(str(tmp_path / "embp"))
    path = str(tmp_path / "slbc")
    dedup.build_signlsh_index(emb, path, bands=16, planes_per_band=4)

    def run():
        out = dedup.neardup_embedding_vs_index(
            emb, path, bands=16, planes_per_band=4, threshold=0.9)
        rows = {(r.new_id, r.index_id, round(r.cosine, 9))
                for r in out.collect()}
        plan = out._jdf.queryExecution().executedPlan().toString()
        out.rm_release_cache()
        return rows, plan

    bc_rows, bc_plan = run()
    spark.conf.set("rm.index.probeBroadcastMaxBytes", "1")
    try:
        sh_rows, sh_plan = run()
    finally:
        spark.conf.unset("rm.index.probeBroadcastMaxBytes")
    assert sh_rows == bc_rows
    # self-probe of the index always hits (cos=1.0), so the plan really ran
    assert bc_rows, "probe found no pairs — test is vacuous"


# --------------------------------------------------- graph path auto-select

def _toy_edges(spark):
    pairs = [(i, (i + 1) % 6) for i in range(6)] + [(0, 3), (2, 5)]
    both = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(both, "src long, dst long")


def test_pagerank_iters_zero_returns_initial_ranks(spark):
    from radmapper_spark.operators import graph
    pr = graph.pagerank(_toy_edges(spark), iters=0)
    rows = pr.collect()
    assert len(rows) == 6
    assert all(r.rank == graph.SCALE for r in rows)


def test_graph_auto_selects_broadcast_path(spark):
    from radmapper_spark.operators import graph
    e = _toy_edges(spark)
    pr = graph.pagerank(e, iters=2)
    assert pr.rm_broadcast_path is True
    pr.rm_release_cache()
    lp = graph.label_propagation(e, iters=1)
    assert lp.rm_broadcast_path is True
    lp.rm_release_cache()


def test_graph_auto_selects_partitioned_above_threshold(spark, tmp_path):
    """Above rm.graph.broadcastMaxBytes the default path must go
    co-partitioned — and stay bit-identical to the broadcast path.
    Edges come from parquet so the optimizer has REAL size stats (local
    relations carry the no-stats sentinel, which auto-resolves to
    broadcast)."""
    from radmapper_spark.operators import graph
    _toy_edges(spark).write.parquet(str(tmp_path / "edges"))
    e = spark.read.parquet(str(tmp_path / "edges"))
    base = {(r.node, r.rank) for r in graph.pagerank(
        e, iters=2, broadcast_ranks=True).collect()}
    spark.conf.set("rm.graph.broadcastMaxBytes", "1")
    try:
        pr = graph.pagerank(e, iters=2)
        assert pr.rm_broadcast_path is False
        assert {(r.node, r.rank) for r in pr.collect()} == base
        pr.rm_release_cache()
        lp = graph.label_propagation(e, iters=1)
        assert lp.rm_broadcast_path is False
        lp.rm_release_cache()
    finally:
        spark.conf.unset("rm.graph.broadcastMaxBytes")


# --------------------------------------------- document-shaped spill path

def test_express_reduce_spill_path_roundtrip(spark, tmp_path, monkeypatch):
    """The >MAX_REDUCE_DOCS error message points at reduce_express_frame
    + a distributed write; prove that path actually round-trips: a
    corpus at 2x the cap flows through the frame plan and a JSONL sink,
    and reads back as exactly the documents the driver path assembles
    when uncapped."""
    import json

    from radmapper_spark.lang.interp import Interp
    from radmapper_spark.operators import express_spark
    from radmapper_spark.operators.express_local import reduce_express
    from radmapper_spark.operators.express_spark import reduce_express_frame
    from radmapper_spark.operators.spark_bridge import SparkBindingSets
    from radmapper_spark.sources.writers import write_result

    rows = [{"ownerName": f"owner{i:02d}", "id": i} for i in range(10)]
    ip = Interp(spark)
    efn = ip.run_raw("express(){{'owner_id': key(?ownerName), 'id': ?id}}")
    bsets = SparkBindingSets(spark.createDataFrame(rows))

    monkeypatch.setattr(express_spark, "MAX_REDUCE_DOCS", 5)
    with pytest.raises(ValueError, match="reduce_express_frame"):
        reduce_express(ip, bsets, efn)

    # the advertised alternative: document-per-row frame -> JSONL sink
    frame = reduce_express_frame(ip, bsets, efn)
    out = str(tmp_path / "docs_jsonl")
    write_result(frame, out, fmt="json")
    got = [json.loads(line)["doc"]
           for p in sorted(os.listdir(out)) if p.endswith(".json")
           for line in open(os.path.join(out, p))]
    got.sort(key=lambda d: d["owner_id"])

    monkeypatch.setattr(express_spark, "MAX_REDUCE_DOCS", 100000)
    want = reduce_express(ip, bsets, efn)
    assert got == want


# ----------------------------------------- RM-level error consistency

def test_probe_builtins_raise_rmfnerror_on_bad_threshold(spark, tables,
                                                         tmp_path):
    """$probeNearDupIndex / $probeEmbeddingIndex must report a
    non-numeric threshold as an RMFnError (like every numeric builtin),
    not a raw TypeError."""
    from radmapper_spark.functions.builtins import RMFnError
    from radmapper_spark.lang.interp import Interp

    docs = tables["documents"]
    mh = str(tmp_path / "mh")
    ip = Interp(spark)
    ip.run_raw("$buildNearDupIndex($db($d), $p)",
               bindings={"$d": docs.limit(10), "$p": mh})
    with pytest.raises(RMFnError, match="probeNearDupIndex"):
        ip.run_raw("$probeNearDupIndex($db($d), $p, 'high')",
                   bindings={"$d": docs.limit(5), "$p": mh})


def test_index_rebuild_updates_meta(spark, tmp_path):
    """Rebuilding an index at the same path with different parameters
    must refresh the _meta sidecar: probes with the OLD params raise,
    probes with the new params run."""
    from radmapper_spark.operators import dedup
    from radmapper_spark.operators.index_meta import IndexParamMismatch
    docs = _tiny_docs(spark)
    path = str(tmp_path / "mh_rebuild")
    dedup.build_minhash_index(docs, path)  # defaults: 32 hashes, 8 bands
    dedup.neardup_vs_index(docs, path).collect()
    dedup.build_minhash_index(docs, path, num_hashes=16, bands=4)
    with pytest.raises(IndexParamMismatch):
        dedup.neardup_vs_index(docs, path)  # old (default) params
    dedup.neardup_vs_index(docs, path, num_hashes=16, bands=4).collect()


# --------------------------------------------------- index append (admit)

def test_minhash_append_equals_full_rebuild(spark, tmp_path):
    """build(corpus) + append(batch) must answer probes identically to
    build(corpus ∪ batch): the admitted batch is fully visible and the
    original index rows are untouched."""
    from radmapper_spark.operators import dedup
    from radmapper_spark.session import load_tables
    docs = load_tables(spark, SF_SMOKE)["documents"]
    base = docs.filter(F.col("doc_id") % 3 == 0)
    admit = docs.filter(F.col("doc_id") % 3 == 1)
    probe = docs.filter(F.col("doc_id") % 3 == 2)
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    dedup.build_minhash_index(base, inc)
    dedup.append_to_minhash_index(admit, inc)
    dedup.build_minhash_index(base.unionByName(admit), full)
    got = {(r.new_id, r.index_id, r.est_jaccard)
           for r in dedup.neardup_vs_index(probe, inc).collect()}
    want = {(r.new_id, r.index_id, r.est_jaccard)
            for r in dedup.neardup_vs_index(probe, full).collect()}
    assert got == want and want, "append diverged from full rebuild"


def test_minhash_append_param_mismatch_raises(spark, tmp_path):
    from radmapper_spark.operators import dedup
    from radmapper_spark.operators.index_meta import IndexParamMismatch
    docs = _tiny_docs(spark)
    path = str(tmp_path / "mh_ap")
    dedup.build_minhash_index(docs, path)
    with pytest.raises(IndexParamMismatch, match="append_to_minhash"):
        dedup.append_to_minhash_index(docs, path, num_hashes=16, bands=4)


def test_signlsh_append_equals_full_rebuild(spark, tmp_path):
    from radmapper_spark.operators import dedup
    from radmapper_spark.session import load_tables
    emb = load_tables(spark, SF_SMOKE)["embeddings"]
    base = emb.filter(F.col("vec_id") % 3 == 0)
    admit = emb.filter(F.col("vec_id") % 3 == 1)
    probe = emb.filter(F.col("vec_id") % 3 == 2)
    kw = dict(bands=64, planes_per_band=8)
    inc, full = str(tmp_path / "sinc"), str(tmp_path / "sfull")
    dedup.build_signlsh_index(base, inc, **kw)
    dedup.append_to_signlsh_index(admit, inc, **kw)
    dedup.build_signlsh_index(base.unionByName(admit), full, **kw)

    def hits(path):
        df = dedup.neardup_embedding_vs_index(probe, path, threshold=0.4,
                                              **kw)
        out = {(r.new_id, r.index_id, round(r.cosine, 9))
               for r in df.collect()}
        df.rm_release_cache()
        return out

    got, want = hits(inc), hits(full)
    assert got == want and want, "append diverged from full rebuild"
    from radmapper_spark.operators.index_meta import IndexParamMismatch
    with pytest.raises(IndexParamMismatch, match="append_to_signlsh"):
        dedup.append_to_signlsh_index(admit, inc, bands=64,
                                      planes_per_band=8, seed=7)


# -------------------------------------------------------- semantic dedup

def test_semantic_dedup_within_cluster_only(spark):
    """Pairs must come from the SAME cluster (the SemDeDup contract),
    and the pair set must equal the brute-force within-cluster truth."""
    from radmapper_spark.operators import similarity
    from radmapper_spark.session import load_tables
    emb = load_tables(spark, SF_SMOKE)["embeddings"]
    pairs = similarity.semantic_dedup_pairs(emb, k=4, iters=1,
                                            threshold=0.4)
    rows = pairs.collect()
    pairs.rm_release_cache()
    asg = similarity.kmeans_lloyd(emb, k=4, iters=1)
    cl = {r.vec_id: r.cluster for r in asg.collect()}
    rel = getattr(asg, "rm_release_cache", None)
    rel and rel()
    assert rows, "vacuous"
    for r in rows:
        assert cl[r.id_a] == cl[r.id_b] == r.cluster
    # brute-force truth restricted to co-clustered pairs
    import numpy as np
    vecs = {r.vec_id: np.array(r.embedding, dtype=float)
            for r in emb.collect()}
    want = set()
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if cl[a] != cl[b]:
                continue
            c = float(vecs[a] @ vecs[b]
                      / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b])))
            if round(c, 6) >= 0.4:
                want.add((a, b))
    assert {(r.id_a, r.id_b) for r in rows} == want


def test_semantic_dedup_dirty_embeddings_modes_agree(spark):
    """NULL or wrong-dimension embeddings must be DROPPED identically by
    both verify modes: catalyst yields a NULL cosine (zip_with pads,
    aggregate propagates) that the threshold filter removes; the arrow
    kernel must not crash on the ragged batch (np.stack) and must drop
    the same pairs."""
    from radmapper_spark.operators import similarity
    clean = _tiny_emb(spark)
    dirty = clean.unionByName(spark.createDataFrame(
        [(100, None), (101, [1.0, 2.0])],  # NULL + wrong dim (8 expected)
        "vec_id long, embedding array<double>"))
    # hand-built single-cluster assignment so the dirty ids are
    # guaranteed to reach the pair-verify kernel (the thing under test)
    asg = dirty.selectExpr("vec_id", "CAST(0 AS BIGINT) AS cluster")

    def run(mode):
        df = similarity.semantic_dedup_pairs(dirty, threshold=0.0,
                                             asg=asg, verify_mode=mode)
        out = {(r.id_a, r.id_b, round(r.cosine, 6)) for r in df.collect()}
        df.rm_release_cache()
        return out

    arrow, catalyst = run("arrow"), run("catalyst")
    assert arrow == catalyst and arrow, "dirty-input mode divergence"
    bad = {100, 101}
    assert not any(a in bad or b in bad for a, b, _ in arrow)


def test_semantic_dedup_builtin(spark, tables):
    from radmapper_spark.lang.interp import Interp
    ip = Interp(spark)
    out = ip.run_raw("$semanticDedup($db($e), 4, 0.4)",
                     bindings={"$e": tables["embeddings"]})
    assert {"cluster", "id_a", "id_b", "cosine"} <= set(out.df.columns)
    n = out.df.count()
    rel = getattr(out.df, "rm_release_cache", None)
    rel and rel()
    assert n > 0


def test_compact_minhash_index_after_replay(spark, tmp_path):
    """A replayed append (the admission sink's restart caveat) leaves
    duplicate rows; compaction removes exactly them, preserves the
    _meta sidecar, and probes answer identically before/after."""
    from radmapper_spark.operators import dedup
    from radmapper_spark.operators.index_meta import IndexParamMismatch
    docs = _tiny_docs(spark)
    path = str(tmp_path / "mhc")
    dedup.build_minhash_index(docs.filter(F.col("doc_id") < 10), path)
    batch = docs.filter(F.col("doc_id") >= 10)
    dedup.append_to_minhash_index(batch, path)
    dedup.append_to_minhash_index(batch, path)  # replay
    probe = docs.limit(5)
    before = {(r.new_id, r.index_id, r.est_jaccard)
              for r in dedup.neardup_vs_index(probe, path).collect()}
    n_batch_rows = batch.count() * 8  # 8 bands per doc
    removed = dedup.compact_minhash_index(spark, path)
    assert removed == n_batch_rows, "compaction must drop exactly the replay"
    after = {(r.new_id, r.index_id, r.est_jaccard)
             for r in dedup.neardup_vs_index(probe, path).collect()}
    assert after == before and before
    # the sidecar survived: a mismatched probe still raises
    with pytest.raises(IndexParamMismatch):
        dedup.neardup_vs_index(probe, path, num_hashes=16, bands=4)


def test_embedding_probe_stats_less_batch_keeps_broadcast(spark, tmp_path):
    """Stats-less probe frames (local relations, foreachBatch micro-
    batches) carry Catalyst's no-stats sentinel (~Long.MaxValue) — the
    size gate must treat that as UNKNOWN and keep the broadcast, even
    under a tiny rm.index.probeBroadcastMaxBytes (regression guard: a
    first cut read the sentinel as 'too big' and silently shuffled
    every in-memory probe batch)."""
    from radmapper_spark.operators import dedup
    emb = _tiny_emb(spark)  # local relation: no real stats
    path = str(tmp_path / "slsent")
    dedup.build_signlsh_index(emb, path, bands=16, planes_per_band=4)
    spark.conf.set("rm.index.probeBroadcastMaxBytes", "1")
    try:
        out = dedup.neardup_embedding_vs_index(
            emb, path, bands=16, planes_per_band=4, threshold=0.9)
        plan = out._jdf.queryExecution().executedPlan().toString()
        n = out.count()
        out.rm_release_cache()
    finally:
        spark.conf.unset("rm.index.probeBroadcastMaxBytes")
    assert "BroadcastHashJoin" in plan, \
        "no-stats probe side must still broadcast"
    assert n > 0


def test_compact_signlsh_index_after_replay(spark, tmp_path):
    """Replayed embedding append leaves duplicates in BOTH index tables;
    compaction removes exactly them and probes answer identically."""
    from radmapper_spark.operators import dedup
    emb = _tiny_emb(spark)
    kw = dict(bands=16, planes_per_band=4)
    path = str(tmp_path / "slc")
    dedup.build_signlsh_index(emb.filter(F.col("vec_id") < 20), path, **kw)
    batch = emb.filter(F.col("vec_id") >= 20)
    dedup.append_to_signlsh_index(batch, path, **kw)
    dedup.append_to_signlsh_index(batch, path, **kw)  # replay

    def probe():
        df = dedup.neardup_embedding_vs_index(emb, path, threshold=0.9,
                                              **kw)
        out = {(r.new_id, r.index_id, round(r.cosine, 9))
               for r in df.collect()}
        df.rm_release_cache()
        return out

    before = probe()
    n_batch = batch.count()
    removed = dedup.compact_signlsh_index(spark, path)
    assert removed == n_batch * 16 + n_batch  # bands rows + vectors rows
    assert probe() == before and before


def test_compact_builtins(spark, tmp_path):
    """$compactNearDupIndex from RM source returns the removed count."""
    from radmapper_spark.lang.interp import Interp
    from radmapper_spark.operators import dedup
    docs = _tiny_docs(spark)
    path = str(tmp_path / "mhb")
    dedup.build_minhash_index(docs.filter(F.col("doc_id") < 10), path)
    batch = docs.filter(F.col("doc_id") >= 10)
    dedup.append_to_minhash_index(batch, path)
    dedup.append_to_minhash_index(batch, path)
    ip = Interp(spark)
    removed = ip.run_raw("$compactNearDupIndex($p)",
                         bindings={"$p": path})
    assert removed == batch.count() * 8


def test_compact_embedding_builtin(spark, tmp_path):
    """$compactEmbeddingIndex from RM source returns the removed count
    (bands rows + vectors rows for the replayed batch)."""
    from radmapper_spark.lang.interp import Interp
    from radmapper_spark.operators import dedup
    emb = _tiny_emb(spark)
    kw = dict(bands=16, planes_per_band=4)
    path = str(tmp_path / "slb")
    dedup.build_signlsh_index(emb.filter(F.col("vec_id") < 20), path, **kw)
    batch = emb.filter(F.col("vec_id") >= 20)
    dedup.append_to_signlsh_index(batch, path, **kw)
    dedup.append_to_signlsh_index(batch, path, **kw)  # replay
    ip = Interp(spark)
    removed = ip.run_raw("$compactEmbeddingIndex($p)",
                         bindings={"$p": path})
    assert removed == batch.count() * 16 + batch.count()


def test_repeated_spans_builtin(spark, tables):
    from radmapper_spark.lang.interp import Interp
    ip = Interp(spark)
    out = ip.run_raw("$repeatedSpans($db($d), 15)",
                     bindings={"$d": tables["documents"]})
    assert {"id_a", "id_b", "n_shared_spans"} <= set(out.df.columns)
    assert out.df.count() > 0
