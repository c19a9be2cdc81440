"""Similarity search over an embedding column (array<float>).

- brute_force_topk: exact cosine top-k. The query vector set is small ->
  broadcast it; the corpus scan is embarrassingly parallel; per-partition
  top-k via window rank after a repartition on query id (at 1000 executors
  the dominant cost is the corpus scan, which prunes to the two needed
  columns).
- ivf_topk: IVF-style scale path — k-means-ish coarse centroids (sampled
  driver-side once), corpus assigned to nearest centroid (narrow), queries
  probe `nprobe` nearest centroids; the candidate join is an equi-join on
  centroid id, cutting the scanned corpus by ~ncentroids/nprobe.

Dot products are Catalyst expressions (zip_with + aggregate): JVM-side,
whole-stage-codegen'd, no Python in the row loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def _to_double(col):
    return F.transform(col, lambda x: x.cast("double"))


# Driver-side codebook cache. Training an IVF/PQ codebook costs a
# corpus.count() + bounded sample collect + driver k-means (~2 s at sf0.1)
# per call; the result is a tiny numpy array (<= ncentroids*dim float64),
# so re-fitting it on every invocation over the same immutable table is
# pure waste. Keyed by (caller cache_key, kind, training params) — the
# caller's key should identify the corpus (e.g. its path); params in the
# key mean a param change can never serve a stale codebook. Entries are
# plain numpy arrays: no Spark resources held, release_codebooks() is the
# explicit eviction handle.
_CODEBOOK_CACHE: dict = {}


def release_codebooks(cache_key=None) -> int:
    """Evict cached codebooks; all of them when cache_key is None, else
    just those trained under that key. Returns the eviction count."""
    if cache_key is None:
        n = len(_CODEBOOK_CACHE)
        _CODEBOOK_CACHE.clear()
        return n
    drop = [k for k in _CODEBOOK_CACHE if k[0] == cache_key]
    for k in drop:
        del _CODEBOOK_CACHE[k]
    return len(drop)


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     qid_col: str = "qid") -> DataFrame:
    """Exact cosine top-k of corpus rows per query row.

    queries: DataFrame[qid, embedding]. Broadcast the queries; rank with a
    window partitioned by qid."""
    c = corpus.select(F.col(id_col).alias("cid"), _to_double(F.col(vec_col)).alias("cv"))
    q = queries.select(F.col(qid_col).alias("qid"), _to_double(F.col(vec_col)).alias("qv"))
    cos = _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv")))
    scored = c.crossJoin(F.broadcast(q)).select(
        "qid", "cid", F.round(cos, 6).alias("cosine"))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "cosine", "rank")
    )


def train_centroids(corpus: DataFrame, vec_col: str = "embedding",
                    ncentroids: int = 16, iters: int = 5, seed: int = 42,
                    max_sample: int = 4096, cache_key=None):
    """Tiny k-means on a driver-side sample (the IVF codebook is small by
    construction; training data is a bounded sample, not the corpus).

    The sample is a genuine uniform row sample: fraction computed from the
    corpus count (with 20% overshoot, trimmed to max_sample) — a
    fraction=1.0 + limit() would just take the first partitions, biasing
    the codebook toward whatever the file order correlates with.

    cache_key (e.g. the corpus table path): when given, the trained
    codebook is memoized in _CODEBOOK_CACHE so repeat invocations skip the
    count + sample collect + fit. Only pass a key for an immutable corpus."""
    import numpy as np
    ck = None
    if cache_key is not None:
        ck = (cache_key, "ivf", vec_col, ncentroids, iters, seed, max_sample)
        hit = _CODEBOOK_CACHE.get(ck)
        if hit is not None:
            return hit
    n = corpus.count()
    frac = min(1.0, (max_sample * 1.2) / max(n, 1))
    sample = np.array(
        [r["v"] for r in
         corpus.select(_to_double(F.col(vec_col)).alias("v"))
         .sample(fraction=frac, seed=seed).limit(max_sample).collect()],
        dtype="float64",
    )
    if len(sample) == 0:
        return np.zeros((1, 1))
    rng = np.random.RandomState(seed)
    cents = sample[rng.choice(len(sample), size=min(ncentroids, len(sample)), replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for i in range(len(cents)):
            pts = sample[assign == i]
            if len(pts):
                cents[i] = pts.mean(axis=0)
    if ck is not None:
        _CODEBOOK_CACHE[ck] = cents
    return cents


def _nearest_centroid_udf(cents, n_take: int = 1):
    """Arrow-batched cell assignment: ids of the n_take nearest centroids
    by cosine, as one numpy matmul per batch.

    Why a pandas UDF and not Catalyst expressions: the expression version
    inlines ncentroids x dim literals (a ~5k-node tree) — Catalyst spends
    seconds PLANNING it, and the interpreted aggregate() lambdas evaluate
    ~1000 ops/row. A normalized-codebook matmul is the vectorized shape
    this math wants; the closure ships the codebook by value (no module
    globals — executor workers can't import this package)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    cn = np.asarray(cents, dtype="float64")
    cn = cn / np.maximum(np.linalg.norm(cn, axis=1, keepdims=True), 1e-12)
    take = int(n_take)

    @pandas_udf("array<int>")
    def assign(batch):
        import numpy as np
        import pandas as pd
        m = np.array(batch.tolist(), dtype="float64")
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ cn.T
        # stable argsort on (-sim, index): deterministic under ties
        order = np.argsort(-sims, axis=1, kind="stable")[:, :take]
        return pd.Series(list(order.astype("int32")))

    return assign


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             qid_col: str = "qid", ncentroids: int = 16, nprobe: int = 4,
             cache_key=None) -> DataFrame:
    """Approximate top-k: probe only the nprobe nearest centroid cells.
    cache_key memoizes the codebook fit for an immutable corpus (see
    train_centroids)."""
    cents = train_centroids(corpus, vec_col, ncentroids, cache_key=cache_key)
    npart = corpus.sparkSession.sparkContext.defaultParallelism
    if corpus.rdd.getNumPartitions() < npart:
        # spread the per-row assignment math; a small parquet file
        # otherwise runs it all in one task (no-op on wide inputs)
        corpus = corpus.repartition(npart)
    assign1 = _nearest_centroid_udf(cents, 1)
    assignp = _nearest_centroid_udf(cents, nprobe)
    c = corpus.select(F.col(id_col).alias("cid"), _to_double(F.col(vec_col)).alias("cv"))
    c = c.withColumn("cnrm", _norm(F.col("cv")))
    c = c.withColumn("cell", assign1(F.col("cv"))[0])
    q = queries.select(F.col(qid_col).alias("qid"), _to_double(F.col(vec_col)).alias("qv"))
    q = q.withColumn("qnrm", _norm(F.col("qv")))
    q = q.withColumn("cells", assignp(F.col("qv")))
    q = q.select("qid", "qv", "qnrm", F.explode(F.col("cells")).alias("cell"))
    # norms hoisted into the frames: the scoring join evaluates ONE dot per
    # (query, candidate), not a dot plus two fresh norm folds
    cos = _dot(F.col("cv"), F.col("qv")) / (F.col("cnrm") * F.col("qnrm"))
    scored = c.join(F.broadcast(q), on="cell").select(
        "qid", "cid", F.round(cos, 6).alias("cosine"))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "cosine", "rank")
    )


def range_search(corpus: DataFrame, queries: DataFrame,
                 threshold: float = 0.5, vec_col: str = "embedding",
                 id_col: str = "vec_id", qid_col: str = "qid") -> DataFrame:
    """Cosine range search: every corpus row within the given cosine
    radius of each query (self-matches excluded). Unlike top-k there is
    no window/rank — the threshold filter is row-local, so the plan is a
    broadcast nested-loop over the (small) query set with NO shuffle at
    all: the shape a fixed-radius retrieval scan wants at 100 TB.
    Candidate pruning for huge query sets belongs in ivf_topk-style
    cell routing; this is the exact baseline."""
    c = corpus.select(F.col(id_col).alias("cid"),
                      _to_double(F.col(vec_col)).alias("cv"))
    q = queries.select(F.col(qid_col).alias("qid"),
                       _to_double(F.col(vec_col)).alias("qv"))
    cos = _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv")))
    return (c.crossJoin(F.broadcast(q))
            .filter(F.col("cid") != F.col("qid"))
            .withColumn("_cos", cos)
            .filter(F.col("_cos") >= threshold)  # threshold on the RAW
            # value (rounding after filtering, like the oracle)
            .select("qid", "cid", F.round(F.col("_cos"), 6).alias("cosine")))


# ---------------------------------------------------------------- PQ

def train_pq_codebooks(corpus: DataFrame, vec_col: str = "embedding",
                       m: int = 4, ksub: int = 16, iters: int = 5,
                       seed: int = 42, max_sample: int = 4096,
                       cache_key=None):
    """Product-quantization codebooks: split the (L2-normalized) vector
    into m subvectors and k-means each subspace on a bounded uniform
    driver-side sample — same sampling discipline as train_centroids.
    Returns an (m, ksub, dim/m) float64 array. Requires dim % m == 0:
    a silent remainder would drop trailing dimensions from every ADC
    score and degrade recall with no warning. cache_key memoizes the fit
    for an immutable corpus (see train_centroids)."""
    import numpy as np
    ck = None
    if cache_key is not None:
        ck = (cache_key, "pq", vec_col, m, ksub, iters, seed, max_sample)
        hit = _CODEBOOK_CACHE.get(ck)
        if hit is not None:
            return hit
    n = corpus.count()
    frac = min(1.0, (max_sample * 1.2) / max(n, 1))
    sample = np.array(
        [r["v"] for r in
         corpus.select(_to_double(F.col(vec_col)).alias("v"))
         .sample(fraction=frac, seed=seed).limit(max_sample).collect()],
        dtype="float64")
    sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    dim = sample.shape[1]
    if dim % m != 0:
        raise ValueError(
            f"PQ requires the vector dimension to be divisible by m: "
            f"dim={dim}, m={m} leaves a {dim % m}-dim remainder that would "
            f"be silently excluded from every distance computation")
    dsub = dim // m
    rng = np.random.RandomState(seed)
    books = []
    for j in range(m):
        sub = sample[:, j * dsub:(j + 1) * dsub]
        cents = sub[rng.choice(len(sub), size=min(ksub, len(sub)), replace=False)]
        for _ in range(iters):
            d = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for i in range(len(cents)):
                pts = sub[assign == i]
                if len(pts):
                    cents[i] = pts.mean(axis=0)
        books.append(cents)
    out = np.stack(books)  # (m, ksub, dsub)
    if ck is not None:
        _CODEBOOK_CACHE[ck] = out
    return out


def _pq_encode_udf(books):
    """Arrow-batched PQ encoder: normalize the row vector, argmin L2 per
    subspace -> array<int> of m codes. Codebooks ship by value in the
    closure (executor workers cannot import this package)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    bk = np.asarray(books, dtype="float64")          # (m, ksub, dsub)
    m, ksub, dsub = bk.shape

    @pandas_udf("array<int>")
    def encode(batch):
        import numpy as np
        import pandas as pd
        x = np.array(batch.tolist(), dtype="float64")
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        codes = np.empty((len(x), m), dtype="int32")
        for j in range(m):
            sub = x[:, j * dsub:(j + 1) * dsub]
            # ||s - c||^2 = ||s||^2 - 2 s.c + ||c||^2; argmin over c
            d = (-2.0 * sub @ bk[j].T) + (bk[j] ** 2).sum(axis=1)[None, :]
            codes[:, j] = d.argmin(axis=1)
        return pd.Series(list(codes))

    return encode


def _pq_lut_udf(books):
    """Arrow-batched ADC lookup-table builder for QUERY vectors: flat
    array of m*ksub inner products <q_subvec_j, centroid_{j,i}> against
    the normalized query. approx_cos(q, c) = sum_j lut[j*ksub+code_j]."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    bk = np.asarray(books, dtype="float64")
    m, ksub, dsub = bk.shape

    @pandas_udf("array<double>")
    def lut(batch):
        import numpy as np
        import pandas as pd
        x = np.array(batch.tolist(), dtype="float64")
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        out = np.empty((len(x), m * ksub), dtype="float64")
        for j in range(m):
            sub = x[:, j * dsub:(j + 1) * dsub]
            out[:, j * ksub:(j + 1) * ksub] = sub @ bk[j].T
        return pd.Series(list(out))

    return lut


def pq_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
            vec_col: str = "embedding", id_col: str = "vec_id",
            qid_col: str = "qid", m: int = 4, ksub: int = 16,
            rerank: int = 4, cache_key=None) -> DataFrame:
    """Approximate cosine top-k via product quantization + exact rerank.

    Scale shape: the corpus is encoded ONCE into m small codes (m bytes at
    ksub<=256 — a 100 TB float corpus becomes ~TBs of codes; the ADC scan
    reads ONLY codes), each query ships a tiny m*ksub lookup table, the
    approximate score is m array lookups per (query, row) in Catalyst, and
    the exact rerank touches just rerank*k candidates per query.

    approx_cos(q, c) = sum_j lut_q[j*ksub + code_c[j]] — the ADC estimate
    of the cosine between the normalized vectors."""
    books = train_pq_codebooks(corpus, vec_col, m=m, ksub=ksub,
                               cache_key=cache_key)
    npart = corpus.sparkSession.sparkContext.defaultParallelism
    if corpus.rdd.getNumPartitions() < npart:
        corpus = corpus.repartition(npart)
    encode = _pq_encode_udf(books)
    lutf = _pq_lut_udf(books)
    c = corpus.select(F.col(id_col).alias("cid"),
                      _to_double(F.col(vec_col)).alias("cv"))
    codes = c.select("cid", encode(F.col("cv")).alias("codes"))
    q = queries.select(F.col(qid_col).alias("qid"),
                       _to_double(F.col(vec_col)).alias("qv"))
    qlut = q.select("qid", lutf(F.col("qv")).alias("lut"))
    approx = None
    for j in range(m):
        term = F.element_at(F.col("lut"),
                            F.lit(j * ksub) + F.col("codes")[j] + 1)
        approx = term if approx is None else approx + term
    scored = codes.crossJoin(F.broadcast(qlut)).select(
        "qid", "cid", approx.alias("approx"))
    wa = Window.partitionBy("qid").orderBy(F.col("approx").desc(), F.col("cid"))
    cand = (scored.withColumn("arank", F.row_number().over(wa))
            .filter(F.col("arank") <= rerank * k)
            .select("qid", "cid"))
    # exact rerank of the small candidate set
    c2 = c.withColumn("cnrm", _norm(F.col("cv")))
    q2 = q.withColumn("qnrm", _norm(F.col("qv")))
    cos = _dot(F.col("cv"), F.col("qv")) / (F.col("cnrm") * F.col("qnrm"))
    rescored = (cand.join(c2, "cid").join(F.broadcast(q2), "qid")
                .select("qid", "cid", F.round(cos, 6).alias("cosine")))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (rescored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "cid", "cosine", "rank"))


def opq_rotation(corpus: DataFrame, vec_col: str = "embedding",
                 m: int = 4, cache_key=None):
    """Parametric OPQ rotation (public recipe: Ge et al. 2013,
    "Optimized Product Quantization", the eigenvalue-allocation
    variant): eigendecompose the corpus's UNCENTERED second-moment
    matrix (centering would move the origin and break cosine's
    rotation-invariance), then greedily allocate principal directions
    to the m subspaces balancing each subspace's eigenvalue PRODUCT —
    variance-balanced subspaces quantize with near-equal error, which
    is what lifts PQ recall on correlated dimensions. Returns (R, n):
    a d×d orthonormal rotation whose row block [j*dsub, (j+1)*dsub)
    feeds PQ subspace j.

    Distributed cost: ONE pass through the corpus (the d²-bounded
    gram/tree aggregate from linalg) + driver-side eigh on a d×d
    matrix — same bounded-fit discipline as train_centroids. The
    rotation is deterministic (engine-exact gram, sign-fixed eigh,
    stable allocation), so results are parallelism-independent."""
    import numpy as np

    from .linalg import GRAM_SCALE, column_sums, gram_matrix

    ck = None
    if cache_key is not None:
        ck = (cache_key, "opqR", vec_col, m)
        hit = _CODEBOOK_CACHE.get(ck)
        if hit is not None:
            return hit
    s_rows = column_sums(corpus, vec_col).collect()
    if not s_rows:
        raise ValueError("opq_rotation: no non-null vectors")
    d = max(r["i"] for r in s_rows)
    n = int(s_rows[0]["n_rows"])
    if d % m != 0:
        raise ValueError(
            f"OPQ requires the vector dimension to be divisible by m: "
            f"dim={d}, m={m}")
    G = np.zeros((d, d))
    for r in gram_matrix(corpus, vec_col, dim=d).collect():
        G[r["i"] - 1, r["j"] - 1] = G[r["j"] - 1, r["i"] - 1] = (
            float(r["gram_scaled"]) / GRAM_SCALE)
    vals, vecs = np.linalg.eigh(G / n)  # ascending
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order]
    # deterministic sign (largest-|coordinate| positive), as in fit_pca
    for c in range(vecs.shape[1]):
        jmax = int(np.argmax(np.abs(vecs[:, c])))
        if vecs[jmax, c] < 0:
            vecs[:, c] = -vecs[:, c]
    # greedy balanced allocation: walk eigenvalues descending, assign
    # each to the non-full subspace with the smallest log-product
    dsub = d // m
    logs = np.log(np.maximum(vals, 1e-12))
    load = [0.0] * m
    members: list = [[] for _ in range(m)]
    for idx in range(d):
        j = min((jj for jj in range(m) if len(members[jj]) < dsub),
                key=lambda jj: (load[jj], jj))
        members[j].append(idx)
        load[j] += logs[idx]
    rows = [vecs[:, idx] for j in range(m) for idx in members[j]]
    R = np.stack(rows)  # d x d, orthonormal
    out = (R, n)
    if ck is not None:
        _CODEBOOK_CACHE[ck] = out
    return out


def opq_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             qid_col: str = "qid", m: int = 4, ksub: int = 16,
             rerank: int = 4, cache_key=None) -> DataFrame:
    """PQ top-k in the OPQ-rotated space: rotate corpus and queries with
    the shared orthonormal R (a MAP-ONLY Arrow pass each — cosine is
    rotation-invariant, so the exact rerank inside pq_topk stays exact),
    then run the standard PQ/ADC pipeline on the rotated vectors. Same
    output contract as pq_topk; recall is >= plain PQ's on correlated
    embeddings because the subspaces are decorrelated and
    variance-balanced before quantization."""
    import numpy as np

    from .linalg import pca_project

    R, _n = opq_rotation(corpus, vec_col, m=m, cache_key=cache_key)
    d = R.shape[0]
    rot_fit = (R, np.ones(d), np.zeros(d), _n)  # unit scale, zero mean:
    #           pca_project degenerates to the pure rotation x -> R @ x
    rc = pca_project(corpus, d, vec_col=vec_col, id_col=id_col,
                     out_col="_rv", fit=rot_fit)
    rq = pca_project(queries, d, vec_col=vec_col, id_col=qid_col,
                     out_col="_rv", fit=rot_fit)
    # cache_key passes through UNWRAPPED so release_codebooks(cache_key)
    # evicts these codebooks too (it matches on key[0]); the rotated
    # vec_col "_rv" inside train_pq_codebooks' key already separates
    # OPQ codebooks from any plain-PQ fit under the same corpus key,
    # and m is in the key, so different rotations cannot alias
    return pq_topk(rc, rq, k=k, vec_col="_rv", id_col=id_col,
                   qid_col=qid_col, m=m, ksub=ksub, rerank=rerank,
                   cache_key=cache_key)


# ----------------------------------------------------- persisted IVF index

def build_ivf_index(corpus: DataFrame, path: str,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    ncentroids: int = 16) -> None:
    """Materialize an IVF index on disk: `<path>/centroids` (cell id +
    centroid vector) and `<path>/cells` — the corpus vectors written
    PARTITIONED BY cell. The partition layout is the point: a probe
    reads only its nprobe cell directories (partition pruning at the
    file-listing level), so at 100 TB a search scans
    ~nprobe/ncentroids of the corpus without any index server."""
    cents = train_centroids(corpus, vec_col, ncentroids)
    spark = corpus.sparkSession
    import pandas as pd
    spark.createDataFrame(
        pd.DataFrame({"cell": range(len(cents)),
                      "centroid": [list(map(float, c)) for c in cents]})) \
        .write.mode("overwrite").parquet(f"{path}/centroids")
    assign1 = _nearest_centroid_udf(cents, 1)
    (corpus.select(F.col(id_col).alias("cid"),
                   _to_double(F.col(vec_col)).alias("cv"))
     .withColumn("cell", assign1(F.col("cv"))[0])
     .write.mode("overwrite").partitionBy("cell").parquet(f"{path}/cells"))
    from .index_meta import write_index_meta
    write_index_meta(spark, path, "ivf", {"ncentroids": ncentroids})


def search_ivf_index(spark, path: str, queries: DataFrame, k: int = 10,
                     vec_col: str = "embedding", qid_col: str = "qid",
                     nprobe: int = 4) -> DataFrame:
    """Top-k cosine search against a build_ivf_index layout. The
    centroid table (tiny by construction) is collected to route queries;
    the cells scan carries a `cell IN (probed)` filter that prunes to
    the probed partition directories (asserted in tests via
    PartitionFilters)."""
    from .index_meta import check_index_meta
    # ncentroids is read FROM the index (no probe-side twin to mismatch);
    # the kind check stops e.g. a sign-LSH path being searched as IVF
    check_index_meta(spark, path, "ivf", {}, "search_ivf_index")
    cents_rows = (spark.read.parquet(f"{path}/centroids")
                  .orderBy("cell").collect())
    cents = [r["centroid"] for r in cents_rows]
    assignp = _nearest_centroid_udf(cents, nprobe)
    q = queries.select(F.col(qid_col).alias("qid"),
                       _to_double(F.col(vec_col)).alias("qv"))
    q = q.withColumn("qnrm", _norm(F.col("qv")))
    q = q.select("qid", "qv", "qnrm",
                 F.explode(assignp(F.col("qv"))).alias("cell"))
    probed = {r["cell"] for r in q.select("cell").distinct().collect()}
    cells = (spark.read.parquet(f"{path}/cells")
             .filter(F.col("cell").isin(*probed)))
    cos = _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * F.col("qnrm"))
    scored = cells.join(F.broadcast(q), on="cell").select(
        "qid", "cid", F.round(cos, 6).alias("cosine"))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "cid", "cosine", "rank"))


# ------------------------------------------------------------ quantization

def quantize_int8(emb: DataFrame, vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max(|x|)/127,
    q_i = round(x_i / scale) clamped to [-127, 127] (half-up, matching
    SQL round semantics in both engines). 4x smaller than float32 (16x
    vs float64) with the scale kept per row for dequantization — the
    storage tier below PQ (which is ~16 bytes/vector but lossy-ranked).
    Pure Catalyst transform; deterministic, so exactly oracle-checkable.
    Adds `scale` (rounded) and `qvec` (array<int> in [-127,127])."""
    v = _to_double(F.col(vec_col))
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(1.0))
    qv = F.transform(v, lambda x: F.round(x / scale).cast("int"))
    return emb.select(
        F.col(id_col), F.round(scale, 9).alias("scale"), qv.alias("qvec"))


def dequantize_error(emb: DataFrame, vec_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    """Max absolute reconstruction error per vector after int8 round-trip
    — the quantization-quality check (bounded by scale/2 for symmetric
    round-to-nearest)."""
    q = quantize_int8(emb, vec_col, id_col).withColumnRenamed(id_col, "_qid")
    j = emb.join(q, F.col(id_col) == F.col("_qid"))
    v = _to_double(F.col(vec_col))
    err = F.array_max(F.zip_with(
        v, F.col("qvec"),
        lambda x, qi: F.abs(x - qi.cast("double") * F.col("scale"))))
    return j.select(F.col(id_col), F.round(err, 9).alias("max_err"),
                    F.round(F.col("scale") / 2, 9).alias("bound"))


def kmeans_assign(emb: DataFrame, k: int = 8,
                  vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """One deterministic Lloyd assignment step: centroids are the k
    vectors with the smallest ids (a fixed, engine-independent seeding —
    the point of this entry is the ASSIGNMENT plan, which is the hot
    per-iteration step of distributed k-means), every vector goes to its
    nearest centroid by squared L2.

    Cross-engine determinism: each squared per-dimension difference is
    scaled to an integer with floor(d * 1e9) and the distance is the
    BIGINT sum of those — no float accumulation order anywhere; argmin
    breaks ties on the lower centroid id via a min-over-struct on
    (dist, centroid).

    Plan: the k centroid rows are a broadcast side of a crossJoin (k
    rows — a Lloyd iteration at 100 TB broadcasts its centroid table
    exactly like this); the corpus scan computes k integer distances
    per row and ONE map-side min-struct groupBy per vector. Output:
    (vec_id, cluster, dist_scaled).
    """
    cents = (emb.filter(F.col(id_col) < k)
             .select(F.col(id_col).alias("_cid"),
                     F.col(vec_col).alias("_cvec")))
    dist = F.aggregate(
        F.zip_with(F.col(vec_col), F.col("_cvec"),
                   lambda x, y: F.floor(
                       (x.cast("double") - y.cast("double"))
                       * (x.cast("double") - y.cast("double")) * 1e9)
                   .cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    scored = (emb.select(id_col, vec_col)
              .crossJoin(F.broadcast(cents))
              .select(F.col(id_col),
                      F.struct(dist.alias("d"),
                               F.col("_cid").alias("c")).alias("_dc")))
    best = scored.groupBy(id_col).agg(F.min("_dc").alias("_best"))
    return best.select(
        F.col(id_col),
        F.col("_best.c").alias("cluster"),
        F.col("_best.d").alias("dist_scaled"))


def kmeans_lloyd(emb: DataFrame, k: int = 8, iters: int = 2,
                 vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """Full fixed-iteration Lloyd k-means in SCALED-INTEGER arithmetic —
    iterative ML with bit-exact cross-engine semantics (the same
    property the scaled-integer PageRank has):

    - coordinates are floor(x * 1e6) BIGINTs; distances are exact
      integer sums of squared diffs (order-independent);
    - centroid updates are floor(sum/count) per dimension — one IEEE
      double division on exact <2^53 integers, deterministic in any
      engine;
    - ties argmin on the lower centroid id. Clusters that lose all
      members simply drop out of the next iteration (documented —
      mirrors the oracle's inner-join semantics).

    Seeding: centroids = the k smallest ids (same deterministic contract
    as kmeans_assign).  Per iteration: ONE broadcast of the k scaled
    centroid vectors into a map-only distance pass + min-struct argmin,
    then the centroid update as a (cluster, dim) shuffle of n*dim
    (id, val) pairs with map-side partial sums — the canonical
    distributed-k-means iteration shape. Centroid tables are persisted
    per iteration (node-sized) to keep the lineage linear in iters.
    Returns the final assignment (vec_id, cluster, dist_scaled).
    """
    sx = F.transform(F.col(vec_col),
                     lambda x: F.floor(x.cast("double") * 1e6)
                     .cast("long"))
    pts = emb.select(F.col(id_col).alias("id"), sx.alias("sv")).persist()
    cents = pts.filter(F.col("id") < k).select(
        F.col("id").alias("cid"), F.col("sv").alias("cv"))
    cached = [pts]
    assigned = None
    for i in range(iters):
        dist = F.aggregate(
            F.zip_with(F.col("sv"), F.col("cv"),
                       lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"), lambda acc, x: acc + x)
        scored = (pts.crossJoin(F.broadcast(cents))
                  .select("id", "sv",
                          F.struct(dist.alias("d"),
                                   F.col("cid").alias("c")).alias("_dc")))
        assigned = (scored.groupBy("id")
                    .agg(F.min("_dc").alias("_best"),
                         F.first("sv").alias("sv")))
        if i < iters - 1:
            dims = assigned.select(
                F.col("_best.c").alias("cid"),
                F.posexplode("sv").alias("pos", "val"))
            upd = (dims.groupBy("cid", "pos")
                   .agg(F.floor(F.sum("val").cast("double")
                                / F.count(F.lit(1))).cast("long")
                        .alias("cval")))
            cents = (upd.groupBy("cid")
                     .agg(F.transform(
                         F.array_sort(F.collect_list(
                             F.struct(F.col("pos").alias("p"),
                                      F.col("cval").alias("v")))),
                         lambda s: s["v"]).alias("cv"))
                     .persist())
            cached.append(cents)
    out = assigned.select(
        "id",
        F.col("_best.c").alias("cluster"),
        F.col("_best.d").alias("dist_scaled")) \
        .withColumnRenamed("id", id_col)

    def _release(frames=tuple(cached)):
        for f in frames:
            f.unpersist()

    out.rm_release_cache = _release
    return out


# ------------------------------------------------------- semantic dedup

def semantic_dedup_pairs(emb: DataFrame, k: int = 8, iters: int = 2,
                         threshold: float = 0.4,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id",
                         verify_mode: str = "arrow",
                         asg: DataFrame = None) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication" — cluster the embedding space, then compare ONLY
    within clusters): k-means partitions the corpus, and the exhaustive
    cosine check runs per cluster, so candidate volume is
    sum_c n_c^2 ~ n^2/k instead of n^2 — at 100 TB, k ~ sqrt(n) clusters
    make each cluster's all-pairs block executor-sized while the
    cluster self-join shuffles each vector ONCE on its cluster id.

    Clustering is the engine-exact scaled-integer Lloyd (kmeans_lloyd),
    so the cluster boundaries — and therefore the pair set — are
    bit-identical in any engine: unlike LSH-banded dedup there is no
    recall parameter; within-cluster recall is exhaustive (cross-cluster
    near-dups are the documented SemDeDup trade-off, bounded by cluster
    granularity). Returns (cluster, id_a, id_b, cosine), id_a < id_b.

    The downstream prune rule (keep the smallest id per pair — or chain
    dedup_groups for transitive pruning) is the caller's policy;
    emitting pairs keeps this composable with the rest of the dedup
    stack.

    verify_mode="arrow" (default) runs the pair cosine as an
    Arrow-batched einsum kernel — the aggregate() HOF dot is interpreted
    per element and dominated the entry (~250k pairs x dim x 3 lambdas
    at sf0.1, measured >2 s of 4.3 s); the einsum does the same double
    math vectorized, value-identical at the 6-decimal rounding (swept
    at all three fixture SFs). "catalyst" keeps the pure-JVM HOF path.

    `asg`: callers over an IMMUTABLE table may pass a (persisted)
    kmeans_lloyd assignment frame so repeated invocations skip the
    Lloyd iterations — caller-owned, not released here (same contract
    as embedding_cosine_pairs' `base`)."""
    owns_asg = asg is None
    if owns_asg:
        asg = kmeans_lloyd(emb, k=k, iters=iters, vec_col=vec_col,
                           id_col=id_col)
    rel = getattr(asg, "rm_release_cache", lambda: None) if owns_asg \
        else (lambda: None)
    sid = asg.select(F.col(id_col).alias("_sid"), "cluster")
    # ship vectors in their STORAGE type (float32 for the fixtures) and
    # widen inside the Arrow kernel — float->double is exact, so the
    # einsum sees the identical doubles while the per-pair Arrow traffic
    # (two full vectors per candidate row, THE dominant byte stream of
    # this operator) halves; the catalyst branch casts JVM-side below
    # because its float arithmetic would otherwise run at float32 (r18)
    v = emb.select(F.col(id_col).alias("_sid"), F.col(vec_col).alias("_v"))
    # explicit REPARTITION_BY_NUM of the (tiny) per-vector side (r18):
    # whichever side of the cluster self-join streams, its partition
    # count is this frame's — and AQE coalesces the few-MB frame to 1-2
    # partitions, starving the fused n^2/k-pair einsum verify above the
    # join (dedup.verify_partitions docstring; measured at sf1 the 27M-
    # pair verify ran on ~2 of 32 cores)
    from .dedup import verify_partitions
    side = sid.join(v, "_sid").repartition(
        verify_partitions(emb.sparkSession))
    a = side.select(F.col("cluster"), F.col("_sid").alias("id_a"),
                    F.col("_v").alias("_va"))
    b = side.select(F.col("cluster"), F.col("_sid").alias("id_b"),
                    F.col("_v").alias("_vb"))
    paired = a.join(b, ["cluster"]).filter(F.col("id_a") < F.col("id_b"))
    thr = float(threshold)
    if verify_mode == "arrow":
        # r18 (guide §4.2): mapInArrow over the list<float> columns —
        # the (m, dim) matrices come from ONE vectorized gather over the
        # flat Arrow values buffer instead of np.stack over a per-cell
        # object array (~µs/row — the dominant slice at sf1's 27M
        # within-cluster pairs); float->double widening happens in the
        # kernel on the batch, bit-identical to the old JVM-side cast.
        def _verify(batches):
            import numpy as np
            import pyarrow as pa

            def _flat(col):
                offs = col.offsets.to_numpy(
                    zero_copy_only=False).astype(np.int64)
                vals = np.asarray(
                    col.values.to_numpy(zero_copy_only=False),
                    dtype=np.float64)
                lens = np.diff(offs)
                return offs[:-1], vals, lens

            for rb in batches:
                n = rb.num_rows
                if not n:
                    continue
                ix = {nm: i for i, nm in enumerate(rb.schema.names)}
                ca, cb = rb.column(ix["_va"]), rb.column(ix["_vb"])
                oa, fa, la = _flat(ca)
                ob, fb, lb = _flat(cb)
                # NULL or length-mismatched embedding pairs yield a NULL
                # cosine on the catalyst path (zip_with pads with NULL,
                # the aggregate sum propagates it) and are dropped by
                # the threshold filter; mirror that (null sentinels -1
                # vs -2 can never match)
                if ca.null_count:
                    la = np.where(
                        ca.is_null().to_numpy(zero_copy_only=False),
                        -1, la)
                if cb.null_count:
                    lb = np.where(
                        cb.is_null().to_numpy(zero_copy_only=False),
                        -2, lb)
                valid = la == lb
                if not valid.any():
                    continue
                # batches can mix dims only via dirty input; one
                # vectorized gather per distinct dim
                for dim in np.unique(la[valid]):
                    m = valid & (la == dim)
                    span = np.arange(int(dim))
                    va = fa[oa[m][:, None] + span]
                    vb = fb[ob[m][:, None] + span]
                    dots = np.einsum("ij,ij->i", va, vb)
                    cosv = dots / (np.sqrt(np.einsum("ij,ij->i", va, va))
                                   * np.sqrt(np.einsum("ij,ij->i",
                                                       vb, vb)))
                    keep = cosv >= thr  # filter on the UN-rounded value,
                    #                     exactly like the HOF path + oracle
                    full = np.zeros(n, dtype=bool)
                    full[np.flatnonzero(m)[keep]] = True
                    fm = pa.array(full)
                    yield pa.RecordBatch.from_arrays(
                        [rb.column(ix["cluster"]).filter(fm),
                         rb.column(ix["id_a"]).filter(fm),
                         rb.column(ix["id_b"]).filter(fm),
                         pa.array(np.round(cosv[keep], 6),
                                  type=pa.float64())],
                        names=["cluster", "id_a", "id_b", "cosine"])

        dt = dict(paired.dtypes)
        pairs = paired.select("cluster", "id_a", "id_b", "_va", "_vb") \
            .mapInArrow(_verify,
                        schema=f"cluster {dt['cluster']}, "
                               f"id_a {dt['id_a']}, "
                               f"id_b {dt['id_b']}, cosine double")
    elif verify_mode == "catalyst":
        da, db = _to_double(F.col("_va")), _to_double(F.col("_vb"))
        cos = _dot(da, db) / (_norm(da) * _norm(db))
        pairs = (paired.withColumn("cosine", cos)
                 .filter(F.col("cosine") >= threshold)
                 .select("cluster", "id_a", "id_b",
                         F.round(F.col("cosine"), 6).alias("cosine")))
    else:
        raise ValueError(f"unknown verify_mode {verify_mode!r} "
                         f"(arrow|catalyst)")
    pairs.rm_release_cache = rel
    return pairs
