"""Importance-weighted data selection (DSIR-shaped).

Data Selection via Importance Resampling (Xie et al. 2023, public
paper) scores raw-corpus documents by how much their hashed n-gram
feature distribution looks like a TARGET corpus (the high-quality
sample you want more of), then keeps the top-scoring slice. The
distributed shape:

1. featurize: normalized-token adjacent bigrams, hashed into a FIXED
   number of buckets (the hashed feature trick bounds all downstream
   state to ``buckets`` rows no matter the corpus size);
2. two bucket-count aggregates — the target sample (small by design:
   DSIR targets are curated samples, not corpora) and the raw corpus.
   Each output is <= ``buckets`` rows; the raw-count agg is the only
   corpus-sized shuffle in the weight fit, and its combine-side
   partials reduce to <= ``buckets`` rows per task before exchanging;
3. per-bucket importance weight, broadcast back (a <= ``buckets``-row
   table — kilobytes at any corpus scale);
4. score: explode each scored doc's bigrams, broadcast-join the weight
   table (NO shuffle of the corpus), sum per doc — one corpus-keyed
   aggregate;
5. select: deterministic top-k cut on (score desc, id) via
   TakeOrderedAndProject + the bounded-rank pattern (ranking.py).

Engine-exact contract (same posture as the scaled-integer PageRank and
gram matrix): the paper's per-occurrence log-likelihood-ratio
``log p_t(b)/p_r(b)`` is replaced by the INTEGER ratio surrogate

    w(b) = (cnt_target(b) + 1) * WEIGHT_SCALE  DIV  (cnt_raw(b) + 1)

summed over a document's bigram occurrences. Laplace smoothing is the
paper's; the distributions' normalizing constants are dropped because a
per-occurrence constant factors out of every document's sum and cannot
change the induced ranking; integer DIV makes the score reproducible
bit-for-bit by any engine (the DuckDB oracle runs the same pipeline in
SQL), parallelism-independent, and immune to float summation order —
log-sums are none of those. Magnitudes: w(b) <= (|target n-grams|+1) *
WEIGHT_SCALE, so with the documented bounded-target contract scores
stay far below int64 even for million-token documents.

Hash modes mirror the dedup family: ``portable`` (md5-prefix ph28 —
what the oracle can reproduce) and ``xxhash64`` (production path).

Reference parity note: the reference engine (pdenno/RADmapper) has no
data-selection surface; this module is part of the training-data
extension stack, re-expressed from the public DSIR paper — not
translated from any implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import portable_hash as PH

WEIGHT_SCALE = 10 ** 6


def _bigram_buckets(docs: DataFrame, text_col: str, buckets: int,
                    hash_mode: str, keep_cols=()) -> DataFrame:
    """One row per adjacent-bigram OCCURRENCE: (*keep_cols, bucket).
    Tokenization matches textstats (lower, split on non-letters)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"[^a-z]+"),
                    lambda t: t != "")
    base = docs.select(*keep_cols, toks.alias("_t"))
    n = F.size(F.col("_t"))
    bigrams = F.when(n >= 2, F.transform(
        F.sequence(F.lit(0), n - F.lit(2)),
        lambda i: F.concat_ws(" ", F.element_at(F.col("_t"), i + 1),
                              F.element_at(F.col("_t"), i + 2))))
    ex = base.select(*keep_cols, F.explode(bigrams).alias("_bg"))
    if hash_mode == "portable":
        h = PH.ph28(F.col("_bg"))
    elif hash_mode == "xxhash64":
        # production hash: spread the sign away before the mod
        h = F.abs(F.xxhash64(F.col("_bg")))
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    return ex.select(*keep_cols, (h % F.lit(buckets)).alias("bucket"))


def importance_weights(raw: DataFrame, target: DataFrame,
                       text_col: str = "text", buckets: int = 4096,
                       hash_mode: str = "portable") -> DataFrame:
    """(bucket, weight): the scaled-integer importance weight of every
    feature bucket that occurs in either corpus. Both inputs reduce to
    <= ``buckets`` rows before the outer merge, so the result is always
    broadcast-sized regardless of corpus scale."""
    rc = (_bigram_buckets(raw, text_col, buckets, hash_mode)
          .groupBy("bucket").agg(F.count(F.lit(1)).alias("_cr")))
    return _weights_from_raw_counts(rc, target, text_col, buckets,
                                    hash_mode)


def _weights_from_raw_counts(rc: DataFrame, target: DataFrame,
                             text_col: str, buckets: int,
                             hash_mode: str) -> DataFrame:
    """importance_weights' merge half over a PRE-AGGREGATED raw side
    (bucket, _cr) — lets dsir_score derive the raw counts from the same
    exchange the scoring pass reads instead of a second corpus pass."""
    tc = (_bigram_buckets(target, text_col, buckets, hash_mode)
          .groupBy("bucket").agg(F.count(F.lit(1)).alias("_ct")))
    merged = (tc.join(rc, "bucket", "full_outer")
              .select("bucket",
                      F.coalesce(F.col("_ct"), F.lit(0)).alias("_ct"),
                      F.coalesce(F.col("_cr"), F.lit(0)).alias("_cr")))
    w = F.expr(f"((_ct + 1) * {WEIGHT_SCALE}) DIV (_cr + 1)")
    return merged.select("bucket", w.cast("long").alias("weight"))


def dsir_score(docs: DataFrame, target: DataFrame,
               text_col: str = "text", id_col: str = "doc_id",
               buckets: int = 4096,
               hash_mode: str = "portable") -> DataFrame:
    """(id_col, score): the importance score of every document in
    ``docs`` against the ``target`` distribution. The corpus is never
    shuffled at occurrence grain: occurrences reduce to (id, bucket,
    n) with map-side partials, broadcast-join the <= ``buckets``-row
    weight table and aggregate once per document. Documents with fewer
    than two tokens score 0 (no features — they carry no evidence
    either way).

    ONE tokenize/explode pass over ``docs`` (r18; guide §1.2 step 1 /
    §2.4): the raw-side bucket counts the weight table needs are
    exactly the scoring occurrences re-aggregated — deriving both from
    the same (id, bucket) aggregate makes its exchange subtree
    identical in the two branches, so ReuseExchange/AQE stage reuse
    computes the explode once (the old form ran _bigram_buckets over
    the full raw corpus twice: once for _cr, once for scoring). The
    per-document score is unchanged: sum(weight) over occurrences ==
    sum(n * weight) over (id, bucket) groups, exact BIGINTs."""
    occ_db = (_bigram_buckets(docs, text_col, buckets, hash_mode,
                              keep_cols=(id_col,))
              .groupBy(id_col, "bucket")
              .agg(F.count(F.lit(1)).alias("_n")))
    rc = occ_db.groupBy("bucket").agg(F.sum("_n").alias("_cr"))
    wtab = _weights_from_raw_counts(rc, target, text_col, buckets,
                                    hash_mode)
    scored = (occ_db.join(F.broadcast(wtab), "bucket")
              .groupBy(id_col)
              .agg(F.sum(F.col("_n") * F.col("weight")).alias("score")))
    # featureless docs (< 2 tokens) drop out of the explode; restore
    # them with score 0 so selection sees the whole corpus
    all_ids = docs.select(id_col).distinct()
    return (all_ids.join(scored, id_col, "left")
            .select(id_col,
                    F.coalesce(F.col("score"), F.lit(0))
                    .cast("long").alias("score")))


def dsir_select(docs: DataFrame, target: DataFrame, k: int,
                text_col: str = "text", id_col: str = "doc_id",
                buckets: int = 4096,
                hash_mode: str = "portable") -> DataFrame:
    """Top-k most target-like documents: (id_col, score, sel_rank),
    deterministically ordered by (score desc, id asc). The cut is a
    TakeOrderedAndProject (bounded k rows on the driver-side heap, never
    a global sort) and the rank is the bounded single-task pattern —
    the corpus-sized work is exactly dsir_score's one aggregate."""
    if k <= 0:
        raise ValueError(f"dsir_select: k must be positive, got {k}")
    from .ranking import bounded_global_rank
    top = (dsir_score(docs, target, text_col, id_col, buckets, hash_mode)
           .orderBy(F.col("score").desc(), F.col(id_col))
           .limit(k))
    return bounded_global_rank(
        top, [F.col("score").desc(), F.col(id_col)],
        rank_col="sel_rank").select(id_col, "score", "sel_rank")


def duck_dsir_sql(raw_pred: str, target_pred: str, k: int,
                  buckets: int = 4096, table: str = "documents",
                  text_col: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB twin of dsir_select(hash_mode='portable') where the raw
    and target corpora are ``table`` filtered by the given predicates —
    the same tokenization, ph28 bucketing, integer weights and
    deterministic cut, for the driver's value-level oracle."""
    bg = (f"SELECT {id_col} AS id, unnest(list_transform(range(1, len(t)),"
          f" i -> t[i] || ' ' || t[i+1])) AS bg FROM "
          f"(SELECT {id_col}, list_filter(string_split_regex("
          f"lower({text_col}), '[^a-z]+'), x -> x <> '') AS t "
          f"FROM {table} WHERE {{pred}}) WHERE len(t) >= 2")
    bucket = f"({PH.duck_ph28('bg')}) % {buckets}"
    return f"""
    WITH tocc AS (SELECT {bucket} AS bucket FROM ({bg.format(pred=target_pred)})),
    rocc AS (SELECT id, {bucket} AS bucket FROM ({bg.format(pred=raw_pred)})),
    tc AS (SELECT bucket, count(*) AS ct FROM tocc GROUP BY bucket),
    rc AS (SELECT bucket, count(*) AS cr FROM rocc GROUP BY bucket),
    w AS (SELECT COALESCE(tc.bucket, rc.bucket) AS bucket,
                 ((COALESCE(ct, 0) + 1) * {WEIGHT_SCALE})
                 // (COALESCE(cr, 0) + 1) AS weight
          FROM tc FULL OUTER JOIN rc ON tc.bucket = rc.bucket),
    sc AS (SELECT id, sum(weight)::BIGINT AS score
           FROM rocc JOIN w USING (bucket) GROUP BY id),
    allsc AS (SELECT {id_col} AS id, COALESCE(score, 0)::BIGINT AS score
              FROM {table} LEFT JOIN sc ON {id_col} = sc.id
              WHERE {raw_pred})
    SELECT id AS {id_col}, score,
           row_number() OVER (ORDER BY score DESC, id ASC) AS sel_rank
    FROM allsc
    ORDER BY score DESC, id ASC
    LIMIT {k}
    """
