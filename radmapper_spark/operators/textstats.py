"""Text-analysis operators over a documents table: language-ID, quality
scoring, token counting, fingerprinting. Pure Catalyst expressions — these
run inside whole-stage codegen on every row of a 100 TB corpus, so no
Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# A small stopword profile per language: the language whose stopwords hit
# most wins (n-gram-free heuristic that is exactly expressible in SQL for
# the oracle).
LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "que", "pour", "pas"],
    "es": ["el", "la", "los", "que", "de", "no", "una", "por", "con", "para"],
}


def _tokens(col):
    return F.split(F.trim(F.lower(col)), r"\s+")


def _hits(tokens, words: list) -> object:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.array_intersect(F.array_distinct(tokens), arr))


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language ID -> lang_pred column ('und' if no hits)."""
    toks = _tokens(F.col(text_col))
    scored = F.array(*[
        F.struct(_hits(toks, words).alias("hits"), F.lit(lang).alias("lang"))
        for lang, words in sorted(LANG_PROFILES.items())
    ])
    best = F.array_max(scored)
    pred = F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    return docs.withColumn("lang_pred", pred)


# GPT-2-style pre-tokenizer pattern, LOOKAHEAD-FREE so the same pattern
# runs in Java regex (Spark) and RE2 (DuckDB oracle): contractions,
# space-prefixed letter runs, digit runs, punctuation runs, whitespace
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens, a BPE-ish REGEX tokenization count (GPT-2-style
    pre-tokenizer pattern, counted JVM-side with regexp_count), and the
    chars/4 estimate — per document, all whole-stage-codegen. NULL or
    whitespace-only text counts as 0 tokens (real corpora contain both;
    split('') would otherwise report 1 and NULL would propagate)."""
    blank = F.col(text_col).isNull() | (F.trim(F.col(text_col)) == "")
    ws = F.when(blank, F.lit(0)).otherwise(F.size(_tokens(F.col(text_col))))
    chars = F.coalesce(F.length(F.col(text_col)), F.lit(0))
    return (docs.withColumn("n_tokens_ws", ws)
            .withColumn("n_tokens_bpe_rx",
                        F.when(blank, F.lit(0)).otherwise(
                            F.regexp_count(F.col(text_col),
                                           F.lit(BPE_PATTERN))))
            .withColumn("n_tokens_bpe_est",
                        F.ceil(chars / F.lit(4.0)).cast("bigint")))


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality signals: mean word length, punctuation ratio,
    stopword ratio, digit ratio, and a composite [0,1] score."""
    text = F.col(text_col)
    toks = _tokens(text)
    n_tok = F.size(toks)
    chars = F.length(text)
    n_punct = chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    n_digit = chars - F.length(F.regexp_replace(text, r"[0-9]", ""))
    en_stop = F.array(*[F.lit(w) for w in LANG_PROFILES["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t)))
    mean_word_len = (chars - n_tok + 1).cast("double") / n_tok.cast("double")
    punct_ratio = n_punct.cast("double") / F.greatest(chars, F.lit(1)).cast("double")
    digit_ratio = n_digit.cast("double") / F.greatest(chars, F.lit(1)).cast("double")
    stop_ratio = n_stop.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double")
    score = (
        F.when((mean_word_len >= 3) & (mean_word_len <= 10), 0.4).otherwise(0.0)
        + F.when(punct_ratio < 0.2, 0.2).otherwise(0.0)
        + F.when(digit_ratio < 0.3, 0.2).otherwise(0.0)
        + F.when(stop_ratio > 0.01, 0.2).otherwise(0.0)
    )
    return (
        docs.withColumn("mean_word_len", F.round(mean_word_len, 6))
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("digit_ratio", F.round(digit_ratio, 6))
        .withColumn("stopword_ratio", F.round(stop_ratio, 6))
        .withColumn("quality", F.round(score, 2))
    )


def fingerprint(docs: DataFrame, text_col: str = "text",
                hash_mode: str = "xxhash64") -> DataFrame:
    """Document fingerprint: 64-bit content hash of normalized text plus a
    rolling-window hash set (winnowing-style min over 8-gram hashes) for
    partial-overlap detection.

    Each token is hashed ONCE (materialized as its own column so
    CollapseProject cannot inline the token-hash array 8x into the window
    lambda). hash_mode "xxhash64" (default): a window hash is the XOR of
    its 8 token hashes rotated by position, re-mixed through xxhash64 —
    order-sensitive, all bitwise (overflow-free under ANSI mode), ~8x less
    byte traffic than a per-window array_join(slice) string rebuild.
    hash_mode "portable": md5-prefix token hashes combined with an
    order-sensitive polynomial mod 2^31-1 — same plan shape, every value
    reproducible in DuckDB SQL (functions.portable_hash)."""
    from ..functions import portable_hash as PH

    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    k = 8
    portable = hash_mode == "portable"

    def rotl(c, r):
        return F.shiftleft(c, r).bitwiseOR(F.shiftrightunsigned(c, 64 - r))

    def window_hash(th, i):
        if portable:
            return PH.poly_col([F.element_at(th, i + 1 + j) for j in range(k)])
        h = F.element_at(th, i + 1)
        for j in range(1, k):
            h = h.bitwiseXOR(rotl(F.element_at(th, i + 1 + j), 7 * j))
        return F.xxhash64(h)

    tok_hash = PH.ph28 if portable else F.xxhash64
    doc_hash = PH.ph60 if portable else F.xxhash64
    with_th = docs.withColumn("_fp_norm", norm).withColumn(
        "_fp_th", F.transform(F.split(F.col("_fp_norm"), " "),
                              lambda tok: tok_hash(tok)))
    n = F.size(F.col("_fp_th"))
    window_hashes = F.when(n >= k, F.transform(
        F.sequence(F.lit(0), n - F.lit(k)),
        lambda i: window_hash(F.col("_fp_th"), i),
    )).otherwise(F.array(doc_hash(F.col("_fp_norm"))))
    return (
        with_th.withColumn("fp_hash", doc_hash(F.col("_fp_norm")))
        .withColumn("fp_min_window", F.array_min(window_hashes))
        .drop("_fp_norm", "_fp_th")
    )


# ----------------------------------------------------------- vocabulary

def vocabulary(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               top_n: int = 200) -> DataFrame:
    """Corpus vocabulary: top_n terms by total count with doc frequency and
    idf. Plan: explode alpha tokens -> groupBy(term) with MAP-SIDE partial
    agg (count + exact distinct-doc count) -> global top-n. The only wide
    exchange carries (term, id) pairs; the top-n reduce sees |vocab| rows,
    orders of magnitude below the corpus. Ties at the cut are impossible:
    rank is (n_total desc, term asc) and terms are unique."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"[^a-z]+"),
                    lambda t: t != "")
    exploded = docs.select(F.col(id_col).alias("_id"),
                           F.explode(toks).alias("term"))
    stats = (exploded.groupBy("term")
             .agg(F.count(F.lit(1)).alias("n_total"),
                  F.countDistinct("_id").alias("n_docs")))
    # top-n as orderBy+limit -> TakeOrderedAndProject (per-partition
    # partial top-n, driver merges n*partitions rows) instead of a global
    # single-partition window sort over the whole vocabulary; the rank
    # then runs over <= top_n rows (bounded_global_rank: intentional
    # bounded single task, no empty-partition-spec window).
    from .ranking import bounded_global_rank
    top = stats.orderBy(F.col("n_total").desc(), F.col("term").asc()).limit(top_n)
    ranked = bounded_global_rank(
        top, [F.col("n_total").desc(), F.col("term").asc()], "rank")
    # corpus doc count folded into the lazy plan as a broadcast 1-row
    # aggregate (NOT an eager .count(): the plan stays one job), applied
    # after the top-n cut so it multiplies <= top_n rows
    n_docs_total = docs.agg(F.count(F.lit(1)).alias("_n_docs_total"))
    return (ranked
            .crossJoin(F.broadcast(n_docs_total))
            .withColumn("idf", F.round(
                F.log((F.col("_n_docs_total") + 1.0)
                      / (F.col("n_docs") + 1.0)), 6))
            .select("rank", "term", "n_total", "n_docs", "idf"))


def tf_idf_topk(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                k: int = 3) -> DataFrame:
    """Top-k characteristic terms per document, tf-idf flavored with an
    ALL-INTEGER ranking (n_in_doc desc, n_docs asc, term asc) so the rank
    is bit-deterministic across engines — the float tf*idf score is
    surfaced (rounded) but never ranked on. Plan: explode -> per-(doc,term)
    counts -> shuffle join on term against the doc-frequency table (NOT
    broadcast: at 100 TB the vocabulary is itself large) -> per-doc window
    top-k."""
    from pyspark.sql import Window
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"[^a-z]+"),
                    lambda t: t != "")
    exploded = docs.select(F.col(id_col).alias("doc_id"),
                           F.explode(toks).alias("term"))
    per_doc = exploded.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("n_in_doc"))
    doc_len = per_doc.groupBy("doc_id").agg(
        F.sum("n_in_doc").alias("_doc_len"))
    df_stats = per_doc.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_docs"))
    # doc count folded into the lazy plan (broadcast 1-row aggregate, no
    # eager .count() job before the main plan)
    n_docs_total = docs.agg(F.count(F.lit(1)).alias("_n_docs_total"))
    joined = (per_doc.join(df_stats, "term").join(doc_len, "doc_id")
              .crossJoin(F.broadcast(n_docs_total)))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("n_in_doc").desc(), F.col("n_docs").asc(), F.col("term").asc())
    tfidf = (F.col("n_in_doc") / F.col("_doc_len")) * F.log(
        (F.col("_n_docs_total") + 1.0) / (F.col("n_docs") + 1.0))
    return (joined.withColumn("term_rank", F.row_number().over(w))
            .filter(F.col("term_rank") <= k)
            .select("doc_id", "term_rank", "term", "n_in_doc", "n_docs",
                    F.round(tfidf, 6).alias("tfidf")))


def bigram_pmi(docs: DataFrame, text_col: str = "text",
               min_count: int = 3, top_n: int = 100) -> DataFrame:
    """Collocation mining: top_n adjacent-word bigrams by count with
    pointwise mutual information. PMI = ln((c_ab/N_bi) / ((c_a/N_uni) *
    (c_b/N_uni))). One explode for unigrams, one for bigrams (built with
    transform over the token array — no self-join), two map-side-partial
    groupBys, a broadcast-sized join of bigrams to unigram counts, and a
    TakeOrdered cut ranked on integers (c_ab desc, bigram asc) so the
    cut is engine-exact; PMI surfaced rounded, never ranked on."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"[^a-z]+"),
                    lambda t: t != "")
    base = docs.select(toks.alias("_t"))
    uni = (base.select(F.explode("_t").alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("c_w")))
    n = F.size(F.col("_t"))
    bigrams = F.when(n >= 2, F.transform(
        F.sequence(F.lit(0), n - F.lit(2)),
        lambda i: F.struct(F.element_at(F.col("_t"), i + 1).alias("w1"),
                           F.element_at(F.col("_t"), i + 2).alias("w2"))))
    bi = (base.select(F.explode(bigrams).alias("b"))
          .select("b.w1", "b.w2")
          .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_ab"))
          .filter(F.col("c_ab") >= min_count))
    # corpus totals stay INSIDE the lazy plan: a 1-row aggregate
    # broadcast-crossed into every bigram row — no eager scalar collects
    # (two driver jobs before the main plan broke the one-lazy-plan
    # discipline and tripled the scan count), and coalesce(.., 1) guards
    # the empty/blank-only corpus where the sums aggregate to NULL
    totals = (uni.agg(F.sum("c_w").alias("_n_uni"))
              .crossJoin(bi.agg(F.sum("c_ab").alias("_n_bi"))))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c_w").alias("c_a"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c_w").alias("c_b"))
    joined = (bi.join(u1, "w1").join(u2, "w2")
              .crossJoin(F.broadcast(totals)))
    n_uni = F.coalesce(F.col("_n_uni"), F.lit(1)).cast("double")
    n_bi = F.coalesce(F.col("_n_bi"), F.lit(1)).cast("double")
    pmi = F.log((F.col("c_ab") / n_bi)
                / ((F.col("c_a") / n_uni) * (F.col("c_b") / n_uni)))
    from .ranking import bounded_global_rank
    top = (joined.orderBy(F.col("c_ab").desc(), F.col("w1").asc(),
                          F.col("w2").asc()).limit(top_n))
    order = [F.col("c_ab").desc(), F.col("w1").asc(), F.col("w2").asc()]
    return (bounded_global_rank(top, order, "rank")
            .select("rank", "w1", "w2", "c_ab", "c_a", "c_b",
                    F.round(pmi, 6).alias("pmi")))


def repetition_score(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", n: int = 3,
                     dup_ngram_max: float = 0.30,
                     top_word_max: float = 0.20) -> DataFrame:
    """Gopher-style repetition quality filter, per document:

    - ``dup_ngram_frac``: fraction of the doc's word n-grams that are
      repeats (1 - distinct/total) — catches boilerplate and loops;
    - ``top_word_frac``: share of tokens taken by the single most common
      word — catches keyword-stuffing;
    - ``keep``: both measures under their thresholds (the published
      heuristic shape: drop on duplicate 3-gram fraction / top-unigram
      coverage).

    Everything is array math over ONE row, on HASHED tokens: each word is
    xxhash64'd once, n-grams are the hash of their n word hashes (no
    per-gram string rebuild — the same trick that made decontamination
    4.7x faster), and both the distinct-gram count and the top-word run
    are computed over the hash arrays (identical values up to negligible
    64-bit collisions). The plan is a map-only single scan: zero
    shuffles, the shape a per-document quality pass must have at
    100 TB."""
    w = F.filter(F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
                 lambda t: t != "")
    docs = docs.select(F.col(id_col),
                       F.transform(w, lambda t: F.xxhash64(t)).alias("_th"))
    nw = F.size("_th")
    grams = F.when(nw >= n, F.transform(
        F.sequence(F.lit(0), nw - F.lit(n)),
        lambda i: F.xxhash64(*[F.element_at(F.col("_th"), i + 1 + j)
                               for j in range(n)])))
    n_grams = F.coalesce(F.size(grams), F.lit(0))
    n_dist = F.coalesce(F.size(F.array_distinct(grams)), F.lit(0))
    dup_frac = F.when(n_grams > 0,
                      (n_grams - n_dist) / n_grams.cast("double")) \
        .otherwise(F.lit(0.0))
    # top unigram count without an explode/groupBy: sort the token-hash
    # array and fold once for the longest equal-run — O(n log n)
    # row-local. (A transform(distinct, d -> count(filter == d)) is
    # O(distinct * n): fine on a toy vocabulary, quadratic on real text
    # where distinct ~ n.)
    sw = F.array_sort("_th")
    top_cnt = F.aggregate(
        sw,
        F.struct(F.lit(0).cast("long").alias("w"), F.lit(0).alias("run"),
                 F.lit(0).alias("best")),
        lambda acc, x: F.struct(
            x.alias("w"),
            F.when(x == acc["w"], acc["run"] + 1).otherwise(F.lit(1))
            .alias("run"),
            F.greatest(acc["best"],
                       F.when(x == acc["w"], acc["run"] + 1)
                       .otherwise(F.lit(1))).alias("best")),
        lambda acc: acc["best"])
    top_frac = F.when(nw > 0, top_cnt / nw.cast("double")) \
        .otherwise(F.lit(0.0))
    return docs.select(
        F.col(id_col),
        F.round(dup_frac, 6).alias("dup_ngram_frac"),
        F.round(top_frac, 6).alias("top_word_frac"),
        ((dup_frac <= dup_ngram_max) & (top_frac <= top_word_max))
        .alias("keep"))


# ----------------------------------------------------------- PII scrub

# Patterns chosen to be lookahead-free so the SAME pattern runs in Java
# regex (Spark) and RE2 (DuckDB oracle). Order of application matters and
# is fixed: emails first (their digits must not feed the phone pattern),
# then IPv4 (dotted digits), then phone runs (no dots in the class, so a
# redacted [IPV4] cannot re-match).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\+?[0-9][0-9()\- ]{7,}[0-9]"


def pii_scrub(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """PII redaction pass: count and redact emails, IPv4 addresses and
    phone-number-shaped digit runs.  Counts are taken on the ORIGINAL
    text; replacements are applied in the fixed order documented above.
    Emits (doc_id, n_emails, n_ipv4, n_phones, scrub_len, scrub_hash)
    where scrub_hash is the md5 of the scrubbed text — enough for an
    engine-exact equality check without hauling full text through the
    comparator.  Map-only single scan, all regexes JVM-side."""
    t = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL, "[EMAIL]"),
            PII_IPV4, "[IPV4]"),
        PII_PHONE, "[PHONE]")
    return docs.select(
        F.col(id_col),
        F.regexp_count(t, F.lit(PII_EMAIL)).alias("n_emails"),
        F.regexp_count(t, F.lit(PII_IPV4)).alias("n_ipv4"),
        F.regexp_count(t, F.lit(PII_PHONE)).alias("n_phones"),
        F.length(scrubbed).alias("scrub_len"),
        F.md5(scrubbed.cast("binary")).alias("scrub_hash"))


# ----------------------------------------------------- inverted index

def inverted_index(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", min_df: int = 2,
                   postings_cap: int = 20) -> DataFrame:
    """Search-style inverted index: per term, the document frequency and
    the posting list — the first ``postings_cap`` doc ids in ascending
    order, serialized to a comma-joined string (comparator-friendly and
    the honest at-scale shape: full posting lists for stopwords would be
    corpus-sized rows; real systems shard them).

    Plan: explode distinct (term, doc) pairs -> ONE groupBy(term) that
    computes both df and the capped posting list. collect_set is
    unordered by contract, so the list is sort_array'ed then sliced —
    the cap bounds the row size but the set itself is the term's full
    doc set; terms below ``min_df`` are dropped AFTER aggregation (the
    filter is on the agg output, no second pass)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"[^a-z]+"),
                    lambda t: t != "")
    pairs = (docs.select(F.col(id_col).alias("_id"),
                         F.explode(F.array_distinct(toks)).alias("term")))
    agg = (pairs.groupBy("term")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.slice(F.sort_array(F.collect_set("_id")), 1,
                        postings_cap).alias("_post")))
    return (agg.filter(F.col("n_docs") >= min_df)
            .select("term", "n_docs",
                    F.array_join(F.transform(
                        F.col("_post"), lambda d: d.cast("string")), ",")
                    .alias("postings")))


# ---------------------------------------------------------------- BM25

def bm25_score(docs: DataFrame, query_terms: list,
               text_col: str = "text", id_col: str = "doc_id",
               k1: float = 1.2, b: float = 0.75,
               top_k: int = 20) -> DataFrame:
    """BM25 ranking of the corpus against a bag of query terms.

    Cross-engine determinism: the float math is confined to ONE rounded
    value per (doc, term) — each term's partial score is rounded to 6
    decimals and scaled to an INTEGER micro-score; the per-doc total is
    a sum of integers (order-independent), and the top-k rank orders on
    (total_micro desc, doc_id asc) — integers only, so the cut is
    bit-identical in any engine.  The ranked float score is surfaced as
    micro/1e6.

    Plan: explode tokens filtered TO THE QUERY TERMS at the scan (the
    IN filter prunes before the shuffle: only query-term tokens leave
    the map side) -> per-(doc, term) tf -> join the |query_terms|-row
    df/idf table (broadcast) -> integer top-k via TakeOrderedAndProject.
    Doc lengths come from a full-token count computed in the same scan
    (no second pass)."""
    if not query_terms:
        raise ValueError("bm25_score needs at least one query term")
    # NULL text tokenizes to an EMPTY array, not NULL: F.size(NULL) is -1
    # under non-ANSI Spark while the DuckDB oracle's sum(len(..)) skips
    # NULLs, so an uncoalesced token column would skew avgdl (and every
    # micro-score) on corpora containing NULL documents
    toks = F.coalesce(
        F.filter(F.split(F.lower(F.col(text_col)), r"[^a-z]+"),
                 lambda t: t != ""),
        F.array().cast("array<string>"))
    qarr = F.array(*[F.lit(t) for t in sorted(set(query_terms))])
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.size(toks).alias("_dl"),
                       F.filter(toks,
                                lambda t: F.array_contains(qarr, t))
                       .alias("_qt"))
    tf = (base.select("doc_id", "_dl", F.explode("_qt").alias("term"))
          .groupBy("doc_id", "_dl", "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    corpus = docs.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.size(toks)).alias("_tok_total"))
    scored = (tf.join(F.broadcast(dfreq), "term")
              .crossJoin(F.broadcast(corpus)))
    avgdl = F.col("_tok_total").cast("double") / F.col("_n").cast("double")
    idf = F.log(
        (F.col("_n").cast("double") - F.col("df") + 0.5)
        / (F.col("df") + 0.5) + 1.0)
    tfd = F.col("tf").cast("double")
    part = idf * (tfd * (k1 + 1.0)) / (
        tfd + k1 * (1.0 - b + b * F.col("_dl").cast("double") / avgdl))
    micro = F.round(part * 1e6).cast("long")
    per_doc = (scored.select("doc_id", micro.alias("_micro"))
               .groupBy("doc_id")
               .agg(F.sum("_micro").alias("_tot_micro"),
                    F.count(F.lit(1)).alias("n_terms_hit")))
    from .ranking import bounded_global_rank
    top = (per_doc.orderBy(F.col("_tot_micro").desc(),
                           F.col("doc_id").asc()).limit(top_k))
    order = [F.col("_tot_micro").desc(), F.col("doc_id").asc()]
    return (bounded_global_rank(top, order, "rank")
            .select("rank", "doc_id", "n_terms_hit",
                    (F.col("_tot_micro").cast("double") / 1e6)
                    .alias("bm25")))
