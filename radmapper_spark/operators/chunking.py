"""Training-data preparation: document chunking and sequence packing.

The two transforms every LLM pre-training pipeline runs between "clean
corpus" and "token shards":

- ``chunk_documents``: split each document into fixed-size token windows
  with overlap (sliding stride).  Map-only — the plan is a single scan
  with a generator (posexplode) and NO shuffle, the only shape that
  works when the input is 100 TB of text.
- ``pack_sequences``: greedy first-fit-in-order packing of documents
  into fixed token-capacity bins (context windows), per packing group.
  Greedy packing is prefix-sequential, so it cannot be a window
  cumsum; it runs as a row-local ``aggregate`` fold over each group's
  (doc_id, n_tokens) structs — one shuffle on the group key, O(group)
  work per group, no driver collect.  Groups are the parallelism unit:
  at 100 TB you pack per (source, shard) so no single fold sees more
  than a few hundred thousand docs.

Reference parity: the reference has no chunking/packing operators
(it is a mapping language); these extend the corpus-pipeline stack the
same way dedup.py / textstats.py do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(docs: DataFrame, chunk_tokens: int = 32,
                    overlap: int = 8, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Sliding-window chunking: whitespace tokens, windows of
    ``chunk_tokens`` every ``stride = chunk_tokens - overlap`` tokens.

    Every token position is covered; the final window is short if the
    document does not divide evenly (standard practice — downstream
    packing handles ragged tails).  Blank/NULL documents produce no
    chunks.  Output: (doc_id, chunk_seq, chunk_start, n_chunk_tokens,
    chunk_text).

    Plan shape: single scan -> transform over a sequence of window
    starts -> posexplode.  No shuffle, no UDF; chunk text is rebuilt
    with array_join only for the emitted window (8x less byte traffic
    than substring arithmetic on the raw text).
    """
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})")
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    blank = F.col(text_col).isNull() | (F.trim(F.col(text_col)) == "")
    n = F.size("_toks")
    starts = F.sequence(F.lit(0), n - F.lit(1), F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start"),
            F.slice(F.col("_toks"), s + 1, chunk_tokens).alias("win")))
    out = (docs
           .filter(~blank)
           .select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
           .select("doc_id", F.posexplode(chunks).alias("chunk_seq", "_c"))
           .select("doc_id",
                   (F.col("chunk_seq") + 1).alias("chunk_seq"),
                   F.col("_c.start").alias("chunk_start"),
                   F.size("_c.win").alias("n_chunk_tokens"),
                   F.array_join("_c.win", " ").alias("chunk_text")))
    return out


def pack_sequences(docs: DataFrame, capacity: int = 256,
                   group_col: str = "source", id_col: str = "doc_id",
                   n_tokens_col: str = "n_tokens") -> DataFrame:
    """Greedy in-order bin packing: within each group (docs ordered by
    id), a document goes into the current bin if it fits, else opens the
    next bin.  Documents longer than ``capacity`` are clamped to it
    (they fill a whole bin), mirroring truncation-at-context-length.

    Output: (group, doc_id, n_used, pack_id, pack_fill) where pack_id
    is the 1-based bin within the group and pack_fill the bin's running
    token count after this doc.

    Plan shape: one shuffle to collect each group's (id, n) structs,
    then a row-local ``aggregate`` fold emitting the assignment array,
    posexploded back to rows.  The fold is the honest expression of a
    prefix-sequential recurrence — a window cumsum CANNOT express
    greedy packing because the leftover space a too-big doc abandons
    depends on every prior decision.  Parallelism comes from the group
    key; callers at scale pack per (source, shard).
    """
    base = docs.select(
        F.col(group_col).alias("grp"),
        F.struct(
            F.col(id_col).alias("id"),
            F.least(F.col(n_tokens_col).cast("long"),
                    F.lit(capacity).cast("long")).alias("n")).alias("_s"))
    grouped = base.groupBy("grp").agg(
        F.array_sort(F.collect_list("_s")).alias("_items"))
    zero = F.struct(
        F.lit(0).cast("long").alias("bin"),
        F.lit(0).cast("long").alias("fill"),
        F.array().cast(
            "array<struct<id:long,n:long,bin:long,fill:long>>").alias("out"))
    fold = F.aggregate(
        F.col("_items"),
        zero,
        lambda acc, x: F.when(
            (acc["fill"] + x["n"] <= capacity) & (acc["bin"] > 0),
            F.struct(
                acc["bin"].alias("bin"),
                (acc["fill"] + x["n"]).alias("fill"),
                F.concat(acc["out"], F.array(F.struct(
                    x["id"].alias("id"), x["n"].alias("n"),
                    acc["bin"].alias("bin"),
                    (acc["fill"] + x["n"]).alias("fill")))).alias("out"))
        ).otherwise(
            F.struct(
                (acc["bin"] + 1).alias("bin"),
                x["n"].alias("fill"),
                F.concat(acc["out"], F.array(F.struct(
                    x["id"].alias("id"), x["n"].alias("n"),
                    (acc["bin"] + 1).alias("bin"),
                    x["n"].alias("fill")))).alias("out"))),
        lambda acc: acc["out"])
    return (grouped.select("grp", F.explode(fold).alias("_a"))
            .select(F.col("grp").alias(group_col),
                    F.col("_a.id").alias(id_col),
                    F.col("_a.n").alias("n_used"),
                    F.col("_a.bin").alias("pack_id"),
                    F.col("_a.fill").alias("pack_fill")))


def pack_sequences_sharded(docs: DataFrame, capacity: int = 256,
                           group_col: str = "source",
                           id_col: str = "doc_id",
                           n_tokens_col: str = "n_tokens",
                           shard_docs: int = 500) -> DataFrame:
    """The at-scale variant of :func:`pack_sequences`: each group's
    ordered doc stream is cut into shards of ``shard_docs`` docs, greedy
    packing runs independently per shard, and shard-local bins are
    renumbered into a single per-group sequence with an exclusive cumsum
    of per-shard bin counts.

    Tradeoff vs pure greedy: bins never span a shard boundary, so each
    shard may leave ONE underfull trailing bin (bounded waste:
    <= capacity tokens per shard_docs docs); in exchange the fold cost
    drops from O(|group|^2) array-copy bytes to O(|group| * shard_docs)
    and shards of one group pack IN PARALLEL — the only shape that
    works when a group has millions of docs. Output schema and
    invariants match pack_sequences (dense 1-based pack_id per group,
    per-bin fill <= capacity, doc order preserved within bins).
    """
    from pyspark.sql import Window
    rn_w = Window.partitionBy(group_col).orderBy(F.col(id_col).asc())
    base = docs.select(
        F.col(group_col).alias("grp"), F.col(id_col).alias("_id"),
        F.least(F.col(n_tokens_col).cast("long"),
                F.lit(capacity).cast("long")).alias("_n"),
        ((F.row_number().over(Window.partitionBy(group_col)
                              .orderBy(F.col(id_col).asc())) - 1)
         / shard_docs).cast("long").alias("_shard"))
    grouped = base.groupBy("grp", "_shard").agg(
        F.array_sort(F.collect_list(F.struct(
            F.col("_id").alias("id"), F.col("_n").alias("n"))))
        .alias("_items"))
    zero = F.struct(
        F.lit(0).cast("long").alias("bin"),
        F.lit(0).cast("long").alias("fill"),
        F.array().cast("array<struct<bin:long,fill:long>>").alias("out"))
    step_in = lambda acc, x: F.struct(
        acc["bin"].alias("bin"), (acc["fill"] + x["n"]).alias("fill"),
        F.concat(acc["out"], F.array(F.struct(
            acc["bin"].alias("bin"),
            (acc["fill"] + x["n"]).alias("fill")))).alias("out"))
    step_new = lambda acc, x: F.struct(
        (acc["bin"] + 1).alias("bin"), x["n"].alias("fill"),
        F.concat(acc["out"], F.array(F.struct(
            (acc["bin"] + 1).alias("bin"),
            x["n"].alias("fill")))).alias("out"))
    fold = F.aggregate(
        F.col("_items"), zero,
        lambda acc, x: F.when(
            (acc["fill"] + x["n"] <= capacity) & (acc["bin"] > 0),
            step_in(acc, x)).otherwise(step_new(acc, x)),
        lambda acc: acc["out"])
    packed = grouped.select(
        "grp", "_shard",
        F.arrays_zip(F.col("_items"), fold.alias("asg")).alias("_z"))
    # exclusive cumsum of per-shard bin counts -> global per-group bins
    shard_bins = packed.withColumn(
        "_shard_nbins",
        F.element_at(F.col("_z"), -1)["asg"]["bin"])
    off_w = (Window.partitionBy("grp").orderBy(F.col("_shard").asc())
             .rowsBetween(Window.unboundedPreceding, -1))
    with_off = shard_bins.withColumn(
        "_off", F.coalesce(F.sum("_shard_nbins").over(off_w),
                           F.lit(0).cast("long")))
    return (with_off.select("grp", "_off", F.explode("_z").alias("_e"))
            .select(F.col("grp").alias(group_col),
                    F.col("_e._items.id").alias(id_col),
                    F.col("_e._items.n").alias("n_used"),
                    (F.col("_e.asg.bin") + F.col("_off")).alias("pack_id"),
                    F.col("_e.asg.fill").alias("pack_fill")))


def chunk_content_defined(docs: DataFrame, mod: int = 16,
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          hash_mode: str = "portable") -> DataFrame:
    """Content-defined chunking: a chunk boundary falls AFTER every token
    whose hash is 0 mod ``mod`` (expected chunk length = ``mod`` tokens).
    Unlike fixed sliding windows, boundaries depend only on LOCAL content
    — editing a document's head re-chunks only up to the first surviving
    boundary, so downstream chunk-level dedup stays stable under
    insertions (the rsync/LBFS property; no min/max clamp here, which
    keeps the operator a pure per-row expression).

    hash_mode "portable" uses the md5-prefix family DuckDB reproduces
    bit-for-bit (the oracle path); "xxhash64" is the fast production
    path (boundary = xxhash64(token) % mod == 0, rows-only checkable).
    Map-only single scan, zero shuffles. Output: (doc_id, chunk_seq,
    chunk_start, n_chunk_tokens, chunk_text).
    """
    from ..functions import portable_hash as PH
    if mod < 2:
        raise ValueError("mod must be >= 2")
    tok_hash = PH.ph28 if hash_mode == "portable" else (
        lambda c: F.pmod(F.xxhash64(c), F.lit(1 << 28)))
    blank = F.col(text_col).isNull() | (F.trim(F.col(text_col)) == "")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = (docs.filter(~blank)
            .select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
            .withColumn("_th", F.transform(F.col("_toks"),
                                           lambda t: tok_hash(t))))
    n = F.size("_toks")
    bpos = F.filter(F.sequence(F.lit(0), n - 1),
                    lambda p: F.element_at(F.col("_th"), p + 1)
                    % mod == 0)
    starts = F.concat(F.array(F.lit(0)),
                      F.transform(bpos, lambda p: p + 1))
    ends = F.concat(F.transform(bpos, lambda p: p + 1),
                    F.array(n))
    spans = F.filter(F.arrays_zip(starts.alias("s"), ends.alias("e")),
                     lambda z: z["s"] < z["e"])
    return (base
            .select("doc_id", "_toks",
                    F.posexplode(spans).alias("chunk_seq", "_sp"))
            .select("doc_id",
                    (F.col("chunk_seq") + 1).cast("long").alias("chunk_seq"),
                    F.col("_sp.s").cast("long").alias("chunk_start"),
                    (F.col("_sp.e") - F.col("_sp.s")).cast("long")
                    .alias("n_chunk_tokens"),
                    F.array_join(
                        F.slice(F.col("_toks"), F.col("_sp.s") + 1,
                                F.col("_sp.e") - F.col("_sp.s")), " ")
                    .alias("chunk_text")))
