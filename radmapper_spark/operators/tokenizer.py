"""Corpus-trained BPE tokenizer (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units" — re-expressed from the
public paper, not translated from any implementation): learn a bounded
merge table from corpus word frequencies, then tokenize distributed with
the merges as a broadcast literal — so chunking/packing token budgets
become EXACT instead of whitespace estimates (r10 verdict item #6).

Scale shape (the DSIR bounded-broadcast-table contract):

- TRAIN: one distributed word-frequency aggregate, a
  TakeOrderedAndProject cut to the ``top_words`` most frequent words
  (the training vocabulary — bounded by construction), then the merge
  loop runs DRIVER-SIDE in pure Python over those <= top_words rows
  (O(top_words * n_merges) work on tiny strings — microseconds; a
  distributed iteration would pay n_merges job launches to process a
  few KB). The corpus is touched exactly once.
- APPLY: merges ship as an ARRAY LITERAL inside a pure-Catalyst
  ``aggregate`` fold (string ``replace`` per merge, in rank order) —
  map-only, zero shuffle, zero Python; at 100 TB tokenization is part
  of the corpus scan. The fold runs ONCE over the whole document's
  space-joined symbol sequence (not per word): merge symbols are
  [a-z0-9]+ only, so no merge pattern can match across a wrapped
  space, and the doc-level fold is positionally identical to per-word
  folding while paying the wrap/fold/split passes once per document.

The symbol-sequence encoding makes one BPE merge equal ONE string
replace: a word's symbol sequence is rendered ``|s1||s2||s3|`` (every
symbol wrapped in '|'), so merging the pair (a, b) is
``replace(seq, '|a||b|', '|ab|')`` — left-to-right, non-overlapping,
boundary-exact (the doubled separator means a pattern can never match
across a symbol boundary, and consecutive occurrences don't share
separators, so ``a a a a -> aa aa`` exactly like greedy BPE). Both
Spark's ``replace`` and DuckDB's have these semantics, which is what
makes the DuckDB oracle able to re-run the ENTIRE pipeline — training
iterations included — in pure SQL.

Token alphabet: words are normalized to [a-z0-9]+ (lowercase, every
other character is a separator), so the '|' sentinel can never appear
inside a symbol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ONE owner for the [a-z0-9]+ word-normalization contract the oracle SQL
# mirrors: decontam._words (r11 review — a second equivalent
# construction here would let a future tweak silently desynchronize
# tokenizer/decontam word semantics)
from .decontam import _words as _norm_words

#: chunk_id = doc_id * CHUNK_ID_STRIDE + chunk_seq — the BIGINT keying
#: scheme every chunk-granularity consumer (the materialized-shard
#: entries, the streaming ingest loop) shares. ONE definition so the
#: streaming and offline shard keys can never be computed under
#: different strides (r14 review); each consumer guards chunk_seq <
#: stride with a loud raise_error.
CHUNK_ID_STRIDE = 1_000_000


def _seq(word: str) -> str:
    return "".join(f"|{c}|" for c in word)


def bpe_train_local(word_freqs, n_merges: int):
    """Pure-Python BPE merge-table training over a (word, freq) list —
    the driver-side half of bpe_train, factored out so tests (and the
    oracle-construction argument) can exercise it standalone. Pair
    counts are per adjacent position weighted by word frequency; ties
    break deterministically by (count DESC, lhs ASC, rhs ASC) — the
    exact ORDER BY the oracle SQL's per-iteration argmax uses. Stops
    early when no pair remains. Returns [(lhs, rhs), ...] in rank
    order."""
    seqs = {w: _seq(w) for w, _ in word_freqs}
    freqs = dict(word_freqs)
    merges = []
    for _ in range(int(n_merges)):
        counts: dict = {}
        for w, s in seqs.items():
            toks = s.strip("|").split("||")
            f = freqs[w]
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p[0], p[1]))
        merges.append(best)
        pat, rep = f"|{best[0]}||{best[1]}|", f"|{best[0]}{best[1]}|"
        seqs = {w: s.replace(pat, rep) for w, s in seqs.items()}
    return merges


def bpe_train(docs: DataFrame, text_col: str = "text",
              n_merges: int = 16, top_words: int = 256):
    """Train a BPE merge table on the corpus: ONE distributed
    word-frequency pass, a bounded top-``top_words`` cut (count DESC,
    word ASC — fully deterministic at the boundary), then the merge
    loop driver-side (see module docstring for why that is the right
    100 TB shape). Returns the merge list [(lhs, rhs), ...]."""
    freq = (docs.select(F.explode(_norm_words(F.col(text_col)))
                        .alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))
    top = (freq.orderBy(F.col("freq").desc(), F.col("word").asc())
           .limit(int(top_words)).collect())  # bounded by construction
    return bpe_train_local([(r["word"], r["freq"]) for r in top],
                           n_merges)


def _merge_fold(col, merges):
    """Catalyst fold applying the merge list in rank order to a
    '|'-wrapped symbol-sequence column. Merges are a broadcast literal
    array; each step is one JVM string replace."""
    if not merges:
        return col
    lits = F.array(*[
        F.struct(F.lit(f"|{a}||{b}|").alias("pat"),
                 F.lit(f"|{a}{b}|").alias("rep"))
        for a, b in merges])
    return F.aggregate(lits, col,
                       lambda acc, m: F.replace(acc, m["pat"], m["rep"]))


def bpe_token_counts(docs: DataFrame, merges, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document EXACT BPE token counts under a trained merge table:
    (id_col, n_words, n_tokens). Documents with no normalized words
    emit no row (mirrored by the oracle's join-through-words shape).
    Map-only: ONE doc-level fold in the input scan — no distinct-words
    join, no shuffle, and no split at all: total symbols fall out of
    the folded sequence's '|' count (len - len(without '|')) / 2, and
    the space symbols the doc-level encoding adds are exactly
    n_words - 1 (merges are [a-z0-9]+ only, so the fold never touches
    a space), so n_tokens = symbols - (n_words - 1)."""
    folded = _merge_fold(_doc_seq(F.col(text_col)), merges)
    n_words = F.size(_norm_words(F.col(text_col)))
    symbols = ((F.length("_f")
                - F.length(F.replace(F.col("_f"), F.lit("|"), F.lit(""))))
               / 2).cast("bigint")
    return (docs
            .select(F.col(id_col), n_words.alias("_w"), folded.alias("_f"))
            .filter(F.col("_w") > 0)
            .select(F.col(id_col),
                    F.col("_w").cast("bigint").alias("n_words"),
                    (symbols - (F.col("_w") - F.lit(1)).cast("bigint"))
                    .alias("n_tokens")))


def _doc_seq(text_col):
    """Column expression: the whole document's '|'-wrapped symbol
    sequence — normalized words joined by single spaces, then EVERY
    character (spaces included) wrapped. Because merge symbols are
    [a-z0-9]+ only, no merge pattern ``|a||b|`` can ever match across a
    wrapped space ``| |``, so folding this ONE string is positionally
    identical to folding each word separately — but pays the wrap
    regex, the 16 replaces and the final split ONCE per document
    instead of once per word through an interpreted per-word lambda
    (r17 optimization: 2.85 -> 1.84 s on the sf0.1 chunker A/B)."""
    return F.regexp_replace(F.array_join(_norm_words(text_col), " "),
                            "(.)", r"|$1|")


def _doc_tokens(text_col, merges):
    """Column expression: the document's flat BPE token array (wrap
    chars, fold merges doc-level, split on the doubled separator, drop
    the space symbols). ONE owner for the wrap/fold/split expression
    shared by bpe_tokenize and bpe_chunk_documents (a second copy could
    silently desynchronize chunking from tokenization if the seq
    encoding ever changes — r11 review). The ``t != ""`` arm keeps the
    no-words document mapping to an EMPTY array (split("") yields [""]),
    matching the old per-word path; the fold itself can never produce
    an empty symbol."""
    return F.filter(
        F.split(F.btrim(_merge_fold(_doc_seq(text_col), merges),
                        F.lit("|")), r"\|\|"),
        lambda t: (t != " ") & (t != ""))


def bpe_tokenize(docs: DataFrame, merges, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document BPE token arrays: (id_col, tokens array<string>).
    Same map-only doc-level fold as bpe_token_counts, emitting the
    symbols themselves (split the folded sequence on the doubled
    separator, drop the space symbols)."""
    return (docs.select(F.col(id_col),
                        _doc_tokens(F.col(text_col), merges).alias("_t"))
            .filter(F.size("_t") > 0)
            .select(F.col(id_col), F.col("_t").alias("tokens")))


def bpe_chunk_documents(docs: DataFrame, merges,
                        chunk_tokens: int = 32,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Sliding-window chunking in EXACT BPE-token space — what a
    training pipeline actually needs at context-length boundaries
    (chunking.chunk_documents counts whitespace words; this counts the
    tokens the model will see, so every emitted window except a doc's
    ragged tail is exactly ``chunk_tokens`` long). Output mirrors
    chunk_documents: (doc_id, chunk_seq 1-based, chunk_start in TOKEN
    units, n_chunk_tokens, chunk_text = space-joined BPE tokens).

    Plan shape: the same map-only doc-level fold as bpe_tokenize builds
    each document's token array in the corpus scan, then a transform
    over window starts + posexplode — zero shuffle, zero Python, merges
    broadcast as a literal. Documents with no normalized words emit no
    chunks."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    n = F.size("_t")
    starts = F.sequence(F.lit(0), n - F.lit(1), F.lit(int(chunk_tokens)))
    windows = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start"),
            F.slice(F.col("_t"), s + 1, int(chunk_tokens)).alias("win")))
    return (docs
            .select(F.col(id_col).alias("doc_id"),
                    _doc_tokens(F.col(text_col), merges).alias("_t"))
            .filter(F.size("_t") > 0)
            .select("doc_id", F.posexplode(windows).alias("chunk_seq", "_c"))
            .select("doc_id",
                    (F.col("chunk_seq") + 1).alias("chunk_seq"),
                    F.col("_c.start").cast("bigint").alias("chunk_start"),
                    F.size("_c.win").cast("bigint").alias("n_chunk_tokens"),
                    F.array_join("_c.win", " ").alias("chunk_text")))
