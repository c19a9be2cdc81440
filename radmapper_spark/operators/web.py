"""Web-corpus preprocessing: HTML main-text extraction and URL
canonicalization — the crawl-side stages that run BEFORE text dedup /
quality in a training-data pipeline (r13 verdict items #3-#4).

The reference has no web operators (this is the beyond-reference
training-data tier, SURVEY §2.12). The rule sets follow the published
crawl-cleaning heuristics — C4 (Raffel et al. 2020 §2.2: keep lines
with terminal punctuation and >= N words, drop javascript/cookie/brace
lines) and CCNet/RefinedWeb-style URL normalization (lowercased host,
stripped www/default ports/fragments/tracking params, sorted query) —
restricted to DETERMINISTIC, Catalyst-expressible forms: every stage is
built-in `pyspark.sql.functions` string/array expressions (map-only,
whole-stage-codegen, zero UDFs, zero shuffles), and each has a DuckDB
SQL twin generated from the SAME Python helpers so the two engines can
never silently fork. Regexes stay inside the Java-regex ∩ RE2 common
subset (no backrefs, no lookaround; lazy quantifiers and inline flags
are in both) — verified empirically on both engines.

At 100 TB both operators are pure per-row projections that fuse into
the scan: no exchange, no state, trivially parallel at any executor
count. The downstream dedup (groupBy canonical_url) and per-host cap
(one hash shuffle) are where the first exchanges appear, and they key
on short strings with naturally bounded skew (a hot host is exactly
what host_volume_cap exists to trim; cap_per_group's rank window is
AQE-splittable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# --------------------------------------------------------------- HTML

#: C4-style line-keep thresholds, shared by both engines.
MIN_WORDS = 5            # keep lines with at least this many words
LINK_DENSITY_NUM = 3     # keep iff 10 * n_links <= 3 * n_words
LINK_DENSITY_DEN = 10    # (link density <= 0.3, in exact integers)
#: lowercase substrings that mark a boilerplate line (C4 drops cookie /
#: javascript notices and lines with '{' — leaked code or CSS)
BAD_SUBSTRINGS = ("cookie", "javascript", "{")

# regexes in the Java ∩ RE2 subset
_RX_SCRIPT = r"(?is)<script[^>]*>.*?</script>"
_RX_STYLE = r"(?is)<style[^>]*>.*?</style>"
_RX_BLOCK = r"(?i)</?(?:p|br|div|li|h[1-6]|tr|table|ul|ol|blockquote)[^>]*>"
_RX_TAG = r"<[^>]*>"
_RX_ANCHOR = r"(?i)<a[\s>]"
_RX_TERMINAL = r"[.!?]$"
#: HTML entity decode pairs, applied in order (&amp; LAST so decoded
#: entities are not re-decoded: '&amp;lt;' -> '&lt;' and stops)
_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"))


def _strip_line(line: Column) -> Column:
    """Tag-strip + entity-decode + whitespace-normalize one line."""
    s = F.regexp_replace(line, _RX_TAG, " ")
    for ent, ch in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(s, r"\s+", " "))


def _duck_strip_line(expr: str) -> str:
    s = f"regexp_replace({expr}, '{_RX_TAG}', ' ', 'g')"
    for ent, ch in _ENTITIES:
        lit = ch.replace("'", "''")
        s = f"replace({s}, '{ent}', '{lit}')"
    return f"trim(regexp_replace({s}, '\\s+', ' ', 'g'))"


def _wc(s: Column) -> Column:
    """Word count of an already-normalized line ('' counts 0)."""
    return F.when(s == "", F.lit(0)).otherwise(F.size(F.split(s, " ")))


def _duck_wc(expr: str) -> str:
    return (f"CASE WHEN {expr} = '' THEN 0 "
            f"ELSE len(string_split({expr}, ' ')) END")


def _keep_fields(s: Column, n_links: Column) -> Column:
    """The C4-style keep rule over a line's ALREADY-STRIPPED text and
    its anchor count: enough words, low link density, terminal
    punctuation, no boilerplate marker."""
    wc = _wc(s)
    keep = ((wc >= F.lit(MIN_WORDS))
            & (n_links * F.lit(LINK_DENSITY_DEN)
               <= wc * F.lit(LINK_DENSITY_NUM))
            & s.rlike(_RX_TERMINAL))
    low = F.lower(s)
    for bad in BAD_SUBSTRINGS:
        keep = keep & ~low.contains(bad)
    return keep


def _duck_keep_fields(s: str, n_links: str) -> str:
    wc = _duck_wc(s)
    conds = [f"({wc}) >= {MIN_WORDS}",
             f"({n_links}) * {LINK_DENSITY_DEN} "
             f"<= ({wc}) * {LINK_DENSITY_NUM}",
             f"regexp_matches({s}, '{_RX_TERMINAL}')"]
    conds += [f"NOT contains(lower({s}), '{bad}')"
              for bad in BAD_SUBSTRINGS]
    return " AND ".join(conds)


def html_extract(df: DataFrame, html_col: str = "html",
                 text_col: str = "extracted_text") -> DataFrame:
    """HTML main-text extraction: strip <script>/<style> blocks, turn
    block-level tags into line breaks, then keep content lines by the
    C4-style rules (>= MIN_WORDS words, link density <= 0.3, terminal
    punctuation, no cookie/javascript/'{' marker) and emit the cleaned
    line text. Adds (text_col, n_lines_kept, n_lines_total) to df;
    NULL html yields ('', 0, 0).

    Map-only by construction — split + nested array lambdas, all
    JVM-side expressions (plan-shape locked in tests): at crawl scale
    this is a free projection fused into the scan, and the expensive
    stages downstream (dedup, quality) see only the extracted text.
    Each line is tag-stripped/entity-decoded ONCE into a struct and
    every rule reads the struct field — the naive form re-ran the
    strip regex chain ~6x per line and priced 2.4x higher at sf0.1
    (r14 bench audit); the DuckDB twin mirrors the struct form."""
    h = F.coalesce(F.col(html_col), F.lit(""))
    h = F.regexp_replace(h, _RX_SCRIPT, " ")
    h = F.regexp_replace(h, _RX_STYLE, " ")
    h = F.regexp_replace(h, _RX_BLOCK, "\n")
    lines = F.split(h, "\n")
    structs = F.transform(lines, lambda l: F.struct(
        _strip_line(l).alias("s"),
        F.size(F.regexp_extract_all(l, F.lit(_RX_ANCHOR),
                                    F.lit(0))).alias("k")))
    kept = F.filter(structs, lambda x: _keep_fields(x["s"], x["k"]))
    n_total = F.size(F.filter(structs, lambda x: x["s"] != ""))
    return df.withColumns({
        text_col: F.array_join(F.transform(kept, lambda x: x["s"]), "\n"),
        "n_lines_kept": F.size(kept).cast("long"),
        "n_lines_total": n_total.cast("long")})


def duck_html_extract_exprs(html_expr: str) -> dict:
    """DuckDB twins of html_extract's three output columns, as SQL
    expression text over ``html_expr`` (same pipeline, same rules,
    same strip-once struct shape)."""
    h = f"coalesce({html_expr}, '')"
    h = f"regexp_replace({h}, '{_RX_SCRIPT}', ' ', 'gs')"
    h = f"regexp_replace({h}, '{_RX_STYLE}', ' ', 'gs')"
    h = f"regexp_replace({h}, '{_RX_BLOCK}', chr(10), 'g')"
    lines = f"string_split({h}, chr(10))"
    structs = (f"list_transform({lines}, l -> struct_pack("
               f"s := {_duck_strip_line('l')}, "
               f"k := len(regexp_extract_all(l, '{_RX_ANCHOR}'))))")
    kept = (f"list_filter({structs}, "
            f"x -> {_duck_keep_fields('x.s', 'x.k')})")
    n_total = f"len(list_filter({structs}, x -> x.s <> ''))"
    return {
        # coalesce: DuckDB's array_to_string of an EMPTY list is NULL
        # while Spark's array_join is '' — without it every zero-kept
        # document (NULL/empty html, or all lines filtered) forks the
        # oracle (r14 review; same quirk as the URL qsorted coalesce)
        "extracted_text":
            f"coalesce(array_to_string(list_transform({kept}, "
            f"x -> x.s), chr(10)), '')",
        "n_lines_kept": f"len({kept})::BIGINT",
        "n_lines_total": f"({n_total})::BIGINT",
    }


# ---------------------------------------------------------------- URL

#: query parameters stripped during canonicalization (tracking noise
#: that forks otherwise-identical URLs; CCNet/RefinedWeb practice)
_RX_TRACKING_PARAM = r"^(?:utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="
_RX_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_RX_HOSTPORT = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_RX_PATH = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_RX_QUERY = r"\?([^#]*)"


def canonicalize_urls(df: DataFrame, url_col: str = "url",
                      out_col: str = "canonical_url",
                      host_col: str = "host") -> DataFrame:
    """URL canonicalization: lowercase scheme and host, strip a leading
    ``www.``, strip the scheme's default port (:80 http / :443 https),
    drop the fragment, drop tracking query params (utm_*, fbclid,
    gclid, ref), SORT the surviving params (param order never
    distinguishes resources in practice), and normalize an empty /
    trailing-slashed path to a canonical form. Adds (out_col, host_col)
    to df; rows without a ``scheme://`` prefix get NULLs (the caller
    decides whether schemeless rows are errors or pass-through).

    Pure per-row Catalyst string expressions — no UDF, no shuffle;
    the canonical form is what crawl dedup keys on (url_canonical_dedup
    groups by it) so equal resources collide BEFORE any content hash
    is computed."""
    u = F.trim(F.col(url_col))
    # drop the fragment BEFORE extracting the query: _RX_QUERY searches
    # the whole string, so a '?' appearing only inside the fragment
    # ('https://h/p#sec?x=1') would otherwise be read as the query and
    # contradict the drop-the-fragment rule — and because both engines
    # shared the regex, the differential oracle could not catch it
    # (r14 advice, medium). (?s): a malformed embedded newline must not
    # resurrect the fragment tail.
    u = F.regexp_replace(u, r"(?s)#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _RX_SCHEME, 1))
    hostport = F.lower(F.regexp_extract(u, _RX_HOSTPORT, 1))
    hostport = F.regexp_replace(hostport, r"^www\.", "")
    host = (F.when(scheme == "http",
                   F.regexp_replace(hostport, r":80$", ""))
            .when(scheme == "https",
                  F.regexp_replace(hostport, r":443$", ""))
            .otherwise(hostport))
    path = F.regexp_replace(F.regexp_extract(u, _RX_PATH, 1),
                            r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.coalesce(F.regexp_extract(u, _RX_QUERY, 1), F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_RX_TRACKING_PARAM))
    qsorted = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qsorted == "", F.lit(""))
        .otherwise(F.concat(F.lit("?"), qsorted)))
    valid = scheme != ""
    return (df
            .withColumn(out_col, F.when(valid, canon))
            .withColumn(host_col, F.when(valid, host)))


def duck_canonicalize_exprs(url_expr: str) -> dict:
    """DuckDB twins of canonicalize_urls' output columns."""
    u = f"trim({url_expr})"
    # fragment stripped FIRST, mirroring canonicalize_urls (r14 advice:
    # the query regex must only see the pre-fragment region); 's' flag
    # = Spark's (?s)
    u = f"regexp_replace({u}, '#.*$', '', 's')"
    scheme = f"lower(regexp_extract({u}, '{_RX_SCHEME}', 1))"
    hostport = (f"regexp_replace(lower(regexp_extract({u}, "
                f"'{_RX_HOSTPORT}', 1)), '^www\\.', '')")
    host = (f"CASE WHEN {scheme} = 'http' "
            f"THEN regexp_replace({hostport}, ':80$', '') "
            f"WHEN {scheme} = 'https' "
            f"THEN regexp_replace({hostport}, ':443$', '') "
            f"ELSE {hostport} END")
    path0 = (f"regexp_replace(regexp_extract({u}, '{_RX_PATH}', 1), "
             f"'/+$', '')")
    path = f"CASE WHEN {path0} = '' THEN '/' ELSE {path0} END"
    query = f"coalesce(regexp_extract({u}, '{_RX_QUERY}', 1), '')"
    params = (f"list_filter(string_split({query}, '&'), "
              f"p -> p <> '' AND "
              f"NOT regexp_matches(p, '{_RX_TRACKING_PARAM}'))")
    # coalesce: DuckDB's array_to_string of an EMPTY list is NULL,
    # Spark's array_join is '' — without it every param-less URL
    # canonicalizes to NULL in the oracle (caught by the adversarial
    # twin test, not by the fixture entries, whose URLs all carry
    # params)
    qsorted = f"coalesce(array_to_string(list_sort({params}), '&'), '')"
    canon = (f"{scheme} || '://' || {host} || {path} || "
             f"CASE WHEN {qsorted} = '' THEN '' "
             f"ELSE '?' || {qsorted} END")
    valid = f"{scheme} <> ''"
    return {
        "canonical_url": f"CASE WHEN {valid} THEN {canon} END",
        "host": f"CASE WHEN {valid} THEN {host} END",
    }


# --------------------------------------- deterministic entry fixtures

def synth_html(doc_id: Column, text: Column, source: Column) -> Column:
    """FIXTURE SYNTHESIS (entry-side only): a deterministic HTML page
    wrapping a document's text — head with <style>/<script> noise, a
    link-dense nav, the text split across two content paragraphs, plus
    a too-short line, a cookie-notice line, and a no-terminal-
    punctuation line (one casualty per extraction rule, so the entry
    is non-vacuous at every SF; the content-line suffixes carry four
    Gopher stopwords — of/the/and/that — so extracted pages can
    satisfy the downstream gopher_quality stopword rule). Mirrored
    verbatim by
    duck_synth_html_expr; the production operator is html_extract —
    this just manufactures its input from the fixed test tables."""
    words = F.split(F.trim(F.coalesce(text, F.lit(""))), r"\s+")
    n = F.size(words)
    half = ((n + F.lit(1)) / F.lit(2)).cast("int")
    part1 = F.array_join(F.slice(words, F.lit(1), half), " ")
    part2 = F.array_join(F.slice(words, half + F.lit(1), n - half), " ")
    d = doc_id.cast("string")
    return F.concat(
        F.lit("<html><head><title>"), source, F.lit("</title>"),
        F.lit("<style>body { color: #333; }</style>"),
        F.lit('<script type="text/javascript">var t = "'), d,
        F.lit('";</script></head><body>'),
        F.lit('<div id="nav"><a href="/">Home</a> '
              '<a href="/about">About</a> '
              '<a href="/c">Contact &amp; help</a></div>'),
        F.lit("<h1>Document "), d, F.lit("</h1>"),
        F.lit("<p>"), part1, F.lit(" of the extracted content and line one "), d,
        F.lit(".</p>"),
        F.lit("<p>Too short here.</p>"),
        F.lit("<p>This site uses cookie consent &amp; tracking "
              "banners on every page.</p>"),
        F.lit("<p>"), part2, F.lit(" that will have extracted content with line two "), d,
        F.lit(".</p>"),
        F.lit("<p>No terminal punctuation so this line is removed"
              "</p></body></html>"))


def duck_synth_html_expr(id_expr: str = "doc_id",
                         text_expr: str = "text",
                         source_expr: str = "source") -> str:
    """DuckDB twin of synth_html (same page, character for character)."""
    words = f"string_split_regex(trim(coalesce({text_expr}, '')), '\\s+')"
    n = f"len({words})"
    half = f"(({n} + 1) // 2)"
    # coalesce: for a <= 1-word text the second slice is EMPTY and
    # DuckDB's array_to_string of an empty list is NULL, which would
    # NULL out the whole || page chain while Spark builds a full page
    # (r14 review — confirmed by execution; the fixture corpora never
    # hit it because every doc has >= 40 words, so only the twin tests
    # see it)
    part1 = (f"coalesce(array_to_string(list_slice({words}, 1, {half}),"
             f" ' '), '')")
    part2 = (f"coalesce(array_to_string(list_slice({words}, {half} + 1,"
             f" {n}), ' '), '')")
    d = f"({id_expr})::VARCHAR"
    return (
        f"'<html><head><title>' || {source_expr} || '</title>'"
        f" || '<style>body {{ color: #333; }}</style>'"
        f" || '<script type=\"text/javascript\">var t = \"' || {d}"
        f" || '\";</script></head><body>'"
        f" || '<div id=\"nav\"><a href=\"/\">Home</a> "
        f"<a href=\"/about\">About</a> "
        f"<a href=\"/c\">Contact &amp; help</a></div>'"
        f" || '<h1>Document ' || {d} || '</h1>'"
        f" || '<p>' || {part1} || ' of the extracted content and line one ' || {d}"
        f" || '.</p>'"
        f" || '<p>Too short here.</p>'"
        f" || '<p>This site uses cookie consent &amp; tracking "
        f"banners on every page.</p>'"
        f" || '<p>' || {part2} || ' that will have extracted content with line two ' || {d}"
        f" || '.</p>'"
        f" || '<p>No terminal punctuation so this line is removed"
        f"</p></body></html>'")


def synth_url(doc_id: Column) -> Column:
    """FIXTURE SYNTHESIS (entry-side only): three raw-URL variants per
    base key (doc_id DIV 3) that all canonicalize to ONE url —
    uppercase host + fragment + unsorted params, www + :443 + trailing
    slash + utm param, tracking params mixed in — so canonicalization
    provably collapses them. Mirrored by duck_synth_url_expr."""
    base = (doc_id / F.lit(3)).cast("long").cast("string")
    hostk = (doc_id / F.lit(3)).cast("long") % F.lit(7)
    k = hostk.cast("string")
    v = doc_id % F.lit(3)
    return (
        F.when(v == 0, F.concat(
            F.lit("HTTPS://ExAmple"), k, F.lit(".COM/path/"), base,
            F.lit("?b=2&a=1#frag")))
        .when(v == 1, F.concat(
            F.lit("https://www.example"), k, F.lit(".com:443/path/"),
            base, F.lit("/?a=1&utm_source=feed&b=2")))
        .otherwise(F.concat(
            F.lit("https://example"), k, F.lit(".com/path/"), base,
            F.lit("?utm_campaign=x&b=2&gclid=g&a=1"))))


def duck_synth_url_expr(id_expr: str = "doc_id") -> str:
    base = f"(({id_expr}) // 3)::VARCHAR"
    k = f"((({id_expr}) // 3) % 7)::VARCHAR"
    return f"""CASE ({id_expr}) % 3
        WHEN 0 THEN 'HTTPS://ExAmple' || {k} || '.COM/path/' || {base}
                    || '?b=2&a=1#frag'
        WHEN 1 THEN 'https://www.example' || {k} || '.com:443/path/'
                    || {base} || '/?a=1&utm_source=feed&b=2'
        ELSE 'https://example' || {k} || '.com/path/' || {base}
             || '?utm_campaign=x&b=2&gclid=g&a=1' END"""


# ------------------------------------------------------------- Gopher

#: Gopher document-quality thresholds (Rae et al. 2021, "Scaling
#: Language Models: Methods, Analysis & Insights from Training Gopher",
#: Table A1) — the standard second gate on extracted web text after the
#: C4 line rules. All ratios are compared in EXACT integer arithmetic
#: (the link-density trick above), so both engines agree bit-for-bit.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3     # 3 <= mean word length <= 10
GOPHER_MAX_MEAN_WORD_LEN = 10
GOPHER_SYMBOL_RATIO = (1, 10)    # (num, den): symbols/words <= 0.1
GOPHER_BULLET_RATIO = (9, 10)    # bullet-started lines <= 90%
GOPHER_ELLIPSIS_RATIO = (3, 10)  # ellipsis-ended lines <= 30%
GOPHER_ALPHA_RATIO = (8, 10)     # words with an alpha char >= 80%
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and",
                    "that", "have", "with")
GOPHER_MIN_STOPWORDS = 2
#: line prefixes that count as bullets; suffixes that count as ellipsis
BULLET_PREFIXES = ("•", "-", "*")
ELLIPSIS_SUFFIXES = ("...", "…")
#: Gopher REPETITION thresholds (same Table A1; r15 verdict item #3).
#: Duplicate fractions are (repeat occurrences)/(total): a line/para
#: counted once per occurrence beyond its first. Top-gram coverage is
#: max over word k-grams of occurrences x gram-chars, compared against
#: total word chars — count x length is the published approximation
#: (overlaps not collapsed), the max-of-products form is this repo's
#: tie rule, and both engines share all three definitions exactly.
GOPHER_DUP_LINE_RATIO = (3, 10)       # duplicate-line fraction <= 0.30
GOPHER_DUP_PARA_RATIO = (3, 10)       # duplicate-paragraph fraction <= 0.30
GOPHER_TOP_GRAM_RATIOS = ((2, (20, 100)),   # top 2-gram chars <= 0.20
                          (3, (18, 100)),   # top 3-gram chars <= 0.18
                          (4, (16, 100)))   # top 4-gram chars <= 0.16
#: temp columns gopher_quality materializes (and drops before
#: returning): the words / lines / paragraphs arrays and the combined
#: per-position gram structs. Materialized as REAL columns because a
#: Catalyst expression is re-evaluated at EVERY reference and the rule
#: set references the words array ~26 times per row (split+filter ran
#: ~26x per document; r16 bench audit measured the gate 2.3x faster
#: with the arrays bound once — CollapseProject leaves multi-referenced
#: non-cheap aliases alone, so the binding survives optimization).
_GOPHER_TMP = ("_gopher_w", "_gopher_l", "_gopher_p", "_gopher_g")


def _top_gram_covers(pre: DataFrame, words: Column) -> tuple:
    """Top word-k-gram CHARACTER coverage for EVERY k in
    GOPHER_TOP_GRAM_RATIOS: max over the document's k-grams of
    (occurrences x gram word-chars), as BIGINTs. Returns (df, covers)
    where df carries the materialized per-position gram structs and
    covers maps ``cover<k>`` to its Column. Zero grams (n < k) or NULL
    text cover 0.

    ONE pass builds every k's (hash, charlen) pair (r16 verdict item
    #3 — the per-k form built three separate gram-string arrays and
    priced the gate at 5.8 s): arrays_zip over kmax SHIFTED full-tail
    slices of the words array (arrays_zip null-pads the shorter
    slices; the per-k slice below cuts the padded tail back off), then
    one transform emits h<k> = xxhash64 over the gram's k words and
    c<k> = the sum of their lengths. Gram identity is the multi-arg
    xxhash64 TUPLE hash — no joined gram string is ever built; the
    DuckDB twin compares the word lists themselves, so the only
    cross-engine fork is a 64-bit collision merging two distinct
    grams' runs on the Spark side (~n^2/2^64 per document — the same
    accepted residual as textstats' hashed-gram counters).

    Per k the cover is then the longest-equal-run maximum of
    run x charlen over the sorted (hash, charlen) structs — row-local
    O(n log n), the same sorted-run trick as textstats
    .repetition_score (a per-distinct-gram recount would be quadratic
    on real text). Two expression-evaluation traps shape the code: a
    free expression inside a higher-order-function lambda is
    re-evaluated PER ELEMENT (both engines!), so gram construction
    must be shifted slices, never `element_at(words, i+j)` (quadratic
    — minutes on a 100k-word document); and the combined gram array is
    re-evaluated at every REFERENCE, so it is materialized as a column
    before the three per-k consumers touch it (the inline form
    re-built the zip+hash pass three times and measured SLOWER than
    three independent passes)."""
    ks = [k for k, _ in GOPHER_TOP_GRAM_RATIOS]
    kmax = max(ks)
    zero = F.lit(0).cast("long")
    n = F.size(words)
    slices = [F.slice(words, j + 1, F.greatest(n - F.lit(j), F.lit(0)))
              for j in range(kmax)]

    def gram_struct(s):
        fields = []
        for k in ks:
            ws = [s[str(j)] for j in range(k)]
            fields.append(F.xxhash64(*ws).alias(f"h{k}"))
            c = F.length(ws[0])
            for w in ws[1:]:
                c = c + F.length(w)
            fields.append(c.cast("long").alias(f"c{k}"))
        return F.struct(*fields)

    pre = pre.withColumn(_GOPHER_TMP[3],
                         F.transform(F.arrays_zip(*slices), gram_struct))
    comb = F.col(_GOPHER_TMP[3])
    nb = F.size(comb)

    def _run(acc, x):
        return (F.when(x["h"] == acc["h"], acc["run"] + F.lit(1))
                .otherwise(F.lit(1)).cast("long"))

    def _pick(k):
        def f(x):
            return F.struct(x[f"h{k}"].alias("h"), x[f"c{k}"].alias("c"))
        return f

    covers = {}
    for k in ks:
        pairs = F.transform(
            F.slice(comb, 1, F.greatest(nb - F.lit(k - 1), F.lit(0))),
            _pick(k))
        best = F.aggregate(
            F.array_sort(pairs),
            F.struct(zero.alias("h"), zero.alias("run"),
                     zero.alias("best")),
            lambda acc, x: F.struct(
                x["h"].alias("h"),
                _run(acc, x).alias("run"),
                F.greatest(acc["best"],
                           _run(acc, x) * x["c"]).alias("best")),
            lambda acc: acc["best"])
        covers[f"cover{k}"] = F.coalesce(best, zero)
    return pre, covers


def _duck_top_gram_cover(words: str, k: int) -> str:
    """DuckDB twin of _top_gram_covers' per-k cover, as a correlated
    scalar subquery. Gram identity is the gram's word LIST (list
    equality on the sorted list-of-lists — the tuple identity the
    Spark side hashes; charlen = sum of the gram's word lengths,
    evaluated only at run starts). Two DuckDB 1.0 performance facts
    shape it (both found empirically): (a) a free expression inside a
    list lambda is re-evaluated per ELEMENT, so the words expression
    must be bound to a subquery column before any lambda touches it;
    (b) list_reduce materializes a shrinking list per step (quadratic
    on 100k-gram documents), so the sorted-run maximum is computed
    WITHOUT a fold: mark run STARTS by comparing each sorted gram to
    its predecessor, then max over starts of (next_start - start) x
    gram charlen — all linear list_transform/list_filter passes.
    sg[0] is NULL and `i = 1 OR ...` short-circuits, so the first
    element is always a start."""
    gram_items = ", ".join(f"_gw[i+{j}]" if j else "_gw[i]"
                           for j in range(k))
    grams = (f"CASE WHEN len(_gw) < {k} THEN []::VARCHAR[][] ELSE "
             f"list_transform(range(1, len(_gw) - {k} + 2), "
             f"i -> [{gram_items}]) END")
    return f"""(
 SELECT coalesce(list_max(list_transform(range(1, len(starts) + 1),
          j -> ((CASE WHEN j < len(starts) THEN starts[j+1]
                 ELSE len(sg) + 1 END) - starts[j])
               * list_sum(list_transform(sg[starts[j]],
                                         w -> len(w)))::BIGINT)),
        0)::BIGINT
 FROM (SELECT list_filter(list_transform(range(1, len(sg) + 1),
         i -> CASE WHEN i = 1 OR sg[i] <> sg[i-1] THEN i END),
         x -> x IS NOT NULL) AS starts, sg
       FROM (SELECT list_sort({grams}) AS sg
             FROM (SELECT {words} AS _gw) _gq0) _gq1) _gq2)"""


def _gopher_fields(pre: DataFrame, text: Column) -> tuple:
    """The per-document Gopher metrics as named Columns over ONE words
    array, ONE lines array and ONE paragraphs array — MATERIALIZED as
    temp columns on ``pre`` (see _GOPHER_TMP: an expression is
    re-evaluated at every reference, so the split+filter chains must
    be bound once per row, not once per rule). Returns (df, fields)."""
    t = F.coalesce(text, F.lit(""))
    # explicit lambda: F.trim grew an optional second parameter in
    # Spark 4, so passing it BARE to transform binds the array index
    # as the trim-charset (trim(l, '0') for the first line!) — found
    # by the per-rule differential test
    pre = pre.withColumns({
        _GOPHER_TMP[0]: F.filter(F.split(F.trim(t), r"\s+"),
                                 lambda w: w != ""),
        _GOPHER_TMP[1]: F.filter(F.transform(F.split(t, "\n"),
                                             lambda l: F.trim(l)),
                                 lambda l: l != ""),
        _GOPHER_TMP[2]: F.filter(F.transform(F.split(t, r"\n{2,}"),
                                             lambda p: F.trim(p)),
                                 lambda p: p != "")})
    words = F.col(_GOPHER_TMP[0])
    lines = F.col(_GOPHER_TMP[1])
    paras = F.col(_GOPHER_TMP[2])
    n_words = F.size(words).cast("long")
    sum_len = F.aggregate(words, F.lit(0).cast("long"),
                          lambda acc, w: acc + F.length(w))
    n_alpha = F.size(F.filter(words,
                              lambda w: w.rlike("[A-Za-z]"))).cast("long")
    n_hash = (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
              ).cast("long")
    # both ellipsis forms count as symbols — ASCII '...' runs AND the
    # single-char '…' (r15 review: the line rule recognized '…' but the
    # symbol counter did not, and since both engines shared the gap the
    # differential oracle could never catch '…'-spam passing the gate)
    n_ell_occ = (F.regexp_count(t, F.lit(r"\.\.\."))
                 + (F.length(t)
                    - F.length(F.replace(t, F.lit("…"), F.lit(""))))
                 ).cast("long")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(F.filter(
        lines, lambda l: F.substring(l, 1, 1).isin(*BULLET_PREFIXES)
    )).cast("long")
    n_ell_lines = F.size(F.filter(
        lines, lambda l: l.endswith(ELLIPSIS_SUFFIXES[0])
        | l.endswith(ELLIPSIS_SUFFIXES[1]))).cast("long")
    n_stop = F.size(F.array_intersect(
        F.array_distinct(F.transform(words, F.lower)),
        F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]))).cast("long")
    # repetition metrics (r15 verdict item #3): duplicate lines reuse
    # the lines array; paragraphs split on blank-line runs, trimmed,
    # non-empty — same lambda shape both engines
    n_dup_lines = (n_lines
                   - F.size(F.array_distinct(lines))).cast("long")
    n_paras = F.size(paras).cast("long")
    n_dup_paras = (n_paras
                   - F.size(F.array_distinct(paras))).cast("long")
    pre, covers = _top_gram_covers(pre, words)
    return pre, {"n_words": n_words, "sum_len": sum_len,
                 "n_alpha": n_alpha, "n_symbols": n_hash + n_ell_occ,
                 "n_lines": n_lines, "n_bullet": n_bullet,
                 "n_ell_lines": n_ell_lines, "n_stop": n_stop,
                 "n_dup_lines": n_dup_lines, "n_paras": n_paras,
                 "n_dup_paras": n_dup_paras, **covers}


def gopher_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher document-quality gate: adds the per-rule booleans, the
    word/line counts, and ``gopher_pass`` (the conjunction). Map-only
    Catalyst expressions over one words array and one lines array —
    same scale shape as html_extract: a free projection fused into the
    scan, no UDF, no exchange. NULL text counts 0 words and fails the
    word-count rule (never NULL booleans).

    Rules (exact integer comparisons; ratios never materialized as
    doubles): word count in [50, 100000]; mean word length in [3, 10];
    symbol-to-word ratio ('#' chars + '...' occurrences) <= 0.1;
    bullet-started lines <= 90%; ellipsis-ended lines <= 30%; >= 80%
    of words contain an alphabetic character; >= 2 distinct stop words
    from the published 8-word list; REPETITION sub-rules (r15 verdict
    item #3): duplicate-line fraction <= 30%, duplicate-paragraph
    fraction <= 30%, top 2-/3-/4-gram character coverage <= 20/18/16%
    of total word chars. Line/paragraph/gram rules pass vacuously on
    documents with zero lines/paragraphs/grams (word count already
    fails those)."""
    pre, g = _gopher_fields(df, F.col(text_col))
    sn, sd = GOPHER_SYMBOL_RATIO
    bn, bd = GOPHER_BULLET_RATIO
    en, ed = GOPHER_ELLIPSIS_RATIO
    an, ad = GOPHER_ALPHA_RATIO
    dln, dld = GOPHER_DUP_LINE_RATIO
    dpn, dpd = GOPHER_DUP_PARA_RATIO
    ok_words = ((g["n_words"] >= GOPHER_MIN_WORDS)
                & (g["n_words"] <= GOPHER_MAX_WORDS))
    ok_mwl = ((g["sum_len"] >= g["n_words"] * GOPHER_MIN_MEAN_WORD_LEN)
              & (g["sum_len"] <= g["n_words"] * GOPHER_MAX_MEAN_WORD_LEN))
    ok_sym = g["n_symbols"] * sd <= g["n_words"] * sn
    ok_bul = g["n_bullet"] * bd <= g["n_lines"] * bn
    ok_ell = g["n_ell_lines"] * ed <= g["n_lines"] * en
    ok_alp = g["n_alpha"] * ad >= g["n_words"] * an
    ok_stp = g["n_stop"] >= GOPHER_MIN_STOPWORDS
    ok_dl = g["n_dup_lines"] * dld <= g["n_lines"] * dln
    ok_dp = g["n_dup_paras"] * dpd <= g["n_paras"] * dpn
    ok_grams = {
        f"ok_top{k}gram": g[f"cover{k}"] * den <= g["sum_len"] * num
        for k, (num, den) in GOPHER_TOP_GRAM_RATIOS}
    # ONE withColumns per layer (r17): each chained withColumn is a
    # separate Project the analyzer+optimizer must traverse over the
    # full (very large) expression tree — 12 stacked Projects cost
    # measurable driver seconds per run at this tree size
    out = pre.withColumns({
        "n_words": g["n_words"], "n_lines": g["n_lines"],
        "ok_words": ok_words, "ok_mean_word_len": ok_mwl,
        "ok_symbol_ratio": ok_sym, "ok_bullet_lines": ok_bul,
        "ok_ellipsis_lines": ok_ell, "ok_alpha_words": ok_alp,
        "ok_stopwords": ok_stp, "ok_dup_lines": ok_dl,
        "ok_dup_paras": ok_dp, **ok_grams})
    conj = (F.col("ok_words") & F.col("ok_mean_word_len")
            & F.col("ok_symbol_ratio") & F.col("ok_bullet_lines")
            & F.col("ok_ellipsis_lines") & F.col("ok_alpha_words")
            & F.col("ok_stopwords") & F.col("ok_dup_lines")
            & F.col("ok_dup_paras"))
    for name in ok_grams:
        conj = conj & F.col(name)
    return out.withColumn("gopher_pass", conj).drop(*_GOPHER_TMP)


def duck_gopher_exprs(text_expr: str) -> dict:
    """DuckDB twins of gopher_quality's output columns, generated from
    the SAME thresholds (one definition, two engines)."""
    t = f"coalesce({text_expr}, '')"
    words = (f"list_filter(string_split_regex(trim({t}), '\\s+'), "
             f"w -> w <> '')")
    lines = (f"list_filter(list_transform(string_split({t}, chr(10)), "
             f"l -> trim(l)), l -> l <> '')")
    n_words = f"len({words})::BIGINT"
    sum_len = (f"coalesce(list_sum(list_transform({words}, "
               f"w -> len(w))), 0)::BIGINT")
    n_alpha = (f"len(list_filter({words}, "
               f"w -> regexp_matches(w, '[A-Za-z]')))::BIGINT")
    n_hash = f"(len({t}) - len(replace({t}, '#', '')))::BIGINT"
    n_ell_occ = (f"(len(regexp_extract_all({t}, '\\.\\.\\.'))"
                 f" + (len({t}) - len(replace({t}, '…', ''))))::BIGINT")
    n_symbols = f"({n_hash} + {n_ell_occ})"
    n_lines = f"len({lines})::BIGINT"
    bullets = " OR ".join(f"l[1:1] = '{p}'" for p in BULLET_PREFIXES)
    n_bullet = f"len(list_filter({lines}, l -> {bullets}))::BIGINT"
    ell = " OR ".join(f"suffix(l, '{s}')" for s in ELLIPSIS_SUFFIXES)
    n_ell_lines = f"len(list_filter({lines}, l -> {ell}))::BIGINT"
    stops = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    n_stop = (f"len(list_intersect(list_distinct(list_transform("
              f"{words}, w -> lower(w))), [{stops}]))::BIGINT")
    n_dup_lines = f"({n_lines} - len(list_distinct({lines}))::BIGINT)"
    paras = (f"list_filter(list_transform(string_split_regex({t}, "
             f"'\\n{{2,}}'), p -> trim(p)), p -> p <> '')")
    n_paras = f"len({paras})::BIGINT"
    n_dup_paras = f"({n_paras} - len(list_distinct({paras}))::BIGINT)"
    sn, sd = GOPHER_SYMBOL_RATIO
    bn, bd = GOPHER_BULLET_RATIO
    en, ed = GOPHER_ELLIPSIS_RATIO
    an, ad = GOPHER_ALPHA_RATIO
    dln, dld = GOPHER_DUP_LINE_RATIO
    dpn, dpd = GOPHER_DUP_PARA_RATIO
    ok = {
        "ok_words": (f"({n_words} >= {GOPHER_MIN_WORDS} AND "
                     f"{n_words} <= {GOPHER_MAX_WORDS})"),
        "ok_mean_word_len": (
            f"({sum_len} >= {n_words} * {GOPHER_MIN_MEAN_WORD_LEN} AND "
            f"{sum_len} <= {n_words} * {GOPHER_MAX_MEAN_WORD_LEN})"),
        "ok_symbol_ratio": f"({n_symbols} * {sd} <= {n_words} * {sn})",
        "ok_bullet_lines": f"({n_bullet} * {bd} <= {n_lines} * {bn})",
        "ok_ellipsis_lines": f"({n_ell_lines} * {ed} <= {n_lines} * {en})",
        "ok_alpha_words": f"({n_alpha} * {ad} >= {n_words} * {an})",
        "ok_stopwords": f"({n_stop} >= {GOPHER_MIN_STOPWORDS})",
        "ok_dup_lines": (f"({n_dup_lines} * {dld} "
                         f"<= {n_lines} * {dln})"),
        "ok_dup_paras": (f"({n_dup_paras} * {dpd} "
                         f"<= {n_paras} * {dpn})"),
        **{f"ok_top{k}gram":
           (f"({_duck_top_gram_cover(words, k)} * {den} "
            f"<= {sum_len} * {num})")
           for k, (num, den) in GOPHER_TOP_GRAM_RATIOS},
    }
    out = {"n_words": n_words, "n_lines": n_lines, **ok}
    out["gopher_pass"] = "(" + " AND ".join(ok.values()) + ")"
    return out


def token_floor_count(text_col: str = "extracted_text") -> Column:
    """The C4 token-floor COUNT expression — ONE definition (r15 third
    review: three Spark copies + two SQL copies of this rule were one
    regex tweak away from a silent fork, the drift class the
    duck_normalize_text rule exists for)."""
    c = F.col(text_col)
    return F.when(c == "", F.lit(0)).otherwise(
        F.size(F.split(c, r"[\s\n]+"))).cast("long")


def duck_token_floor_count(expr: str) -> str:
    """DuckDB twin of token_floor_count."""
    return (f"CASE WHEN {expr} = '' THEN 0 "
            f"ELSE len(string_split_regex({expr}, '[\\s\\n]+')) "
            f"END::BIGINT")


def extract_floor_gate(df: DataFrame, min_tokens: int = 60,
                       html_col: str = "html") -> DataFrame:
    """The shared extraction tail — html_extract -> C4 token floor ->
    Gopher gate — used by pipeline_web_crawl, the stream_crawl_ingest
    batch twin, and the streaming crawl loop (one definition, three
    consumers). Adds extracted_text / n_lines_kept / n_lines_total /
    n_extracted_tokens plus the gopher columns; rows failing the floor
    or any Gopher rule are dropped.

    Caller contract (r18): feed this gate a frame the optimizer CANNOT
    push predicates out of — either a scan-rooted lazy frame (the
    streaming loop's per-micro-batch input) or a materialization
    barrier (the crawl heads' localCheckpoint of the tiny capped
    survivors⋈payload join). With a join directly below the gate,
    PushPredicateThroughJoin slides the whole interpreted
    extraction+Gopher predicate below the join and runs it over the
    FULL corpus (measured 40+ s at sf0.1 vs ~1 s post join, r17); the
    r17 OR-pin workaround (``pred OR (join_side_rank < 0)``) kept it
    in the join condition but double-evaluated the extraction per
    survivor and inflated the join condition to a ~200 KB expression
    the driver re-stringified at every AQE update. The barrier removes
    both: the gate is a plain Filter over a leaf, evaluated once per
    survivor."""
    cols = extract_floor_columns(df, html_col=html_col)
    return (cols.filter(F.col("n_extracted_tokens") >= min_tokens)
            .filter(F.col("gopher_pass")))


def extract_floor_columns(df: DataFrame,
                          html_col: str = "html") -> DataFrame:
    """The COMPUTED-COLUMNS half of extract_floor_gate: extraction +
    n_extracted_tokens + the Gopher columns, NO filters. The crawl
    heads consume this form directly and checkpoint it BEFORE
    filtering: a filter above these Projects gets pushed through by
    alias substitution (PushPredicateThroughNonJoin), re-inlining the
    whole extraction chain into one ~200 KB Filter condition that (a)
    the CodegenFallback HOFs force into interpreted eval and (b) the
    driver re-prints at every plan stringification — while the
    unfiltered Project stack keeps each expression written and
    evaluated ONCE per row (CollapseProject does not inline non-cheap
    aliases referenced more than once). Values are unchanged either
    way: the gate columns are deterministic per row, so filtering
    before or after computing them selects the same rows."""
    ext = html_extract(df, html_col=html_col)
    floored = ext.withColumn("n_extracted_tokens", token_floor_count())
    return gopher_quality(floored, text_col="extracted_text")


#: constant casualty blocks for the REPETITION rules (fixture-side,
#: classes 5-9 below). Each targets one rule; the duplicate-line /
#: duplicate-paragraph blocks also trip a gram rule (unavoidable —
#: repeated lines ARE repeated grams), while the three gram blocks are
#: engineered to fire ONLY their own k: the k-gram repeats between
#: UNIQUE filler words (so no other k repeats), with enough unique
#: tail text that the sub-gram coverages stay under their thresholds.
_REP_STOP_TAIL = (" It must be of the data and that will have merge "
                  "with scan.")
_REP_DUP_LINE = "the data of and that have with more detail here today."
_REP_DUP_LINE_BLOCK = "\n".join(
    [_REP_DUP_LINE] * 5
    + [f"unique{u} sentence number{u} words differ here{u} fully{u} now."
       for u in range(6)])
_REP_DUP_PARA_BLOCK = "\n\n".join(
    [_REP_DUP_LINE + _REP_STOP_TAIL] * 2
    + ["\n".join(f"u{u} fresh line words{u} here{u}." for u in range(5))])
_REP_TOP2_BLOCK = (" ".join(f"data science u{i}" for i in range(30))
                   + _REP_STOP_TAIL)
_REP_TOP3_BLOCK = (" ".join(f"gold iron coal u{i} v{i}"
                            for i in range(10))
                   + " " + " ".join(f"w{i}x{i} y{i}z{i}"
                                    for i in range(28))
                   + _REP_STOP_TAIL)
_REP_TOP4_BLOCK = (" ".join(f"mint opal ruby sand u{i} v{i}"
                            for i in range(10))
                   + " " + " ".join(f"w{i}x{i} y{i}z{i}"
                                    for i in range(60))
                   + _REP_STOP_TAIL)


def _duck_const(s: str) -> str:
    """A Python string constant as a DuckDB expression (single-quote
    escape; newlines via the replace-chr(10) trick the class-0 bullet
    block established)."""
    esc = s.replace("'", "''")
    if "\n" in esc:
        return ("replace('" + esc.replace("\n", "\\n")
                + "', '\\n', chr(10))")
    return "'" + esc + "'"


def synth_quality_text(doc_id: Column, text: Column) -> Column:
    """FIXTURE SYNTHESIS (entry-side only): per-class decorated text so
    every Gopher rule has casualties at every SF — doc_id % 13 picks
    the class: 0 all-bullet lines, 1 ellipsis-ended lines, 2 '#'
    symbol spam, 3 numeric (non-alpha) words, 4 stopword-free prose,
    5 duplicate lines, 6 duplicate paragraphs, 7/8/9 top 2-/3-/4-gram
    spam (the _REP_* constant blocks); everything else gets the base
    text plus a stopword-rich sentence (so the stopword rule is
    satisfiable at all — the fixture corpus vocabulary contains only
    'the' from the published list) and fails only the word-count floor
    when the underlying document is short. Mirrored verbatim by
    duck_synth_quality_text_expr; the production operator is
    gopher_quality."""
    base = F.concat(
        F.coalesce(text, F.lit("")),
        F.lit(" It must be of the data and that will have merge "
              "with scan."))
    bullet_line = "- the data of and that have with more line."
    m = doc_id % F.lit(13)
    return (
        F.when(m == 0, F.lit("\n".join([bullet_line] * 6)))
        .when(m == 1, F.concat(
            base, F.lit("\nwait for it...\nmore soon...")))
        .when(m == 2, F.concat(base, F.lit(" "),
                               F.repeat(F.lit("#"), 25)))
        .when(m == 3, F.concat(F.repeat(F.lit("12345 "), 60),
                               F.lit("of the")))
        .when(m == 4, F.concat(F.repeat(F.lit("science word data "),
                                        20), F.lit("here now.")))
        .when(m == 5, F.lit(_REP_DUP_LINE_BLOCK))
        .when(m == 6, F.lit(_REP_DUP_PARA_BLOCK))
        .when(m == 7, F.lit(_REP_TOP2_BLOCK))
        .when(m == 8, F.lit(_REP_TOP3_BLOCK))
        .when(m == 9, F.lit(_REP_TOP4_BLOCK))
        .otherwise(base))


def duck_synth_quality_text_expr(id_expr: str = "doc_id",
                                 text_expr: str = "text") -> str:
    base = (f"coalesce({text_expr}, '') || ' It must be of the data "
            f"and that will have merge with scan.'")
    bullet_line = "- the data of and that have with more line."
    bullets = "\\n".join([bullet_line] * 6)
    return f"""CASE ({id_expr}) % 13
        WHEN 0 THEN replace('{bullets}', '\\n', chr(10))
        WHEN 1 THEN {base} || chr(10) || 'wait for it...'
                    || chr(10) || 'more soon...'
        WHEN 2 THEN {base} || ' ' || repeat('#', 25)
        WHEN 3 THEN repeat('12345 ', 60) || 'of the'
        WHEN 4 THEN repeat('science word data ', 20) || 'here now.'
        WHEN 5 THEN {_duck_const(_REP_DUP_LINE_BLOCK)}
        WHEN 6 THEN {_duck_const(_REP_DUP_PARA_BLOCK)}
        WHEN 7 THEN {_duck_const(_REP_TOP2_BLOCK)}
        WHEN 8 THEN {_duck_const(_REP_TOP3_BLOCK)}
        WHEN 9 THEN {_duck_const(_REP_TOP4_BLOCK)}
        ELSE {base} END"""
