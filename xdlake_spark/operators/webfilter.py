"""Web-corpus filter rule sets: Gopher, C4, HTML extraction, URL stats.

The canonical pre-training web-pipeline stages the reference's users run
upstream of a lakehouse (parity target: the quality/repetition signals of
SURVEY §2's LLM-pipeline extension; sibling of operators/text.py, which
holds the scoring primitives these rule sets compose):

- :func:`gopher_rules` — the document-level quality heuristics of the
  Gopher corpus pipeline (Rae et al. 2021, appendix A1): word-count
  bounds, mean word length, symbol-to-word ratio, bullet/ellipsis line
  fractions, alphabetic-word fraction, required-stopword hits.
- :func:`c4_line_filter` — the line-level rules of C4 (Raffel et al.
  2020): keep lines that end in terminal punctuation and have >= 5
  words, drop boilerplate ("javascript" lines), drop whole documents
  containing "lorem ipsum" or code braces or fewer than 3 kept lines.
- :func:`html_main_text` — boilerplate-strip: remove script/style/nav
  blocks, strip tags, decode HTML entities, collapse whitespace.
- :func:`url_host_stats` — per-host corpus accounting over parsed URLs.

Scale posture: every function below is a pure JVM column expression
(split / higher-order filter / regexp) — zero Python in the row path, one
narrow map stage per document, no shuffle except the final aggregation in
:func:`url_host_stats` (a standard partial-agg groupBy on host). All
regexes are restricted to the Java-regex ∩ RE2 dialect so the DuckDB
oracles execute the identical pattern strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Gopher's "required word" list: a document must contain at least
#: GOPHER_MIN_STOPWORD_HITS distinct words of this set.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_MIN_STOPWORD_HITS = 2

#: Terminal-punctuation class for C4's line rule (kept free of the
#: single-quote character so the same pattern embeds in SQL literals).
C4_TERMINAL_RE = '[.!?"]$'


def _nonempty_lines(col: Column) -> Column:
    """Trimmed, non-empty lines of the text."""
    return F.filter(F.transform(F.split(col, "\n"), lambda x: F.trim(x)),
                    lambda x: F.length(x) > 0)


def _words(col: Column) -> Column:
    """Whitespace tokens with empties dropped (safe on blank text)."""
    return F.filter(F.split(F.trim(col), r"\s+"),
                    lambda t: F.length(t) > 0)


def _substr_count(col: Column, sub: str, width: int) -> Column:
    """Occurrences of a literal substring (non-overlapping)."""
    return ((F.length(col) - F.length(F.replace(col, F.lit(sub), F.lit(""))))
            / width).cast("long")


def gopher_rules(df: DataFrame, text_col: str = "text",
                 min_words: int = 50, max_words: int = 100_000,
                 min_mean_wl: float = 3.0, max_mean_wl: float = 10.0,
                 max_symbol_ratio: float = 0.1,
                 max_bullet_frac: float = 0.9,
                 max_ellipsis_frac: float = 0.3,
                 min_alpha_frac: float = 0.8,
                 min_stopword_hits: int = GOPHER_MIN_STOPWORD_HITS,
                 ) -> DataFrame:
    """Per-document Gopher quality signals + the combined pass flag.

    Each signal is computed once from a shared token / line array; the
    whole operator is a single narrow projection (no shuffle, no UDF),
    so at 100 TB it rides the scan with whole-stage codegen.
    """
    c = F.col(text_col)
    toks = _words(c)
    lines = _nonempty_lines(c)
    n_words = F.size(toks)
    n_lines = F.size(lines)
    safe_w = F.greatest(n_words, F.lit(1)).cast("double")
    safe_l = F.greatest(n_lines, F.lit(1)).cast("double")

    mean_wl = (F.aggregate(toks, F.lit(0).cast("long"),
                           lambda acc, t: acc + F.length(t))
               .cast("double") / safe_w)
    symbol_ratio = ((_substr_count(c, "#", 1) + _substr_count(c, "...", 3)
                     + _substr_count(c, "…", 1)).cast("double") / safe_w)
    bullet_frac = (F.size(F.filter(
        lines, lambda ln: F.startswith(ln, F.lit("- "))
        | F.startswith(ln, F.lit("* "))
        | F.startswith(ln, F.lit("• ")))).cast("double") / safe_l)
    ellipsis_frac = (F.size(F.filter(
        lines, lambda ln: F.endswith(ln, F.lit("..."))
        | F.endswith(ln, F.lit("…")))).cast("double") / safe_l)
    alpha_frac = (F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
                  .cast("double") / safe_w)
    low = F.transform(toks, lambda t: F.lower(t))
    stop_hits = sum(
        (F.array_contains(low, w).cast("int") for w in GOPHER_STOPWORDS),
        F.lit(0)).cast("long")

    out = df.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_line_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_line_frac"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        stop_hits.alias("stopword_hits"),
    )
    passes = ((F.col("n_words") >= min_words)
              & (F.col("n_words") <= max_words)
              & (F.col("mean_word_len") >= min_mean_wl)
              & (F.col("mean_word_len") <= max_mean_wl)
              & (F.col("symbol_ratio") <= max_symbol_ratio)
              & (F.col("bullet_line_frac") <= max_bullet_frac)
              & (F.col("ellipsis_line_frac") <= max_ellipsis_frac)
              & (F.col("alpha_word_frac") >= min_alpha_frac)
              & (F.col("stopword_hits") >= min_stopword_hits))
    return out.withColumn("passes_gopher", passes)


def c4_line_filter(df: DataFrame, text_col: str = "text",
                   min_line_words: int = 5,
                   min_kept_lines: int = 3) -> DataFrame:
    """C4's line-level cleaning + document drop rules.

    A line survives when it ends in terminal punctuation, has at least
    ``min_line_words`` words, and does not mention javascript; the
    document survives when it keeps >= ``min_kept_lines`` lines and
    contains neither "lorem ipsum" nor code braces. ``clean_text`` is
    the surviving lines re-joined — the column a downstream tokenizer
    would consume.
    """
    c = F.col(text_col)
    lines = _nonempty_lines(c)
    kept = F.filter(
        lines,
        lambda ln: ln.rlike(C4_TERMINAL_RE)
        & (F.size(F.split(ln, r"\s+")) >= min_line_words)
        & ~F.contains(F.lower(ln), F.lit("javascript")))
    n_kept = F.size(kept)
    doc_ok = ((n_kept >= min_kept_lines)
              & ~F.contains(F.lower(c), F.lit("lorem ipsum"))
              & ~F.contains(c, F.lit("{")))
    return df.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_kept_lines"),
        doc_ok.alias("keep_doc"),
        F.when(doc_ok, F.array_join(kept, "\n")).otherwise(F.lit(""))
        .alias("clean_text"),
    )


#: Entity decode table, applied in order (&amp; LAST so escaped literals
#: like "&amp;lt;" decode to "&lt;" and not "<").
HTML_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                 ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]

#: Invisible-block patterns removed before tag stripping. (?s) makes the
#: non-greedy span cross newlines; supported by Java regex and RE2 alike.
HTML_DROP_BLOCKS = [r"(?s)<script.*?</script>", r"(?s)<style.*?</style>",
                    r"(?s)<nav.*?</nav>", r"(?s)<header.*?</header>",
                    r"(?s)<footer.*?</footer>", r"(?s)<!--.*?-->"]


def html_escape(col: Column) -> Column:
    """Minimal &/</> escaping (the inverse of the decode table)."""
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    return F.replace(out, F.lit(">"), F.lit("&gt;"))


def html_main_text(df: DataFrame, html_col: str = "html",
                   out_col: str = "main_text") -> DataFrame:
    """Strip an HTML document down to its visible main text.

    Pipeline: drop script/style/nav/header/footer/comment blocks →
    strip remaining tags to spaces → decode the common entities →
    collapse whitespace. Pure regexp_replace chain: one narrow stage,
    payloads never shuffle, whole-stage codegen end to end.
    """
    out = F.col(html_col)
    for pat in HTML_DROP_BLOCKS:
        out = F.regexp_replace(out, pat, " ")
    out = F.regexp_replace(out, "<[^>]*>", " ")
    for ent, ch in HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return df.withColumn(out_col, out)


def blocklist_filter(df: DataFrame, terms, text_col: str = "text",
                     id_col: str = "doc_id",
                     strategy: str = "auto",
                     max_literal_terms: int = 256) -> DataFrame:
    """Banned-wordlist document screening — the C4 "bad words" stage
    (Raffel et al. 2020 filter docs whose tokens hit the LDNOOBW
    blocklist; every production web pipeline runs some variant).

    Tokens are ASCII-lowercase word runs (``lower`` then split on
    ``[^a-z]+``) so any engine reproduces the match set; ``terms``
    must already be such tokens (single words — phrase blocklists
    need the substring operators in operators/text.py). Adds three
    columns: ``banned_hits`` (total occurrences), ``banned_terms``
    (distinct blocklist words present), ``flagged``
    (``banned_hits > 0`` — the C4 drop criterion).

    Two physical strategies, both zero-Python:

    - ``literal`` (lists up to ``max_literal_terms``): the blocklist
      becomes an array literal and the counts are higher-order
      ``filter``/``array_intersect`` expressions — whole-stage
      codegen, no join, no shuffle, one narrow map pass. This is the
      realistic shape: curated blocklists are hundreds of words.
    - ``join`` (beyond that, e.g. a merged multi-language list of
      tens of thousands): tokens explode and inner-join the BROADCAST
      term table, so the only shuffled rows are actual hits (rare by
      construction) aggregated per document and joined back — never a
      regex alternation of 10k terms scanned per row.

    ``strategy="auto"`` picks by list size. Both paths are
    equivalence-tested against each other in TestBlocklistFilter.
    """
    tl = sorted({str(t).lower() for t in terms})
    if not tl:
        raise ValueError("blocklist is empty")
    for t in tl:
        if not t or not all("a" <= c <= "z" for c in t):
            raise ValueError(
                f"blocklist terms must be ASCII-lowercase words: {t!r}")
    if strategy == "auto":
        strategy = "literal" if len(tl) <= max_literal_terms else "join"
    words = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z]+"),
                     lambda w: F.length(w) > 0)
    if strategy == "literal":
        lits = F.array(*[F.lit(t) for t in tl])
        hits = F.size(F.filter(words,
                               lambda w: F.array_contains(lits, w)))
        distinct = F.size(F.array_intersect(F.array_distinct(words),
                                            lits))
        return (df.withColumn("banned_hits", hits.cast("long"))
                .withColumn("banned_terms", distinct.cast("long"))
                .withColumn("flagged", F.col("banned_hits") > 0))
    if strategy != "join":
        raise ValueError(f"unknown strategy: {strategy}")
    spark = df.sparkSession
    tdf = spark.createDataFrame([(t,) for t in tl], "__term string")
    hits = (df.select(id_col, F.explode(words).alias("__term"))
            .join(F.broadcast(tdf), "__term")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("__h"),
                 F.countDistinct("__term").alias("__d")))
    return (df.join(hits, id_col, "left")
            .withColumn("banned_hits", F.coalesce(F.col("__h"),
                                                  F.lit(0)))
            .withColumn("banned_terms", F.coalesce(F.col("__d"),
                                                   F.lit(0)))
            .withColumn("flagged", F.col("banned_hits") > 0)
            .drop("__h", "__d"))


def phrase_blocklist_filter(df: DataFrame, phrases, text_col: str = "text",
                            id_col: str = "doc_id",
                            strategy: str = "auto",
                            max_literal_phrases: int = 64) -> DataFrame:
    """Multi-word blocklist screening — the half of C4's rule set
    :func:`blocklist_filter` can't express ("lorem ipsum", "terms of
    use", "all rights reserved" are phrases, not words). Matching is
    TOKEN-sequence containment over the same ASCII-lowercase word
    stream as the single-word filter, so "Lorem-Ipsum!" still hits
    "lorem ipsum"; occurrences are counted at every start position
    (overlapping included — both strategies agree by construction).
    Adds ``phrase_hits`` (total start positions), ``phrase_matches``
    (distinct phrases present) and ``flagged``.

    - ``literal``: each phrase becomes an array literal compared
      against token-array slices in a codegen ``filter`` — no join,
      no shuffle; right for the curated dozens real pipelines use.
    - ``join``: for each distinct phrase LENGTH the document explodes
      into its token n-grams once, broadcast-joins the phrase table,
      and only actual hits shuffle — the 10k-phrase path.
    """
    plist = []
    for p in phrases:
        toks = str(p).lower().split()
        if not toks or not all(
                t and all("a" <= c <= "z" for c in t) for t in toks):
            raise ValueError(
                f"phrases must be ASCII-lowercase word sequences: {p!r}")
        plist.append(tuple(toks))
    plist = sorted(set(plist))
    if not plist:
        raise ValueError("phrase blocklist is empty")
    if strategy == "auto":
        strategy = ("literal" if len(plist) <= max_literal_phrases
                    else "join")
    words = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z]+"),
                     lambda w: F.length(w) > 0)
    if strategy == "literal":
        base = df.withColumn("__toks", words)
        hit_cols = []
        for toks in plist:
            m = len(toks)
            lit = F.array(*[F.lit(t) for t in toks])
            # sequence(1, 0) DESCENDS in Spark; guard short docs
            idx = F.when(
                F.size("__toks") >= m,
                F.sequence(F.lit(1), F.size("__toks") - m + 1)) \
                .otherwise(F.array().cast("array<int>"))
            starts = F.size(F.filter(
                idx, lambda i: F.slice("__toks", i, m) == lit))
            hit_cols.append(starts)
        total = hit_cols[0]
        present = F.when(hit_cols[0] > 0, 1).otherwise(0)
        for hc in hit_cols[1:]:
            total = total + hc
            present = present + F.when(hc > 0, 1).otherwise(0)
        return (base
                .withColumn("phrase_hits", total.cast("long"))
                .withColumn("phrase_matches", present.cast("long"))
                .withColumn("flagged", F.col("phrase_hits") > 0)
                .drop("__toks"))
    if strategy != "join":
        raise ValueError(f"unknown strategy: {strategy}")
    spark = df.sparkSession
    pdf = spark.createDataFrame(
        [(" ".join(t), len(t)) for t in plist], "__p string, __m int")
    lengths = sorted({len(t) for t in plist})
    base = df.withColumn("__toks", words)
    grams = None
    for m in lengths:
        idx = F.when(
            F.size("__toks") >= m,
            F.sequence(F.lit(1), F.size("__toks") - m + 1)) \
            .otherwise(F.array().cast("array<int>"))
        g = base.select(
            id_col,
            F.explode(F.transform(
                idx,
                lambda i: F.array_join(F.slice("__toks", i, m), " ")))
            .alias("__p"))
        grams = g if grams is None else grams.unionByName(g)
    hits = (grams.join(F.broadcast(pdf.select("__p")), "__p")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("__h"),
                 F.countDistinct("__p").alias("__d")))
    return (df.join(hits, id_col, "left")
            .withColumn("phrase_hits",
                        F.coalesce(F.col("__h"), F.lit(0)))
            .withColumn("phrase_matches",
                        F.coalesce(F.col("__d"), F.lit(0)))
            .withColumn("flagged", F.col("phrase_hits") > 0)
            .drop("__h", "__d"))


#: Tracking query parameters stripped by canonicalization (the
#: standard crawler list: UTM campaign tags + click identifiers).
#: Java∩RE2, shared verbatim with the DuckDB oracle.
URL_TRACKING_RE = "^(utm_[a-zA-Z0-9_]*|gclid|fbclid|msclkid|ref)="


def canonical_url(col: Column) -> Column:
    """Canonical form of a URL column — the identity crawl pipelines
    dedup on (the same page arrives as http://Example.COM:80/a?utm_
    source=feed and example.com/a): lowercase scheme+host, default
    ports stripped (:80 http / :443 https), fragment dropped,
    tracking parameters removed (:data:`URL_TRACKING_RE`), remaining
    query parameters SORTED, path's trailing slashes trimmed (root
    stays ``/``). Pure JVM regex/HOF expressions, one map pass.
    """
    scheme = F.lower(F.regexp_extract(col, "^([a-zA-Z]+)://", 1))
    host = F.lower(F.regexp_extract(col, "^[a-zA-Z]+://([^/?#]+)", 1))
    host = F.when(scheme == "http",
                  F.regexp_replace(host, ":80$", "")) \
        .when(scheme == "https",
              F.regexp_replace(host, ":443$", "")) \
        .otherwise(host)
    path = F.regexp_extract(col, "^[a-zA-Z]+://[^/?#]+([^?#]*)", 1)
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(col, "\\?([^#]*)", 1)
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0)
        & ~p.rlike(URL_TRACKING_RE)))
    qs = F.when(F.size(params) > 0,
                F.concat(F.lit("?"), F.array_join(params, "&"))) \
        .otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, qs)


def url_dedup_keepers(df: DataFrame, url_col: str = "url",
                      id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by canonical URL: one map pass to
    :func:`canonical_url`, one map-side-combinable groupBy on the
    canonical key — the crawl-frontier dedup shape at any scale.
    Output: ``canonical_url``, ``n_variants``, ``keeper`` (the
    smallest id, first-occurrence-wins determinism).
    """
    return (df.select(canonical_url(F.col(url_col))
                      .alias("canonical_url"), F.col(id_col))
            .groupBy("canonical_url")
            .agg(F.count(F.lit(1)).alias("n_variants"),
                 F.min(id_col).alias("keeper")))


def url_host_stats(df: DataFrame, url_col: str = "url",
                   group_extra: str = "lang") -> DataFrame:
    """Per-host corpus accounting over a URL column.

    Parses scheme/host/path with a shared Java∩RE2 regex (NOT Spark's
    ``parse_url``, whose java.net semantics the oracle cannot mirror),
    then one partial-aggregated groupBy on host — the standard shape for
    domain-level corpus triage (robots blocklists, per-site caps) at
    100 TB: the only shuffle moves one row per (host, extra) group.
    """
    u = F.col(url_col)
    host = F.regexp_extract(u, "^[a-z]+://([^/]+)", 1)
    path = F.regexp_extract(u, "^[a-z]+://[^/]*(/[^?#]*)", 1)
    depth = F.size(F.split(path, "/")) - 1
    return (df.select(host.alias("host"), depth.alias("path_depth"),
                      F.col(group_extra))
            .groupBy("host")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct(group_extra).alias(f"n_{group_extra}s"),
                 F.round(F.avg(F.col("path_depth").cast("double")), 4)
                 .alias("avg_path_depth"))
            .orderBy("host"))
