"""Corpus-level text statistics: TF-IDF, vocabulary, mix accounting,
encoding quality.

These answer the questions a training-data curator asks of a whole
corpus ("what are the distinctive terms", "what vocabulary covers 95%
of tokens", "how is the mix split across sources/languages", "which
docs are mojibake") — all as single-pass DataFrame plans with map-side
partial aggregation and zero Python in the row path. Extends the
reference's surface; mandated by the build brief's
training-data-pipeline component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(text_col: str):
    """Lowercased whitespace tokens — the same tokenization as
    functions.text.token_count_ws / shingles."""
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def tfidf_top_terms(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 5,
                    min_df: int = 1) -> DataFrame:
    """Top-``k`` TF-IDF terms per document:
    ``score = tf * ln(N / df)`` (raw term frequency, plain idf).

    Plan shape: one token explode feeds BOTH aggregations — per-(doc,
    token) counts (tf) and per-token distinct-doc counts (df) — joined
    on the token; N arrives as a broadcast single-row cross join. All
    shuffles key on the token hash (uniform); the final top-k is a
    row_number window per doc (score desc, token asc for deterministic
    ties), never a global sort.

    ``min_df`` drops hapax noise (terms in fewer than min_df docs).
    Output: (doc_id, term, tf, df, score) — score rounded to 6 for
    cross-engine comparability.
    """
    toks = (df.select(F.col(id_col).alias("doc_id"),
                      F.explode(_tokens(text_col)).alias("term"))
            .filter(F.length("term") > 0))
    # tf feeds BOTH the df aggregation and the score join — checkpoint
    # so the corpus explode runs once, not per consumer
    tf = (toks.groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).alias("tf"))
          .localCheckpoint(eager=False))
    dfreq = (tf.groupBy("term")
             .agg(F.count(F.lit(1)).alias("df"))
             .filter(F.col("df") >= min_df))
    n_docs = df.select(
        F.countDistinct(F.col(id_col)).alias("__n"))
    scored = (tf.join(dfreq, "term")
              .crossJoin(F.broadcast(n_docs))
              .withColumn("score",
                          F.round(F.col("tf")
                                  * F.log(F.col("__n") / F.col("df")), 6)))
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(),
                                             F.col("term"))
    return (scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .select("doc_id", "term", "tf", "df", "score"))


def build_vocab(df: DataFrame, text_col: str = "text",
                max_size: int | None = None) -> DataFrame:
    """Frequency-ranked corpus vocabulary with cumulative coverage —
    the tokenizer-training prep report ("how many types cover 95% of
    tokens").

    One explode + one map-side-combinable count per token; rank and
    running coverage are a single window over the (small) type table,
    ordered (count desc, token asc) for determinism. Output:
    (rank, token, n, coverage) with coverage = cumulative token
    fraction, rounded to 6.
    """
    counts = (df.select(F.explode(_tokens(text_col)).alias("token"))
              .filter(F.length("token") > 0)
              .groupBy("token")
              .agg(F.count(F.lit(1)).alias("n"))
              .localCheckpoint(eager=False))  # feeds total AND top-N
    total = counts.agg(F.sum("n").alias("__total"))
    if max_size is not None:
        # distributed top-N selection FIRST (TakeOrderedAndProject — k
        # rows per partition, no global shuffle), so the rank/coverage
        # window below runs over <= max_size rows instead of pulling
        # every vocabulary type into one reducer. Ranks within the
        # top-N prefix equal global ranks (same total order), and the
        # coverage denominator stays the full-corpus token total.
        counts = counts.orderBy(F.col("n").desc(),
                                F.col("token")).limit(max_size)
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    return (counts.crossJoin(F.broadcast(total))
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .withColumn("coverage",
                        F.round(F.sum("n").over(
                            w.rowsBetween(Window.unboundedPreceding, 0))
                            / F.col("__total"), 6))
            .select("rank", "token", "n", "coverage"))


def corpus_mix(df: DataFrame, group_cols: list[str] | None = None,
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Training-mix accounting per stratum (default source x lang):
    document and whitespace-token counts plus each stratum's fraction
    of corpus documents and tokens — the report behind mix-weighting
    decisions. One pass; totals ride along as a broadcast single row.
    """
    group_cols = group_cols or ["source", "lang"]
    per_row = df.select(
        *group_cols,
        F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
        .cast("long").alias("__t"))
    agg = (per_row.groupBy(*group_cols)
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("__t").alias("n_tokens"))
           .localCheckpoint(eager=False))  # feeds totals AND the join
    totals = agg.agg(F.sum("n_docs").alias("__d"),
                     F.sum("n_tokens").alias("__k"))
    return (agg.crossJoin(F.broadcast(totals))
            .select(*group_cols, "n_docs", "n_tokens",
                    F.round(F.col("n_docs") / F.col("__d"), 6)
                    .alias("doc_frac"),
                    F.round(F.col("n_tokens") / F.col("__k"), 6)
                    .alias("token_frac")))


def bpe_pair_counts(df: DataFrame, text_col: str = "text",
                    top_n: int | None = None) -> DataFrame:
    """Adjacent-token-pair frequencies — the statistic behind one BPE
    merge step (the most frequent pair is the next merge). One explode
    of per-document bigrams (``zip_with`` of the token array against
    its own tail — single pass, JVM-side) into a map-side-combinable
    count; ranked (count desc, pair asc) for determinism. Output:
    (rank, left, right, n).
    """
    toks = _tokens(text_col)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")))
    counts = (df.select(F.explode(pairs).alias("p"))
              .select("p.left", "p.right")
              .filter((F.length("left") > 0) & (F.length("right") > 0))
              .groupBy("left", "right")
              .agg(F.count(F.lit(1)).alias("n")))
    if top_n is not None:
        # same pattern as build_vocab: distributed TakeOrdered top-N
        # before the single-reducer rank window ever sees a row
        counts = counts.orderBy(F.col("n").desc(), F.col("left"),
                                F.col("right")).limit(top_n)
    w = Window.orderBy(F.col("n").desc(), F.col("left"), F.col("right"))
    return (counts.withColumn("rank", F.row_number().over(w).cast("long"))
            .select("rank", "left", "right", "n"))


def length_report(df: DataFrame, group_col: str = "lang",
                  text_col: str = "text") -> DataFrame:
    """Per-stratum document-length distribution: exact p50/p90/p99 of
    whitespace token counts plus mean — the histogram behind context-
    window and chunk-size decisions. ``percentile`` (exact linear
    interpolation, matching DuckDB's quantile_cont) over one map-side-
    combinable projection; the stratum table is small, so the exact
    sort-based percentile is cheap. For a quantile over billions of
    ROWS per stratum at 100 TB, swap in approx_percentile.
    """
    per = df.select(
        group_col,
        F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
        .cast("long").alias("__t"))
    return (per.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.avg("__t"), 6).alias("mean_tokens"),
                 F.round(F.percentile("__t", 0.5), 6).alias("p50"),
                 F.round(F.percentile("__t", 0.9), 6).alias("p90"),
                 F.round(F.percentile("__t", 0.99), 6).alias("p99")))


def unigram_logprob(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-document unigram language-model score against the corpus's
    own token distribution — the CCNet-style fluency signal (documents
    full of corpus-atypical tokens score high): for each document the
    mean token negative log-probability
    ``avg(-ln(count(token) / total_tokens))``; ``exp`` of it is the
    self-perplexity.

    One token explode feeds both the corpus counts and the per-doc
    token stream; the count table joins back on the (uniform) token
    key; totals are a broadcast single row. Every token occurrence in
    a doc contributes (occurrences weighted naturally, no distinct).
    Output: (doc_id, n_tokens, avg_neg_logp), rounded to 6.
    """
    toks = (df.select(F.col(id_col).alias("doc_id"),
                      F.explode(_tokens(text_col)).alias("token"))
            .filter(F.length("token") > 0)
            .localCheckpoint(eager=False))  # feeds counts AND the join
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("__c"))
    total = counts.agg(F.sum("__c").alias("__total"))
    scored = (toks.join(counts, "token")
              .crossJoin(F.broadcast(total))
              .withColumn("__nlp", F.log(F.col("__total"))
                          - F.log(F.col("__c"))))
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.round(F.avg("__nlp"), 6).alias("avg_neg_logp")))


def bigram_logprob(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", k: float = 1.0) -> DataFrame:
    """Per-document bigram language-model score with add-``k``
    smoothing against the corpus's own bigram distribution — the
    KenLM-style fluency signal one order up from
    :func:`unigram_logprob` (word salad whose unigrams are all common
    still scores high, because its *transitions* are rare):

    ``p(w2 | w1) = (c(w1 w2) + k) / (c(w1 .) + k * V)``

    with ``V`` = corpus vocabulary size (distinct token types) and
    ``c(w1 .)`` = occurrences of ``w1`` as a bigram left context. The
    document score is ``avg(-ln p)`` over its bigrams; documents with
    fewer than two tokens have no bigrams and drop out.

    Plan shape: one regex split per doc builds the token array; the
    bigram stream is ``arrays_zip`` of the two shifted slices (no
    per-position lambda), exploded once and lazily checkpointed so it
    feeds the bigram counts, the left-context counts, AND the scoring
    join without recomputing the split. Both count tables shuffle on
    uniform token-hash keys; V arrives as a broadcast single row. At
    100 TB this is two token-keyed aggregations plus one token-keyed
    join — the same scale shape as TF-IDF.

    Output: (doc_id, n_bigrams, avg_neg_logp), rounded to 6.
    """
    t = F.filter(_tokens(text_col), lambda x: F.length(x) > 0)
    n = F.size(t)
    pairs = F.arrays_zip(
        F.slice(t, 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
        F.slice(t, 2, F.greatest(n - 1, F.lit(0))).alias("w2"))
    base = (df.select(F.col(id_col).alias("doc_id"), t.alias("__t"),
                      pairs.alias("__p"))
            .localCheckpoint(eager=False))  # split once, three consumers
    bg = (base.select("doc_id", F.explode("__p").alias("__bg"))
          .select("doc_id", F.col("__bg.w1").alias("w1"),
                  F.col("__bg.w2").alias("w2"))
          .localCheckpoint(eager=False))
    c12 = (bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__c12")))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("__c1"))
    vocab = (base.select(F.explode("__t").alias("token"))
             .agg(F.countDistinct("token").alias("__v")))
    scored = (bg.join(c12, ["w1", "w2"]).join(c1, "w1")
              .crossJoin(F.broadcast(vocab))
              .withColumn("__nlp",
                          F.log(F.col("__c1") + F.lit(k) * F.col("__v"))
                          - F.log(F.col("__c12") + F.lit(k))))
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.round(F.avg("__nlp"), 6).alias("avg_neg_logp")))


def perplexity_buckets(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", lang_col: str = "lang",
                       head: float = 3.37, tail: float = 3.40,
                       k: float = 1.0) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020, the
    public recipe behind CCNet/RedPajama quality splits): score every
    document under the corpus's own bigram LM
    (:func:`bigram_logprob`), split into head / middle / tail at
    fixed score thresholds, and report per-(lang, bucket) document
    counts and bigram mass — the split a pre-training sampler draws
    from (head kept, middle downsampled, tail dropped).

    Buckets compare the ROUNDED avg negative log-prob directly
    against the thresholds (head: score < ``head``; tail: score >
    ``tail``) rather than exponentiating to perplexity first — exp()
    can differ by an ulp across engines, and a boundary flip would
    break oracle-exactness for zero semantic gain (thresholds are
    tuning constants either way; ppl cutoffs are just exp of these).

    Scale: the scoring is bigram_logprob's two token-keyed
    aggregations + one join; the bucketing adds one doc-id equi-join
    (to re-attach ``lang_col``) and a languages×3-row aggregate.
    Output: (lang, bucket, n_docs, total_bigrams), one row per
    (language, bucket).
    """
    scored = bigram_logprob(df, text_col, id_col, k)
    langs = df.select(F.col(id_col).alias("doc_id"),
                      F.col(lang_col).alias("lang"))
    bucket = (F.when(F.col("avg_neg_logp") < head, "head")
              .when(F.col("avg_neg_logp") > tail, "tail")
              .otherwise("middle"))
    return (scored.join(langs, "doc_id")
            .withColumn("bucket", bucket)
            .groupBy("lang", "bucket")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_bigrams").alias("total_bigrams")))


def bigram_logprob_kn(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      discount: float = 0.75) -> DataFrame:
    """Per-document bigram score under interpolated Kneser-Ney
    smoothing — the modern-LM upgrade of :func:`bigram_logprob`'s
    add-k (KN's continuation probability fixes add-k's systematic
    over-scoring of high-frequency-unigram word salad):

    ``p(w2 | w1) = max(c(w1 w2) - D, 0) / c(w1 .)
                   + D * T(w1 .) / c(w1 .) * P_cont(w2)``

    with ``D`` the absolute discount, ``T(w1 .)`` = distinct token
    types following ``w1``, and the continuation probability
    ``P_cont(w2) = T(. w2) / B`` (distinct bigram types ending in
    ``w2`` over total distinct bigram types ``B``). Every scored
    bigram is in-corpus (the model scores its own training stream),
    so ``c(w1 .) > 0`` always; out-of-corpus scoring would need an
    explicit unigram backoff. Document score is ``avg(-ln p)``; docs
    with < 2 tokens drop out.

    Plan shape: same as :func:`bigram_logprob` — one split, one
    exploded bigram stream lazily checkpointed, now feeding FOUR
    map-side-combinable aggregations (c12, c1, left-context type
    counts, right-continuation type counts; the type counts aggregate
    the already-small c12 table, not the stream) joined back on the
    w1/w2 hash keys, with ``B`` a broadcast single row. At 100 TB the
    cost is the same two token-keyed shuffles; the three derived count
    tables are vocabulary-sized.

    Output: (doc_id, n_bigrams, avg_neg_logp), rounded to 6.
    """
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1): {discount}")
    t = F.filter(_tokens(text_col), lambda x: F.length(x) > 0)
    n = F.size(t)
    pairs = F.arrays_zip(
        F.slice(t, 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
        F.slice(t, 2, F.greatest(n - 1, F.lit(0))).alias("w2"))
    bg = (df.select(F.col(id_col).alias("doc_id"),
                    F.explode(pairs).alias("__bg"))
          .select("doc_id", F.col("__bg.w1").alias("w1"),
                  F.col("__bg.w2").alias("w2"))
          .localCheckpoint(eager=False))  # one stream, four consumers
    c12 = (bg.groupBy("w1", "w2")
           .agg(F.count(F.lit(1)).cast("double").alias("__c12"))
           .localCheckpoint(eager=False))  # feeds c1/t1/tc/score join
    c1 = c12.groupBy("w1").agg(F.sum("__c12").alias("__c1"),
                               F.count(F.lit(1)).cast("double")
                               .alias("__t1"))
    tcont = c12.groupBy("w2").agg(F.count(F.lit(1)).cast("double")
                                  .alias("__tc"))
    btypes = c12.agg(F.count(F.lit(1)).cast("double").alias("__b"))
    d = F.lit(discount)
    scored = (bg.join(c12, ["w1", "w2"]).join(c1, "w1")
              .join(tcont, "w2")
              .crossJoin(F.broadcast(btypes))
              .withColumn(
                  "__p",
                  F.greatest(F.col("__c12") - d, F.lit(0.0))
                  / F.col("__c1")
                  + d * F.col("__t1") / F.col("__c1")
                  * (F.col("__tc") / F.col("__b"))))
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.round(F.avg(-F.log("__p")), 6).alias("avg_neg_logp")))


def linear_classifier_scores(df: DataFrame, weights: dict[str, float],
                             bias: float = 0.0, text_col: str = "text",
                             id_col: str = "doc_id",
                             threshold: float = 0.5) -> DataFrame:
    """fastText-style linear text classifier scoring — the shape of the
    model-based quality filters real corpus pipelines run at scale
    (a bag-of-tokens linear model distilled from a reference corpus):

    ``score = sigmoid(bias + mean(weight(token)))``

    with out-of-vocabulary tokens contributing weight 0 (they still
    count in the mean's denominator, as fastText's averaging does).
    ``label`` is ``score >= threshold``.

    Plan shape: one token explode, a broadcast left join against the
    (small, driver-held) weight vocabulary, one per-doc aggregation —
    at 100 TB the weights ship once per executor and the only shuffle
    keys on doc_id. Empty docs drop out (no tokens, undefined mean).

    Output: (doc_id, n_tokens, score, label), score rounded to 6.
    """
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(t, float(w)) for t, w in sorted(weights.items())],
        "token string, __w double")
    toks = (df.select(F.col(id_col).alias("doc_id"),
                      F.explode(_tokens(text_col)).alias("token"))
            .filter(F.length("token") > 0))
    scored = (toks.join(F.broadcast(wdf), "token", "left")
              .withColumn("__w", F.coalesce(F.col("__w"), F.lit(0.0))))
    agg = (scored.groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n_tokens"),
                F.avg("__w").alias("__mean")))
    score = F.lit(1.0) / (F.lit(1.0)
                          + F.exp(-(F.lit(float(bias)) + F.col("__mean"))))
    return (agg.withColumn("score", F.round(score, 6))
            .withColumn("label", F.col("score") >= F.lit(float(threshold)))
            .drop("__mean"))


def value_histogram(df: DataFrame, value_col: str, lo: float, hi: float,
                    n_bins: int = 20,
                    group_col: str | None = None) -> DataFrame:
    """Fixed-width histogram of a numeric column (optionally per
    group): the distribution report behind threshold tuning (quality
    cutoffs, outlier clips). Values below ``lo`` clamp into bin 0,
    at/above ``hi`` into the last bin. One map-side-combinable groupBy
    on the bin index — a single shuffle of ``n_bins`` rows per group.
    Output: ([group,] bin, bin_lo, bin_hi, n).
    """
    if not hi > lo:
        raise ValueError("need hi > lo")
    width = (hi - lo) / n_bins
    v = F.col(value_col).cast("double")
    bin_ = F.least(F.greatest(F.floor((v - F.lit(lo)) / F.lit(width))
                              .cast("long"), F.lit(0)),
                   F.lit(n_bins - 1))
    keys = ([group_col] if group_col else []) + ["bin"]
    # NaN is NOT null to Spark and would clamp into bin 0 — drop both
    return (df.filter(v.isNotNull() & ~F.isnan(v))
            .select(*([group_col] if group_col else []),
                    bin_.alias("bin"))
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("bin_lo",
                        F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6))
            .withColumn("bin_hi",
                        F.round(F.lit(lo) + (F.col("bin") + 1)
                                * F.lit(width), 6))
            .select(*keys, "bin_lo", "bin_hi", "n"))


#: Sentence terminators / vowel groups for the readability heuristic —
#: Java ∩ RE2 regexes so the DuckDB oracle runs the same strings.
SENTENCE_RX = "[.!?]+"
VOWEL_GROUP_RX = "[aeiouyAEIOUY]+"


def readability_scores(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Flesch reading-ease and Flesch-Kincaid grade per document, with
    the classic vowel-group syllable heuristic (a syllable ~= one
    maximal vowel run): crude but deterministic, language-agnostic-ish,
    and exactly reproducible in SQL — the point here is the corpus
    -level distribution, not linguistic truth. Pure JVM regex counts,
    one projection. Output: (doc_id, n_sentences, n_words,
    n_syllables, flesch, fk_grade), rounded to 4.
    """
    c = F.col(text_col)
    n_sent = F.greatest(F.regexp_count(c, F.lit(SENTENCE_RX)), F.lit(1)) \
        .cast("double")
    n_words = F.greatest(
        F.size(F.split(F.trim(c), r"\s+")), F.lit(1)).cast("double")
    n_syll = F.greatest(F.regexp_count(c, F.lit(VOWEL_GROUP_RX)),
                        F.lit(1)).cast("double")
    flesch = (F.lit(206.835) - F.lit(1.015) * (n_words / n_sent)
              - F.lit(84.6) * (n_syll / n_words))
    fk = (F.lit(0.39) * (n_words / n_sent)
          + F.lit(11.8) * (n_syll / n_words) - F.lit(15.59))
    return df.select(
        F.col(id_col),
        n_sent.cast("long").alias("n_sentences"),
        n_words.cast("long").alias("n_words"),
        n_syll.cast("long").alias("n_syllables"),
        F.round(flesch, 4).alias("flesch"),
        F.round(fk, 4).alias("fk_grade"))


#: Java ∩ RE2 classes so the DuckDB oracle runs the same strings.
REPLACEMENT_CHAR_RX = "�"
CONTROL_CHAR_RX = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"


def encoding_quality(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     max_bad_frac: float = 0.001) -> DataFrame:
    """Mojibake / encoding-damage report per document: counts of
    U+FFFD replacement characters (the signature of a wrong-charset
    decode) and C0 control characters (minus tab/newline/CR), their
    fraction of the text, and an ``is_clean`` flag at ``max_bad_frac``.
    Pure JVM regex passes; one projection.
    """
    c = F.col(text_col)
    n_repl = F.regexp_count(c, F.lit(REPLACEMENT_CHAR_RX))
    n_ctrl = F.regexp_count(c, F.lit(CONTROL_CHAR_RX))
    bad_frac = F.round((n_repl + n_ctrl)
                       / F.greatest(F.length(c), F.lit(1)), 6)
    return df.select(
        F.col(id_col),
        n_repl.cast("long").alias("n_replacement"),
        n_ctrl.cast("long").alias("n_control"),
        bad_frac.alias("bad_frac"),
        (bad_frac <= max_bad_frac).alias("is_clean"))
