"""Distributed corpus classifiers and data-selection weighting:
multinomial Naive Bayes (train + classify in one plan) and DSIR-style
hashed-n-gram importance weights.

Both are curation primitives a training-data pipeline runs over the
whole corpus ("which language is this document really", "which raw
documents look most like my target domain" — Xie et al. 2023, *Data
Selection for Language Models via Importance Resampling*), and both are
pure-aggregation algorithms, so they train at 100 TB with a handful of
token-keyed shuffles and no parameter server: the "model" is a
DataFrame of counts. Extends the reference's surface (xbrianh/xdlake
has no relational operators — SURVEY §2.4); mandated by the build
brief's training-data-pipeline component.

Everything here is oracle-exact: no sampling, no SGD, no
nondeterministic init — the same counts + logarithms are expressible
in ANSI SQL, and the registry pairs each query with that oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .corpus import _tokens

#: 13 md5 hex chars = 52 bits — exactly representable in a double and
#: within conv()'s precision, same basis as sampling.weighted_reservoir.
_MD5_CHARS = 13


def _bucket(col, n_buckets: int):
    """Portable content hash -> [0, n_buckets): md5 prefix parsed as an
    integer, mod B. Matches DuckDB's
    ``('0x' || substring(md5(x), 1, 13))::BIGINT % B`` bit-for-bit, so
    oracles reproduce the exact same feature buckets."""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, _MD5_CHARS), 16, 10)
        .cast("long"), F.lit(n_buckets))


def nb_train_classify(df: DataFrame, label_col: str = "lang",
                      text_col: str = "text", id_col: str = "doc_id",
                      ) -> DataFrame:
    """Train a multinomial Naive Bayes classifier on the corpus and
    classify every document with it, in one DataFrame plan.

    Model (add-one Laplace smoothing over the corpus vocabulary V):

    - ``prior(c)   = ln(docs_c / N)``
    - ``ll(t | c)  = ln((count(t, c) + 1) / (tokens_c + V))``
    - ``score(d,c) = prior(c) + sum_t cnt(t, d) * ll(t | c)``

    prediction = argmax_c score(d, c), ties broken by class name
    ascending. Tokens are the corpus-standard lowercased whitespace
    tokens; scoring uses the same corpus the model was trained on, so
    every token is in V and only (t, c) pairs can be unseen (handled by
    the +1 smoothing via a left join's coalesce-to-zero).

    Plan shape / 100 TB: the token explode feeds three aggregations —
    per-(class, term) counts (shuffle keyed on the term hash, map-side
    combinable), per-(doc, term) counts (keyed on doc+term, uniform),
    and a single-row (V, N) aggregate that arrives broadcast. The class
    table (priors + per-class token totals) is |C| rows — broadcast.
    Scoring is doc-terms x |C| via that broadcast, left-joined to the
    (class, term) likelihood table on the term key (uniform hash; the
    likelihood side is at most V x |C| rows, shuffled once). The argmax
    is a per-doc row_number window — keyed on doc_id, never global. No
    driver materialization, no Python in the row path, no iteration:
    NB's MLE *is* a count aggregation, which is why it scales where SGD
    needs an optimizer loop.

    Output: (doc_id, label, pred, n_tokens, score) — score rounded to
    6 for cross-engine comparability.
    """
    base = df.select(F.col(id_col).alias("doc_id"),
                     F.col(label_col).alias("label"),
                     F.col(text_col).alias("__text"))
    toks = (base.select("doc_id", "label",
                        F.explode(_tokens("__text")).alias("term"))
            .filter(F.length("term") > 0))

    # model: per-(class, term) counts and per-class totals + priors
    ctc = toks.groupBy(F.col("label").alias("cls"), "term") \
              .agg(F.count("*").cast("double").alias("ctc"))
    cls = (ctc.groupBy("cls").agg(F.sum("ctc").alias("tok_c"))
           .join(base.groupBy(F.col("label").alias("cls"))
                     .agg(F.count("*").cast("double").alias("docs_c")),
                 "cls"))
    consts = (toks.agg(F.countDistinct("term").cast("double").alias("v"))
              .crossJoin(base.agg(F.count("*").cast("double")
                                  .alias("n"))))
    cls = (F.broadcast(cls.crossJoin(F.broadcast(consts)))
           .withColumn("prior", F.log(F.col("docs_c") / F.col("n"))))

    # scoring: every doc-term against every class, unseen pairs -> +1
    dtc = toks.groupBy("doc_id", "label", "term") \
              .agg(F.count("*").cast("double").alias("cnt"))
    scored = (dtc.join(cls, how="cross")
              .join(ctc, ["cls", "term"], "left")
              .withColumn("ll", F.col("cnt") * F.log(
                  (F.coalesce(F.col("ctc"), F.lit(0.0)) + 1.0)
                  / (F.col("tok_c") + F.col("v"))))
              .groupBy("doc_id", "label", "cls")
              .agg((F.first("prior") + F.sum("ll")).alias("score"),
                   F.sum("cnt").alias("n_tokens")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cls"))
    return (scored.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1)
            .select("doc_id", "label", F.col("cls").alias("pred"),
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.round("score", 6).alias("score")))


def dsir_weights(df: DataFrame, target_filter,
                 text_col: str = "text", id_col: str = "doc_id",
                 n_buckets: int = 4096, top_k: int | None = None,
                 ) -> DataFrame:
    """DSIR-style importance weight of every document against a target
    domain, with hashed unigram features (Xie et al. 2023).

    The target distribution is the subset of ``df`` matching
    ``target_filter`` (a Column predicate); the raw distribution is the
    whole corpus. Each token hashes into one of ``n_buckets`` feature
    buckets (portable md5 hash, so the oracle reproduces it); each
    distribution is the add-one-smoothed bucket frequency

    ``p(f) = (cnt(f) + 1) / (total + B)``

    and a document's log importance weight is

    ``w(d) = sum_tokens ln(p_target(bucket) / p_raw(bucket))``

    — high means "looks like the target domain", the quantity DSIR
    resamples on when selecting pretraining data.

    Plan shape / 100 TB: one token explode projected straight to bucket
    ids feeds both distribution aggregations (B-row results, broadcast)
    and the per-(doc, bucket) counts (shuffle keyed on doc+bucket,
    uniform). The log-ratio table is B rows — a broadcast join, so the
    per-doc sum is the only real shuffle. With ``top_k`` the final
    selection is TakeOrdered (k rows per partition to the driver),
    never a global sort.

    Output: (doc_id, n_tokens, logweight) — rounded to 6; ``top_k``
    orders by logweight desc, doc_id asc.
    """
    base = df.select(F.col(id_col).alias("doc_id"),
                     F.col(text_col).alias("__text"),
                     target_filter.alias("__is_target"))
    toks = (base.select("doc_id", "__is_target",
                        F.explode(_tokens("__text")).alias("term"))
            .filter(F.length("term") > 0)
            .select("doc_id", "__is_target",
                    _bucket(F.col("term"), n_buckets).alias("bucket")))

    raw = toks.groupBy("bucket").agg(
        F.count("*").cast("double").alias("c_raw"))
    tgt = (toks.filter("__is_target").groupBy("bucket")
           .agg(F.count("*").cast("double").alias("c_tgt")))
    # bucket -> ln(p_target / p_raw); buckets absent from one side get
    # the +1 numerator only, so build over raw's buckets (a superset of
    # the target's: target rows are raw rows too) plus totals
    totals = (toks.agg(F.count("*").cast("double").alias("t_raw"))
              .crossJoin(toks.filter("__is_target")
                         .agg(F.count("*").cast("double").alias("t_tgt"))))
    ratio = (raw.join(tgt, "bucket", "left")
             .crossJoin(F.broadcast(totals))
             .select("bucket", (
                 F.log((F.coalesce(F.col("c_tgt"), F.lit(0.0)) + 1.0)
                       / (F.col("t_tgt") + F.lit(float(n_buckets))))
                 - F.log((F.col("c_raw") + 1.0)
                         / (F.col("t_raw") + F.lit(float(n_buckets)))))
                 .alias("lr")))

    dbc = toks.groupBy("doc_id", "bucket").agg(
        F.count("*").cast("double").alias("cnt"))
    out = (dbc.join(F.broadcast(ratio), "bucket")
           .groupBy("doc_id")
           .agg(F.sum("cnt").cast("long").alias("n_tokens"),
                F.round(F.sum(F.col("cnt") * F.col("lr")), 6)
                .alias("logweight")))
    if top_k is not None:
        out = out.orderBy(F.desc("logweight"), F.asc("doc_id")) \
                 .limit(top_k)
    return out


def rocchio_classify(df: DataFrame, label_col: str = "label",
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     round_digits: int = 6) -> DataFrame:
    """Nearest-class-mean (Rocchio) classifier over an embedding column.

    Train + classify in one plan: per-class centroids come from ONE
    partial-aggregated ``posexplode`` mean job (``n_labels x dim``
    result rows — the only thing that reaches the driver), then every
    vector is assigned to the nearest centroid with the codegen'd
    ``x.c - ||c||^2/2`` struct-argmax (clustering._best_struct's shape):
    no Python in the row path, no shuffle of the vectors. At 100 TB the
    train pass moves ``n_labels * dim`` rows and the classify pass is a
    narrow projection.

    Centroid components are rounded to ``round_digits`` before use so
    the assignment is bit-reproducible across engines (the house rule
    for float aggregates — partial-sum order varies, the rounded mean
    does not); the DuckDB oracle applies the identical round. Ties
    break toward the higher class id on both sides.

    Returns ``df`` plus ``pred_<label_col>``.
    """
    from ..functions.vectors import dot, lit_vector

    means = (df.select(label_col,
                       F.posexplode(F.col(vec_col)).alias("__pos", "__val"))
             .groupBy(label_col, "__pos")
             .agg(F.round(F.avg("__val"), round_digits).alias("__avg"))
             .collect())  # n_labels x dim rows — metadata-sized
    by_label: dict = {}
    for r in means:
        by_label.setdefault(r[label_col], {})[r["__pos"]] = r["__avg"]
    labels = sorted(by_label)
    if not labels:
        raise ValueError("rocchio_classify: empty input")
    dim = max(max(d) for d in by_label.values()) + 1

    def seq_dot(vals):
        total = 0.0
        for v in vals:
            total += float(v) * float(v)
        return total

    scored = F.array(*[
        F.struct((dot(F.col(vec_col),
                      lit_vector([by_label[lab].get(p, 0.0)
                                  for p in range(dim)]))
                  - F.lit(seq_dot([by_label[lab].get(p, 0.0)
                                   for p in range(dim)]) / 2.0))
                 .alias("score"),
                 F.lit(ci).alias("cid"))
        for ci, lab in enumerate(labels)
    ])
    pred = F.element_at(F.array(*[F.lit(lab) for lab in labels]),
                        F.array_max(scored)["cid"] + 1)
    return df.withColumn(f"pred_{label_col}", pred)


# ---------------------------------------------------------------------------
# Trainable quality classifier: distributed logistic regression
# ---------------------------------------------------------------------------

def quality_features(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     n_buckets: int = 1024) -> DataFrame:
    """Hashed-unigram features for the logistic trainer/scorer: one
    row per (doc, bucket) with the fastText-style L1-normalized count
    ``x = cnt / n_tokens`` (the document embedding is the MEAN of its
    token embeddings). Buckets use the same portable md5 hash as DSIR
    (classify._bucket), so any engine reproduces them.

    One explode + one (doc, bucket) aggregation; at 100 TB this is a
    single shuffle keyed on (doc_id, bucket) — uniform, no hot keys
    (bucket count is capped at n_buckets per doc). The normalization
    window then leaves the output hash(doc_id)-partitioned, which the
    trainer's per-epoch doc-keyed groupBy/join reuse exchange-free
    (localCheckpoint preserves partitioning). The tokenize+hash map
    side runs inside the scan stage: spread it when the input arrives
    as a single split (no-op at cluster scale)."""
    from . import ensure_parallelism
    toks = (ensure_parallelism(df)
            .select(F.col(id_col).alias("doc_id"),
                    F.explode(_tokens(text_col)).alias("term"))
            .filter(F.length("term") > 0)
            .select("doc_id",
                    _bucket(F.col("term"), n_buckets).alias("bucket")))
    counts = toks.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("doc_id")
    return counts.select(
        "doc_id", "bucket",
        (F.col("cnt") / F.sum("cnt").over(w)).alias("x"))


def train_quality_classifier(df: DataFrame, label_col: str,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             n_buckets: int = 1024,
                             epochs: int = 10, lr: float = 2.0,
                             l2: float = 0.0):
    """Train a fastText-style linear quality classifier with
    distributed FULL-BATCH logistic regression (the training half the
    fixed-weight ``linear_classifier_scores`` consumes; VERDICT r8
    "What's missing" item 4).

    Deterministic by construction — zero init, no sampling, no
    SGD shuffling — so the same inputs give the same weights on any
    cluster layout up to float-summation order (pinned against a
    sequential numpy twin in tests/test_operators.py).

    Per epoch (ONE action, ZERO feature-scale shuffles): the feature
    table is hash(doc_id)-partitioned once at its localCheckpoint, so
    the margin ``m_d = b + sum_f w[f] x_df`` is a window sum over that
    layout (broadcasting the B-row weight table preserves the streamed
    side's partitioning) — every (doc, bucket) row carries its doc's
    residual ``r_d = sigmoid(m_d) - y_d`` without the former
    groupBy(doc)+join-back pair, which re-exchanged the feature table
    twice per epoch. The bucket gradients
    ``grad[f] = mean_d r_d x_df`` and the bias gradient
    ``mean_d r_d`` (each doc's residual counted once, via the window's
    row_number) then ride one B-row aggregation. The driver holds only
    the B-float weight vector (metadata scale); features are computed
    once and localCheckpoint'd, so epoch r never replays tokenization.
    Gradient-descent updates with constant lr and optional L2.
    Window-vs-hash-aggregation float summation order differs by ulps;
    the sequential-twin test pins the weights to 1e-9.

    Returns ``(weights, bias)`` — a ``numpy`` array of length
    ``n_buckets`` and a float.
    """
    import numpy as np

    spark = df.sparkSession
    labels = df.select(F.col(id_col).alias("doc_id"),
                       F.col(label_col).cast("double").alias("y"))
    # hash(doc_id)-partition ONCE at the checkpoint: every epoch's
    # margin window then runs over this layout with no exchange
    # (r12, guide §2.4 — the doremi pattern)
    feats = (quality_features(df, text_col, id_col, n_buckets)
             .join(labels, "doc_id")
             .repartition("doc_id"))
    feats = feats.localCheckpoint(eager=True)
    try:
        n_docs = labels.count()
        if n_docs == 0:
            raise ValueError("cannot train on an empty corpus")

        # one window spec for the margin sum AND the count-once row
        # marker: partition by doc, order by bucket, full frame — a
        # single sort, shared by both expressions
        wd = Window.partitionBy("doc_id").orderBy("bucket")
        full = wd.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
        w = np.zeros(n_buckets)
        b = 0.0
        for _ in range(epochs):
            wdf = spark.createDataFrame(
                [(int(i), float(w[i])) for i in range(n_buckets)],
                "bucket long, w double")
            rows = (feats.join(F.broadcast(wdf), "bucket", "left")
                    .withColumn("__m", F.sum(
                        F.col("x") * F.coalesce("w", F.lit(0.0)))
                        .over(full))
                    .withColumn("__r", F.lit(1.0) / (
                        F.lit(1.0)
                        + F.exp(-(F.col("__m") + F.lit(b))))
                        - F.col("y"))
                    .withColumn("__rn", F.row_number().over(wd)))
            # one action per epoch: bucket gradients plus the
            # per-doc-once bias gradient in the SAME aggregation
            grad_rows = (rows.groupBy("bucket")
                         .agg(F.sum(F.col("x") * F.col("__r"))
                              .alias("g"),
                              F.sum(F.when(F.col("__rn") == 1,
                                           F.col("__r"))
                                    .otherwise(0.0)).alias("gb"))
                         .collect())
            g = np.zeros(n_buckets)
            gb = 0.0
            for row in sorted(grad_rows, key=lambda r: r["bucket"]):
                g[int(row["bucket"])] = float(row["g"]) / n_docs
                gb += float(row["gb"])
            gb /= n_docs
            w -= lr * (g + l2 * w)
            b -= lr * gb
        return w, b
    finally:
        # release the checkpointed feature blocks — a caller training
        # many models in one session would otherwise accumulate them
        # until executor storage pressure evicts
        feats.unpersist()


def quality_classifier_predict(df: DataFrame, weights, bias: float,
                               text_col: str = "text",
                               id_col: str = "doc_id") -> DataFrame:
    """Score documents with a trained bucket-weight model: the same
    broadcast weight join + per-doc mean + sigmoid as training's
    forward pass. Output (doc_id, score, label), score rounded to 6.
    One shuffle (the per-doc aggregation); the B-row weight table
    broadcasts."""
    import numpy as np

    weights = np.asarray(weights, dtype="float64")
    n_buckets = len(weights)
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(int(i), float(weights[i])) for i in range(n_buckets)],
        "bucket long, w double")
    feats = quality_features(df, text_col, id_col, n_buckets)
    return (feats.join(F.broadcast(wdf), "bucket", "left")
            .groupBy("doc_id")
            .agg(F.sum(F.col("x") * F.coalesce("w", F.lit(0.0)))
                 .alias("m"))
            .select("doc_id",
                    F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(
                        -(F.col("m") + F.lit(float(bias))))), 6)
                    .alias("score"))
            .withColumn("label", F.col("score") >= 0.5))


def auc_eval(scored: DataFrame, score_col: str = "score",
             label_col: str = "y") -> DataFrame:
    """Exact ROC-AUC of a score column against a boolean label — the
    model-evaluation half of the classifier family, tie-aware
    (Mann-Whitney: AUC = P(s_pos > s_neg) + 0.5 P(s_pos = s_neg)).

    Scale shape — NO global window (the naive rank-based form funnels
    the whole corpus through one reducer): per-distinct-score pos/neg
    counts (one map-side-combinable aggregation; distinct 6-decimal
    sigmoid scores are <= 1e6+1), then the cumulative-negatives-below
    term via the same score-binned two-pass prefix pattern as
    sampling.token_budget_select — coarse 2-decimal bins' offsets
    computed driver-side from a <= 101-row table and broadcast, the
    fine prefix windowed PARTITIONED BY bin (<= 1e4 distinct scores
    per partition), one final scalar aggregation.

    Output: one row ``(auc, n_pos, n_neg)``, auc rounded to 6.
    """
    per_score = (scored.groupBy(F.col(score_col).alias("__s"))
                 .agg(F.sum(F.when(F.col(label_col).cast("boolean"),
                                   1).otherwise(0)).alias("__p"),
                      F.sum(F.when(F.col(label_col).cast("boolean"),
                                   0).otherwise(1)).alias("__n")))
    binned = per_score.withColumn("__bin", F.round(F.col("__s"), 2))
    per_bin = (binned.groupBy("__bin")
               .agg(F.sum("__n").alias("__bn")).collect())
    offsets, acc = {}, 0
    for row in sorted(per_bin, key=lambda r: r["__bin"]):
        offsets[row["__bin"]] = acc
        acc += row["__bn"]
    spark = scored.sparkSession
    off = spark.createDataFrame(
        [(float(b), int(o)) for b, o in offsets.items()],
        "__bin double, __off long")
    w = Window.partitionBy("__bin").orderBy("__s")
    fine = (binned.join(F.broadcast(off), "__bin")
            .withColumn("__below",
                        F.col("__off")
                        + F.coalesce(F.sum("__n").over(
                            w.rowsBetween(Window.unboundedPreceding,
                                          -1)), F.lit(0))))
    return (fine.agg(
        F.sum(F.col("__p") * F.col("__below")).alias("__gt"),
        F.sum(F.col("__p") * F.col("__n")).alias("__eq"),
        F.sum("__p").alias("n_pos"),
        F.sum("__n").alias("n_neg"))
        .select(
            F.round((F.col("__gt") + 0.5 * F.col("__eq"))
                    / (F.col("n_pos") * F.col("n_neg")), 6)
            .alias("auc"),
            F.col("n_pos").cast("long").alias("n_pos"),
            F.col("n_neg").cast("long").alias("n_neg")))
