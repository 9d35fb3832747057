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
