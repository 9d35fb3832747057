"""Corpus retrieval and graph-centrality operators: BM25 ranking and
fixed-iteration PageRank.

Both answer curator questions the reference's surface can't ("which
documents best match this probe query", "which nodes carry authority
in the interaction graph") and both are pure DataFrame plans — token-
keyed aggregations for BM25, edge-keyed join+agg rounds for PageRank —
with no Python in the row path. Extends the reference's surface
(xbrianh/xdlake has no relational operators — SURVEY §2.4); mandated
by the build brief's training-data-pipeline component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .corpus import _tokens


def bm25_scores(df: DataFrame, query_terms: list[str],
                text_col: str = "text", id_col: str = "doc_id",
                k1: float = 1.2, b: float = 0.75,
                top_k: int | None = None) -> DataFrame:
    """Okapi BM25 document ranking for a fixed probe query.

    ``score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b *
    dl/avgdl))`` with the Lucene-style non-negative idf
    ``idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))``. ``df`` counts
    documents containing ``t`` across the WHOLE corpus (not just
    matches), ``dl`` is the document's whitespace-token count and
    ``avgdl`` the corpus mean.

    Plan shape: the token explode is filtered to the query terms
    *before* any aggregation, so the shuffled data is only the posting
    lists of the |q| probe terms, never the full corpus explode; df and
    tf come from that same filtered stream. ``dl``/``avgdl``/``N`` are
    a scan-level projection (no explode — ``size(split(...))``), with
    the corpus constants arriving as one broadcast row. The final
    top-k is TakeOrdered (k rows per partition to the driver), never a
    global sort. At 100 TB: one filtered explode + two tiny term-keyed
    aggregations + one doc-keyed join — the posting lists of a handful
    of terms are millions of rows, not trillions.

    Skew note: a stop-word probe term concentrates its posting list on
    one term key; tf aggregation keys on (doc, term) — uniform — and
    the df count is map-side combinable, so no single reducer sees a
    term's full posting list.

    Output: (doc_id, n_terms, score) — score rounded to 6, descending,
    doc_id ascending tiebreak.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})
    base = df.select(F.col(id_col).alias("doc_id"),
                     F.col(text_col).alias("__text"))
    # corpus constants: N docs and average doc length (one broadcast row)
    dl = base.select(
        "doc_id",
        F.size(F.filter(_tokens("__text"),
                        lambda x: F.length(x) > 0))
        .cast("double").alias("dl"))
    consts = dl.agg(F.count(F.lit(1)).cast("double").alias("__n"),
                    F.avg("dl").alias("__avgdl"))
    toks = (base.select("doc_id",
                        F.explode(_tokens("__text")).alias("term"))
            .filter(F.col("term").isin(terms)))
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf"))
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df"))
    scored = (tf.join(F.broadcast(dfreq), "term")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(consts))
              .withColumn(
                  "__idf",
                  F.log(F.lit(1.0) + (F.col("__n") - F.col("df")
                                      + F.lit(0.5))
                        / (F.col("df") + F.lit(0.5))))
              .withColumn(
                  "__s",
                  F.col("__idf") * F.col("tf") * F.lit(k1 + 1.0)
                  / (F.col("tf") + F.lit(k1)
                     * (F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("__avgdl")))))
    out = (scored.groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n_terms"),
                F.round(F.sum("__s"), 6).alias("score"))
           .orderBy(F.col("score").desc(), F.col("doc_id")))
    if top_k is not None:
        out = out.limit(top_k)
    return out


def pagerank(edges: DataFrame, iterations: int = 4,
             damping: float = 0.85,
             src_col: str = "src", dst_col: str = "dst",
             personalize: "list | DataFrame | None" = None,
             tol: "float | None" = None) -> DataFrame:
    """Fixed-iteration PageRank with dangling-mass redistribution —
    authority weighting over an interaction graph (the signal behind
    harmonic-centrality-style corpus quality weights).

    ``r_{i+1}(v) = (1-d)/N + d * (sum_{u->v} r_i(u)/deg(u) +
    dangling_i / N)`` where ``dangling_i`` is the total rank held by
    nodes with no out-edges (redistributed uniformly, the standard
    fix). ``r_0 = 1/N``. A FIXED iteration count keeps the operator
    deterministic and oracle-comparable (the unrolled-SQL twin runs
    the same rounds); convergence-driven stopping belongs to the
    caller (compare successive outputs).

    Plan shape per round: ONE shuffle join of the (big, static,
    src-partitioned) edge list with the rank table + ONE dst-keyed
    partial-aggregated sum — exactly the page-rank-on-MapReduce shape
    that scales linearly in |E|. The out-degree is joined into the
    rank table ONCE before the loop and carried through every update
    (it is static), and the dangling mass rides the same shuffle as
    the contributions: the edge join is a RIGHT join, so an
    out-degree-0 node survives with a NULL dst and its rank sums into
    the null group of the very same aggregation — no separate
    dangling scan/job per round. Ranks are rounded to 12 per round IN
    BOTH ENGINES so cross-partition float-sum drift can't compound
    across rounds (same posture as ``snapped_avg``).

    ``personalize``: a seed set turns this into PERSONALIZED PageRank
    (topic-sensitive, Haveliwala 2002): restart mass — and dangling
    mass — flows to the seeds instead of uniformly, ranking nodes by
    proximity to the seed set. Ranks initialize from the same restart
    vector. Accepts either a LIST of node ids (driver-side literal —
    fine for topic seed sets up to a few thousand; each seed gets
    1/|seeds|) or a DATAFRAME whose first column is the node id with
    an optional ``weight`` column (normalized to sum 1; uniform when
    absent). The DataFrame form is the 100 TB path: the restart
    vector is JOINED onto the static node table once — million-seed
    restart sets never pass through the driver or the plan text.

    ``tol``: when set, iteration stops early once the L1 delta
    ``sum(|r_{i+1} - r_i|)`` falls below it (``iterations`` becomes
    the max). The delta rides the round's eager checkpoint: one extra
    1-row aggregation per round, no extra shuffle of the rank table.
    Leave None (fixed rounds) for oracle-comparable runs.

    Output: (node, rank) over all nodes (sources + sinks), rank
    rounded to 6.
    """
    spark = edges.sparkSession
    # ONE shuffle builds the canonical edge list: hash(src)
    # partitioning satisfies the (src, dst) clustering the dedup
    # needs, so repartition + dropDuplicates fuse into a single
    # exchange (vs .distinct().repartition(): two)
    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .repartition("src")
         .dropDuplicates(["src", "dst"])
         .localCheckpoint(eager=False))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("double")
                               .alias("deg"))
    # (node, deg) for ALL nodes — deg NULL marks dangling; static, so
    # computed once and carried through every round's rank table
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct()
             .join(deg, F.col("node") == deg.src, "left")
             .select("node", "deg")
             .localCheckpoint(eager=False))
    n_nodes = float(nodes.count())  # scalar; |V| is a metadata-scale count
    personalized = personalize is not None and (
        not isinstance(personalize, (list, tuple, set, frozenset))
        or len(personalize) > 0)
    if personalized and isinstance(personalize, DataFrame):
        # DataFrame restart vector: normalize weights distributedly
        # and JOIN onto the static node table — no driver literals,
        # so seed sets scale with the cluster, not the plan size
        sdf = personalize
        ncol = sdf.columns[0]
        w = sdf.select(
            F.col(ncol).alias("node"),
            (F.col("weight").cast("double")
             if "weight" in sdf.columns[1:] else F.lit(1.0))
            .alias("__rw"))
        # seeds absent from the graph are dropped BEFORE normalizing,
        # so restart mass still sums to 1 (the literal-list path
        # divides by |seeds| regardless — callers there control
        # membership)
        w = (w.join(nodes.select("node"), "node", "left_semi")
             .groupBy("node").agg(F.sum("__rw").alias("__rw")))
        tot = float(w.agg(F.sum("__rw")).first()[0] or 0.0)
        if tot <= 0.0:
            raise ValueError("personalize weights must sum > 0")
        w = w.select("node",
                     (F.col("__rw") / F.lit(tot)).alias("__rw"))
        nodes = (nodes.join(w, "node", "left")
                 .select("node", "deg",
                         F.coalesce(F.col("__rw"), F.lit(0.0))
                         .alias("__rw"))
                 .localCheckpoint(eager=False))
        restart = F.col("__rw")
    elif personalized:
        seeds = sorted(set(personalize))
        restart = F.when(F.col("node").isin(seeds),
                         F.lit(1.0 / len(seeds))).otherwise(F.lit(0.0))
    else:
        restart = F.lit(1.0 / n_nodes)
    ranks = nodes.withColumn("rank", restart)
    for _ in range(iterations):
        # one join + one agg: e RIGHT JOIN ranks keeps dangling nodes
        # as null-dst rows, whose rank sums into the null group —
        # contributions and dangling mass from a single shuffle pass.
        # The checkpoint is LAZY: the dangling-mass aggregation below
        # is a full scan, so it materializes the round's flow AND
        # returns the driver scalar in ONE job (r12 — previously an
        # eager-materialize job plus a separate first() job per round)
        flow = (e.join(ranks.withColumnRenamed("node", "src"),
                       "src", "right")
                .groupBy("dst")
                .agg(F.sum(F.when(F.col("deg").isNull(), F.col("rank"))
                           .otherwise(F.col("rank") / F.col("deg")))
                     .alias("__in"))
                .localCheckpoint(eager=False))
        # dangling mass: ONE row of the checkpointed flow — a driver
        # scalar, not a data collect (|row| == 1 at any graph size)
        row = (flow.filter(F.col("dst").isNull())
               .agg(F.coalesce(F.sum("__in"), F.lit(0.0))
                    .alias("__dang")).first())
        dang_val = float(row["__dang"])
        if personalized:
            new_rank = (F.lit(1.0 - damping) * restart
                        + F.lit(damping)
                        * (F.coalesce(F.col("__in"), F.lit(0.0))
                           + F.lit(dang_val) * restart))
        else:
            # keep the exact literal shapes of the uniform formula —
            # the unrolled-SQL oracle reproduces these floats
            new_rank = (F.lit((1.0 - damping) / n_nodes)
                        + F.lit(damping)
                        * (F.coalesce(F.col("__in"), F.lit(0.0))
                           + F.lit(dang_val / n_nodes)))
        new_ranks = (nodes
                     .join(flow.filter(F.col("dst").isNotNull()),
                           nodes.node == F.col("dst"), "left")
                     .select("node", "deg",
                             F.round(new_rank, 12).alias("rank")))
        if tol is not None:
            # convergence screen: checkpoint the round (bounds lineage
            # exactly like the flow checkpoint) and take the L1 delta
            # vs the previous round — a 1-row driver scalar whose full
            # aggregation doubles as the lazy checkpoint's materializer
            new_ranks = new_ranks.localCheckpoint(eager=False)
            delta = (new_ranks.select("node",
                                      F.col("rank").alias("__nr"))
                     .join(ranks.select("node",
                                        F.col("rank").alias("__or")),
                           "node")
                     .agg(F.coalesce(
                         F.sum(F.abs(F.col("__nr") - F.col("__or"))),
                         F.lit(0.0)))
                     .first()[0])
            ranks = new_ranks
            if float(delta) < tol:
                break
        else:
            ranks = new_ranks
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def rrf_fuse(rankings: list[DataFrame], id_col: str = "doc_id",
             k: int = 60, top_k: int = 10) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of ranked lists.

    Each input carries ``(id_col, rank)`` (1-based); a document absent
    from a list simply contributes nothing for it — the standard
    top-N-per-ranker RRF. ``score = sum_l 1/(k + rank_l)``.

    Scale shape: the inputs are already top-N lists (each produced by
    its own TakeOrdered/limit), so fusion unions a few hundred rows,
    one tiny groupBy, one TakeOrdered — driver-side nothing. The heavy
    lifting stays in the upstream rankers (BM25 posting lists, ANN
    probes), which is the point of fusing RANKS instead of scores: no
    cross-ranker score calibration, no full-corpus re-join.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [r.select(F.col(id_col),
                      (F.lit(1.0) / (F.lit(float(k)) + F.col("rank")))
                      .alias("__contrib"))
             for r in rankings]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (u.groupBy(id_col)
            .agg(F.round(F.sum("__contrib"), 6).alias("rrf_score"),
                 F.count(F.lit(1)).alias("n_lists"))
            .orderBy(F.col("rrf_score").desc(), F.col(id_col))
            .limit(top_k))
