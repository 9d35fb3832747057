"""Distributed k-means clustering over embedding columns.

The clustering layer behind corpus curation at scale: SemDeDup-style
semantic dedup prunes within clusters, diversity ("cluster-balanced")
sampling caps each cluster's contribution, and IVF similarity search is
a cosine k-means in disguise (operators/similarity.py ivf_build shares
this design). Extends the reference's surface (xbrianh/xdlake has no
vector operators — SURVEY §2.4); mandated by the build brief.

Scale design: Lloyd iterations run as Spark jobs — assignment is a pure
JVM column expression (an ``array_max`` over (score, cid) structs, so
whole-stage codegen evaluates k dot products per row with no Python in
the row path), and the centroid update is one map-side-combinable
``posexplode`` aggregation whose result is only ``k x dim`` rows; the
centroid matrix is the ONLY thing that ever reaches the driver, and it
ships back broadcast inside the next iteration's expression. For k*dim
past ~10^5 (where the codegen'd expression bloats), switch the
assignment to the numpy block-matmul shape used by
``dedup.embedding_neardup_pairs`` — same contract, Arrow batches.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import ensure_parallelism
from ..functions.vectors import (dot, lit_double_rows, lit_doubles,
                                 lit_vector)


def _best_struct(centroids: np.ndarray, vec_col: str):
    """argmin_c ||x - c||^2 as a codegen-friendly argmax over structs:
    ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2, and ||x||^2 is constant per
    row, so argmin is argmax of (x.c - ||c||^2 / 2). Struct ordering
    compares score first, then breaks ties on the HIGHER cid (struct
    max) — deterministic either way. Returns the winning (score, cid)
    struct: cid is the assignment, and the squared distance falls out
    as ``||x||^2 - 2 * score`` without re-evaluating any dot product.

    ||c||^2 is accumulated with an explicit left-to-right loop, NOT
    ``np.dot``: BLAS may reorder/block the accumulation, while both the
    JVM ``aggregate`` twin and DuckDB's ``list_inner_product`` sum
    sequentially — matching the order keeps near-tie assignments
    bit-identical across engines (the ``embedding_assign_nearest``
    oracle's exactness claim)."""
    # One transform-with-index over the centroid matrix as a 2-D
    # LITERAL instead of k per-centroid struct builds: the arithmetic
    # is bit-identical (same sequential zip_with/aggregate dot, same
    # halved self-dot, same struct ordering), but plan construction
    # costs a constant handful of py4j lambda conversions instead of
    # 2k — k-means at k=16 spent seconds of pure driver time building
    # each iteration's assignment expression.
    cl = lit_double_rows(centroids)
    halves = lit_doubles([_seq_self_dot(c) / 2.0 for c in centroids])
    scored = F.transform(cl, lambda c, i: F.struct(
        (F.aggregate(F.zip_with(F.col(vec_col), c,
                                lambda a, b: a.cast("double")
                                * b.cast("double")),
                     F.lit(0.0), lambda acc, x: acc + x)
         - F.element_at(halves, i + 1)).alias("score"),
        i.alias("cid")))
    return F.array_max(scored)


def _seq_self_dot(c) -> float:
    total = 0.0
    for v in c:
        total += float(v) * float(v)
    return total


def _assign_expr(centroids: np.ndarray, vec_col: str):
    return _best_struct(centroids, vec_col)["cid"]


def assign_to_centroids(df: DataFrame, centroids,
                        vec_col: str = "embedding",
                        out_col: str = "cluster") -> DataFrame:
    """Attach the nearest-centroid (euclidean) index for a fixed
    ``k x dim`` centroid matrix — the deterministic building block
    under :func:`kmeans`; also useful standalone to re-apply a trained
    quantizer to new data. Pure JVM expression, no shuffle."""
    return df.withColumn(
        out_col, _assign_expr(np.asarray(centroids, dtype="float64"),
                              vec_col))


def _farthest_point_init(base: DataFrame, n_clusters: int,
                         vec_col: str, id_col: str,
                         seed: int) -> np.ndarray:
    """Deterministic farthest-point ("maximin") seeding: start from the
    lowest-``xxhash64(id, seed)`` vector, then repeatedly take the
    point maximizing the min squared distance to the chosen set (ties
    break on id). k TakeOrdered jobs of ONE row each — robust to the
    two-seeds-in-one-blob local optimum that random/hash seeding feeds
    Lloyd; pass ``init='hash'`` to skip it for large k.

    Same incremental bookkeeping as :func:`kcenter_select`: the
    per-point running min distance is carried in a lazily
    localCheckpointed state column and each round folds in ONE new
    dot product per point with ``least`` — O(k |corpus|) total work
    and an O(1) plan per round, where rebuilding ``least(*d2s)`` over
    the whole chosen set each round is O(k^2 |corpus|) work with a
    linearly growing plan. ``least`` is an exact min over floats, so
    the running min equals the batch min bit-for-bit. The seed
    collect also proves there are >= k rows (one TakeOrdered job
    instead of a count job plus a 1-row collect)."""
    head = (base.select(id_col, vec_col)
            .orderBy(F.xxhash64(F.col(id_col).cast("string"),
                                F.lit(seed)), F.col(id_col))
            .limit(n_clusters).collect())
    if len(head) < n_clusters:
        raise ValueError(
            f"need >= {n_clusters} rows to seed {n_clusters} clusters")
    chosen = [np.asarray(list(head[0][vec_col]), dtype="float64")]
    x2 = dot(F.col(vec_col), F.col(vec_col))

    def d2_to(c: np.ndarray):
        return x2 - 2.0 * dot(F.col(vec_col), lit_vector(c)) \
            + F.lit(_seq_self_dot(c))

    state = base.select(id_col, vec_col, d2_to(chosen[0]).alias("__dm"))
    prev = None
    while len(chosen) < n_clusters:
        # lazy: the round's TakeOrdered is a full-partition scan, so it
        # both materializes the checkpoint and returns the argmax — one
        # job per round, no standalone warm-up
        state = state.localCheckpoint(eager=False)
        far = (state.select(id_col, vec_col,
                            F.col("__dm").alias("__d2"))
               .orderBy(F.col("__d2").desc(), F.col(id_col))
               .limit(1).collect())
        if prev is not None:
            prev.unpersist()
        prev = state
        newest = np.asarray(list(far[0][vec_col]), dtype="float64")
        chosen.append(newest)
        state = state.select(
            id_col, vec_col,
            F.least(F.col("__dm"), d2_to(newest)).alias("__dm"))
    if prev is not None:
        prev.unpersist()
    return np.stack(chosen)


def kmeans(df: DataFrame, n_clusters: int = 8,
           vec_col: str = "embedding", id_col: str = "vec_id",
           iters: int = 5, seed: int = 42, init: str = "farthest"):
    """Lloyd's k-means (euclidean) over an ``array<float>`` column.

    Deterministic init, two flavors:

    - ``'farthest'`` (default): maximin farthest-point seeding — k
      one-row TakeOrdered jobs; immune to the split-blob local optimum.
    - ``'hash'``: the ``n_clusters`` vectors with the smallest
      ``xxhash64(id, seed)`` — one job, a reproducible pseudo-random
      sample independent of partitioning; cheaper for large k.

    Each iteration: one distributed assign + one ``(cluster, pos)``
    partial-aggregated mean job (k*dim result rows). Clusters that
    lose all members keep their previous centroid (the standard
    empty-cluster rule). No data rows are ever collected.

    Returns ``(assigned, centroids)``: ``assigned`` is ``df`` plus a
    ``cluster`` int column (computed with the FINAL centroids),
    ``centroids`` the ``k x dim`` numpy array.
    """
    if n_clusters < 1:
        raise ValueError("n_clusters must be >= 1")
    if init not in ("farthest", "hash"):
        raise ValueError(f"unknown init {init!r}")
    # k init jobs + iters assign/update jobs + the final assignment all
    # rescan the input — checkpoint the (narrow) projection once
    base = ensure_parallelism(df).localCheckpoint(eager=False)
    if init == "farthest":
        # the row-count guard lives inside the init's seed collect
        centroids = _farthest_point_init(base, n_clusters, vec_col,
                                         id_col, seed)
    else:
        sample = (base.select(id_col, vec_col)
                  .orderBy(F.xxhash64(F.col(id_col).cast("string"),
                                      F.lit(seed)), F.col(id_col))
                  .limit(n_clusters).collect())
        if len(sample) < n_clusters:
            raise ValueError(
                f"need >= {n_clusters} rows to seed {n_clusters} "
                f"clusters, got {len(sample)}")
        centroids = np.array([list(r[vec_col]) for r in sample],
                             dtype="float64")

    for _ in range(iters):
        # withColumn, then a separate generator select: a posexplode in
        # the same select strips the struct field aliases the argmax
        # lookup needs
        means = (base.withColumn("__c", _assign_expr(centroids, vec_col))
                 .select("__c",
                         F.posexplode(F.col(vec_col)).alias("__pos",
                                                            "__val"))
                 .groupBy("__c", "__pos")
                 .agg(F.avg("__val").alias("__avg"))
                 .collect())  # k x dim rows — metadata-sized
        new = centroids.copy()  # empty clusters keep their centroid
        for r in means:
            new[r["__c"], r["__pos"]] = r["__avg"]
        if np.allclose(new, centroids):
            centroids = new
            break
        centroids = new

    assigned = base.withColumn("cluster",
                               _assign_expr(centroids, vec_col))
    return assigned, centroids


def cluster_report(df: DataFrame, n_clusters: int = 8,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   iters: int = 5, seed: int = 42) -> DataFrame:
    """Per-cluster curation report: size and inertia (sum of squared
    euclidean distance to the centroid — the k-means objective), plus
    the root-mean-square distance. One extra pass over the assigned
    table; distances come from the same JVM dot-product expressions as
    the assignment (no Python).

    Output: (cluster, n, inertia, rms_dist), rounded to 4.
    """
    assigned, centroids = kmeans(df, n_clusters, vec_col, id_col,
                                 iters, seed)
    # one struct-argmax yields BOTH the assignment (cid) and the
    # distance (||x||^2 - 2 * score) — no second bank of dot products;
    # overwriting `cluster` lets Catalyst prune the original column and
    # reuse kmeans' checkpointed lineage
    best = _best_struct(centroids, vec_col)
    x2 = dot(F.col(vec_col), F.col(vec_col))
    scored = (assigned.withColumn("__best", best)
              .withColumn("cluster", F.col("__best.cid")))
    d2 = F.greatest(x2 - 2.0 * F.col("__best.score"),
                    F.lit(0.0))  # clamp float cancellation
    return (scored.select("cluster", d2.alias("__d2"))
            .groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("__d2"), 4).alias("inertia"),
                 F.round(F.sqrt(F.avg("__d2")), 4).alias("rms_dist"))
            .orderBy("cluster"))


def cluster_balanced_sample(df: DataFrame, n_clusters: int = 8,
                            per_cluster: int = 100,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id",
                            iters: int = 5, seed: int = 42) -> DataFrame:
    """Diversity sampling: cluster the corpus, then keep at most
    ``per_cluster`` rows per cluster, chosen by the same deterministic
    ``xxhash64(id, seed)`` order as every other sampler here (stable
    across partitionings and scale factors).

    This is the cluster-balanced mix used to keep a dominant mode
    (boilerplate, one source's house style) from swamping a training
    set. Same window shape as sampling.stratum_cap (one shuffle on the
    cluster id) but ordered by the hash, not the raw id, so the kept
    rows are an unbiased sample of each cluster rather than its oldest
    ids.
    """
    from pyspark.sql import Window

    assigned, _ = kmeans(df, n_clusters, vec_col, id_col, iters, seed)
    w = (Window.partitionBy("cluster")
         .orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)),
                  F.col(id_col)))
    return (assigned.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= per_cluster)
            .drop("__rn"))


def kcenter_select(df: DataFrame, k: int = 8,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id") -> DataFrame:
    """Greedy k-center (farthest-point / "maximin") data selection —
    the coreset construction behind diversity-driven training-data
    selection (Sener & Savarese 2018's k-Center-Greedy): start from
    the lowest-id vector, then repeatedly take the point that
    maximizes the min squared distance to everything selected so far.
    The greedy choice 2-approximates the optimal k-center cover, and
    the per-round max-min distance is the corpus' coverage radius —
    returned so curators can read the diminishing-returns curve and
    stop at the knee.

    Returns ``(sel_order, id, radius)``: selection order (0-based),
    the chosen id, and the squared coverage radius at the moment of
    selection (NULL for the seed row; rounded to 6 like every
    cross-engine float here, and snapped BEFORE the argmax so the
    tie-break — smallest id — is bit-reproducible against the
    unrolled-SQL oracle, `kcenter_coreset` in the registry).

    Scale shape — standard k-center++ bookkeeping: the per-point
    running min-distance is MATERIALIZED (localCheckpoint) once per
    round, so each round computes exactly ONE new dot product per
    point (distance to the newest center) and folds it in with
    ``least`` — true O(k |corpus|) total work, O(1) plan literals
    per round (only the newest center rides in as a broadcast
    literal; a growing ``least(*d2s)`` expression list would be
    O(k²  |corpus|) work and a linearly growing plan). The checkpoint
    also cuts the lineage, so round r's plan never replays rounds
    0..r-1. Nothing but the 1-row argmax ever reaches the driver.
    For the very-large-k regime, pre-reduce with :func:`kmeans` and
    run the greedy over centroids (standard two-level coreset),
    which this composes with directly.

    Numerically identical to folding all k distances in one
    expression: ``least`` is an exact min over floats, so the
    incremental running min equals the batch min bit-for-bit, and
    the round-6 snap still happens AFTER the min / BEFORE the argmax
    (bit-reproducible tie-breaks vs the unrolled-SQL oracle).
    """
    base = df.select(F.col(id_col).alias("id"),
                     F.col(vec_col).alias("v"))
    first = base.orderBy("id").limit(1).collect()
    if not first:
        raise ValueError("cannot select from an empty input")
    spark = df.sparkSession
    seed = np.asarray(list(first[0]["v"]), dtype="float64")
    chosen_ids = {int(first[0]["id"])}
    out = [(0, int(first[0]["id"]), None)]
    x2 = dot(F.col("v"), F.col("v"))

    def d2_to(c: np.ndarray):
        return x2 - 2.0 * dot(F.col("v"), lit_vector(c)) \
            + F.lit(_seq_self_dot(c))

    # running per-point min squared distance to the chosen set, kept
    # RAW (unrounded) so the incremental min matches the batch min;
    # rounded only at argmax time
    state = base.select("id", "v", d2_to(seed).alias("__dm"))
    prev = None
    while len(out) < k:
        # lazy checkpoint: the argmax TakeOrdered scans every
        # partition, so it materializes the round's state AND returns
        # the driver row in ONE job (eager=True paid a separate
        # materialize job per round). prev is released only after the
        # collect — the new state's first computation streams out of
        # prev's blocks.
        state = state.localCheckpoint(eager=False)
        far = (state.select("id", "v",
                            F.round(F.col("__dm"), 6).alias("__d2"))
               .orderBy(F.col("__d2").desc(), F.col("id"))
               .limit(1).collect())[0]
        if prev is not None:
            prev.unpersist()
        prev = state
        if int(far["id"]) in chosen_ids:
            break     # k exceeds the number of distinct points
        out.append((len(out), int(far["id"]), float(far["__d2"])))
        chosen_ids.add(int(far["id"]))
        newest = np.asarray(list(far["v"]), dtype="float64")
        state = state.select(
            "id", "v",
            F.least(F.col("__dm"), d2_to(newest)).alias("__dm"))
    if prev is not None:
        prev.unpersist()
    return spark.createDataFrame(
        out, "sel_order int, id long, radius double")
