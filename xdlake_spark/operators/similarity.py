"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k — one narrow projection + TakeOrdered;
Catalyst never materializes more than k rows per partition. Scale paths:
random-hyperplane LSH bucket search and an IVF-style coarse quantizer
(centroid assignment + nprobe search), both expressible as joins over
bucket keys so a 1000-executor cluster probes only its buckets.

Extends the reference's surface (no similarity ops in xbrianh/xdlake);
mandated by the build brief.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import ensure_parallelism
from ..functions.vectors import (cosine, dot, hyperplane_signature,
                                 lit_double_cube, lit_double_rows,
                                 lit_doubles, lit_vector, norm)


def brute_force_topk(df: DataFrame, query_vec, k: int = 10,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k for one query vector.

    Ties break on id for determinism (oracle-checkable). The plan is
    scan -> project(cosine) -> TakeOrderedAndProject: no shuffle of the
    corpus, only k rows per partition reach the driver-side merge.
    """
    sim = cosine(F.col(vec_col), lit_vector(query_vec))
    return (ensure_parallelism(df)
            .select(F.col(id_col), sim.alias("score"))
            .orderBy(F.col("score").desc(), F.col(id_col))
            .limit(k))


def knn_join(queries: DataFrame, corpus: DataFrame, k: int = 5,
             q_id: str = "q_id", q_vec: str = "q_vec",
             c_id: str = "vec_id", c_vec: str = "embedding") -> DataFrame:
    """For every query vector, its k nearest corpus vectors by cosine.

    The (small) query side is broadcast; the corpus — the 100 TB side —
    streams through executors exactly once. Top-k is two-level: a
    per-(query, input-partition) rank prunes each partition to k rows
    BEFORE the global per-query rank, so the final shuffle carries
    k * n_partitions rows per query instead of the whole scored corpus
    into n_queries reducers.
    """
    q = F.broadcast(queries.select(F.col(q_id).alias("__qid"),
                                   F.col(q_vec).alias("__qvec")))
    joined = ensure_parallelism(corpus.select(F.col(c_id), F.col(c_vec))) \
        .crossJoin(q)
    sim = cosine(F.col(c_vec), F.col("__qvec"))
    scored = joined.select(F.col("__qid").alias(q_id), F.col(c_id),
                           sim.alias("score"),
                           F.spark_partition_id().alias("__part"))
    w_local = Window.partitionBy(q_id, "__part").orderBy(
        F.col("score").desc(), F.col(c_id))
    pruned = (scored.withColumn("__lr", F.row_number().over(w_local))
              .filter(F.col("__lr") <= k))
    w = Window.partitionBy(q_id).orderBy(F.col("score").desc(), F.col(c_id))
    return (pruned.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .drop("__part", "__lr"))


def bitext_margin_mine(src: DataFrame, tgt: DataFrame, k: int = 4,
                       threshold: float = 1.0,
                       src_id: str = "src_id", tgt_id: str = "tgt_id",
                       vec_col: str = "embedding",
                       candidates: DataFrame | None = None) -> DataFrame:
    """Margin-based parallel-corpus mining (Artetxe & Schwenk 2019,
    the LASER/CCMatrix criterion): score every candidate (src, tgt)
    pair by its RATIO margin — cosine divided by the average of the
    two sides' k-NN cosines — and keep mutual-best pairs above
    ``threshold``. Raw cosine thresholds fail on hubness (some
    sentences are near everything); the margin normalizes each pair
    by how promiscuous its endpoints are, which is why it became the
    standard bitext miner.

    ``candidates`` is the scale lever: pass a ``(src_id, tgt_id)``
    DataFrame of ANN candidates (e.g. :func:`ivf_topk` /
    :func:`lsh_topk` unions, as CCMatrix does with FAISS) and the
    k-NN statistics are computed within it; ``None`` scores the full
    cross product — the exact baseline, fine up to ~10^7 pairs.

    Plan: one join (or cross join) produces the scored pair table;
    then exactly THREE exchanges of that table — the forward-rank and
    forward-denominator windows share the src partitioning, the
    backward windows AND the backward-best rank share the tgt
    partitioning (computed adjacently so Catalyst reuses the sort),
    and the forward-best rank re-partitions by src once more. Cosines
    are rounded to 6 decimals before any ranking and margins to 4, so
    every rank, k-NN set, and the final pair set are reproducible on
    any engine.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")

    def unit(df, idc, out):
        # normalize ONCE per vector (a column, so the fold runs once
        # per row), not once per pair: the pair scorer is then a bare
        # dot product — a third of the per-pair flops and exactly the
        # arithmetic any engine reproduces (sequential folds)
        n = F.greatest(norm(F.col(vec_col)), F.lit(1e-12))
        return (df.withColumn("__n", n)
                .select(F.col(idc),
                        F.transform(vec_col,
                                    lambda x: x.cast("double")
                                    / F.col("__n")).alias(out)))

    s = unit(src, src_id, "__sv")
    t = unit(tgt, tgt_id, "__tv")
    if candidates is None:
        pairs = ensure_parallelism(s).crossJoin(t)
    else:
        pairs = (candidates.select(src_id, tgt_id)
                 .join(s, src_id).join(t, tgt_id))
    scored = pairs.select(
        src_id, tgt_id,
        F.round(dot(F.col("__sv"), F.col("__tv")), 6).alias("cos"))
    wsrc = Window.partitionBy(src_id)
    wtgt = Window.partitionBy(tgt_id)
    fwd = wsrc.orderBy(F.col("cos").desc(), tgt_id)
    bwd = wtgt.orderBy(F.col("cos").desc(), src_id)
    withden = (scored
               .withColumn("__rf", F.row_number().over(fwd))
               .withColumn("__df", F.avg(F.when(F.col("__rf") <= k,
                                                F.col("cos"))).over(wsrc))
               .withColumn("__rb", F.row_number().over(bwd))
               .withColumn("__db", F.avg(F.when(F.col("__rb") <= k,
                                                F.col("cos"))).over(wtgt))
               .withColumn("margin", F.round(
                   F.col("cos") / F.greatest(
                       (F.col("__df") + F.col("__db")) / 2,
                       F.lit(1e-9)), 4)))
    bb = wtgt.orderBy(F.col("margin").desc(), src_id)
    bf = wsrc.orderBy(F.col("margin").desc(), tgt_id)
    return (withden
            .withColumn("__bb", F.row_number().over(bb))
            .withColumn("__bf", F.row_number().over(bf))
            .filter((F.col("__bf") == 1) & (F.col("__bb") == 1)
                    & (F.col("margin") >= threshold))
            .select(src_id, tgt_id, "margin"))


def lsh_topk(df: DataFrame, query_vec, k: int = 10, dim: int = 64,
             n_planes: int = 8, seed: int = 42,
             vec_col: str = "embedding", id_col: str = "vec_id",
             multiprobe: int = 1) -> DataFrame:
    """Approximate top-k: search only vectors whose hyperplane signature
    matches the query's, plus the ``multiprobe-1`` next-likeliest
    buckets.

    Probe order is the classic multi-probe LSH sequence: buckets ranked
    by the total margin of the flipped hyperplanes (a neighbor most
    likely lands across the planes the query sits closest to), covering
    multi-bit flips — so ``multiprobe`` can be raised smoothly all the
    way to 2^n_planes (exhaustive = exact). At scale the signature is a
    partition key: the probe touches ~multiprobe/2^n_planes of the
    corpus.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    qv = np.asarray(query_vec, dtype="float64")
    qbits = [(int(np.dot(qv, p) >= 0)) for p in planes]

    def sig_str(bits) -> str:
        return "".join(str(b) for b in bits)

    probes = {sig_str(qbits)}
    if multiprobe > 1:
        margins = np.abs(planes @ qv)
        # enumerate flip sets cheapest-total-margin first (n_planes is
        # small — <= 20 — so 2^n driver-side enumeration is fine; for
        # larger n use the heap-based incremental sequence)
        costs = []
        for mask in range(1, 1 << n_planes):
            cost = sum(margins[j] for j in range(n_planes)
                       if mask >> j & 1)
            costs.append((cost, mask))
        for _, mask in sorted(costs)[:multiprobe - 1]:
            flipped = [b ^ (mask >> j & 1) for j, b in enumerate(qbits)]
            probes.add(sig_str(flipped))

    sig = hyperplane_signature(F.col(vec_col), planes)
    cand = (ensure_parallelism(df).withColumn("__sig", sig)
            .filter(F.col("__sig").isin(*probes)))
    sim = cosine(F.col(vec_col), lit_vector(query_vec))
    return (cand.select(F.col(id_col), sim.alias("score"))
            .orderBy(F.col("score").desc(), F.col(id_col))
            .limit(k))


def ivf_build(df: DataFrame, n_centroids: int = 16,
              vec_col: str = "embedding", id_col: str = "vec_id",
              seed: int = 42, lloyd_iters: int = 2):
    """IVF coarse quantizer: deterministic sample vectors seed the
    centroids, then ``lloyd_iters`` k-means refinements (each one
    distributed assign + per-centroid mean job; only the k x dim
    centroid matrix ever reaches the driver) before the final
    assignment. Refined centroids balance the inverted lists, which is
    what bounds probe fan-out at scale.

    Returns (assigned_df with ``__centroid`` column, centroids ndarray).
    At scale, write the assigned table partitioned by ``__centroid`` so
    each probe is a partition-pruned scan.
    """
    sample = (df.select(id_col, vec_col)
              .orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)))
              .limit(n_centroids).collect())
    centroids = np.array([list(r[vec_col]) for r in sample], dtype="float64")

    def normalize(m):
        return m / np.clip(np.linalg.norm(m, axis=1, keepdims=True),
                           1e-12, None)

    centroids = normalize(centroids)
    base = ensure_parallelism(df)

    def assign(cents):
        # argmax via array_max over (score, cid) structs — one
        # transform over the centroid matrix literal (constant py4j
        # lambda count; same sequential dot arithmetic)
        cl = lit_double_rows(cents)
        scored = F.transform(cl, lambda c, i: F.struct(
            F.aggregate(F.zip_with(F.col(vec_col), c,
                                   lambda a, b: a.cast("double")
                                   * b.cast("double")),
                        F.lit(0.0),
                        lambda acc, x: acc + x).alias("score"),
            i.alias("cid")))
        return base.withColumn("__centroid", F.array_max(scored)["cid"])

    for _ in range(lloyd_iters):
        means = (assign(centroids)
                 .select("__centroid",
                         F.posexplode(F.col(vec_col))
                         .alias("__pos", "__val"))
                 .groupBy("__centroid", "__pos")
                 .agg(F.avg("__val").alias("__avg"))
                 .collect())
        new = centroids.copy()
        by_c: dict[int, dict[int, float]] = {}
        for r in means:
            by_c.setdefault(r["__centroid"], {})[r["__pos"]] = r["__avg"]
        for ci, dims in by_c.items():
            for pos, v in dims.items():
                new[ci, pos] = v
        centroids = normalize(new)

    return assign(centroids), centroids


def ivf_topk(assigned: DataFrame, centroids, query_vec, k: int = 10,
             nprobe: int = 4, vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """Search the ``nprobe`` centroids nearest the query; exact cosine
    within those inverted lists only."""
    qv = np.asarray(query_vec, dtype="float64")
    qn = qv / max(np.linalg.norm(qv), 1e-12)
    order = np.argsort(-(centroids @ qn))
    probe_ids = [int(c) for c in order[:nprobe]]
    cand = assigned.filter(F.col("__centroid").isin(probe_ids))
    sim = cosine(F.col(vec_col), lit_vector(query_vec))
    return (cand.select(F.col(id_col), sim.alias("score"))
            .orderBy(F.col("score").desc(), F.col(id_col))
            .limit(k))


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-bound ANN scale path
# ---------------------------------------------------------------------------

def pq_train(df: DataFrame, m: int = 8, n_codes: int = 16,
             vec_col: str = "embedding", id_col: str = "vec_id",
             sample_size: int = 2048, iters: int = 10,
             seed: int = 42) -> np.ndarray:
    """Train per-subspace PQ codebooks (Jegou et al. 2011).

    The vector dimension is split into ``m`` contiguous subspaces and
    each gets an ``n_codes``-centroid k-means codebook, trained on a
    deterministic hash-ordered sample (bounded driver transfer:
    ``sample_size`` rows regardless of corpus size — at 100 TB the
    codebooks still train on the same few thousand vectors, which is
    the standard PQ recipe; encoding, the linear-cost step, stays
    distributed). Returns an ``(m, n_codes, subdim)`` float64 array.
    """
    dim_row = df.select(F.size(vec_col).alias("d")).first()
    if dim_row is None:
        raise ValueError("cannot train PQ on an empty DataFrame")
    dim = dim_row["d"]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sub = dim // m
    rows = (df.select(id_col, vec_col)
            .orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)),
                     F.col(id_col))
            .limit(sample_size).collect())
    X = np.array([list(r[vec_col]) for r in rows], dtype="float64")
    if len(X) < n_codes:
        raise ValueError(f"need >= {n_codes} sample vectors, got {len(X)}")
    return _pq_fit(X, m, n_codes, iters)


def _pq_fit(X: np.ndarray, m: int, n_codes: int,
            iters: int) -> np.ndarray:
    """Per-subspace k-means codebook fit on a driver-held sample —
    the numpy core shared by :func:`pq_train` and :func:`opq_train`.
    Deterministic seeding: first ``n_codes`` DISTINCT subvectors in
    the (hash-shuffled) sample order."""
    sub = X.shape[1] // m
    books = np.empty((m, n_codes, sub), dtype="float64")
    for j in range(m):
        S = X[:, j * sub:(j + 1) * sub]
        seen, init = set(), []
        for v in S:
            t = tuple(v)
            if t not in seen:
                seen.add(t)
                init.append(v)
            if len(init) == n_codes:
                break
        C = np.array(init + [S[i % len(S)]
                             for i in range(n_codes - len(init))])
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            newC = C.copy()
            for c in range(n_codes):
                mask = a == c
                if mask.any():
                    newC[c] = S[mask].mean(axis=0)
            if np.allclose(newC, C):
                break
            C = newC
        books[j] = C
    return books


def _pq_reconstruct(Y: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Encode-then-decode a sample against fitted codebooks (numpy,
    driver-side) — the OPQ inner loop's quantization step."""
    m, n_codes, sub = books.shape
    out = np.empty_like(Y)
    for j in range(m):
        S = Y[:, j * sub:(j + 1) * sub]
        d2 = ((S[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        out[:, j * sub:(j + 1) * sub] = books[j][d2.argmin(axis=1)]
    return out


def pq_encode(df: DataFrame, codebooks: np.ndarray,
              vec_col: str = "embedding",
              code_col: str = "codes") -> DataFrame:
    """Attach the ``m``-byte PQ code array to every row.

    Pure JVM expression: per subspace, argmin over ``n_codes`` centroid
    distances via the ``array_max``-over-structs trick on a sliced
    vector (same codegen shape as clustering._best_struct — no Python
    in the row path, no shuffle; the encoded table is what you persist,
    at m bytes/vector instead of 4*dim).
    """
    m, n_codes, sub = codebooks.shape

    def seq_dot(c):
        total = 0.0
        for v in c:
            total += float(v) * float(v)
        return total

    # One transform-with-index per subspace over a 2-D codebook
    # LITERAL (argmax of s.c - |c|^2/2 == argmin distance): constant
    # lambda count per subspace. The naive per-code struct build cost
    # ~256 py4j lambda conversions — multiple SECONDS of driver time
    # before any job ran.
    # the WHOLE m-subspace encode is one nested-transform expression
    # over 3-D/2-D literals: a constant handful of lambda conversions
    # at plan-build time (the per-code struct build cost ~256 py4j
    # round-trips — seconds of driver latency before any job ran).
    # Runtime is the same interpreted-HOF class the per-code dots
    # already were; bytes scanned and rows moved are unchanged.
    cb3 = lit_double_cube(codebooks)
    halves2 = lit_double_rows([[seq_dot(c) / 2.0 for c in codebooks[j]]
                               for j in range(m)])

    codes = F.transform(F.lit(list(range(m))),
                        lambda j: F.array_max(F.transform(
                            F.element_at(cb3, j + 1),
                            lambda c, i: F.struct(
                                (F.aggregate(
                                    F.zip_with(
                                        F.slice(F.col(vec_col),
                                                j * sub + 1, sub),
                                        c,
                                        lambda a, b:
                                        a.cast("double") * b),
                                    F.lit(0.0),
                                    lambda acc, x: acc + x)
                                 - F.element_at(
                                     F.element_at(halves2, j + 1),
                                     i + 1)).alias("score"),
                                i.alias("cid"))))["cid"].cast("int"))
    return df.withColumn(code_col, codes)


def pq_topk(encoded: DataFrame, codebooks: np.ndarray, query_vec,
            k: int = 10, id_col: str = "vec_id",
            code_col: str = "codes", vec_col: str | None = None,
            oversample: int = 4) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes.

    The driver precomputes the ``m x n_codes`` table of squared
    distances from the query's subvectors to every centroid; executors
    score each row with m array lookups + a sum (no vector arithmetic,
    no decode), then TakeOrdered keeps k rows per partition. This is
    the plan whose scan cost is bytes-of-codes, not bytes-of-vectors —
    the reason PQ survives a 100 TB corpus on a fixed memory budget.

    When ``vec_col`` is given, the standard shortlist+re-rank refinement
    runs: ADC keeps ``k * oversample`` candidates (still TakeOrdered —
    only that many full vectors are ever touched again), then exact
    squared euclidean re-ranks the shortlist. Output column is
    ``adc_dist`` either way (exact distance when re-ranked).
    """
    m, n_codes, sub = codebooks.shape
    q = np.asarray(query_vec, dtype="float64")
    if q.shape[0] != m * sub:
        raise ValueError(f"query dim {q.shape[0]} != {m * sub}")
    tables = ((q.reshape(m, 1, sub) - codebooks) ** 2).sum(axis=2)
    adc = None
    for j in range(m):
        t = lit_doubles(tables[j])
        term = F.element_at(t, F.col(code_col)[j] + 1)
        adc = term if adc is None else adc + term
    base = ensure_parallelism(encoded)
    if vec_col is None:
        return (base
                .select(F.col(id_col), F.round(adc, 6).alias("adc_dist"))
                .orderBy(F.col("adc_dist").asc(), F.col(id_col))
                .limit(k))
    qlit = lit_doubles(q)
    exact = F.aggregate(
        F.zip_with(F.col(vec_col), qlit,
                   lambda a, b: (a.cast("double") - b)
                   * (a.cast("double") - b)),
        F.lit(0.0), lambda acc, x: acc + x)
    shortlist = (base
                 .select(F.col(id_col), F.col(vec_col),
                         F.round(adc, 6).alias("__adc"))
                 .orderBy(F.col("__adc").asc(), F.col(id_col))
                 .limit(k * oversample))
    return (shortlist
            .select(F.col(id_col), F.round(exact, 6).alias("adc_dist"))
            .orderBy(F.col("adc_dist").asc(), F.col(id_col))
            .limit(k))


# ---------------------------------------------------------------------------
# OPQ — optimized product quantization (learned rotation, Ge et al. 2013)
# ---------------------------------------------------------------------------

def opq_train(df: DataFrame, m: int = 8, n_codes: int = 16,
              vec_col: str = "embedding", id_col: str = "vec_id",
              sample_size: int = 2048, iters: int = 10,
              opq_iters: int = 8, seed: int = 42):
    """Train OPQ (the non-parametric alternation of Ge et al. 2013):
    a learned ORTHOGONAL rotation ``R`` is fit jointly with the PQ
    codebooks so the subspace split stops fighting correlated
    dimensions — plain PQ quantizes each contiguous dim-block
    independently and pays dearly when variance concentrates across
    blocks; OPQ rotates variance into balance first and typically
    halves the quantization error on anisotropic embeddings (pinned
    against plain PQ in tests).

    Alternation on the same bounded driver sample ``pq_train`` uses
    (corpus-size-independent — the standard recipe): rotate with the
    current ``R``, fit codebooks (:func:`_pq_fit`), reconstruct, then
    solve the Procrustes step ``min_R ||X R - X_hat||`` in closed form
    via one d x d SVD. ``R`` is seeded with the sample's PCA basis
    (already variance-balancing), so a handful of iterations
    converge. Returns ``(R, codebooks)`` with ``R`` of shape (d, d)
    applied as ``x @ R``.
    """
    rows = (df.select(id_col, vec_col)
            .orderBy(F.xxhash64(F.col(id_col).cast("string"),
                                F.lit(seed)), F.col(id_col))
            .limit(sample_size).collect())
    X = np.array([list(r[vec_col]) for r in rows], dtype="float64")
    if len(X) < n_codes:
        raise ValueError(
            f"need >= {n_codes} sample vectors, got {len(X)}")
    d = X.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    # PCA init: eigenvectors of the sample covariance, deterministic
    # sign, padded to a full orthogonal basis by construction of eigh
    mu = X.mean(axis=0)
    cov = (X - mu).T @ (X - mu) / max(len(X), 1)
    w, V = np.linalg.eigh((cov + cov.T) / 2.0)
    R = V[:, np.argsort(w)[::-1]]
    for j in range(d):
        i = int(np.argmax(np.abs(R[:, j])))
        if R[i, j] < 0:
            R[:, j] = -R[:, j]
    books = None
    for _ in range(opq_iters):
        Y = X @ R
        books = _pq_fit(Y, m, n_codes, iters)
        Yh = _pq_reconstruct(Y, books)
        # Procrustes: argmin_R ||X R - Yh||_F over orthogonal R
        U, _s, Vt = np.linalg.svd(X.T @ Yh)
        R_new = U @ Vt
        if np.allclose(R_new, R, atol=1e-10):
            R = R_new
            break
        R = R_new
    Y = X @ R
    books = _pq_fit(Y, m, n_codes, iters)
    return R, books


def _rotate_expr(R: np.ndarray, vec_col: str):
    """``x @ R`` as ONE transform over the rotation's columns as a
    2-D literal — d JVM dot products at runtime, constant lambda
    count at plan-build time (d separate zip_with dots cost seconds
    of py4j round-trips before any job ran)."""
    cols = lit_double_rows(np.asarray(R, dtype="float64").T)
    return F.transform(cols, lambda c: F.aggregate(
        F.zip_with(F.col(vec_col), c,
                   lambda a, b: a.cast("double") * b),
        F.lit(0.0), lambda acc, x: acc + x))


def opq_encode(df: DataFrame, R: np.ndarray, codebooks: np.ndarray,
               vec_col: str = "embedding",
               code_col: str = "codes") -> DataFrame:
    """Rotate (JVM dots, no shuffle, no Python) then PQ-encode —
    the persisted index is still m bytes per vector."""
    # barrier for the same reason as ivfpq_build: the d rotation dots
    # must materialize once, not re-inline into every encode term
    rotated = df.withColumn("__rot", _rotate_expr(R, vec_col)) \
        .localCheckpoint(eager=False)
    return pq_encode(rotated, codebooks, vec_col="__rot",
                     code_col=code_col).drop("__rot")


def opq_topk(encoded: DataFrame, R: np.ndarray,
             codebooks: np.ndarray, query_vec, k: int = 10,
             id_col: str = "vec_id", code_col: str = "codes",
             vec_col: str | None = None,
             oversample: int = 4) -> DataFrame:
    """ADC search in the rotated space: rotation is orthogonal, so
    distances are preserved and the query simply rotates driver-side
    before the standard :func:`pq_topk` scan. With ``vec_col``, the
    exact re-rank runs on the ORIGINAL vectors (rotating the query
    back is free; rotating every candidate is not)."""
    q = np.asarray(query_vec, dtype="float64")
    qr = q @ np.asarray(R, dtype="float64")
    if vec_col is None:
        return pq_topk(encoded, codebooks, qr, k=k, id_col=id_col,
                       code_col=code_col)
    # shortlist by rotated ADC, then exact euclidean on the raw
    # vectors (orthogonal R preserves the metric, so the ordering is
    # the same as re-ranking in rotated space)
    m, n_codes, sub = codebooks.shape
    tables = ((qr.reshape(m, 1, sub) - codebooks) ** 2).sum(axis=2)
    adc = None
    for j in range(m):
        t = lit_doubles(tables[j])
        term = F.element_at(t, F.col(code_col)[j] + 1)
        adc = term if adc is None else adc + term
    base = ensure_parallelism(encoded)
    qlit = lit_doubles(q)
    qq = float(q @ q)
    exact = (dot(F.col(vec_col), F.col(vec_col))
             - 2.0 * dot(F.col(vec_col), qlit) + F.lit(qq))
    shortlist = (base
                 .select(F.col(id_col), F.col(vec_col),
                         F.round(adc, 6).alias("__adc"))
                 .orderBy(F.col("__adc").asc(), F.col(id_col))
                 .limit(k * oversample))
    return (shortlist
            .select(F.col(id_col), F.round(exact, 6).alias("adc_dist"))
            .orderBy(F.col("adc_dist").asc(), F.col(id_col))
            .limit(k))


# ---------------------------------------------------------------------------
# Distributed PCA — embedding compression / whitening
# ---------------------------------------------------------------------------

def pca_train(df: DataFrame, k: int = 16, vec_col: str = "embedding",
              center: bool = True):
    """Distributed PCA over an ``array<float>`` column.

    ONE Spark job computes the exact first and second moments: an
    Arrow-batched ``mapInPandas`` emits each batch's count, d-vector
    sum and flattened d x d cross-product matrix as ``(pos, val)``
    pairs, and a map-side-combinable ``groupBy(pos).sum`` reduces them
    — the driver receives exactly ``d^2 + d + 1`` rows no matter how
    many vectors the corpus holds (64-dim: 4161 doubles). The d x d
    eigendecomposition runs on the driver; state is O(d^2),
    row-count-independent — the textbook moment-sketch PCA, the same
    shape at 100 TB.

    Eigenvectors come back variance-descending with a deterministic
    sign (the largest-magnitude coefficient is positive), so retrains
    are reproducible. Returns ``(mean, eigvals, components)`` with
    ``components`` shaped ``(k, d)``.
    """
    probe = df.select(F.size(vec_col).alias("d")).first()
    if probe is None:
        raise ValueError("cannot train PCA on an empty DataFrame")
    d = probe["d"]
    if not 1 <= k <= d:
        raise ValueError(f"k={k} out of range for dim {d}")

    def moments(batches):
        for pdf in batches:
            X = np.array(pdf[vec_col].tolist(), dtype="float64")
            if not len(X):
                continue
            out = np.empty(d * d + d + 1)
            out[0] = len(X)
            out[1:d + 1] = X.sum(axis=0)
            out[d + 1:] = (X.T @ X).ravel()
            yield pd.DataFrame({"pos": np.arange(d * d + d + 1),
                                "val": out})

    rows = (ensure_parallelism(df).select(vec_col)
            .mapInPandas(moments, "pos long, val double")
            .groupBy("pos").agg(F.sum("val").alias("val"))
            .collect())
    acc = np.zeros(d * d + d + 1)
    for r in rows:
        acc[r["pos"]] = r["val"]
    n = acc[0]
    if n < 2:
        raise ValueError("need >= 2 vectors to train PCA")
    mean = acc[1:d + 1] / n
    second = acc[d + 1:].reshape(d, d) / n
    cov = second - np.outer(mean, mean) if center else second
    eigvals, eigvecs = np.linalg.eigh((cov + cov.T) / 2.0)
    order = np.argsort(eigvals)[::-1][:k]
    vals = eigvals[order]
    comps = eigvecs[:, order].T.copy()
    for j in range(len(comps)):
        i = int(np.argmax(np.abs(comps[j])))
        if comps[j, i] < 0:
            comps[j] = -comps[j]
    if not center:
        mean = np.zeros(d)
    return mean, vals, comps


def pca_project(df: DataFrame, mean, eigvals, components,
                vec_col: str = "embedding", out_col: str = "pca",
                whiten: bool = False) -> DataFrame:
    """Attach the k-dim PCA projection ``(x - mean) @ components.T``
    as an array column — k JVM ``zip_with/aggregate`` dot products
    against broadcast component literals, with the mean's contribution
    folded into a per-component scalar on the driver. No Python in
    the row path, no shuffle; ``whiten=True`` scales each coordinate
    by ``1/sqrt(eigval)`` (unit-variance output, the OPQ/ZCA
    preprocessing step)."""
    comps = np.asarray(components, dtype="float64")
    mu = np.asarray(mean, dtype="float64")
    vals = np.asarray(eigvals, dtype="float64")
    offs = comps @ mu
    scale = 1.0 / np.sqrt(np.clip(vals, 1e-12, None)) if whiten \
        else np.ones(len(comps))
    terms = [((dot(F.col(vec_col), lit_vector(c)) - F.lit(float(o)))
              * F.lit(float(s)))
             for c, o, s in zip(comps, offs, scale)]
    return df.withColumn(out_col, F.array(*terms))


# ---------------------------------------------------------------------------
# IVF-PQ — inverted lists over residual product codes (Jegou et al. 2011 §V)
# ---------------------------------------------------------------------------

def ivfpq_build(df: DataFrame, n_centroids: int = 16, m: int = 8,
                n_codes: int = 16, vec_col: str = "embedding",
                id_col: str = "vec_id", seed: int = 42,
                lloyd_iters: int = 2):
    """Build the combined IVF-PQ index: the IVF coarse quantizer
    assigns each vector to an inverted list, then PQ codebooks are
    trained and applied on the RESIDUAL (vector minus its list's
    centroid) — the Jegou et al. 2011 IVFADC layout. Residual
    encoding is what makes small codebooks sharp: residuals are
    centered near zero, so the same 4-bit-per-subspace budget spends
    its codes where the data actually is.

    The residual subtraction is a pure JVM ``zip_with`` against the
    row's centroid (looked up in a broadcast k x dim literal — no
    shuffle, no Python); codebook training samples a bounded
    ``pq_train`` set. Persist the returned table partitioned by
    ``__centroid`` and a probe becomes a partition-pruned scan of
    m-byte codes — the index whose 100 TB cost is
    bytes-of-codes * nprobe / n_centroids.

    Returns ``(encoded_df, centroids, codebooks)`` where encoded_df
    carries ``__centroid`` and ``codes`` next to the original columns.
    """
    assigned, centroids = ivf_build(
        df, n_centroids=n_centroids, vec_col=vec_col, id_col=id_col,
        seed=seed, lloyd_iters=lloyd_iters)
    cent_lit = lit_double_rows(centroids)
    resid = assigned.withColumn(
        "__resid",
        F.zip_with(F.col(vec_col),
                   F.element_at(cent_lit, F.col("__centroid") + 1),
                   lambda a, b: a.cast("double") - b))
    # materialization barrier: Catalyst collapses projections and does
    # not CSE inside higher-order functions, so without it the residual
    # zip_with would be re-inlined into every one of the m x n_codes
    # encode terms (128x recompute per row + a codegen blowup measured
    # in tens of seconds of compile time). One pass over the residuals
    # is the cheap side of that trade at any scale.
    resid = resid.localCheckpoint(eager=False)
    books = pq_train(resid, m=m, n_codes=n_codes, vec_col="__resid",
                     id_col=id_col, seed=seed)
    encoded = pq_encode(resid, books, vec_col="__resid") \
        .drop("__resid")
    return encoded, centroids, books


def ivfpq_topk(encoded: DataFrame, centroids: np.ndarray,
               codebooks: np.ndarray, query_vec, k: int = 10,
               nprobe: int = 4, id_col: str = "vec_id",
               code_col: str = "codes", vec_col: str | None = None,
               oversample: int = 4) -> DataFrame:
    """IVFADC search: probe the ``nprobe`` inverted lists whose
    centroids are nearest the query, then score candidates by
    asymmetric distance — per probed list the driver precomputes the
    ``m x n_codes`` table of squared distances from the QUERY
    RESIDUAL (query minus that list's centroid) to every codebook
    centroid, and executors sum m table lookups per row. The scan
    touches only probed lists and only code bytes; no vector
    arithmetic, no Python, no shuffle — TakeOrdered keeps k.

    With ``vec_col``, the standard shortlist + exact re-rank runs:
    ADC keeps ``k * oversample`` rows, exact squared euclidean
    (``|x|^2 - 2 x.q + |q|^2``, the oracle-aligned accumulation)
    re-orders them. Output column ``adc_dist`` either way.
    """
    m, n_codes, sub = codebooks.shape
    q = np.asarray(query_vec, dtype="float64")
    if q.shape[0] != m * sub:
        raise ValueError(f"query dim {q.shape[0]} != {m * sub}")
    qn = q / max(np.linalg.norm(q), 1e-12)
    order = np.argsort(-(centroids @ qn))
    probe_ids = [int(c) for c in order[:nprobe]]

    adc = None
    for cid in probe_ids:
        qres = q - centroids[cid]
        tables = ((qres.reshape(m, 1, sub) - codebooks) ** 2) \
            .sum(axis=2)
        term = None
        for j in range(m):
            t = lit_doubles(tables[j])
            lk = F.element_at(t, F.col(code_col)[j] + 1)
            term = lk if term is None else term + lk
        cond = F.col("__centroid") == cid
        adc = F.when(cond, term) if adc is None \
            else adc.when(cond, term)
    base = ensure_parallelism(
        encoded.filter(F.col("__centroid").isin(probe_ids)))
    if vec_col is None:
        return (base
                .select(F.col(id_col), F.round(adc, 6).alias("adc_dist"))
                .orderBy(F.col("adc_dist").asc(), F.col(id_col))
                .limit(k))
    qlit = lit_doubles(q)
    qq = float(q @ q)
    exact = (dot(F.col(vec_col), F.col(vec_col))
             - 2.0 * dot(F.col(vec_col), qlit) + F.lit(qq))
    shortlist = (base
                 .select(F.col(id_col), F.col(vec_col),
                         F.round(adc, 6).alias("__adc"))
                 .orderBy(F.col("__adc").asc(), F.col(id_col))
                 .limit(k * oversample))
    return (shortlist
            .select(F.col(id_col), F.round(exact, 6).alias("adc_dist"))
            .orderBy(F.col("adc_dist").asc(), F.col(id_col))
            .limit(k))


# ---------------------------------------------------------------------------
# Scalar quantization (SQ-int8) — the simplest compressed-scan ANN tier
# ---------------------------------------------------------------------------

def sq_train(df: DataFrame, vec_col: str = "embedding") -> np.ndarray:
    """Per-dimension (lo, hi) bounds for uint8 scalar quantization —
    one posexplode + partial-aggregated min/max groupBy whose result is
    2 x dim driver floats regardless of corpus size (min/max are
    order-insensitive, so the bounds are exactly reproducible by any
    engine). Returns a ``(2, dim)`` float64 array."""
    rows = (df.select(F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("pos")
            .agg(F.min(F.col("x").cast("double")).alias("lo"),
                 F.max(F.col("x").cast("double")).alias("hi"))
            .orderBy("pos").collect())
    if not rows:
        raise ValueError("cannot train SQ bounds on an empty input")
    return np.array([[r["lo"] for r in rows],
                     [r["hi"] for r in rows]], dtype="float64")


def sq_encode(df: DataFrame, bounds: np.ndarray,
              vec_col: str = "embedding",
              code_col: str = "sq_codes") -> DataFrame:
    """Attach the uint8 code array: ``floor((x - lo) * 255/(hi - lo)
    + 0.5)`` clamped to [0, 255] (floor, not round: floor is
    bit-identical across engines; a constant dimension encodes 0).
    Pure JVM zip_with expressions — no Python, no shuffle; the encoded
    table persists at 1 byte/dim instead of 4."""
    lo, hi = bounds[0], bounds[1]
    span = hi - lo
    scale = np.where(span > 0, 255.0 / np.where(span > 0, span, 1.0),
                     0.0)
    shifted = F.zip_with(F.col(vec_col), lit_vector(lo),
                         lambda x, l: x.cast("double") - l)
    codes = F.zip_with(
        shifted, lit_vector(scale),
        lambda d, s: F.least(
            F.lit(255),
            F.greatest(F.lit(0),
                       F.floor(d * s + F.lit(0.5)).cast("int"))))
    return df.withColumn(code_col, codes)


def sq_topk(encoded: DataFrame, bounds: np.ndarray, query_vec,
            k: int = 10, id_col: str = "vec_id",
            code_col: str = "sq_codes", vec_col: "str | None" = None,
            oversample: int = 4) -> DataFrame:
    """Asymmetric top-k over SQ codes: each row reconstructs
    ``lo + code * span/255`` per dimension (two zip_with passes) and
    takes the sequential dot with the query — the same left-to-right
    fold DuckDB's list_inner_product runs, so the APPROXIMATE path is
    itself oracle-exact (`similarity_sq_topk`), unusual for ANN. The
    scan reads 1 byte/dim; TakeOrdered keeps k rows per partition.

    With ``vec_col``, the standard shortlist + exact-cosine re-rank
    refinement runs on ``k * oversample`` candidates (recall-gated in
    tests like IVF/PQ). Output: ``(id, score)`` — approximate
    reconstruction dot, or exact cosine when re-ranked."""
    lo, hi = bounds[0], bounds[1]
    span = hi - lo
    step = np.where(span > 0, span / 255.0, 0.0)
    q = np.asarray(query_vec, dtype="float64")
    recon = F.zip_with(
        F.zip_with(F.col(code_col), lit_vector(step),
                   lambda c, s: c.cast("double") * s),
        lit_vector(lo), lambda d, l: d + l)
    approx = dot(recon, lit_vector(q))
    base = ensure_parallelism(encoded)
    if vec_col is None:
        # order by the FULL-precision reconstruction dot (matching the
        # oracle's ORDER BY) and round only the projected column — two
        # candidates within 5e-5 at the k boundary must not flip sets
        return (base.select(F.col(id_col), approx.alias("__s"))
                .orderBy(F.col("__s").desc(), F.col(id_col))
                .limit(k)
                .select(F.col(id_col), F.round("__s", 4).alias("score")))
    shortlist = (base.select(F.col(id_col), F.col(vec_col),
                             approx.alias("__a"))
                 .orderBy(F.col("__a").desc(), F.col(id_col))
                 .limit(k * oversample))
    exact = cosine(F.col(vec_col), lit_vector(q))
    return (shortlist.select(F.col(id_col), exact.alias("__s"))
            .orderBy(F.col("__s").desc(), F.col(id_col))
            .limit(k)
            .select(F.col(id_col), F.round("__s", 4).alias("score")))
