"""Mergeable sketch operators: approximate heavy hitters.

At 100 TB the full-cardinality ``groupBy(term).count()`` behind "top
terms" shuffles billions of distinct keys; a Misra-Gries summary per
partition shuffles ``cap`` rows per partition instead, with the classic
deterministic guarantee (Misra & Gries 1982; merge soundness per
Agarwal et al., "Mergeable Summaries", PODS 2012 — both public):

- every item with true count > n / cap survives;
- each estimate undercounts by at most the summary's tracked error
  (``max_err`` column), never overcounts.

The exact companion query (full groupBy) doubles as the correctness
gate in tests and the DuckDB oracle at test scale.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MG_SCHEMA = T.StructType([
    T.StructField("term", T.StringType()),
    T.StructField("est_count", T.LongType()),
    T.StructField("err", T.LongType()),
])


def _mg_reduce(counts: pd.Series, cap: int) -> tuple[pd.Series, int]:
    """Shrink a term->count series to at most ``cap`` entries by the
    Misra-Gries rule: subtract the (cap+1)-th largest count from all,
    drop non-positive. Returns (summary, amount subtracted)."""
    if len(counts) <= cap:
        return counts, 0
    t = int(counts.nlargest(cap + 1).iloc[-1])
    out = counts - t
    return out[out > 0], t


def heavy_hitters(df: DataFrame, term_col: str, k: int = 50,
                  cap: int = 4096) -> DataFrame:
    """Approximate top-``k`` most frequent values of ``term_col``.

    One Arrow-batched pass builds a capacity-``cap`` Misra-Gries
    summary per partition (vectorized: per-batch ``value_counts``
    merged under the MG reduction — error-equivalent to the row-by-row
    algorithm); summaries merge with a single ``cap``-bounded shuffle
    (term-sum of estimates, term-max never needed — errors ADD across
    summaries, tracked in ``err``). Returns
    ``(term, est_count, max_err)`` for the top k by estimate, ordered
    by (est_count desc, term). True counts lie in
    ``[est_count, est_count + max_err]``.
    """
    cap = int(cap)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts = pd.Series(dtype="int64")
        err = 0
        for pdf in batches:
            vc = pdf[term_col].dropna().value_counts()
            counts = counts.add(vc, fill_value=0).astype("int64")
            counts, sub = _mg_reduce(counts, cap)
            err += sub
        if counts.empty and err == 0:
            return
        out = counts.reset_index()
        out.columns = ["term", "est_count"]
        out["term"] = out["term"].astype(str)
        out["err"] = err
        yield out

    partials = (df.select(F.col(term_col).cast("string").alias(term_col))
                .mapInPandas(run, schema=_MG_SCHEMA)
                .withColumn("__p", F.spark_partition_id())
                # feeds both the merge and the error total: evaluate the
                # summaries once
                .localCheckpoint(eager=False))
    # total error bound = sum of every partition's subtracted amount
    # (a term absent from one summary may have lost up to that
    # summary's err) — one broadcast scalar
    errs = (partials.groupBy("__p")
            .agg(F.max("err").alias("e"))
            .agg(F.coalesce(F.sum("e"), F.lit(0)).alias("max_err")))
    merged = (partials.groupBy("term")
              .agg(F.sum("est_count").alias("est_count")))
    return (merged.join(F.broadcast(errs))
            .orderBy(F.col("est_count").desc(), "term")
            .limit(k)
            .select("term", "est_count", "max_err"))


# --------------------------------------------------------------------------
# t-digest: mergeable approximate quantiles (Dunning & Ertl, public:
# "Computing Extremely Accurate Quantiles Using t-Digests", 2019)
# --------------------------------------------------------------------------

_TD_PARTIAL_SCHEMA = T.StructType([
    T.StructField("mean", T.DoubleType()),
    T.StructField("weight", T.DoubleType()),
    T.StructField("lo", T.DoubleType()),      # partition min (tail clamp)
    T.StructField("hi", T.DoubleType()),      # partition max
])

_TD_RESULT_SCHEMA = T.StructType([
    T.StructField("q", T.DoubleType()),
    T.StructField("value_est", T.DoubleType()),
])


def _td_compress(means, weights, delta: float):
    """Merge sorted-by-mean centroids under the k1 scale function
    ``k(q) = delta/(2*pi) * asin(2q - 1)``: adjacent centroids combine
    while the merged span covers <= 1 unit of k — tight centroids near
    the tails (asin steepens), wide in the middle. Returns <= ~2*delta
    centroids regardless of input size."""
    import math

    import numpy as np

    order = np.argsort(means, kind="mergesort")
    m = np.asarray(means, np.float64)[order]
    w = np.asarray(weights, np.float64)[order]
    total = float(w.sum())

    def k(q: float) -> float:
        return delta / (2.0 * math.pi) * \
            math.asin(max(-1.0, min(1.0, 2.0 * q - 1.0)))

    out_m, out_w = [], []
    cur_m, cur_w = float(m[0]), float(w[0])
    w_done = 0.0
    for i in range(1, len(m)):
        q0 = w_done / total
        q2 = (w_done + cur_w + float(w[i])) / total
        if k(q2) - k(q0) <= 1.0:
            nw = cur_w + float(w[i])
            cur_m += (float(m[i]) - cur_m) * float(w[i]) / nw
            cur_w = nw
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_done += cur_w
            cur_m, cur_w = float(m[i]), float(w[i])
    out_m.append(cur_m)
    out_w.append(cur_w)
    return out_m, out_w


def _td_quantile(means, weights, lo: float, hi: float, q: float) -> float:
    """Interpolated quantile from a compressed digest: centroid i's
    mass is centered at its cumulative midpoint; linear between
    midpoints, clamped to the exact [lo, hi] observed range."""
    total = sum(weights)
    target = q * total
    cum = 0.0
    prev_mid, prev_mean = 0.0, lo
    for m, w in zip(means, weights):
        mid = cum + w / 2.0
        if target < mid:
            if mid == prev_mid:
                return m
            frac = (target - prev_mid) / (mid - prev_mid)
            return prev_mean + frac * (m - prev_mean)
        prev_mid, prev_mean = mid, m
        cum += w
    return hi


def tdigest_quantiles(df: DataFrame, value_col: str,
                      qs: "list[float]", delta: float = 100.0,
                      ) -> DataFrame:
    """Approximate quantiles of ``value_col`` via a mergeable t-digest.

    One Arrow-batched pass builds a ~2*delta-centroid digest per
    partition; the O(partitions * delta) partial rows (tiny — they are
    centroids, not data) merge in a single-task reduce that re-runs
    the same compression, so the final digest is identical to digesting
    the concatenated partials. At 100 TB this never shuffles data rows:
    the exact-quantile companion's full sort is replaced by a constant
    ~200 rows per input partition. Rank error is O(q(1-q)/delta) —
    tightest at the tails (k1 scale function). Returns (q, value_est)
    ordered by q; the exact companion query doubles as the accuracy
    gate in tests.
    """
    import numpy as np

    qs = sorted(float(q) for q in qs)
    delta = float(delta)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        means: list = []
        weights: list = []
        lo, hi = float("inf"), float("-inf")
        for pdf in batches:
            v = pd.to_numeric(pdf[value_col], errors="coerce") \
                .dropna().to_numpy(np.float64)
            if not len(v):
                continue
            lo = min(lo, float(v.min()))
            hi = max(hi, float(v.max()))
            means.extend(v.tolist())
            weights.extend([1.0] * len(v))
            if len(means) > 32 * int(delta):
                means, weights = _td_compress(means, weights, delta)
        if not means:
            return
        means, weights = _td_compress(means, weights, delta)
        yield pd.DataFrame({"mean": means, "weight": weights,
                            "lo": lo, "hi": hi})

    def merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        means: list = []
        weights: list = []
        lo, hi = float("inf"), float("-inf")
        for pdf in batches:
            if not len(pdf):
                continue
            means.extend(pdf["mean"].tolist())
            weights.extend(pdf["weight"].tolist())
            lo = min(lo, float(pdf["lo"].min()))
            hi = max(hi, float(pdf["hi"].max()))
        if not means:
            return
        means, weights = _td_compress(means, weights, delta)
        yield pd.DataFrame({
            "q": qs,
            "value_est": [_td_quantile(means, weights, lo, hi, q)
                          for q in qs]})

    partials = df.select(value_col).mapInPandas(
        build, schema=_TD_PARTIAL_SCHEMA)
    return (partials.repartition(1)
            .mapInPandas(merge, schema=_TD_RESULT_SCHEMA)
            .orderBy("q"))


def tdigest_quantiles_by(df: DataFrame, key_col: str, value_col: str,
                         qs: "list[float]", delta: float = 100.0,
                         ) -> DataFrame:
    """Per-group approximate quantiles via two-level t-digest merge.

    Level 1 (map side): one digest per (input partition, key) built in
    a single Arrow pass — the shuffle then carries only centroid rows
    (~2*delta per partition-key), never data rows.  Level 2: centroids
    group by key and merge under the same compression, so the result
    is layout-independent.  This is the scalable form of
    ``GROUP BY key -> percentile(value)``: the exact form sorts every
    group; this shuffles a constant per group.  Returns one row per
    key with a ``value_est`` array aligned to ``qs`` (ascending).
    """
    import numpy as np

    qs = sorted(float(q) for q in qs)
    delta = float(delta)

    partial_schema = T.StructType([
        T.StructField("key", T.StringType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("weight", T.DoubleType()),
        T.StructField("lo", T.DoubleType()),
        T.StructField("hi", T.DoubleType()),
    ])
    result_schema = T.StructType([
        T.StructField("key", T.StringType()),
        T.StructField("n_est", T.DoubleType()),
        T.StructField("value_est", T.ArrayType(T.DoubleType())),
    ])

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict = {}
        for pdf in batches:
            v = pd.to_numeric(pdf[value_col], errors="coerce")
            for key, grp in v.groupby(pdf[key_col].astype(str)):
                grp = grp.dropna().to_numpy(np.float64)
                if not len(grp):
                    continue
                means, weights, lo, hi = state.get(
                    key, ([], [], float("inf"), float("-inf")))
                means.extend(grp.tolist())
                weights.extend([1.0] * len(grp))
                lo = min(lo, float(grp.min()))
                hi = max(hi, float(grp.max()))
                if len(means) > 32 * int(delta):
                    means, weights = _td_compress(means, weights, delta)
                state[key] = (means, weights, lo, hi)
        for key, (means, weights, lo, hi) in state.items():
            means, weights = _td_compress(means, weights, delta)
            yield pd.DataFrame({"key": key, "mean": means,
                                "weight": weights, "lo": lo, "hi": hi})

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        means, weights = _td_compress(pdf["mean"].to_numpy(),
                                      pdf["weight"].to_numpy(), delta)
        lo, hi = float(pdf["lo"].min()), float(pdf["hi"].max())
        return pd.DataFrame({
            "key": [key[0]],
            "n_est": [float(sum(weights))],
            "value_est": [[_td_quantile(means, weights, lo, hi, q)
                           for q in qs]]})

    partials = df.select(F.col(key_col).cast("string").alias(key_col),
                         value_col) \
        .mapInPandas(build, schema=partial_schema)
    return (partials.groupBy("key")
            .applyInPandas(merge, schema=result_schema)
            .orderBy("key"))


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — deterministic, portable
# ---------------------------------------------------------------------------

#: 13 md5 hex chars = 52 bits: exactly representable in a double and
#: parsable by DuckDB's ('0x' || ...)::BIGINT — the portable hash basis
#: shared with classify._bucket / sampling.weighted_reservoir.
_CMS_MD5_CHARS = 13


def _cms_bucket(row_col, value_col, width: int):
    """Seeded portable bucket: md5 of "<row>:<value>" parsed as a 52-bit
    int, mod width. DuckDB reproduces it bit-for-bit as
    ``('0x' || substring(md5(i || ':' || x), 1, 13))::BIGINT % width``."""
    seeded = F.concat(row_col.cast("string"), F.lit(":"), value_col)
    return F.pmod(
        F.conv(F.substring(F.md5(seeded), 1, _CMS_MD5_CHARS), 16, 10)
        .cast("long"), F.lit(width))


def _with_cells(df: DataFrame, value_col: str, depth: int,
                width: int) -> DataFrame:
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)]))
    return (df.withColumn("row_i", rows)
            .withColumn("bucket", _cms_bucket(F.col("row_i"),
                                              F.col(value_col), width)))


def cms_build(items: DataFrame, value_col: str, depth: int = 4,
              width: int = 256) -> DataFrame:
    """Build a count-min sketch over a stream of values.

    One pass: each occurrence fans out to ``depth`` (row, bucket) cells
    (a generator explode, still narrow), then ONE partial-aggregated
    groupBy whose result is at most ``depth * width`` rows — the whole
    sketch — independent of stream cardinality. That fixed size is the
    point at 100 TB: sketches from different days/shards merge by cell
    addition (union + re-groupBy), and the finished sketch BROADCASTS
    to any estimator join. Returns ``(row_i, bucket, cnt)``.
    """
    return (_with_cells(items.select(F.col(value_col)), value_col,
                        depth, width)
            .groupBy("row_i", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_estimate(sketch: DataFrame, candidates: DataFrame,
                 value_col: str, depth: int = 4,
                 width: int = 256) -> DataFrame:
    """Point-estimate each candidate's count from a built sketch:
    min over the ``depth`` addressed cells (the classic CMS guarantee —
    never an underestimate, overestimate bounded by collisions). The
    sketch side (``<= depth * width`` rows) is broadcast; candidates
    stream through with no shuffle before the per-candidate min."""
    probes = _with_cells(candidates, value_col, depth, width)
    joined = probes.join(F.broadcast(sketch), ["row_i", "bucket"],
                         "left")
    return (joined.groupBy(*candidates.columns)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias("cms_est")))


# ---------------------------------------------------------------------------
# Bloom filter — the incremental-ingest membership screen
# ---------------------------------------------------------------------------

def _bloom_bits(df: DataFrame, value_col: str, k: int,
                m_bits: int) -> DataFrame:
    """Fan each value out to its ``k`` bloom bit addresses:
    ``pos_i = md5("i:value")[:13 hex] % m_bits`` (the same seeded
    portable hash as the CMS — DuckDB reproduces it bit-for-bit),
    packed as ``(word_i = pos div 32, mask = 1 << pos % 32)``. The
    payload is 32 bits inside a BIGINT so shifted masks stay positive
    in BOTH engines (no sign-bit divergence at bit 63)."""
    hashes = F.explode(F.array(*[F.lit(i) for i in range(k)]))
    seeded = F.concat(F.col("hash_i").cast("string"), F.lit(":"),
                      F.col(value_col))
    pos = F.pmod(F.conv(F.substring(F.md5(seeded), 1, _CMS_MD5_CHARS),
                        16, 10).cast("long"), F.lit(m_bits))
    return (df.withColumn("hash_i", hashes)
            .withColumn("__pos", pos)
            .withColumn("word_i", F.expr("__pos div 32"))
            .withColumn("mask",
                        F.expr("shiftleft(1L, cast(__pos % 32 as int))")))


def bloom_build(items: DataFrame, value_col: str, k: int = 3,
                m_bits: int = 4096) -> DataFrame:
    """Build a Bloom filter over a value column as a ``(word_i, bits)``
    word table — the membership screen an incremental ingest runs
    against the historical corpus before paying for exact dedup.

    One pass: each value fans out to ``k`` bit addresses (a generator
    explode, still narrow), then ONE partial-aggregated ``bit_or``
    groupBy whose result is at most ``m_bits/32`` rows — the whole
    filter — independent of corpus cardinality. Like the CMS, that
    fixed size is the 100 TB point: filters from different days/shards
    merge by ``union + bit_or``, and the finished filter BROADCASTS to
    any probe join. Standard sizing: ``m_bits ~ 14.4 * n`` for ~0.1%
    false positives at ``k = 10``; the defaults here are test-scale.

    Guarantee (pinned in tests + the oracle-exact registry query
    ``bloom_incremental_screen``): NO false negatives — a value that
    was inserted always probes ``maybe_present = true``.
    """
    return (_bloom_bits(items.select(F.col(value_col)), value_col,
                        k, m_bits)
            .groupBy("word_i")
            .agg(F.expr("bit_or(mask)").alias("bits")))


def bloom_screen(bloom: DataFrame, candidates: DataFrame,
                 value_col: str, k: int = 3,
                 m_bits: int = 4096) -> DataFrame:
    """Probe each candidate against a built filter: ``maybe_present``
    iff ALL ``k`` addressed bits are set. ``false`` is definitive (the
    row is certainly new — skip exact dedup entirely); ``true`` routes
    the row to the exact path. The filter side (``<= m_bits/32`` rows)
    is broadcast; candidates stream through with one narrow fan-out
    and a per-candidate count — no shuffle of the candidate table
    beyond the final regroup."""
    probes = _bloom_bits(candidates, value_col, k, m_bits)
    joined = probes.join(F.broadcast(bloom), "word_i", "left")
    hit = (F.col("bits").isNotNull()
           & (F.col("bits").bitwiseAND(F.col("mask"))
              == F.col("mask")))
    return (joined.groupBy(*candidates.columns)
            .agg((F.sum(F.when(hit, 1).otherwise(0)) == F.lit(k))
                 .alias("maybe_present")))
