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
