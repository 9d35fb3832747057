"""Custom stateful streaming operators via ``applyInPandasWithState``.

``streaming_dedup``: exact dedup across micro-batches — the streaming
counterpart of operators/dedup.exact_dedup. State is one flag per
fingerprint group ("seen"), so state size is O(distinct keys) and the
grouping key partitions state uniformly across executors (content hash —
no skew). A row is emitted only the first time its fingerprint appears
anywhere in the stream.

``running_user_stats``: per-user running counters (events, value sum) —
the minimal template for custom accumulating state (fraud counters,
quota enforcement, rate limits).

Both also accept batch DataFrames (they fall back to the equivalent
batch computation) so oracles/tests can check semantics.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.text import fingerprint_md5


def streaming_dedup(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Emit each document once per distinct content fingerprint, across
    all micro-batches. Output schema: (fingerprint, doc_id)."""
    keyed = df.select(fingerprint_md5(F.col(text_col)).alias("fingerprint"),
                      F.col(id_col).cast("long").alias("doc_id"))

    if not df.isStreaming:
        from pyspark.sql import Window
        w = Window.partitionBy("fingerprint").orderBy("doc_id")
        return (keyed.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1).drop("__rn"))

    out_schema = "fingerprint STRING, doc_id LONG"
    state_schema = "seen BOOLEAN"

    def dedup_fn(key: Tuple[str], batches: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            (seen,) = state.get
        else:
            seen = False
        best = None
        for pdf in batches:
            if len(pdf):
                m = int(pdf["doc_id"].min())
                best = m if best is None else min(best, m)
        if not seen and best is not None:
            state.update((True,))
            yield pd.DataFrame({"fingerprint": [key[0]], "doc_id": [best]})

    return (keyed.groupBy("fingerprint")
            .applyInPandasWithState(dedup_fn, out_schema, state_schema,
                                    "append",
                                    GroupStateTimeout.NoTimeout))


def streaming_dedup_within_watermark(df: DataFrame, ts_col: str,
                                     watermark: str = "10 minutes",
                                     text_col: str = "text",
                                     id_col: str = "doc_id") -> DataFrame:
    """Bounded-state streaming dedup: emit a document once per distinct
    content fingerprint among rows whose event times fall within the
    watermark of each other (Spark's ``dropDuplicatesWithinWatermark``).

    This is the production shape for unbounded streams:
    :func:`streaming_dedup` keeps one state entry per fingerprint
    FOREVER (exact, but state grows with the corpus), while here the
    state store evicts entries as the watermark passes — O(state) is
    bounded by the dedup window, the right trade when duplicates arrive
    close together (retries, crawler revisits). A duplicate arriving
    later than the watermark is re-emitted by design.

    Batch fallback (for oracle/tests): plain first-per-fingerprint
    dedup, the whole-input equivalent. Output:
    (fingerprint, doc_id, ``ts_col``).
    """
    keyed = df.select(
        fingerprint_md5(F.col(text_col)).alias("fingerprint"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(ts_col))

    if not df.isStreaming:
        from pyspark.sql import Window
        w = Window.partitionBy("fingerprint").orderBy("doc_id")
        return (keyed.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1).drop("__rn"))

    return (keyed.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["fingerprint"]))


def running_user_stats(df: DataFrame, user_col: str = "user_id",
                       value_col: str = "value") -> DataFrame:
    """Per-user running (n_events, sum_value) emitted after every batch.
    Output: (user_id, n_events, sum_value)."""
    keyed = df.select(F.col(user_col).cast("long").alias("user_id"),
                      F.col(value_col).cast("double").alias("value"))

    if not df.isStreaming:
        return (keyed.groupBy("user_id")
                .agg(F.count(F.lit(1)).alias("n_events"),
                     F.sum("value").alias("sum_value")))

    out_schema = "user_id LONG, n_events LONG, sum_value DOUBLE"
    state_schema = "n LONG, s DOUBLE"

    def stats_fn(key: Tuple[int], batches: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            s += float(pdf["value"].fillna(0.0).sum())
        state.update((n, s))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "sum_value": [s]})

    return (keyed.groupBy("user_id")
            .applyInPandasWithState(stats_fn, out_schema, state_schema,
                                    "update",
                                    GroupStateTimeout.NoTimeout))
