"""Sequence packing: assign documents to fixed-capacity context windows.

Two strategies, both scale-designed:

- :func:`pack_running_sum` — the streaming-order packer most pipelines
  run: documents in a deterministic order, a running token total, a new
  bin every time the total crosses the capacity. Pure window math (one
  shuffle on the order key), exactly expressible in ANSI SQL, so it is
  oracle-checked.
- :func:`pack_first_fit` — greedy first-fit-decreasing within hash
  buckets via ``applyInPandas``: tighter packing (less padding waste)
  at the price of an Arrow batch per bucket. Buckets are independent,
  so the packing parallelizes to any cluster size; rows-only checked
  (greedy FFD is not SQL-expressible).

Documents longer than the capacity get a bin of their own; chain
:func:`chunk_documents` upstream to split them into overlapping
windows first (chunk -> pack is the standard pre-training layout).

Extends the reference's surface; mandated by the build brief's
training-data-pipeline component.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_running_sum(df: DataFrame, token_col: str, id_col: str,
                     capacity: int,
                     shard_col: str | None = None) -> DataFrame:
    """Sequential packing by running token total.

    Bin boundary rule (deterministic, order = ``id_col`` ascending): a
    document starts a new bin when the running total of all documents
    up to and including it exceeds ``capacity`` times the bins already
    closed. Implemented as ``floor((cumsum - 1) / capacity)``.

    ``shard_col`` is the scale path: the window partitions on it, every
    shard packs independently in parallel, and bin ids become globally
    unique as ``shard * 2^32 + local_bin``. Without it the window is a
    single global order — fine for one shard's worth of data, the wrong
    plan for 100 TB (pair with ``sampling.shuffle_order`` to assign
    shards first).
    """
    toks = F.least(F.greatest(F.col(token_col).cast("long"), F.lit(1)),
                   F.lit(capacity))
    w = (Window.partitionBy(shard_col) if shard_col else Window) \
        .orderBy(F.col(id_col)) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = (F.floor((F.col("__cum") - 1) / F.lit(capacity))
             .cast("long"))
    out = (df.withColumn("__toks", toks)
           .withColumn("__cum", F.sum("__toks").over(w)))
    if shard_col:
        out = out.withColumn(
            "bin", F.col(shard_col).cast("long") * F.lit(1 << 32) + local)
    else:
        out = out.withColumn("bin", local)
    return out.drop("__toks", "__cum")


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", max_tokens: int = 512,
                    overlap: int = 64) -> DataFrame:
    """Split each document into overlapping token windows — the
    upstream stage that makes every row fit a context window before
    :func:`pack_running_sum` / :func:`pack_first_fit`.

    Tokens are whitespace splits (the same tokenization as
    ``functions.text.token_count_ws``). Window ``i`` covers tokens
    ``[i*stride, i*stride + max_tokens)`` with
    ``stride = max_tokens - overlap``; a document of ``n`` tokens
    yields ``ceil((n - max_tokens) / stride) + 1`` windows (one if it
    already fits), so consecutive chunks share ``overlap`` tokens and
    the final window is never empty.

    Entirely JVM-side (split / sequence / slice / posexplode — no
    Python in the row path); the explode is the only fan-out and
    chunking each document is embarrassingly parallel. Output:
    ``chunk_id`` (= id * 2^20 + index, unique while a document has
    fewer than ~10^6 chunks), ``doc_id``, ``chunk_index``,
    ``chunk_text``, ``n_tokens``. Null texts yield no rows.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    n_chunks = F.when(n <= max_tokens, F.lit(1)).otherwise(
        F.ceil((n - F.lit(max_tokens)) / F.lit(stride)).cast("long") + 1)
    starts = F.transform(
        F.sequence(F.lit(0).cast("long"), n_chunks - 1),
        lambda i: i * stride)
    exploded = df.select(
        F.col(id_col), toks.alias("__toks"),
        F.posexplode(starts).alias("chunk_index", "__start"))
    chunk_toks = F.slice("__toks", F.col("__start").cast("int") + 1,
                         F.lit(max_tokens))
    return exploded.select(
        (F.col(id_col).cast("long") * F.lit(1 << 20)
         + F.col("chunk_index")).alias("chunk_id"),
        F.col(id_col),
        F.col("chunk_index").cast("long").alias("chunk_index"),
        F.concat_ws(" ", chunk_toks).alias("chunk_text"),
        F.size(chunk_toks).cast("long").alias("n_tokens"))


def pack_first_fit(df: DataFrame, token_col: str, id_col: str,
                   capacity: int, n_buckets: int = 64,
                   bucket_col: str | None = None) -> DataFrame:
    """Greedy first-fit-decreasing packing inside hash buckets.

    Rows hash into ``n_buckets`` independent groups (or group on a
    caller-provided ``bucket_col`` — any SQL-expressible bucketing, which
    also makes the packing reproducible by other engines); within each
    group an Arrow batch runs classic FFD (sort by clipped size
    descending, ties broken on ascending id — fully deterministic
    regardless of incoming row order; place each doc into the first bin
    with room). Bin ids are globally unique as
    ``bucket * 2^32 + local_bin``. Padding waste is strictly <= the
    running-sum packer's; parallelism = number of buckets.
    """
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("bin", T.LongType())])
    cap = int(capacity)

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(key[0])
        sizes = pdf[token_col].clip(lower=1, upper=cap).astype("int64")
        order = (pdf.assign(__size=sizes)
                 .sort_values(["__size", id_col],
                              ascending=[False, True],
                              kind="mergesort").index)
        bins: list[int] = []   # remaining room per local bin
        assign = pd.Series(0, index=pdf.index, dtype="int64")
        for idx in order:
            s = int(sizes[idx])
            for b, room in enumerate(bins):
                if room >= s:
                    bins[b] = room - s
                    assign[idx] = b
                    break
            else:
                bins.append(cap - s)
                assign[idx] = len(bins) - 1
        out = pdf.copy()
        out["bin"] = (bucket << 32) + assign
        return out

    if bucket_col is not None:
        return (df.groupBy(bucket_col)
                .applyInPandas(pack, schema=out_schema))
    bucketed = df.withColumn(
        "__bucket", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)))
    return (bucketed.groupBy("__bucket")
            .applyInPandas(lambda key, pdf:
                           pack(key, pdf.drop(columns="__bucket")),
                           schema=out_schema))


def packing_stats(packed: DataFrame, token_col: str,
                  capacity: int) -> DataFrame:
    """Per-bin fill statistics: n_docs, tokens, fill fraction — the
    padding-waste report for a packing run."""
    toks = F.least(F.greatest(F.col(token_col).cast("long"), F.lit(1)),
                   F.lit(capacity))
    return (packed.groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(toks).alias("tokens"))
            .withColumn("fill",
                        F.round(F.col("tokens") / F.lit(capacity), 4)))
