"""Distributed BPE tokenizer training and application.

The canonical tokenizer-training step of an LLM data pipeline
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units" — public algorithm): start from characters, repeatedly
merge the most frequent adjacent symbol pair. Extends the reference's
surface (xbrianh/xdlake has no text operators; the corpus module's
``bpe_pair_counts`` computes one round's statistic — this module runs
the full training loop and applies the learned merges).

Scale design: training runs over the DISTINCT-WORD frequency table,
not the corpus — at 100 TB the corpus is billions of documents but the
word table is ~10^8 rows, and every round is one explode+groupBy over
it (map-side-combinable pair counts keyed by uniform symbol pairs)
plus one k-row TakeOrdered to the driver. The evolving segmentation
column is re-checkpointed every few rounds so lineage stays bounded
(the connected-components pattern). ``batch_k > 1`` merges several
pairwise-disjoint top pairs per round — the standard scalable-BPE
approximation that cuts rounds ~k× while staying deterministic; the
exact classic algorithm is ``batch_k=1``. Merge application is an
Arrow-batched pandas UDF (per-word Python loop over ≤word-length
symbols; adjacency rewriting is inherently sequential per word, and
words are short) — differential-tested against a pure-Python reference
implementation in tests/test_operators.py.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: End-of-word sentinel symbol (kept out of the character alphabet).
EOW = "</w>"

#: Per-task cap on the tokenizer apply memo (distinct words cached per
#: task before the dict resets) — ~1M entries of short token lists is
#: tens of MB, far under executor overhead budgets.
_MEMO_CAP = 1 << 20

MERGE_SCHEMA = T.StructType([
    T.StructField("rank", T.LongType()),
    T.StructField("left", T.StringType()),
    T.StructField("right", T.StringType()),
    T.StructField("merged", T.StringType()),
    T.StructField("pair_count", T.LongType()),
])


def _word_freq(df: DataFrame, text_col: str,
               lowercase: bool) -> DataFrame:
    # the split+explode map side runs inside the scan stage: spread it
    # when the input arrives as a single split (no-op at cluster scale)
    from . import ensure_parallelism
    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    return (ensure_parallelism(df)
            .select(F.explode(F.split(F.trim(txt), r"\s+"))
                    .alias("word"))
            .filter(F.length("word") > 0)
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def _init_symbols(words: DataFrame) -> DataFrame:
    # split("abc", "") -> [a, b, c]; append the end-of-word sentinel
    return words.select(
        "freq",
        F.concat(F.split(F.col("word"), ""),
                 F.array(F.lit(EOW))).alias("syms"))


def _pair_counts(words: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the word table — one
    explode + one map-side-combinable groupBy."""
    pairs = words.select(
        "freq",
        F.explode(F.arrays_zip(
            F.slice("syms", 1, F.size("syms") - 1).alias("l"),
            F.slice("syms", 2, F.size("syms") - 1).alias("r"))
        ).alias("p"))
    return (pairs.groupBy(F.col("p.l").alias("left"),
                          F.col("p.r").alias("right"))
            .agg(F.sum("freq").alias("pair_count")))


def _apply_merges_udf(merge_list: list):
    """Rewrite symbol arrays applying ``[(left, right), ...]`` in order
    (each pair merged greedily left-to-right within a word)."""
    def run(syms: pd.Series) -> pd.Series:
        out = []
        for s in syms:
            s = list(s)
            for l, r in merge_list:
                if len(s) < 2:
                    break
                m, i, lr = [], 0, l + r
                while i < len(s):
                    if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                        m.append(lr)
                        i += 2
                    else:
                        m.append(s[i])
                        i += 1
                s = m
            out.append(s)
        return pd.Series(out)
    return F.pandas_udf(run, T.ArrayType(T.StringType()))


def train_bpe(df: DataFrame, text_col: str = "text",
              n_merges: int = 50, batch_k: int = 1,
              lowercase: bool = True, min_pair_count: int = 2,
              checkpoint_every: int = 6) -> DataFrame:
    """Learn a BPE merge table. Returns a DataFrame
    ``(rank, left, right, merged, pair_count)`` with ``rank`` the merge
    order (1-based). Deterministic: each round's pairs are ranked by
    (count desc, left, right); ``batch_k > 1`` takes up to k top pairs
    whose symbols are pairwise disjoint (overlapping candidates defer
    to the next round, so application order cannot change results).
    Stops early when no pair reaches ``min_pair_count``.
    """
    spark = df.sparkSession
    # NOTE (r12): deliberately NOT pinned at session parallelism — the
    # per-round pair-count/merge work per word is tiny, so the AQE
    # byte-coalesced layout is right at every scale (a large word table
    # is never coalesced to one partition), and an extra exchange +
    # 32-task rounds measurably slowed the sf0.1 bench. Only unigram's
    # CPU-bound E-step warrants the explicit spread.
    words = _init_symbols(_word_freq(df, text_col, lowercase)) \
        .localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, str, int]] = []
    rounds = 0
    while len(merges) < n_merges:
        want = min(batch_k, n_merges - len(merges))
        # over-fetch so disjoint filtering can still fill the batch
        top = (_pair_counts(words)
               .filter(F.col("pair_count") >= min_pair_count)
               .orderBy(F.col("pair_count").desc(), "left", "right")
               .limit(4 * want + 8).collect())
        if not top:
            break
        chosen: list = []
        used: set[str] = set()
        for row in top:
            if len(chosen) >= want:
                break
            syms = {row["left"], row["right"],
                    row["left"] + row["right"]}
            if used & syms:
                continue  # overlaps a pair already chosen this round
            used |= syms
            chosen.append(row)
        for row in chosen:
            merges.append((len(merges) + 1, row["left"], row["right"],
                           row["left"] + row["right"],
                           int(row["pair_count"])))
        apply_udf = _apply_merges_udf(
            [(r["left"], r["right"]) for r in chosen])
        words = words.select("freq", apply_udf(F.col("syms"))
                             .alias("syms"))
        rounds += 1
        if rounds % checkpoint_every == 0:
            # truncate the per-round lineage (CC pattern)
            words = words.localCheckpoint(eager=False)
    return spark.createDataFrame(
        pd.DataFrame(merges, columns=[f.name for f in
                                      MERGE_SCHEMA.fields])
        if merges else pd.DataFrame(columns=[f.name for f in
                                             MERGE_SCHEMA.fields]),
        schema=MERGE_SCHEMA)


def apply_bpe(df: DataFrame, merges: "DataFrame | list",
              text_col: str = "text", id_col: str = "doc_id",
              lowercase: bool = True) -> DataFrame:
    """Tokenize text with a learned merge table: per word, start from
    characters (+ ``</w>``) and apply every merge in rank order.
    Returns ``(id, tokens array<string>, n_tokens)``. The merge list is
    collected to the driver (it is vocab-sized — thousands of rows) and
    shipped inside the UDF closure; the corpus never moves.

    Per-worker word memo (r12; hoisted out of the UDF body in r13 —
    Spark invokes a pandas UDF once per Arrow batch, so a memo created
    inside it lost the Zipfian reuse ACROSS batches): merge replay is
    a pure function of the word and corpus word frequency is Zipfian —
    most occurrences are repeats — so each Python worker tokenizes a
    distinct word once and serves repeats from a dict (the
    ``lru_cache`` in the released GPT-2 encoder, same rationale).
    Bounded by ``_MEMO_CAP`` entries so a pathological worker cannot
    hoard memory."""
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("rank").collect()
        merge_list = [(r["left"], r["right"]) for r in rows]
    else:
        merge_list = list(merges)
    memo: dict = {}

    def run(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            t = (t or "")
            if lowercase:
                t = t.lower()
            toks: list[str] = []
            for w in t.split():
                cached = memo.get(w)
                if cached is None:
                    s = list(w) + [EOW]
                    for l, r in merge_list:
                        if len(s) < 2:
                            break
                        m, i, lr = [], 0, l + r
                        while i < len(s):
                            if i + 1 < len(s) and s[i] == l \
                                    and s[i + 1] == r:
                                m.append(lr)
                                i += 2
                            else:
                                m.append(s[i])
                                i += 1
                        s = m
                    if len(memo) >= _MEMO_CAP:
                        memo.clear()
                    memo[w] = cached = s
                toks.extend(cached)
            out.append(toks)
        return pd.Series(out)

    from . import ensure_parallelism
    tok_udf = F.pandas_udf(run, T.ArrayType(T.StringType()))
    return ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        tok_udf(F.col(text_col)).alias("tokens")) \
        .withColumn("n_tokens", F.size("tokens").cast("long"))


def reference_bpe(word_freqs: "dict[str, int]", n_merges: int,
                  min_pair_count: int = 2) -> list:
    """Pure-Python classic BPE (the differential-test oracle): same
    tie-breaks as ``train_bpe(batch_k=1)``."""
    segs = {w: tuple(list(w) + [EOW]) for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts: dict = {}
        for w, f in word_freqs.items():
            s = segs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = \
                    counts.get((s[i], s[i + 1]), 0) + f
        counts = {p: c for p, c in counts.items()
                  if c >= min_pair_count}
        if not counts:
            break
        (l, r), c = min(counts.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((len(merges) + 1, l, r, l + r, c))
        lr = l + r
        for w in segs:
            s = segs[w]
            if len(s) < 2:
                continue
            m, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    m.append(lr)
                    i += 2
                else:
                    m.append(s[i])
                    i += 1
            segs[w] = tuple(m)
    return merges
