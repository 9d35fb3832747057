"""Distributed WordPiece tokenizer training and application.

The third classic subword family next to BPE (operators/bpe.py) and
unigram-LM (operators/unigram.py): WordPiece (Schuster & Nakajima
2012; the BERT tokenizer) merges like BPE but scores candidates by the
LIKELIHOOD ratio ``count(ab) / (count(a) * count(b))`` instead of raw
frequency — a merge is chosen when the pair co-occurs more than its
parts' popularity predicts, so frequent-but-independent pairs (``e`` +
``s``) lose to genuinely cohesive ones. Continuation symbols carry the
``##`` prefix ("playing" -> ``p ##l ##a ##y ##i ##n ##g``), and
inference is greedy longest-match against the final vocabulary, not
merge replay.

Scale design mirrors train_bpe: training runs over the DISTINCT-WORD
frequency table; each round is one explode+groupBy for pair counts and
one for symbol counts — the symbol-count side is vocabulary-sized
(alphabet + merges so far), so it broadcast-joins onto the pair table
and the scored top-k is a TakeOrdered to the driver. ``batch_k > 1``
applies up to k symbol-disjoint merges per round (same contract as
``train_bpe``), dividing the Spark-round count. The corpus is
touched exactly once (word-frequency build); everything else moves
vocab-scale rows. Differential-tested against a pure-Python reference
(tests/test_wordpiece.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Continuation prefix (BERT convention).
CONT = "##"

MERGE_SCHEMA = T.StructType([
    T.StructField("rank", T.LongType()),
    T.StructField("left", T.StringType()),
    T.StructField("right", T.StringType()),
    T.StructField("merged", T.StringType()),
    T.StructField("score", T.DoubleType()),
])


def _merge_symbols(left: str, right: str) -> str:
    """a + ##b -> ab; ##a + ##b -> ##ab (the right side's ## always
    folds into the left)."""
    return left + (right[len(CONT):] if right.startswith(CONT)
                   else right)


def _word_freq(df: DataFrame, text_col: str,
               lowercase: bool) -> DataFrame:
    # spread the split+explode map side when the input arrives as a
    # single split (no-op at cluster scale)
    from . import ensure_parallelism
    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    return (ensure_parallelism(df)
            .select(F.explode(F.split(F.trim(txt), r"\s+"))
                    .alias("word"))
            .filter(F.length("word") > 0)
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def _init_symbols(words: DataFrame) -> DataFrame:
    """'abc' -> [a, ##b, ##c] (first char bare, rest continuations)."""
    chars = F.filter(F.split(F.col("word"), ""),
                     lambda c: F.length(c) > 0)
    syms = F.concat(
        F.slice(chars, 1, 1),
        F.transform(F.slice(chars, 2, F.size(chars) - 1),
                    lambda c: F.concat(F.lit(CONT), c)))
    return words.select("freq", syms.alias("syms"))


def _pair_counts(words: DataFrame) -> DataFrame:
    pairs = words.select(
        "freq",
        F.explode(F.arrays_zip(
            F.slice("syms", 1, F.size("syms") - 1).alias("l"),
            F.slice("syms", 2, F.size("syms") - 1).alias("r"))
        ).alias("p"))
    return (pairs.groupBy(F.col("p.l").alias("left"),
                          F.col("p.r").alias("right"))
            .agg(F.sum("freq").alias("pair_count")))


def _symbol_counts(words: DataFrame) -> DataFrame:
    return (words.select("freq", F.explode("syms").alias("sym"))
            .groupBy("sym").agg(F.sum("freq").alias("sym_count")))


def _apply_merges_udf(merge_list: list):
    """Rewrite symbol arrays applying ``[(left, right, merged), ...]``
    in rank order (each merge applied greedily left-to-right within a
    word) — one Arrow pass over the word table per ROUND, not per
    merge."""
    def run(syms: pd.Series) -> pd.Series:
        out = []
        for s in syms:
            s = list(s)
            for left, right, merged in merge_list:
                if len(s) < 2:
                    break
                m, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == left \
                            and s[i + 1] == right:
                        m.append(merged)
                        i += 2
                    else:
                        m.append(s[i])
                        i += 1
                s = m
            out.append(s)
        return pd.Series(out)
    return F.pandas_udf(run, T.ArrayType(T.StringType()))


def train_wordpiece(df: DataFrame, text_col: str = "text",
                    n_merges: int = 50, batch_k: int = 1,
                    lowercase: bool = True,
                    min_pair_count: int = 2,
                    checkpoint_every: int = 6) -> DataFrame:
    """Learn a WordPiece merge table. Returns
    ``(rank, left, right, merged, score)`` in merge order, where
    ``score = count(pair) / (count(left) * count(right))`` at the time
    of the merge, rounded to 10 for cross-run float stability. Ties
    break by (score desc, left, right). Stops early when no pair
    reaches ``min_pair_count``.

    ``batch_k > 1`` takes up to k top-scored pairs per round whose
    symbols (left, right, AND merged) are pairwise disjoint, applied
    in rank order — disjoint merges cannot create, destroy, or
    re-score one another's pairs (a merge only touches counts of
    symbols it consumes or produces), so the batch is deterministic
    and each chosen merge's recorded score is the score the
    sequential algorithm would have seen. Overlapping candidates
    defer to the next round. ``batch_k=1`` is the exact sequential
    algorithm (the differential-test gate vs
    :func:`reference_wordpiece`); batching mirrors
    ``train_bpe(batch_k=...)`` and cuts the Spark-round count — the
    scale lever, since each round is two shuffles over the
    vocab-scale word table regardless of k.
    """
    spark = df.sparkSession
    # NOTE (r12): not pinned at session parallelism — per-round work
    # per word is tiny, so the AQE byte-coalesced layout is right at
    # every scale (see train_bpe); only unigram's CPU-bound E-step
    # warrants the explicit spread.
    words = _init_symbols(_word_freq(df, text_col, lowercase)) \
        .localCheckpoint(eager=False)
    merges: list = []
    rounds = 0
    while len(merges) < n_merges:
        want = min(batch_k, n_merges - len(merges))
        syms = _symbol_counts(words)
        # over-fetch so disjoint filtering can still fill the batch
        top = (_pair_counts(words)
               .filter(F.col("pair_count") >= min_pair_count)
               .join(F.broadcast(syms.withColumnRenamed("sym", "left")
                                 .withColumnRenamed("sym_count", "lc")),
                     "left")
               .join(F.broadcast(syms.withColumnRenamed("sym", "right")
                                 .withColumnRenamed("sym_count", "rc")),
                     "right")
               .select("left", "right", "pair_count",
                       F.round(F.col("pair_count")
                               / (F.col("lc") * F.col("rc")), 10)
                       .alias("score"))
               .orderBy(F.col("score").desc(), "left", "right")
               .limit(4 * want + 8).collect())
        if not top:
            break
        chosen: list = []
        used: set = set()
        for row in top:
            if len(chosen) >= want:
                break
            merged = _merge_symbols(row["left"], row["right"])
            ss = {row["left"], row["right"], merged}
            if used & ss:
                continue  # overlaps a pair already chosen this round
            used |= ss
            chosen.append((row, merged))
        for row, merged in chosen:
            merges.append((len(merges) + 1, row["left"], row["right"],
                           merged, float(row["score"])))
        words = words.select(
            "freq",
            _apply_merges_udf([(r["left"], r["right"], m)
                               for r, m in chosen])(
                F.col("syms")).alias("syms"))
        rounds += 1
        if rounds % checkpoint_every == 0:
            words = words.localCheckpoint(eager=False)
    return spark.createDataFrame(
        pd.DataFrame(merges, columns=[f.name for f in
                                      MERGE_SCHEMA.fields])
        if merges else pd.DataFrame(columns=[f.name for f in
                                             MERGE_SCHEMA.fields]),
        schema=MERGE_SCHEMA)


def wordpiece_vocab(merges: "DataFrame | list",
                    alphabet: "set[str] | None" = None) -> "list[str]":
    """Vocabulary = alphabet symbols + merged tokens, merge order kept
    (greedy longest-match doesn't need order, but a stable list does)."""
    if isinstance(merges, DataFrame):
        toks = [r["merged"] for r in merges.orderBy("rank").collect()]
    else:
        toks = [m[3] if isinstance(m, tuple) else m for m in merges]
    return sorted(alphabet or set()) + toks


def apply_wordpiece(df: DataFrame, vocab: "list[str] | set[str]",
                    text_col: str = "text", id_col: str = "doc_id",
                    lowercase: bool = True,
                    unk: str = "[UNK]") -> DataFrame:
    """Greedy longest-match WordPiece tokenization (the BERT
    inference algorithm): per word, take the longest vocabulary prefix
    (continuations matched with the ``##`` form), emit ``[UNK]`` for a
    word with any unmatchable position. The vocab ships in the UDF
    closure (vocab-sized); the corpus never moves. Per-worker word
    memo (r12; hoisted out of the per-Arrow-batch UDF body in r13 so
    reuse survives across batches): greedy matching is a pure function
    of the word and word frequency is Zipfian, so each worker matches
    a distinct word once and serves repeats from a dict."""
    from .bpe import _MEMO_CAP
    vset = set(vocab)
    memo: dict = {}

    def run(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            t = (t or "")
            if lowercase:
                t = t.lower()
            toks: list = []
            for w in t.split():
                cached = memo.get(w)
                if cached is None:
                    i, first, word_toks = 0, True, []
                    while i < len(w):
                        j, hit = len(w), None
                        while j > i:
                            piece = w[i:j] if first else CONT + w[i:j]
                            if piece in vset:
                                hit = piece
                                break
                            j -= 1
                        if hit is None:
                            word_toks = [unk]
                            break
                        word_toks.append(hit)
                        i, first = j, False
                    if len(memo) >= _MEMO_CAP:
                        memo.clear()
                    memo[w] = cached = word_toks
                toks.extend(cached)
            out.append(toks)
        return pd.Series(out)

    from . import ensure_parallelism
    tok_udf = F.pandas_udf(run, T.ArrayType(T.StringType()))
    return ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        tok_udf(F.col(text_col)).alias("tokens")) \
        .withColumn("n_tokens", F.size("tokens").cast("long"))


def reference_wordpiece(word_freqs: "dict[str, int]", n_merges: int,
                        min_pair_count: int = 2) -> list:
    """Pure-Python WordPiece trainer (the differential-test oracle):
    same scoring, rounding, and tie-breaks as ``train_wordpiece``."""
    segs = {w: tuple([w[0]] + [CONT + c for c in w[1:]])
            for w in word_freqs if w}
    merges: list = []
    for _ in range(n_merges):
        pair_c: dict = {}
        sym_c: dict = {}
        for w, f in word_freqs.items():
            s = segs.get(w, ())
            for sym in s:
                sym_c[sym] = sym_c.get(sym, 0) + f
            for i in range(len(s) - 1):
                pair_c[(s[i], s[i + 1])] = \
                    pair_c.get((s[i], s[i + 1]), 0) + f
        scored = [(round(c / (sym_c[l] * sym_c[r]), 10), l, r, c)
                  for (l, r), c in pair_c.items()
                  if c >= min_pair_count]
        if not scored:
            break
        score, l, r, c = min(scored,
                             key=lambda x: (-x[0], x[1], x[2]))
        merged = _merge_symbols(l, r)
        merges.append((len(merges) + 1, l, r, merged, score))
        for w in segs:
            s = segs[w]
            if len(s) < 2:
                continue
            m, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    m.append(merged)
                    i += 2
                else:
                    m.append(s[i])
                    i += 1
            segs[w] = tuple(m)
    return merges
