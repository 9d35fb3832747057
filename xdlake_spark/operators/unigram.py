"""Distributed unigram-LM (SentencePiece-style) tokenizer training.

The other canonical subword tokenizer of LLM pipelines (Kudo 2018,
"Subword Regularization: Improving Neural Network Translation Models
with Multiple Subword Candidates" — public algorithm): model a word as
the most likely segmentation under a unigram language model over
pieces, train piece probabilities by EM, and shrink a large seed
vocabulary down to the target size by dropping the least-useful pieces.
Complements :mod:`.bpe` (merge-based) with the probabilistic trainer;
the reference (xbrianh/xdlake) has no text operators at all.

Scale design — the same shape as the BPE trainer:

- everything runs over the DISTINCT-WORD frequency table (at 100 TB the
  corpus is billions of documents, the word table ~10^8 rows);
- seed-candidate generation is one JVM-side substring explode +
  map-side-combinable groupBy (no Python);
- each EM iteration is one Arrow-batched ``mapInPandas`` pass
  (forward-backward per word — inherently sequential per word, words
  are short and bounded) emitting (piece, expected-count) rows, then
  one map-side-combinable sum. Only the vocab-sized count vector ever
  reaches the driver (the k-means-centroid class of materialization);
- the M-step, pruning and convergence decisions are driver-side
  arithmetic over that vocab-sized vector.

Differential-tested against a pure-Python sequential implementation of
the same EM (tests/test_operators.py::TestUnigram), mirroring
``reference_bpe``.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .bpe import _word_freq

#: sentinel piece key carrying the corpus log-likelihood through the
#: (piece, count) aggregation; '\x00' cannot appear in a real piece
_LL_KEY = "\x00loglik"

VOCAB_SCHEMA = T.StructType([
    T.StructField("piece", T.StringType()),
    T.StructField("logprob", T.DoubleType()),
    T.StructField("expected_count", T.DoubleType()),
])


def _seed_candidates(words: DataFrame, max_piece_len: int,
                     seed_size: int, min_count: int) -> pd.DataFrame:
    """Frequency-weighted counts of every substring (length <=
    ``max_piece_len``) of the distinct-word table — one JVM explode +
    groupBy; returns the driver-side top ``seed_size`` multi-char
    candidates plus every single character."""
    subs = words.select(
        "freq",
        F.explode(F.flatten(F.expr(f"""
            transform(sequence(1, length(word)), i ->
                transform(sequence(i, least(length(word),
                                            i + {max_piece_len - 1})),
                          j -> substring(word, i, j - i + 1)))
        """))).alias("piece"))
    counts = (subs.groupBy("piece")
              .agg(F.sum("freq").alias("cnt")))
    chars = (counts.filter(F.length("piece") == 1)
             .toPandas())
    multi = (counts.filter((F.length("piece") > 1)
                           & (F.col("cnt") >= min_count))
             # seed score = count * len (SentencePiece's ranking):
             # prefer long pieces that still occur often
             .withColumn("score", F.col("cnt") * F.length("piece"))
             .orderBy(F.col("score").desc(), "piece")
             .limit(seed_size)
             .drop("score")
             .toPandas())
    return pd.concat([chars, multi], ignore_index=True)


def _forward_backward(word: str, freq: float, logp: dict,
                      max_len: int, counts: dict) -> float:
    """Expected piece counts for one word under the unigram LM (all
    segmentations, forward-backward in log space); accumulates
    ``freq``-weighted counts into ``counts`` and returns the word's
    ``freq``-weighted log-likelihood. Unreachable words contribute 0.

    One substring+vocab-lookup pass builds ``spans`` (the in-vocab
    pieces per start position); the alpha/beta/gamma loops then read
    the table instead of re-slicing and re-hashing each piece three
    times (r12 — E-steps are the trainer's CPU budget). The log-sum-exp
    folds visit (j, i) pairs in exactly the original loop order, so
    every float is bit-identical to the three-pass form."""
    n = len(word)
    NEG = float("-inf")
    log1p, exp = math.log1p, math.exp
    spans = []
    for j in range(n):
        row = []
        for i in range(j + 1, min(n, j + max_len) + 1):
            lp = logp.get(word[j:i])
            if lp is not None:
                row.append((i, lp, word[j:i]))
        spans.append(row)
    alpha = [NEG] * (n + 1)
    alpha[0] = 0.0
    # scatter form: outer j ascending == for each i, contributions fold
    # in ascending-j order, the original gather sequence
    for j in range(n):
        aj = alpha[j]
        if aj == NEG:
            continue
        for i, lp, _ in spans[j]:
            v = aj + lp
            acc = alpha[i]
            alpha[i] = v if acc == NEG else (
                max(acc, v) + log1p(exp(-abs(acc - v))))
    if alpha[n] == NEG:
        return 0.0
    beta = [NEG] * (n + 1)
    beta[n] = 0.0
    for j in range(n - 1, -1, -1):
        acc = NEG
        for i, lp, _ in spans[j]:
            bi = beta[i]
            if bi == NEG:
                continue
            v = lp + bi
            acc = v if acc == NEG else (
                max(acc, v) + log1p(exp(-abs(acc - v))))
        beta[j] = acc
    z = alpha[n]
    for j in range(n):
        aj = alpha[j]
        if aj == NEG:
            continue
        for i, lp, p in spans[j]:
            bi = beta[i]
            if bi == NEG:
                continue
            gamma = exp(aj + lp + bi - z)
            if gamma > 1e-12:
                counts[p] = counts.get(p, 0.0) + freq * gamma
    return freq * z


def _estep(words: DataFrame, logp: dict, max_len: int) -> dict:
    """One distributed E-step: (piece -> expected count) plus the
    corpus log-likelihood under ``_LL_KEY``. ``logp`` rides to the
    executors inside the closure (vocab-sized, broadcast-class)."""

    def gen(batches):
        for pdf in batches:
            counts: dict = {}
            ll = 0.0
            for word, freq in zip(pdf["word"], pdf["freq"]):
                ll += _forward_backward(word, float(freq), logp,
                                        max_len, counts)
            counts[_LL_KEY] = ll
            yield pd.DataFrame({"piece": list(counts),
                                "cnt": list(counts.values())})

    agg = (words.mapInPandas(gen, "piece string, cnt double")
           .groupBy("piece").agg(F.sum("cnt").alias("cnt")))
    return {r["piece"]: r["cnt"] for r in agg.collect()}


def _mstep(counts: dict) -> dict:
    """Maximum-likelihood piece probabilities from expected counts."""
    total = sum(v for k, v in counts.items()
                if k != _LL_KEY and v > 0)
    return {k: math.log(v / total) for k, v in counts.items()
            if k != _LL_KEY and v > 0}


def train_unigram(df: DataFrame, text_col: str = "text",
                  vocab_size: int = 512, seed_size: int = 4096,
                  max_piece_len: int = 8, em_iters: int = 2,
                  shrink: float = 0.75, min_seed_count: int = 2,
                  lowercase: bool = True) -> DataFrame:
    """Learn a unigram-LM piece vocabulary. Returns a DataFrame
    ``(piece, logprob, expected_count)`` of exactly the surviving
    pieces, logprob normalized over them.

    Loop: seed (substring counts) -> repeat {``em_iters`` EM rounds,
    then keep the ``shrink`` fraction of multi-char pieces with the
    highest expected counts} until ``vocab_size`` is reached (single
    characters are never pruned, so every word stays segmentable) ->
    one final EM round re-normalizes the survivors. Deterministic:
    ties rank lexicographically.
    """
    spark = df.sparkSession
    # session-parallelism pin before the checkpoint: AQE coalesces the
    # small word-freq shuffle to one partition, which would run every
    # E-step's forward-backward Python single-threaded (the E-step is
    # CPU-bound over the distinct-word table; spreading it is the
    # whole point of distributing EM). Deterministic hash layout; the
    # piece-count sums tolerate partition-order float drift by design
    # (tests pin 1e-9, outputs round to 6).
    par = spark.sparkContext.defaultParallelism
    words = _word_freq(df, text_col, lowercase) \
        .repartition(par, "word") \
        .localCheckpoint(eager=False)
    seed = _seed_candidates(words, max_piece_len, seed_size,
                            min_seed_count)
    total = float(seed["cnt"].sum())
    logp = {p: math.log(c / total)
            for p, c in zip(seed["piece"], seed["cnt"])}

    def n_multi(d: dict) -> int:
        return sum(1 for k in d if len(k) > 1)

    n_chars = len(logp) - n_multi(logp)
    while True:
        counts = {}
        for _ in range(em_iters):
            counts = _estep(words, logp, max_piece_len)
            logp = _mstep(counts)
        if len(logp) <= max(vocab_size, n_chars):
            break
        # prune: multi-char pieces ranked by expected count; keep the
        # top shrink-fraction, floored at the target size
        multi = sorted(
            ((counts.get(k, 0.0), k) for k in logp if len(k) > 1),
            key=lambda t: (-t[0], t[1]))
        keep = max(int(len(multi) * shrink), vocab_size - n_chars)
        if keep >= len(multi):
            break  # cannot shrink further without passing the target
        kept = {k for _, k in multi[:keep]}
        logp = {k: v for k, v in logp.items()
                if len(k) == 1 or k in kept}

    counts = _estep(words, logp, max_piece_len)
    logp = _mstep(counts)
    rows = sorted(((p, lp, counts.get(p, 0.0))
                   for p, lp in logp.items()),
                  key=lambda t: (-t[2], t[0]))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["piece", "logprob",
                                    "expected_count"])
        if rows else pd.DataFrame(columns=["piece", "logprob",
                                           "expected_count"]),
        schema=VOCAB_SCHEMA)


def viterbi_segment(word: str, logp: dict, max_len: int) -> list[str]:
    """Most-likely segmentation of ``word`` under the unigram LM;
    characters missing from the vocab fall back to single-char pieces
    with a large penalty (never fails)."""
    n = len(word)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    unk = min(logp.values(), default=0.0) - 10.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j > 1:
                    continue
                lp = unk  # unseen character
            if best[j] == NEG:
                continue
            v = best[j] + lp
            if v > best[i]:
                best[i], back[i] = v, j
    out = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return out[::-1]


def apply_unigram(df: DataFrame, vocab: "DataFrame | dict",
                  text_col: str = "text", id_col: str = "doc_id",
                  max_piece_len: int = 8,
                  lowercase: bool = True) -> DataFrame:
    """Tokenize with a trained vocab: ``(id, n_tokens, n_unk)`` per
    document — Viterbi per word inside one Arrow-batched pass, the
    vocab riding in the closure. ``id`` keeps the input column's native
    type (same posture as :func:`~.bpe.apply_bpe`). Per-worker word
    memo (r12; hoisted out of the per-Arrow-batch UDF body in r13 so
    reuse survives across batches): Viterbi is a pure function of the
    word and word frequency is Zipfian, so each worker segments a
    distinct word once and serves repeats from a dict."""
    from .bpe import _MEMO_CAP

    if isinstance(vocab, DataFrame):
        pdf = vocab.select("piece", "logprob").toPandas()
        logp = dict(zip(pdf["piece"], pdf["logprob"]))
    else:
        logp = dict(vocab)
    known = set(logp)
    memo: dict = {}

    def run(texts: pd.Series) -> pd.DataFrame:
        n_toks, n_unks = [], []
        for text in texts:
            toks = 0
            unks = 0
            t = (text or "")
            if lowercase:
                t = t.lower()
            for w in t.split():
                cached = memo.get(w)
                if cached is None:
                    pieces = viterbi_segment(w, logp, max_piece_len)
                    if len(memo) >= _MEMO_CAP:
                        memo.clear()
                    memo[w] = cached = (
                        len(pieces),
                        sum(1 for p in pieces if p not in known))
                toks += cached[0]
                unks += cached[1]
            n_toks.append(toks)
            n_unks.append(unks)
        return pd.DataFrame({"n_tokens": n_toks, "n_unk": n_unks})

    from . import ensure_parallelism
    tok_udf = F.pandas_udf(
        run, T.StructType([T.StructField("n_tokens", T.LongType()),
                           T.StructField("n_unk", T.LongType())]))
    return (ensure_parallelism(df)
            .select(F.col(id_col).alias("id"),
                    tok_udf(F.col(text_col)).alias("__t"))
            .select("id", F.col("__t.n_tokens").alias("n_tokens"),
                    F.col("__t.n_unk").alias("n_unk")))


def reference_unigram(word_freqs: "dict[str, int]", vocab_size: int,
                      seed_size: int = 4096, max_piece_len: int = 8,
                      em_iters: int = 2, shrink: float = 0.75,
                      min_seed_count: int = 2) -> dict:
    """Sequential reference: same seed, EM and prune schedule as
    :func:`train_unigram`, pure Python — the differential oracle."""
    sub_counts: dict = {}
    for w, f in word_freqs.items():
        for j in range(len(w)):
            for i in range(j + 1, min(len(w), j + max_piece_len) + 1):
                p = w[j:i]
                sub_counts[p] = sub_counts.get(p, 0) + f
    chars = {p: c for p, c in sub_counts.items() if len(p) == 1}
    multi = sorted(((c * len(p), c, p) for p, c in sub_counts.items()
                    if len(p) > 1 and c >= min_seed_count),
                   key=lambda t: (-t[0], t[2]))[:seed_size]
    seed = dict(chars)
    seed.update({p: c for _, c, p in multi})
    total = float(sum(seed.values()))
    logp = {p: math.log(c / total) for p, c in seed.items()}
    n_chars = len(chars)

    def estep(lp):
        counts: dict = {}
        ll = 0.0
        for w, f in word_freqs.items():
            ll += _forward_backward(w, float(f), lp, max_piece_len,
                                    counts)
        counts[_LL_KEY] = ll
        return counts

    while True:
        counts = {}
        for _ in range(em_iters):
            counts = estep(logp)
            logp = _mstep(counts)
        if len(logp) <= max(vocab_size, n_chars):
            break
        mult = sorted(((counts.get(k, 0.0), k)
                       for k in logp if len(k) > 1),
                      key=lambda t: (-t[0], t[1]))
        keep = max(int(len(mult) * shrink), vocab_size - n_chars)
        if keep >= len(mult):
            break
        kept = {k for _, k in mult[:keep]}
        logp = {k: v for k, v in logp.items()
                if len(k) == 1 or k in kept}
    counts = estep(logp)
    return _mstep(counts)
