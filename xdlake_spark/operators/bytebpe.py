"""Distributed byte-level BPE (the GPT-2 tokenizer family).

The production LLM tokenizer shape (Radford et al. 2019, public
algorithm + the released GPT-2 tokenizer code): text is first split by
the GPT-2 PRE-TOKENIZATION regex (contractions, optionally-space-
prefixed letter runs, digit runs, punctuation runs, trailing
whitespace), each pre-token's UTF-8 BYTES are mapped through the
reversible printable-unicode byte table, and BPE merges run over those
byte units WITHIN pre-tokens — no end-of-word sentinel, no unknown
tokens ever (every byte has a unit), and spaces travel with the word
('Ġ' prefix).

Scale design mirrors operators/bpe.py (whose pair-count and merge-
application machinery this module reuses): pre-tokenization and
counting are corpus-scale but pure JVM (one regexp_extract_all +
explode + groupBy); the byte mapping and the training loop run over
the DISTINCT pre-token table (vocab-scale). ``batch_k`` merges several
pairwise-disjoint top pairs per round, same contract as train_bpe.
Differential-tested against a sequential byte-BPE reference
(tests/test_bytebpe.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .bpe import MERGE_SCHEMA, _apply_merges_udf, _pair_counts

#: GPT-2 pre-tokenization pattern. Written in the Java∩`regex`-module
#: dialect: \p{L}/\p{N} are Unicode categories in both; the (?U) flag
#: (stripped for Python) makes Java's \s Unicode-aware to match
#: Python's.
GPT2_SPLIT = (r"'s|'t|'re|'ve|'m|'ll|'d"
              r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
              r"|\s+(?!\S)|\s+")


def bytes_to_unicode() -> "dict[int, str]":
    """GPT-2's reversible byte -> printable-unicode table: the three
    printable latin-1 ranges map to themselves, every other byte maps
    to U+0100+n in first-gap order (public algorithm from the released
    GPT-2 encoder)."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


_B2U = bytes_to_unicode()
_U2B = {u: b for b, u in _B2U.items()}


def _to_units(pretoken: str) -> "list[str]":
    return [_B2U[b] for b in pretoken.encode("utf-8")]


def units_to_text(units: "list[str] | str") -> str:
    """Inverse mapping: token unit string(s) -> original text bytes ->
    str (lossless round trip; the reason byte-BPE has no [UNK])."""
    s = "".join(units) if not isinstance(units, str) else units
    return bytes(_U2B[ch] for ch in s).decode("utf-8")


def _pretoken_freq(df: DataFrame, text_col: str) -> DataFrame:
    """Distinct GPT-2 pre-tokens with corpus frequencies — the
    corpus-scale step, pure JVM (one fused regex pass + one
    map-side-combinable groupBy). The regex map side runs inside the
    scan stage: spread it when the input arrives as a single split
    (no-op at cluster scale)."""
    from . import ensure_parallelism
    toks = F.regexp_extract_all(F.col(text_col),
                                F.lit("(?U)" + GPT2_SPLIT), F.lit(0))
    return (ensure_parallelism(df)
            .select(F.explode(toks).alias("word"))
            .filter(F.length("word") > 0)
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def _init_units_udf():
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def run(words: pd.Series) -> pd.Series:
        return words.map(_to_units)
    return run


def train_byte_bpe(df: DataFrame, text_col: str = "text",
                   n_merges: int = 50, batch_k: int = 1,
                   min_pair_count: int = 2,
                   checkpoint_every: int = 6) -> DataFrame:
    """Learn a byte-level BPE merge table over the GPT-2 pre-token
    units. Returns ``(rank, left, right, merged, pair_count)`` in
    merge order; ties break (count desc, left, right); ``batch_k > 1``
    applies up to k symbol-disjoint merges per round (train_bpe's
    contract); stops early when no pair reaches ``min_pair_count``.
    No lowercasing — byte-BPE is case-preserving by design."""
    spark = df.sparkSession
    # NOTE (r12): not pinned at session parallelism — per-round work
    # per pre-token is tiny, so the AQE byte-coalesced layout is right
    # at every scale (see train_bpe); only unigram's CPU-bound E-step
    # warrants the explicit spread.
    words = (_pretoken_freq(df, text_col)
             .select("freq", _init_units_udf()(F.col("word"))
                     .alias("syms"))
             .localCheckpoint(eager=False))
    merges: list = []
    rounds = 0
    while len(merges) < n_merges:
        want = min(batch_k, n_merges - len(merges))
        top = (_pair_counts(words)
               .filter(F.col("pair_count") >= min_pair_count)
               .orderBy(F.col("pair_count").desc(), "left", "right")
               .limit(4 * want + 8).collect())
        if not top:
            break
        chosen: list = []
        used: set = set()
        for row in top:
            if len(chosen) >= want:
                break
            syms = {row["left"], row["right"],
                    row["left"] + row["right"]}
            if used & syms:
                continue
            used |= syms
            chosen.append(row)
        for row in chosen:
            merges.append((len(merges) + 1, row["left"], row["right"],
                           row["left"] + row["right"],
                           int(row["pair_count"])))
        words = words.select(
            "freq",
            _apply_merges_udf([(r["left"], r["right"])
                               for r in chosen])(F.col("syms"))
            .alias("syms"))
        rounds += 1
        if rounds % checkpoint_every == 0:
            words = words.localCheckpoint(eager=False)
    cols = [f.name for f in MERGE_SCHEMA.fields]
    return spark.createDataFrame(
        pd.DataFrame(merges, columns=cols) if merges
        else pd.DataFrame(columns=cols), schema=MERGE_SCHEMA)


def apply_byte_bpe(df: DataFrame, merges: "DataFrame | list",
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Tokenize with a learned byte-BPE merge table: GPT-2 regex
    pre-tokenization, byte -> unit mapping, then every merge in rank
    order within each pre-token. Returns ``(id, tokens, n_tokens)``;
    ``units_to_text("".join(tokens))`` reconstructs the text exactly
    (no [UNK], pinned in tests). The merge list ships in the UDF
    closure (vocab-sized); the corpus never moves. Per-worker
    pre-token memo (r12; hoisted out of the per-Arrow-batch UDF body
    in r13 so reuse survives across batches): merge replay is a pure
    function of the pre-token and pre-token frequency is Zipfian, so
    each worker replays a distinct pre-token once and serves repeats
    from a dict — the ``lru_cache`` of the released GPT-2 encoder."""
    import regex as _rx

    from .bpe import _MEMO_CAP
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("rank").collect()
        merge_list = [(r["left"], r["right"]) for r in rows]
    else:
        merge_list = list(merges)
    pat = _rx.compile(GPT2_SPLIT)
    memo: dict = {}

    def run(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks: list = []
            for w in pat.findall(t or ""):
                cached = memo.get(w)
                if cached is None:
                    s = _to_units(w)
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


def reference_byte_bpe(pretoken_freqs: "dict[str, int]",
                       n_merges: int,
                       min_pair_count: int = 2) -> list:
    """Sequential byte-BPE (the differential-test oracle): same unit
    mapping, scoring, and tie-breaks as ``train_byte_bpe(batch_k=1)``."""
    segs = {w: tuple(_to_units(w)) for w in pretoken_freqs}
    merges: list = []
    for _ in range(n_merges):
        counts: dict = {}
        for w, f in pretoken_freqs.items():
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


def gpt2_pretokenize(text: str) -> "list[str]":
    """The shared pre-tokenizer, sequential form (regex module — same
    Unicode semantics the (?U) Java pattern gives the JVM path)."""
    import regex as _rx
    return _rx.findall(GPT2_SPLIT, text or "")
