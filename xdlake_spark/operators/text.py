"""Document-level text-analysis operators (DataFrame in, DataFrame out).

Thin compositions of the column functions in functions/text.py — each
output column is a pure JVM expression, so these run at full codegen speed
over a 100 TB documents table with zero Python in the row path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as X


def analyze_documents(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Per-document metrics: counts, ratios, quality, fingerprint."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        X.char_count(c).alias("n_chars"),
        X.token_count_ws(c).alias("n_tokens_ws"),
        X.token_count_bpe(c).alias("n_tokens_bpe"),
        X.punct_ratio(c).alias("punct_ratio"),
        X.digit_ratio(c).alias("digit_ratio"),
        X.space_ratio(c).alias("space_ratio"),
        X.stopword_ratio(c).alias("stopword_ratio"),
        X.quality_score(c).alias("quality"),
        X.fingerprint_md5(c).alias("fingerprint"),
    )


def detect_language(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Lexicon language-ID with per-language scores."""
    c = F.col(text_col)
    cols = [F.col(id_col)]
    for lang, markers in X.LANG_MARKERS:
        cols.append(X.lang_score(c, markers).alias(f"score_{lang}"))
    cols.append(X.lang_id(c).alias("lang_pred"))
    return df.select(*cols)


def quality_filter(df: DataFrame, min_score: float = 0.5,
                   text_col: str = "text") -> DataFrame:
    """Keep documents with quality >= min_score (the classic pre-training
    corpus filter)."""
    return df.filter(X.quality_score(F.col(text_col)) >= min_score)


def token_count_summary(df: DataFrame, text_col: str = "text",
                        group_col: str = "lang") -> DataFrame:
    """Corpus token accounting grouped by ``group_col`` (the 'how many
    tokens do we have per language' question).

    Per-row metrics are projected once before the aggregation so each
    regex pass over the text runs exactly once per document.
    """
    c = F.col(text_col)
    per_row = df.select(
        group_col,
        X.token_count_ws(c).alias("__ws"),
        X.token_count_bpe(c).alias("__bpe"),
        X.quality_score(c).alias("__q"))
    return (per_row.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("__ws").alias("tokens_ws"),
                 F.sum("__bpe").alias("tokens_bpe"),
                 F.avg("__q").alias("avg_quality"))
            .orderBy(group_col))


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     max_dup_line_frac: float = 0.3,
                     max_dup_2gram_frac: float = 0.2) -> DataFrame:
    """Gopher-style repetition signals per document: the fraction of
    non-empty lines that repeat an earlier line and the fractions of
    word 2-/3-grams that repeat — plus an ``is_repetitive`` flag at the
    published thresholds (0.30 duplicate lines / 0.20 duplicate
    2-grams). Pure JVM column expressions; one pass over the text.
    """
    c = F.col(text_col)
    dl = X.dup_line_fraction(c)
    d2 = X.dup_ngram_fraction(c, 2)
    d3 = X.dup_ngram_fraction(c, 3)
    return df.select(
        F.col(id_col),
        F.round(dl, 6).alias("dup_line_frac"),
        F.round(d2, 6).alias("dup_2gram_frac"),
        F.round(d3, 6).alias("dup_3gram_frac"),
        ((dl > max_dup_line_frac) | (d2 > max_dup_2gram_frac))
        .alias("is_repetitive"))


#: Payment-card candidate patterns (Java∩RE2): a bare 13-19 digit run,
#: and the dddd-dddd-dddd-dddd separator form (dashes stripped before
#: validation). Kept as module constants so the DuckDB oracle embeds
#: the identical strings.
CC_RUN_RE = "[0-9]{13,19}"
CC_SEP_RE = "[0-9]{4}(?:-[0-9]{4}){3}"


def _luhn_digit_sql(c: str, i: str) -> str:
    """SQL for the Luhn contribution of the ``i``-th digit (0-based
    from the RIGHT) of candidate ``c``: odd positions double, with
    digits > 9 reduced by 9."""
    d = f"(ascii(substring(reverse({c}), {i} + 1, 1)) - 48)"
    return (f"(CASE WHEN {i} % 2 = 1 THEN "
            f"IF({d} * 2 > 9, {d} * 2 - 9, {d} * 2) "
            f"ELSE {d} END)")


def credit_card_stats(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Luhn-validated payment-card detection: candidate digit runs
    (bare 13-19 digits, or the dash-separated 4x4 form) are extracted
    with one regex pass each, then CHECKSUM-validated with the Luhn
    algorithm (ISO/IEC 7812) entirely in JVM higher-order functions —
    the validation is what separates a usable PII scrubber from one
    that flags every invoice number and timestamp as a card. Adds
    ``n_cc_candidates``, ``n_cc_valid`` and ``has_valid_cc``.

    Scale: a narrow map pass, no shuffle, no Python; candidates are
    <= 19 chars so the per-digit fold is constant work. The Luhn fold
    and both patterns are shared verbatim with the DuckDB oracle
    (CC_RUN_RE / CC_SEP_RE / the `_luhn_digit_sql` contribution), so
    validity verdicts are engine-exact by construction.
    """
    cands = (f"concat(regexp_extract_all({text_col}, '{CC_RUN_RE}', 0), "
             f"transform(regexp_extract_all({text_col}, "
             f"'{CC_SEP_RE}', 0), x -> replace(x, '-', '')))")
    luhn = ("aggregate(sequence(0, length(c) - 1), 0, "
            "(acc, i) -> acc + " + _luhn_digit_sql("c", "i")
            + ") % 10 = 0")
    valid = f"filter({cands}, c -> {luhn})"
    return df.select(
        F.col(id_col),
        F.expr(f"size({cands})").cast("long").alias("n_cc_candidates"),
        F.expr(f"size({valid})").cast("long").alias("n_cc_valid"),
        F.expr(f"size({valid}) > 0").alias("has_valid_cc"))


def pii_stats(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id",
              redacted: bool = False) -> DataFrame:
    """Per-document PII accounting: email / IPv4 / phone occurrence
    counts plus a ``has_pii`` flag; ``redacted=True`` adds the scrubbed
    text (typed placeholders). Pure JVM regex passes — the patterns are
    restricted to the Java∩RE2 dialect so the DuckDB oracle runs the
    very same strings.
    """
    c = F.col(text_col)
    ne, ni, np_ = X.pii_counts(c)
    cols = [F.col(id_col),
            ne.alias("n_emails"), ni.alias("n_ipv4"),
            np_.alias("n_phones"),
            ((ne + ni + np_) > 0).alias("has_pii")]
    if redacted:
        cols.append(X.redact_pii(c).alias("text_redacted"))
    return df.select(*cols)


def _kgram_arrow_udf(k: int):
    """Vectorized k-gram rolling hashes: identical math to
    functions.text.kgram_hashes (normalize / codepoint / 31-bit
    Rabin-Karp), all positions in order — k numpy vector ops per
    document instead of n*k interpreted HOF steps."""
    import re

    from pyspark.sql.functions import pandas_udf

    mod = X.ROLL_MOD
    base = X.ROLL_BASE
    ws = re.compile("[ \\t\\n\\x0b\\f\\r]+")  # Java \s (ASCII-only)

    @pandas_udf("array<long>")
    def _grams(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            s = ws.sub(" ", (t or "").lower()).strip(" ")
            if not s:
                out.append([])
                continue
            cps = np.frombuffer(s.encode("utf-32-le"),
                                dtype=np.uint32).astype(np.int64)
            n = len(cps)
            if n >= k:
                m = n - k + 1
                h = np.zeros(m, dtype=np.int64)
                for j in range(k):  # Horner step across all positions
                    h = (h * base + cps[j:j + m]) % mod
            else:
                acc = 0
                for c in cps.tolist():
                    acc = (acc * base + c) % mod
                h = np.array([acc], dtype=np.int64)
            out.append(h.tolist())
        return pd.Series(out)

    return _grams


def _winnow_arrow_udf(k: int, window: int):
    """Vectorized winnowing: identical semantics to the JVM expression
    path (same normalize / codepoint / 31-bit Rabin-Karp math), but the
    per-position gram fold runs as k numpy vector ops per document
    instead of n interpreted HOF lambdas — Spark does not codegen
    lambda bodies inside transform/aggregate, which makes the JVM path
    the suite's hottest interpreter loop on large corpora."""
    import re

    from pyspark.sql.functions import pandas_udf

    mod = X.ROLL_MOD
    base = X.ROLL_BASE
    # Java regex \s (ASCII-only) — python's unicode \s would diverge
    ws = re.compile("[ \\t\\n\\x0b\\f\\r]+")

    @pandas_udf("array<long>")
    def _winnow(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            # strip ASCII space ONLY: python's bare strip() removes
            # unicode whitespace ( , 　 ...) that the JVM
            # path's ASCII \s+ collapse + trim leaves in place
            s = ws.sub(" ", (t or "").lower()).strip(" ")
            if not s:
                out.append([])
                continue
            cps = np.frombuffer(s.encode("utf-32-le"),
                                dtype=np.uint32).astype(np.int64)
            n = len(cps)
            if n >= k:
                m = n - k + 1
                h = np.zeros(m, dtype=np.int64)
                for j in range(k):  # Horner step across all positions
                    h = (h * base + cps[j:j + m]) % mod
            else:
                acc = 0
                for c in cps.tolist():
                    acc = (acc * base + c) % mod
                h = np.array([acc], dtype=np.int64)
            g = len(h)
            if g >= window:
                m2 = g - window + 1
                mn = h[:m2].copy()
                for j in range(1, window):
                    np.minimum(mn, h[j:j + m2], out=mn)
            else:
                mn = h.min(keepdims=True)
            out.append(np.unique(mn).tolist())
        return pd.Series(out)

    return _winnow


def winnow_fingerprints(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 8,
                        window: int = 4,
                        use_arrow: "bool | None" = None) -> DataFrame:
    """Winnowing document fingerprints (the MOSS scheme): the distinct
    minima over every ``window`` of consecutive k-char-gram rolling
    hashes of the normalized text. Robust to local edits — an edit only
    perturbs fingerprints within k+window positions of it — which makes
    the fingerprint-set overlap a plagiarism/near-dup signal.

    Output: one row per (doc_id, fingerprint); texts whose normalized
    form is empty produce no rows.

    Two equivalent plans (asserted identical in tests, the same pattern
    as ``simhash_df``):

    - pure JVM (small corpora): the k-gram hash array is bound as a
      lambda variable (single evaluation) before the window fold — but
      HOF lambda bodies are interpreted, not codegen'd, so the fold
      costs n*k interpreter steps per document;
    - arrow (default past a few thousand docs): the same math as k+window
      numpy vector ops per document in an Arrow-batched pandas UDF.

    ``use_arrow=None`` picks by corpus size from Catalyst plan
    statistics (no job); pass an explicit bool to override.
    """
    from . import arrow_gate, ensure_parallelism

    if use_arrow is None:
        use_arrow = arrow_gate(df)

    base = (ensure_parallelism(df)
            .filter(F.length(X.normalize_text(F.col(text_col))) > 0))

    if use_arrow:
        fps = _winnow_arrow_udf(k, window)(F.col(text_col))
        return base.select(F.col(id_col).alias("doc_id"),
                           F.explode(fps).alias("fingerprint"))

    hashes = X.kgram_hashes(F.col(text_col), k)
    withh = base.select(F.col(id_col).alias("doc_id"), hashes.alias("__h"))
    mins = F.transform(
        F.sequence(F.lit(1),
                   F.greatest(F.size("__h") - window + 1, F.lit(1))),
        lambda i: F.array_min(F.slice("__h", i, window)))
    return withh.select(
        "doc_id",
        F.explode(F.array_sort(F.array_distinct(mins))).alias("fingerprint"))


def winnow_overlap_pairs(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", k: int = 8,
                         window: int = 4,
                         threshold: float = 0.5,
                         bucket_cap: int = 2000,
                         max_doc_freq: int | None = None,
                         use_arrow: "bool | None" = None) -> DataFrame:
    """Near-dup pairs by winnowing-fingerprint overlap (the MOSS
    match metric): pairs whose shared fingerprints cover >= threshold
    of the SMALLER document's fingerprint set (overlap coefficient —
    robust to length mismatch, catches containment).

    Inverted-index join on the fingerprint (same shape as the ngram
    jaccard join): only docs sharing at least one fingerprint are ever
    paired, so candidate generation is ~linear in corpus size, never
    all-pairs. One shuffle on the fingerprint, one on the pair. The
    per-fingerprint join is tiled by ``bucket_cap``
    (dedup._bounded_bucket_pairs, count-preserving mode) so one
    boilerplate fingerprint shared by k docs spreads its k^2/2 pair
    emissions over bounded block tasks — result identical.

    ``max_doc_freq``: scale valve for skew (same knob as
    ``ngram_jaccard_pairs``). A fingerprint present in s docs emits
    s*(s-1)/2 candidate pairs, so one boilerplate fingerprint can
    dominate the join even when tiled (the tiling bounds the straggler,
    not the total work). Setting a cutoff drops fingerprints whose
    document frequency exceeds it from BOTH the index and the overlap
    denominators, so the overlap coefficient stays a true ratio over
    the surviving (discriminative) fingerprint sets. None = exact MOSS.
    """
    from .dedup import _bounded_bucket_pairs

    fps = winnow_fingerprints(df, text_col, id_col, k, window,
                              use_arrow=use_arrow) \
        .localCheckpoint(eager=False)
    if max_doc_freq is not None:
        keep = (fps.groupBy("fingerprint")
                .agg(F.count(F.lit(1)).alias("__df"))
                .filter(F.col("__df") <= max_doc_freq)
                .select("fingerprint"))
        fps = fps.join(keep, "fingerprint").localCheckpoint(eager=False)
    sizes = fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("__n"))
    inter = (_bounded_bucket_pairs(
                fps.select(F.col("doc_id").alias("id"), "fingerprint"),
                ["fingerprint"], bucket_cap=bucket_cap, distinct=False)
             .groupBy("id_a", "id_b")
             .agg(F.count(F.lit(1)).alias("n_shared")))
    sa = sizes.select(F.col("doc_id").alias("id_a"),
                      F.col("__n").alias("__na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"),
                      F.col("__n").alias("__nb"))
    overlap = (F.col("n_shared").cast("double")
               / F.least(F.col("__na"), F.col("__nb")))
    return (inter.join(sa, "id_a").join(sb, "id_b")
            .withColumn("overlap", overlap)
            .filter(F.col("overlap") >= threshold)
            .select("id_a", "id_b", "n_shared", "overlap"))


def normalize_text(df: DataFrame, text_col: str = "text",
                   out_col: str = "norm_text") -> DataFrame:
    """Canonical text normalization for dedup/matching: Unicode NFC
    composition, lowercase, zero-width/soft-hyphen/BOM stripping, and
    whitespace collapse — the standard prep before exact or fuzzy
    dedup so visually-identical variants (decomposed accents, sneaky
    ZWSPs, case and spacing noise) hash identically.

    NFC is the one step Spark has no built-in for (it needs the full
    Unicode composition tables), so it runs as an Arrow-batched pandas
    UDF over ``unicodedata.normalize`` — vectorized transfer, never
    row-at-a-time Python; every other step is a JVM expression. The
    UDF is position-stable and stateless, safe at any parallelism.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata
        return s.map(lambda x: None if x is None
                     else unicodedata.normalize("NFC", x))

    # ZWSP, ZWNJ, ZWJ, BOM/ZWNBSP, soft hyphen
    cleaned = F.regexp_replace(
        F.lower(_nfc(F.col(text_col))),
        "[\u200b\u200c\u200d\ufeff\u00ad]", "")
    collapsed = F.trim(F.regexp_replace(cleaned, r"\s+", " "))
    return df.withColumn(out_col, collapsed)


#: cp1252 images of every UTF-8 lead byte 0xC2–0xF4 — a mojibake text
#: ALWAYS contains at least one of these (lead bytes are >= 0xA0, where
#: cp1252 and latin-1 agree and are fully mapped), so this class is a
#: complete prefilter for one-round UTF-8-as-cp1252/latin-1 damage.
_MOJIBAKE_MARKER = ("["
                    + "".join(bytes([b]).decode("cp1252")
                              for b in range(0xC2, 0xF5))
                    + "]")


def fix_mojibake(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 max_rounds: int = 3) -> DataFrame:
    """Repair UTF-8-read-as-cp1252 double encoding — the classic
    web-crawl corruption ('Ã©' -> 'é', 'â€“' -> en dash, 'â€œ' ->
    left quote), including texts corrupted more than once.

    The repair rule is deterministic and CONSERVATIVE: one round
    re-encodes the text as cp1252 (per-character latin-1 fallback for
    the C1 controls U+0080–U+009F — inverting both the "sloppy"
    cp1252 convention real decoders use AND plain latin-1 decodes) and
    re-decodes it as strict UTF-8; the round applies only when both
    steps succeed AND the text strictly shortens (a multibyte UTF-8
    sequence always shrinks when its mojibake collapses). Clean ASCII
    round-trips to itself (not shorter -> untouched) and genuinely
    accented text fails the strict UTF-8 decode (its cp1252 bytes are
    not valid UTF-8 -> untouched), so false repairs need an
    adversarial text that IS valid doubly-encoded UTF-8 — vanishingly
    rare in natural language. Rounds repeat to a fixed point
    (``max_rounds`` caps pathological inputs).

    Scale: a JVM ``rlike`` prefilter keys the Python path — only rows
    carrying a mojibake lead character (the cp1252 image of every
    UTF-8 lead byte 0xC2–0xF4, generated programmatically below: Â–ô,
    covering Latin-Extended, CJK 'ä¸­', and emoji 'ðŸ…' mojibake)
    enter the Arrow-batched UDF; a clean corpus pays one fused regex
    scan and zero Python. Returns the input columns with ``text_col``
    repaired plus ``mojibake_rounds`` (0 = untouched).
    """
    from pyspark.sql.functions import pandas_udf

    def _sloppy_cp1252(x: str):
        """Encode as "sloppy cp1252": cp1252 per character, with a
        latin-1 fallback for ONLY the C1 control code points
        U+0080–U+009F — the exact inverse of BOTH real decode
        conventions (a sloppy-cp1252 decoder emits C1 controls for
        cp1252's five unmapped bytes; a latin-1 decoder emits them
        for all of 0x80–0x9F), so mixed texts like 'ãŒ' ('が') still encode.
        Returns None when any other character has no cp1252 image."""
        try:
            return x.encode("cp1252")
        except UnicodeEncodeError:
            pass
        out = bytearray()
        for ch in x:
            try:
                out += ch.encode("cp1252")
            except UnicodeEncodeError:
                if "\u0080" <= ch <= "\u009f":
                    out += ch.encode("latin-1")
                else:
                    return None
        return bytes(out)

    def _repair_one(x: str, rounds: int):
        for r in range(rounds):
            b = _sloppy_cp1252(x)
            if b is None:
                return x, r
            try:
                y = b.decode("utf-8")
            except UnicodeDecodeError:
                return x, r
            if len(y) >= len(x):
                return x, r
            x = y
        return x, rounds

    @pandas_udf("struct<text: string, rounds: int>")
    def _fix(s: pd.Series) -> pd.DataFrame:
        out_t, out_r = [], []
        for x in s:
            if x is None:
                out_t.append(None)
                out_r.append(0)
                continue
            t, r = _repair_one(x, max_rounds)
            out_t.append(t)
            out_r.append(r)
        return pd.DataFrame({"text": out_t, "rounds": out_r})

    suspect = F.col(text_col).rlike(_MOJIBAKE_MARKER)
    fixed = F.when(suspect, _fix(F.col(text_col))).otherwise(
        F.struct(F.col(text_col).alias("text"),
                 F.lit(0).alias("rounds")))
    others = [c for c in df.columns if c != text_col]
    return (df.withColumn("__fx", fixed)
            .select(*others,
                    F.col("__fx.text").alias(text_col),
                    F.col("__fx.rounds").alias("mojibake_rounds")))


#: Unicode scripts for corpus triage: profile name -> (Java regex
#: script class, DuckDB/RE2 class). Script classes, not blocks — both
#: engines count the same character sets (parity pinned in tests and
#: the oracle-exact `text_script_profile`).
SCRIPTS = [
    ("latin", r"\p{IsLatin}", r"\p{Latin}"),
    ("cyrillic", r"\p{IsCyrillic}", r"\p{Cyrillic}"),
    ("greek", r"\p{IsGreek}", r"\p{Greek}"),
    ("arabic", r"\p{IsArabic}", r"\p{Arabic}"),
    ("hebrew", r"\p{IsHebrew}", r"\p{Hebrew}"),
    ("devanagari", r"\p{IsDevanagari}", r"\p{Devanagari}"),
    ("han", r"\p{IsHan}", r"\p{Han}"),
    ("hangul", r"\p{IsHangul}", r"\p{Hangul}"),
    ("kana", r"[\p{IsHiragana}\p{IsKatakana}]",
     r"[\p{Hiragana}\p{Katakana}]"),
]


def script_profile(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-document Unicode SCRIPT profile — the triage step before
    language ID in a multilingual corpus (langid models are per-script
    families; mixed-script docs are their own quality signal). Counts
    characters per script (regexp_count, pure JVM — one codegen pass,
    zero shuffle), plus ``dominant_script`` (argmax, ties to the
    alphabetically first — 'none' when nothing matched) and
    ``script_mix`` (number of scripts present).
    """
    c = F.col(text_col)
    counts = {name: F.regexp_count(c, F.lit(java)).alias(f"n_{name}")
              for name, java, _ in SCRIPTS}
    # argmax via array_max over (n, rank, name) structs: struct compare
    # is lexicographic, and rank is the DESCENDING alphabetical position
    # so count ties resolve to the alphabetically-first script
    ordered = sorted(name for name, _, _ in SCRIPTS)
    rank = {name: len(ordered) - i for i, name in enumerate(ordered)}
    scored = F.array(*[
        F.struct(F.col(f"n_{name}").alias("n"),
                 F.lit(rank[name]).alias("r"),
                 F.lit(name).alias("script"))
        for name, _, _ in SCRIPTS])
    best = F.array_max(scored)
    out = df.select(F.col(id_col), *counts.values())
    return out.select(
        id_col, *[f"n_{name}" for name, _, _ in SCRIPTS],
        F.when(best["n"] > 0, best["script"]).otherwise(F.lit("none"))
        .alias("dominant_script"),
        sum((F.when(F.col(f"n_{name}") > 0, 1).otherwise(0)
             for name, _, _ in SCRIPTS), F.lit(0))
        .cast("int").alias("script_mix"))


def compression_ratio(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      level: int = 6) -> DataFrame:
    """Per-document zlib compression ratio — the classic cheap
    repetitiveness/quality signal (RefinedWeb-style: highly
    compressible text is boilerplate or spam; incompressible text is
    often binary junk or mojibake). Returns ``(id, n_bytes,
    n_compressed, ratio)`` with ratio = compressed/original rounded to
    6 (empty docs: ratio 1.0).

    Python is unavoidable (zlib), so the pass is an Arrow-batched
    mapInPandas like the codec paths: one worker pass per partition,
    zero shuffle, text bytes never leave their partition. zlib output
    is deterministic for a fixed level, pinned by a python twin in
    tests.
    """
    import zlib
    from collections.abc import Iterator as _It

    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("n_compressed", T.IntegerType()),
        T.StructField("ratio", T.DoubleType()),
    ])

    def run(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                raw = (text or "").encode("utf-8")
                comp = zlib.compress(raw, level) if raw else b""
                rows.append({
                    id_col: int(doc_id),
                    "n_bytes": len(raw),
                    "n_compressed": len(comp),
                    "ratio": round(len(comp) / len(raw), 6)
                    if raw else 1.0,
                })
            yield pd.DataFrame(rows, columns=[f.name
                                              for f in schema.fields])

    return df.select(id_col, text_col).mapInPandas(run, schema=schema)
