"""Deterministic sampling / splitting / ordering for training pipelines.

Every operator here is REPRODUCIBLE BY CONSTRUCTION: given the same
inputs it yields byte-identical outputs on any cluster layout, because
nothing depends on partition boundaries, task scheduling, or RNG state —
only on row content. That is the property training pipelines actually
need (re-run the pipeline, get the same train/val split), and it is what
makes these oracle-checkable against DuckDB.

Scale notes: splits and caps are single-pass column expressions or one
window shuffle on the stratum key; the deterministic shuffle is a sort
by a content hash (one exchange), which at 100 TB is the same cost any
epoch-shuffle pays.

Extends the reference's surface (no sampling ops in xbrianh/xdlake);
mandated by the build brief's training-data-pipeline component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Knuth multiplicative hash constant (golden-ratio / 2^32). Exact in
#: int64 math for 32-bit-ish ids, so Spark and any ANSI SQL engine
#: compute the identical value — unlike xxhash64, which only Spark has.
_KNUTH = 2654435761


def hash_bucket(col, n_buckets: int = 10000):
    """Deterministic, content-only bucket in [0, n_buckets) for an
    integer id column. The basis for splits and shuffles below."""
    return F.pmod((F.col(col) if isinstance(col, str) else col)
                  * F.lit(_KNUTH), F.lit(n_buckets))


def hash_split(df: DataFrame, id_col: str,
               weights: dict[str, float]) -> DataFrame:
    """Assign every row to a named split (train/val/test) by hashing its
    id — stable across runs, partitionings, and cluster sizes, unlike
    ``randomSplit`` (whose assignment depends on partition layout).

    ``weights`` maps split name -> fraction; fractions must sum to 1.
    Returns ``df`` plus a ``split`` column.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket(id_col, 10000)
    expr = None
    acc = 0.0
    items = sorted(weights.items())
    for name, w in items[:-1]:
        acc += w
        cond = bucket < int(round(acc * 10000))
        expr = (F.when(cond, name) if expr is None
                else expr.when(cond, name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def weighted_sample(df: DataFrame, stratum_col: str, id_col: str,
                    rates: dict[str, float],
                    default_rate: float = 1.0) -> DataFrame:
    """Mix reweighting: keep each row with a per-stratum probability —
    the downsampling step a curator runs after a ``corpus_mix`` report
    says one source/language is over-represented.

    Deterministic by construction: the keep decision is
    ``hash_bucket(id) < rate * 10000``, so the SAME rows survive on any
    cluster layout and re-run (and a stratum's sample at rate r is a
    strict SUBSET of its sample at any higher rate — nested samples,
    which lets you dial a mix down without resampling from scratch).
    Strata missing from ``rates`` keep ``default_rate``. Single-pass
    column expression, no shuffle.
    """
    for name, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {name!r} must be in [0, 1]: {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1]: {default_rate}")
    bucket = hash_bucket(id_col, 10000)
    thresh = None
    for name, r in sorted(rates.items()):
        t = F.lit(int(round(r * 10000)))
        cond = F.col(stratum_col) == name
        thresh = (F.when(cond, t) if thresh is None
                  else thresh.when(cond, t))
    dflt = F.lit(int(round(default_rate * 10000)))
    thresh = dflt if thresh is None else thresh.otherwise(dflt)
    return df.filter(bucket < thresh)


def stratum_cap(df: DataFrame, stratum_col: str, id_col: str,
                cap: int) -> DataFrame:
    """Budgeted per-stratum cap: keep at most ``cap`` rows per stratum,
    chosen deterministically (lowest id first). One window shuffle on
    the stratum key; the common way to bound per-language /
    per-domain over-representation in a training mix."""
    w = Window.partitionBy(stratum_col).orderBy(F.col(id_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= cap)
            .drop("__rn"))


def shuffle_order(df: DataFrame, id_col: str,
                  n_shards: int = 1024, epoch: int = 0) -> DataFrame:
    """Deterministic epoch shuffle: a reproducible global order plus a
    shard assignment for sharded writers. Different ``epoch`` values
    derive different (still deterministic) permutations. Adds
    ``shuffle_key`` (sort by it for the global order) and ``shard``."""
    key = F.pmod((F.col(id_col) + F.lit(epoch * 7919)) * F.lit(_KNUTH),
                 F.lit(1 << 32))
    return (df.withColumn("shuffle_key", key)
            .withColumn("shard", F.pmod(F.col("shuffle_key"),
                                        F.lit(n_shards))))


def leakage_safe_split(df: DataFrame, pairs: DataFrame,
                       id_col: str = "doc_id",
                       weights: dict[str, float] | None = None,
                       id_a: str = "id_a", id_b: str = "id_b"
                       ) -> DataFrame:
    """Train/val/test split that keeps every near-duplicate component in
    ONE split — the leakage-safe version of :func:`hash_split`.

    A plain per-document hash split puts two near-identical documents
    in train and test with probability ~2·p·(1-p): the classic
    train/test contamination that inflates eval scores. Here each
    document is first labeled with its connected-component
    representative (min reachable id, via
    ``dedup.connected_components`` over the near-dup ``pairs``;
    unpaired documents represent themselves), and the Knuth hash split
    is applied to the REPRESENTATIVE — so a whole dup cluster moves as
    a unit, and unpaired docs split exactly as ``hash_split`` would.

    Scale shape: the component labeling is the star-contraction (or the
    size-gated union-find) plus one left join on the id; the split
    itself is a pure column expression. Deterministic by construction,
    hence DuckDB-oracle-checkable end to end (recursive-CTE components
    + the same multiplicative-hash CASE).

    Returns ``df`` plus ``split``.
    """
    from .dedup import connected_components

    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    comp = (connected_components(pairs, id_a=id_a, id_b=id_b)
            .withColumnRenamed("id", id_col))
    labeled = (df.join(comp, id_col, "left")
               .withColumn("__rep", F.coalesce(F.col("component"),
                                               F.col(id_col))))
    return hash_split(labeled, "__rep", weights) \
        .drop("__rep", "component")


def weighted_reservoir(df: DataFrame, id_col: str, weight_col,
                       k: int = 100) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement of ``k`` rows
    (Efraimidis & Spirakis A-RES, public): each row draws a uniform
    ``u`` from the md5 of its id and ranks by ``ln(u) / weight`` —
    the top-k by that key is a weighted sample, and because ``u`` is a
    content hash (not an RNG), the same rows win on every run and
    every cluster layout, which also makes the selection
    oracle-checkable against any engine with md5.

    ``ln(u)/w`` is a monotone transform of the textbook ``u^(1/w)``
    key (one log instead of one pow). The uniform takes the first 13
    md5 hex chars (52 bits — exact in a double); +1 offsets guard
    ``ln(0)``.

    Scale: one TakeOrdered (k rows per partition to the driver-side
    merge) — no global sort, no shuffle of data rows.
    """
    u = ((F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 13),
                 16, 10).cast("double") + F.lit(1.0))
         / F.lit(float(16 ** 13 + 1)))
    key = F.log(u) / F.col(weight_col) if isinstance(weight_col, str) \
        else F.log(u) / weight_col
    return (df.withColumn("__ares_key", key)
            .orderBy(F.col("__ares_key").desc(), F.col(id_col))
            .limit(k)
            .drop("__ares_key"))


def temperature_rates(df: DataFrame, stratum_col: str,
                      alpha: float = 0.5) -> dict[str, float]:
    """Temperature-scaled mixture rates: keep-probability per stratum
    so the SAMPLED mix follows ``p_s' ∝ n_s^alpha`` (the multilingual-
    LM sampling rule; ``alpha=1`` keeps the natural mix, ``alpha=0``
    flattens it to uniform). The returned dict feeds
    :func:`weighted_sample`, which applies it with nested-sample
    determinism.

    Rates are pure downsampling (this engine never duplicates rows):
    ``m_s = c * n_s^alpha`` rows kept per stratum with ``c`` chosen as
    large as every stratum allows — the binding constraint is the
    SMALLEST stratum, so ``rate_s = (n_min / n_s)^(1-alpha)`` (the
    smallest stratum keeps everything). Rates are rounded to 4
    decimals so the 1/10000 hash-bucket threshold in weighted_sample
    represents them exactly (oracle-reproducible).

    The aggregate is one map-side-combinable count per stratum —
    stratum cardinality is report-sized, so the dict is driver-safe.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1]: {alpha}")
    counts = {r[0]: r[1] for r in
              df.groupBy(stratum_col)
              .agg(F.count(F.lit(1)).alias("n")).collect()
              if r[0] is not None}
    if not counts:
        return {}
    n_min = min(counts.values())
    return {s: round(min(1.0, (n_min / n) ** (1.0 - alpha)), 4)
            for s, n in sorted(counts.items())}


def token_budget_select(df: DataFrame, score_col: str, token_col: str,
                        id_col: str, budget: int) -> DataFrame:
    """Greedy data selection under a token budget: walk documents in
    (score desc, id asc) order and keep each while the running token
    total stays within ``budget`` — the standard quality-first corpus
    budgeting step ("best N-token subset by this quality signal").

    A naive exact implementation is a global-order running sum — ONE
    reducer holding the whole corpus. This one is exact WITHOUT a
    global window, via score-binned two-pass prefix sums:

    1. bin each row by its score ROUNDED to ``_BIN_DECIMALS`` —
       rounding is monotone, so bin order refines to the exact total
       order (ties land in the same bin);
    2. aggregate token sums per bin (map-side combinable; the bin
       table is at most ~10^_BIN_DECIMALS * score-range rows — report-
       sized), compute each bin's STARTING offset driver-side, and
       broadcast it back;
    3. run the running sum as a window PARTITIONED BY bin (ordered by
       exact score desc, id) plus the bin's offset — per-bin state,
       no single-reducer stage.

    The kept set is byte-identical to the naive global version; rows
    whose running total would cross the budget are dropped (first-fit
    prefix, not best-fit). Output: df's columns + ``running_tokens``
    (the total AFTER including the row).
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0: {budget}")
    binned = df.withColumn("__bin", F.round(F.col(score_col),
                                            _BIN_DECIMALS))
    per_bin = (binned.groupBy("__bin")
               .agg(F.sum(F.col(token_col)).alias("__bt"))
               .collect())
    offsets, acc = {}, 0
    for row in sorted(per_bin, key=lambda r: -r["__bin"]):
        offsets[row["__bin"]] = acc
        acc += row["__bt"]
        if acc > budget and offsets[row["__bin"]] > budget:
            # bins entirely past the budget can't contribute rows;
            # stop materializing offsets for them (broadcast stays
            # small even when the corpus is huge)
            break
    spark = df.sparkSession
    off = spark.createDataFrame(
        [(b, int(o)) for b, o in offsets.items()],
        schema="__bin double, __off long")
    w = (Window.partitionBy("__bin")
         .orderBy(F.col(score_col).desc(), F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, 0))
    return (binned.join(F.broadcast(off), "__bin")
            .withColumn("running_tokens",
                        F.col("__off")
                        + F.sum(F.col(token_col)).over(w))
            .filter(F.col("running_tokens") <= budget)
            .drop("__bin", "__off"))


#: Score-bin width for token_budget_select: 3 decimals keeps the bin
#: table tiny for [0,1]-ish quality scores while still splitting the
#: global running sum across thousands of independent window groups.
_BIN_DECIMALS = 3


def unimax_mix(df: DataFrame, stratum_col: str, size_col: str,
               id_col: str, budget: int,
               max_epochs: int = 4) -> DataFrame:
    """UniMax epoch-capped mixture allocation (Chung et al., 2023,
    "UniMax: Fairer and More Effective Language Sampling for
    Large-Scale Multilingual Pretraining"): share a total training
    budget UNIFORMLY across strata (languages), except no stratum may
    be repeated beyond ``max_epochs`` passes over its data — the
    fairness rule that replaced temperature sampling in PaLM-2-era
    mixes (low-resource languages get an equal share until their
    epoch cap binds, freeing budget for the rest).

    The paper's sequential allocation loop (in exact arithmetic) is
    water-filling, so it collapses to closed form: with per-stratum
    caps ``cap_s = max_epochs * n_s`` sorted ascending, the water
    level is ``U = max_i (budget - prefix_{i-1}) div (L - i + 1)``
    and every stratum gets ``alloc_s = clamp(cap_s, U)`` — pure
    window functions over the k-row stratum table, no driver loop,
    no collect (unlike :func:`temperature_rates`, which collects).
    The discretization is "floor the common water level" (proved
    equal to the exact loop floored at the end by a 300-example
    Hypothesis property, TestUnimaxWaterFillingProperty — a
    per-step-truncating loop would instead cascade remainders onto
    later strata, an order-sensitive policy no engine could replay
    from window functions). All arithmetic is int64 with truncating
    division on non-negative operands, so any SQL engine reproduces
    the allocation exactly.

    Each stratum's allocation then unrolls to per-document copy
    counts: ``full = alloc_s div n_s`` whole epochs for every
    document, plus one extra copy for the deterministic hash-ordered
    prefix whose running ``size_col`` total stays within
    ``alloc_s mod n_s`` (the partial epoch). Output:
    ``(id, stratum, n_copies)`` for rows with ``n_copies > 0`` — a
    repetition plan, not materialized duplicate rows.

    Scale: one map-side-combinable aggregate to the k-row stratum
    table, two tiny windows over it, one broadcast join back, and
    ONE window partitioned by stratum over the corpus (the same
    shape as :func:`stratum_cap`). Up to ``L-1`` budget units can go
    unallocated to integer flooring — by design, for portability.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0: {budget}")
    if max_epochs < 1:
        raise ValueError(f"max_epochs must be >= 1: {max_epochs}")
    base = df.filter(F.col(stratum_col).isNotNull())
    strata = (base.groupBy(stratum_col)
              .agg(F.sum(F.col(size_col).cast("long")).alias("__n")))
    asc = Window.orderBy("__n", stratum_col)
    ordered = (strata
               .withColumn("__cap", F.lit(int(max_epochs)) * F.col("__n"))
               .withColumn("__i", F.row_number().over(asc))
               .withColumn("__L", F.count(F.lit(1)).over(
                   Window.partitionBy()))
               .withColumn("__prefix", F.coalesce(
                   F.sum("__cap").over(
                       asc.rowsBetween(Window.unboundedPreceding, -1)),
                   F.lit(0))))
    # integer water level: max over split points of the uniform share
    # among the strata at or above that point (numerator clamped so
    # truncating division == floor on every engine)
    level = ordered.withColumn(
        "__u", F.expr(f"greatest(0L, {int(budget)}L - __prefix) "
                      "div (__L - __i + 1)"))
    plan = (level
            .withColumn("__U", F.max("__u").over(Window.partitionBy()))
            .withColumn("__alloc",
                        F.greatest(F.lit(0), F.least(F.col("__cap"),
                                                     F.col("__U"))))
            .withColumn("__full", F.expr("__alloc div __n"))
            .withColumn("__rem", F.expr("__alloc % __n"))
            .select(stratum_col, "__full", "__rem"))
    key = F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.lit("unimax"), F.col(id_col).cast("string"))),
        1, 13), 16, 10).cast("long")
    w = (Window.partitionBy(stratum_col).orderBy("__key", id_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    out = (base.select(id_col, stratum_col,
                       F.col(size_col).cast("long").alias("__sz"),
                       key.alias("__key"))
           .join(F.broadcast(plan), stratum_col)
           .withColumn("__csum", F.sum("__sz").over(w))
           .withColumn("n_copies",
                       (F.col("__full")
                        + F.when(F.col("__csum") <= F.col("__rem"), 1)
                        .otherwise(0)).cast("int"))
           .filter(F.col("n_copies") > 0)
           .select(id_col, stratum_col, "n_copies"))
    return out


def shuffle_shards(df: DataFrame, n_shards: int = 64, seed: int = 0,
                   id_col: str = "doc_id") -> DataFrame:
    """Deterministic global shuffle into shards — the data-order
    primitive every pre-training run needs (a corpus must be read in
    a reproducible pseudo-random order, and "order" at 100 TB means
    shard assignment + intra-shard position, never one global
    sequence).

    Each row draws a portable 52-bit key ``md5(seed:id)`` (the same
    hash family as the CMS/bloom/walks, so ANY engine reproduces the
    permutation bit-for-bit), shards on ``key % n_shards`` and ranks
    within its shard by (key, id). One shuffle keyed on the shard;
    the rank window is PARTITIONED BY shard — per-shard state only,
    (corpus/n_shards) rows per partition, no single-reducer stage.
    Reading shards in index order then rows in ``pos`` order replays
    the identical permutation on any cluster layout.

    Output: ``(id, shard, pos)``.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    key = F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.lit(str(seed)), F.col(id_col).cast("string"))),
        1, 13), 16, 10).cast("long")
    w = Window.partitionBy("shard").orderBy("__key", id_col)
    return (df.select(F.col(id_col),
                      key.alias("__key"),
                      F.pmod(key, F.lit(n_shards)).cast("int")
                      .alias("shard"))
            .withColumn("pos", F.row_number().over(w))
            .drop("__key"))
