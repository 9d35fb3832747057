"""DoReMi-style domain-mixture reweighting (Xie et al. 2023, "DoReMi:
Optimizing Data Mixtures Speeds Up Language Model Pretraining" —
public algorithm).

DoReMi's Group-DRO weighting algebra, with the transformer proxy
replaced by the one language model this engine can train exactly and
distributedly: an add-k-smoothed BIGRAM LM. The substitution keeps the
method's structure intact — a REFERENCE model per domain (the best a
model tuned to that domain alone achieves), a PROXY model trained on
the current mixture, per-domain EXCESS loss (proxy minus reference,
clipped at 0), and multiplicative-weights updates with uniform
smoothing — while making every quantity a closed-form aggregation, so
the whole optimization is deterministic and numpy-twin testable (no
SGD, no sampling).

Scale: ONE corpus pass builds the per-domain bigram count table
(map-side-combinable groupBy, content-hash keys); every round after
that is 3 aggregations over that vocab-scale table (weighted-mixture
counts -> proxy probabilities -> per-domain cross-entropy), never the
corpus. The driver holds the k-domain weight vector. At 100 TB the
corpus is touched once; rounds cost bigram-vocab work regardless of
corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["doremi_domain_weights", "reference_doremi"]


def _domain_bigrams(df: DataFrame, domain_col: str,
                    text_col: str) -> DataFrame:
    """(domain, w1, w2, c): whitespace-lowercase bigram counts per
    domain — the single corpus-scale pass. ``(?U)`` makes the JVM
    regex \\s Unicode-aware (U+00A0, NEL, ...) so tokenization matches
    the sequential twin's Python ``str.split()`` on non-ASCII
    whitespace too (same convention as bytebpe.py)."""
    from . import ensure_parallelism
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"(?U)\s+")
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.size(toks) - 1).alias("w1"),
        F.slice(toks, 2, F.size(toks) - 1).alias("w2"))
    return (ensure_parallelism(df)
            .select(F.col(domain_col).alias("domain"),
                    F.explode(pairs).alias("p"))
            .select("domain", F.col("p.w1").alias("w1"),
                    F.col("p.w2").alias("w2"))
            .filter((F.length("w1") > 0) & (F.length("w2") > 0))
            .groupBy("domain", "w1", "w2")
            .agg(F.count(F.lit(1)).alias("c")))


def doremi_domain_weights(df: DataFrame, domain_col: str = "lang",
                          text_col: str = "text",
                          rounds: int = 10, step: float = 1.0,
                          smoothing: float = 1e-3,
                          add_k: float = 0.5) -> DataFrame:
    """Optimize the domain mixture. Returns one row per domain:
    ``(domain, weight, excess_loss, n_bigrams)`` with weights summing
    to 1 — the mixture a pre-training sampler should draw from.

    Round algebra (exactly DoReMi's, proxy = add-k bigram LM):

    - reference loss ``L_ref(d)``: cross-entropy of domain d under
      the LM trained on d alone (computed once);
    - proxy loss ``L_a(d)``: cross-entropy of d under the LM trained
      on the a-weighted mixture (per-domain counts scaled by
      ``a_d / N_d`` so weights mean sampling probability, not raw
      token mass);
    - ``excess(d) = max(0, L_a(d) - L_ref(d))``;
    - ``a' = normalize(a * exp(step * excess))``, then uniform
      smoothing ``a = (1-smoothing) a' + smoothing / k``.
    """
    spark = df.sparkSession
    # hash(w1)-partition the bigram table ONCE at the checkpoint: both
    # per-round mixture sums are then window aggregations over that
    # layout (hash(w1) satisfies clustering on (w1) AND on (w1, w2)),
    # so a round runs zero vocab-scale exchanges — previously each
    # round shuffled the table three times (mix groupBy, mix_tot
    # groupBy, and the join back) (r12, guide §2.4). The broadcast
    # domain-weight join preserves the streamed side's partitioning.
    bg = (_domain_bigrams(df, domain_col, text_col)
          .repartition("w1")
          .localCheckpoint(eager=False))
    try:
        # the conditioning vocabulary and the constant (w1, w2) mix
        # support, ONE fused action (r12; previously two distinct
        # jobs) — this also materializes the lazy checkpoint
        r0 = bg.agg(F.countDistinct("w2").alias("v"),
                    F.countDistinct("w1", "w2").alias("nk")).first()
        vocab_size = int(r0["v"])
        n_bigram_keys = int(r0["nk"])
        kv = add_k * vocab_size

        # reference losses AND per-domain token mass in one
        # aggregation (r12; nd previously cost its own job):
        # p_d(w2|w1) from the domain's own counts via a window over
        # the existing layout, smoothed over the global vocab
        wtot_d = Window.partitionBy("domain", "w1")
        ref_rows = (bg.withColumn("__tot", F.sum("c").over(wtot_d))
                    .select("domain", "c",
                            (-F.col("c")
                             * F.log((F.col("c") + F.lit(add_k))
                                     / (F.col("__tot") + F.lit(kv))))
                            .alias("nll"))
                    .groupBy("domain")
                    .agg(F.sum("nll").alias("s"),
                         F.sum("c").alias("n"))
                    .collect())
        nd = {r["domain"]: int(r["n"]) for r in ref_rows}
        domains = sorted(nd)
        if not domains:
            raise ValueError("no domains with bigrams")
        l_ref = {r["domain"]: float(r["s"]) / nd[r["domain"]]
                 for r in ref_rows}

        k = len(domains)
        alpha = {d: 1.0 / k for d in domains}
        excess = {d: 0.0 for d in domains}
        w_mix = Window.partitionBy("w1", "w2")
        w_tot = Window.partitionBy("w1")
        for _ in range(rounds):
            sdf = spark.createDataFrame(
                [(d, alpha[d] / nd[d]) for d in domains],
                "domain string, s double")
            scaled = (bg.join(F.broadcast(sdf), "domain")
                      .withColumn("wc", F.col("c") * F.col("s")))
            # scale-invariant add-k: smooth relative to the mixture's
            # mean count so the probabilities don't depend on the
            # arbitrary magnitude of the s_d scaling. Derived in the
            # driver — sum(mc) = sum_d alpha_d exactly (each domain's
            # counts scale by alpha_d/N_d and sum to N_d) over the
            # constant support — so the round runs ONE action
            mean_mc = sum(alpha.values()) / n_bigram_keys
            ak = add_k * mean_mc
            akv = ak * vocab_size
            # mixture count and its w1 total as two windows over the
            # checkpoint's hash(w1) layout — no exchange, one sort
            loss_rows = (scaled
                         .withColumn("mc", F.sum("wc").over(w_mix))
                         .withColumn("mtot", F.sum("wc").over(w_tot))
                         .select("domain",
                                 (-F.col("c")
                                  * F.log((F.col("mc") + F.lit(ak))
                                          / (F.col("mtot")
                                             + F.lit(akv))))
                                 .alias("nll"))
                         .groupBy("domain")
                         .agg(F.sum("nll").alias("s")).collect())
            l_mix = {r["domain"]: float(r["s"]) / nd[r["domain"]]
                     for r in loss_rows}
            import math
            excess = {d: max(0.0, l_mix[d] - l_ref[d])
                      for d in domains}
            raw = {d: alpha[d] * math.exp(step * excess[d])
                   for d in domains}
            z = sum(raw.values())
            alpha = {d: (1.0 - smoothing) * raw[d] / z
                     + smoothing / k for d in domains}
        return spark.createDataFrame(
            [(d, alpha[d], round(excess[d], 10), int(nd[d]))
             for d in domains],
            "domain string, weight double, excess_loss double, "
            "n_bigrams long")
    finally:
        bg.unpersist()


def reference_doremi(docs: "list[tuple[str, str]]", rounds: int = 10,
                     step: float = 1.0, smoothing: float = 1e-3,
                     add_k: float = 0.5) -> "dict[str, float]":
    """Sequential twin over (domain, text) pairs — same bigram LM,
    same DRO algebra, pure Python dicts (the differential oracle)."""
    import math
    from collections import Counter, defaultdict

    bg: dict = defaultdict(Counter)
    for dom, text in docs:
        toks = [w for w in text.lower().split() if w]
        for a, b in zip(toks, toks[1:]):
            bg[dom][(a, b)] += 1
    bg = {d: c for d, c in bg.items() if c}
    nd = {d: sum(c.values()) for d, c in bg.items()}
    domains = sorted(nd)
    vocab = {w2 for c in bg.values() for (_, w2) in c}
    kv = add_k * len(vocab)

    l_ref = {}
    for d in domains:
        tot = Counter()
        for (w1, _), c in bg[d].items():
            tot[w1] += c
        s = sum(-c * math.log((c + add_k) / (tot[w1] + kv))
                for (w1, _), c in bg[d].items())
        l_ref[d] = s / nd[d]

    k = len(domains)
    alpha = {d: 1.0 / k for d in domains}
    for _ in range(rounds):
        mix: Counter = Counter()
        for d in domains:
            s_d = alpha[d] / nd[d]
            for b, c in bg[d].items():
                mix[b] += c * s_d
        mtot: dict = defaultdict(float)
        for (w1, _), c in mix.items():
            mtot[w1] += c
        # same driver-side derivation as the distributed version so
        # the twin stays in bit-level lockstep: sum(mix) = sum(alpha)
        # over the constant support
        mean_mc = sum(alpha.values()) / len(mix)
        ak = add_k * mean_mc
        akv = ak * len(vocab)
        excess = {}
        for d in domains:
            s = sum(-c * math.log((mix[b] + ak) / (mtot[b[0]] + akv))
                    for b, c in bg[d].items())
            excess[d] = max(0.0, s / nd[d] - l_ref[d])
        raw = {d: alpha[d] * math.exp(step * excess[d])
               for d in domains}
        z = sum(raw.values())
        alpha = {d: (1.0 - smoothing) * raw[d] / z + smoothing / k
                 for d in domains}
    return alpha
