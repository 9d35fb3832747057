"""VERDICT r12 item 3: settle contamination_check with one clean A/B.

Same session, alternating OLD (always lazily checkpoint the train
inverted-index input) vs NEW (checkpoint only when the doc-freq valve
makes it a two-consumer table — the r12 `8703747` change under
suspicion), min-of-N each, noop sink, quiet host, 32 cores.

Both variants produce identical results (the checkpoint is a pure
materialization barrier); only the plan shape differs.

Usage: python tools/ab_contamination.py [n_rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def variant(train, eval_df, mode: str):
    from pyspark.sql import functions as F

    from xdlake_spark.functions.text import shingles
    from xdlake_spark.operators import ensure_parallelism

    def inv(df_, tag):
        return (ensure_parallelism(df_)
                .select(F.col("doc_id").alias(f"{tag}_id"),
                        shingles(F.col("text"), 3).alias("sh")))

    tr = inv(train, "train")
    if mode == "checkpoint":
        tr = tr.localCheckpoint(eager=False)
    ev = inv(eval_df, "eval").localCheckpoint(eager=False)
    if mode == "explode_outer":
        # no implicit size(sh)>0 filter -> the shingles() expression
        # is NOT duplicated below the Generate by filter pushdown
        tr_inv = (tr.select("train_id",
                            F.explode_outer("sh").alias("__s"))
                  .filter(F.col("__s").isNotNull())
                  .select("train_id",
                          F.xxhash64("__s").alias("shingle")))
    else:
        tr_inv = (tr.select("train_id", F.explode("sh").alias("__s"))
                  .select("train_id", F.xxhash64("__s").alias("shingle")))
    ev_inv = (ev.select("eval_id", F.explode("sh").alias("__s"))
              .select("eval_id", F.xxhash64("__s").alias("shingle")))
    ev_sizes = ev.select("eval_id", F.size("sh").alias("n_eval"))
    inter = (tr_inv.join(ev_inv, "shingle")
             .groupBy("train_id", "eval_id")
             .agg(F.count(F.lit(1)).alias("n_inter")))
    return (inter.join(ev_sizes, "eval_id")
            .withColumn("containment",
                        F.col("n_inter").cast("double") / F.col("n_eval"))
            .filter(F.col("containment") >= 0.8))


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("ab-contamination")
        .config("spark.driver.memory", "32g")
        .config("spark.sql.shuffle.partitions",
                os.environ.get("SPARK_GRAFT_CPUS", "32"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.serializer",
                "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    train = d.filter("doc_id % 10 != 0")
    ev = d.filter("doc_id % 10 = 0")

    modes = [("old_checkpoint", "checkpoint"),
             ("new_nocheckpoint", "plain"),
             ("explode_outer", "explode_outer")]
    # warm each plan once
    for _, m in modes:
        variant(train, ev, m).write.format("noop") \
            .mode("overwrite").save()

    samples: dict[str, list[float]] = {n: [] for n, _ in modes}
    for i in range(n_rounds):
        for name, ck in modes:
            spark.sparkContext.setJobDescription(f"ab {name} r{i}")
            t0 = time.time()
            variant(train, ev, ck).write.format("noop") \
                .mode("overwrite").save()
            samples[name].append(round(time.time() - t0, 3))
    out = {n: {"min": min(s), "median": sorted(s)[(len(s) - 1) // 2],
               "samples": s} for n, s in samples.items()}
    out["load"] = open("/proc/loadavg").read().split()[0]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
