"""One A/B pass: run the given queries once each on the code tree at
sys.argv[1], with the bench session config, and print one JSON line
{name: sec, "_load": loadavg_before, "_wall": pass_total}."""
import json
import os
import sys
import time

tree = sys.argv[1]
sys.path.insert(0, tree)
os.environ["PYTHONPATH"] = tree

QUERIES = [
    "pagerank_interaction_graph",
    "graph_bfs_hops",
    "graph_walk_corpus",
    "trained_quality_scores",
    "delta_delete_dv",
    "dedup_quality_keepers",
    "pagerank_personalized",
    "unigram_tokenize_stats",
    "dedup_winnow_pairs",
    "graph_kcore",
]

sf_dir = "/root/testdata/sf0.1"
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[32]")
         .appName("ab-bench")
         .config("spark.driver.memory", "32g")
         .config("spark.cleaner.periodicGC.interval", "30s")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.serializer",
                 "org.apache.spark.serializer.KryoSerializer")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from xdlake_spark.queries import queries
from xdlake_spark.sources.readers import read_parquet_any
qs = queries()

for t in ("lineitem", "events", "documents", "embeddings"):
    read_parquet_any(spark, f"{sf_dir}/{t}.parquet") \
        .write.format("noop").mode("overwrite").save()
# one untimed warm pass of the A/B set itself (codegen, worker spawn)
for name in QUERIES:
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

load = open("/proc/loadavg").read().split()[0]
out = {}
t_pass = time.time()
for name in QUERIES:
    t0 = time.time()
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    out[name] = round(time.time() - t0, 3)
out["_load"] = float(load)
out["_wall"] = round(time.time() - t_pass, 1)
print(json.dumps(out))
spark.stop()
