"""Measure Spark-vs-DuckDB gap scaling for the small queries the
round-5 verdict flagged as >2x at sf0.1 (item #5), plus the full
duckdb_s set at a chosen scale dir (item #6: sf1 synthetic).

For each query and each sf dir: DuckDB warm+timed, Spark warm pass
then min of N timed passes. Prints a per-query table with the
spark/duckdb ratio, and the absolute gap (spark - duckdb) per sf so
"constant overhead" vs "multiplicative" is directly visible.

Usage: python tools/profile_overhead.py [sfdir1 sfdir2 ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "dedup_paragraphs",
    "q1_pricing_summary",
    "dedup_exact_keepers",
    "incremental_dedup_keepers",
    "corpus_filter_funnel",
    "corpus_prep_pipeline",
    "text_stats",
    "contamination_check",
    "dedup_ngram_jaccard_pairs",
    "leakage_safe_split",
]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01",
                               "/root/testdata/sf0.1"]
    n_runs = int(os.environ.get("PROFILE_RUNS", "3"))

    import duckdb

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[32]")
             .appName("overhead-profile")
             .config("spark.driver.memory", "32g")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled",
                     "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    results: dict[str, dict] = {}
    for sf_dir in sf_dirs:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sf_dir}/{t}.parquet')")
        for name in QUERIES:
            fn = qs[name]
            # spark: warm + min of n
            fn(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            ts = []
            for _ in range(n_runs):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                ts.append(time.time() - t0)
            s = min(ts)
            # duckdb: warm + timed
            con.execute(oracles[name]).fetchall()
            t0 = time.time()
            con.execute(oracles[name]).fetchall()
            d = time.time() - t0
            results.setdefault(name, {})[sf_dir] = (s, d)
            print(f"# {sf_dir.rsplit('/',1)[-1]:10s} {name:28s} "
                  f"spark {s:6.2f}s duckdb {d:6.2f}s "
                  f"ratio {s/max(d,1e-9):5.2f} gap {s-d:+6.2f}s",
                  flush=True)
        con.close()

    print("\n== gap scaling (spark - duckdb, seconds) ==")
    for name, per_sf in results.items():
        gaps = [f"{d.rsplit('/',1)[-1]}: {s-dd:+.2f}"
                for d, (s, dd) in per_sf.items()]
        print(f"{name:28s} {'  '.join(gaps)}")
    spark.stop()


if __name__ == "__main__":
    main()
