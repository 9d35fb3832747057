"""Tri-scale evidence for the round-8/9 top-of-cost-table queries
(VERDICT r8 next-round item 6): wall time + Spark job count at
sf0.01 / sf0.1 / sf1-synthetic, so "flat job count, sublinear wall
growth" is directly measurable for the iterative/graph/DV/codec
heavy hitters (the earlier profile_overhead.py covers the
DuckDB-baselined set; these five have no SQL baseline or are
dominated by non-SQL work).

Usage: python tools/triscale_r9.py [sfdir1 sfdir2 ...]
(sf1 synthetic comes from tools/gen_sf1.py -> /tmp/sf1_synth)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "graph_walk_corpus",
    "graph_kcore",
    "pagerank_personalized_df",
    "delta_delete_dv",
    "multimodal_mp3_decode_real",
    "trained_quality_scores",
]


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01",
                               "/root/testdata/sf0.1",
                               "/tmp/sf1_synth"]
    n_runs = int(os.environ.get("PROFILE_RUNS", "2"))

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[32]")
             .appName("triscale-r9")
             .config("spark.driver.memory", "48g")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from xdlake_spark import queries as Q

    tracker = spark.sparkContext.statusTracker()
    out = {}
    for name in QUERIES:
        fn, _ = Q.REGISTRY[name]
        out[name] = {}
        for sf in sf_dirs:
            if not os.path.isdir(sf):
                continue
            best, jobs_per_run = None, None
            for r in range(n_runs + 1):      # +1 warm pass
                grp = f"{name}:{sf}:{r}"
                spark.sparkContext.setJobGroup(grp, name)
                t0 = time.time()
                fn(spark, sf).write.format("noop").mode(
                    "overwrite").save()
                dt = time.time() - t0
                spark.sparkContext.setJobGroup("", "")
                nj = len(tracker.getJobIdsForGroup(grp))
                if r == 0:
                    continue                 # discard warmup
                if best is None or dt < best:
                    best, jobs_per_run = dt, nj
            out[name][os.path.basename(sf.rstrip("/"))] = {
                "sec": round(best, 2), "jobs": jobs_per_run}
            print(f"{name:32s} {sf}: {best:7.2f}s  "
                  f"{jobs_per_run} jobs", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
