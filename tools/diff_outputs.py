"""Differential harness: run named registry queries on TWO code trees
and compare their collected outputs exactly (sorted row strings).

The strongest identical-results proof for rows-only queries (no DuckDB
oracle): any drift an optimization introduces shows up as a row diff.

Usage: python tools/diff_outputs.py <old_tree> <new_tree> <query> [...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.001).

Runs each tree in a SUBPROCESS (clean sys.path/JVM per tree) writing
sorted row reprs to a temp file, then diffs.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

RUNNER = r"""
import os, sys
tree, out_path, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
names = sys.argv[4:]
sys.path.insert(0, tree)
os.environ["PYTHONPATH"] = tree
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[16]")
         .appName("diff-outputs")
         .config("spark.driver.memory", "16g")
         .config("spark.sql.shuffle.partitions", "16")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from xdlake_spark.queries import queries
qs = queries()
with open(out_path, "w") as f:
    for name in names:
        df = qs[name](spark, sf_dir)
        rows = sorted(repr(sorted(r.asDict().items())) for r in df.collect())
        f.write(f"=== {name} ({len(rows)} rows)\n")
        for r in rows:
            f.write(r + "\n")
spark.stop()
"""


def main() -> None:
    old_tree, new_tree = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    outs = []
    for tree in (old_tree, new_tree):
        fd, out = tempfile.mkstemp(prefix="diffq-")
        os.close(fd)
        env = dict(os.environ, PYTHONPATH=tree)
        r = subprocess.run([sys.executable, "-c", RUNNER, tree, out,
                            sf_dir, *names], env=env,
                           capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stderr[-3000:])
            sys.exit(1)
        outs.append(out)
    a = open(outs[0]).read()
    b = open(outs[1]).read()
    if a == b:
        print(f"IDENTICAL outputs for {len(names)} queries "
              f"({len(a.splitlines())} lines)")
    else:
        import difflib
        diff = list(difflib.unified_diff(
            a.splitlines(), b.splitlines(), "old", "new", lineterm=""))
        print("\n".join(diff[:80]))
        print(f"DIFFER ({len(diff)} diff lines)")
        sys.exit(2)


if __name__ == "__main__":
    main()
