"""Log checkpointing: parquet state snapshot + _last_checkpoint pointer."""

import os

from pyspark.sql import functions as F

from xdlake_spark import DeltaTable
from xdlake_spark.log import DeltaLog
from xdlake_spark.log.checkpoint import (checkpoint_filename,
                                         last_checkpoint_version)
from xdlake_spark.sources.storage import Location


def _build(spark, loc, n_commits=12):
    df = spark.range(10).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("cat"))
    t = DeltaTable(spark, loc).write(df, partition_by=["cat"])
    for i in range(1, n_commits):
        t = t.write(df.withColumn("id", F.col("id") + 100 * i))
    return t


class TestCheckpoint:
    def test_written_at_interval_and_state_matches(self, spark,
                                                   tmp_table_dir):
        t = _build(spark, tmp_table_dir, 12)
        log_dir = os.path.join(tmp_table_dir, "_delta_log")
        assert last_checkpoint_version(
            Location.resolve(log_dir)) == 10
        assert os.path.exists(os.path.join(log_dir, checkpoint_filename(10)))

        # checkpointed load == full JSON replay
        loc = Location.resolve(log_dir)
        fast = DeltaLog.load(loc)
        full = DeltaLog.load(loc, use_checkpoint=False)
        assert fast.version == full.version == 11
        assert set(fast.add_actions()) == set(full.add_actions())
        assert fast.schema() == full.schema()
        assert fast.partition_columns() == full.partition_columns()
        # the fast path did NOT parse pre-checkpoint JSONs
        assert set(fast.entries) == {10, 11}
        assert t.to_df().count() == 120

    def test_history_complete_across_checkpoint(self, spark, tmp_table_dir):
        t = _build(spark, tmp_table_dir, 12)
        hist = list(t.history())
        assert [h["version"] for h in hist] == list(range(11, -1, -1))
        assert all(h.get("operation") for h in hist)

    def test_time_travel_before_checkpoint(self, spark, tmp_table_dir):
        t = _build(spark, tmp_table_dir, 12)
        old = t.load_as_version(2)
        assert old.version == 2
        assert old.to_df().count() == 30

    def test_restore_before_checkpoint(self, spark, tmp_table_dir):
        t = _build(spark, tmp_table_dir, 12)
        t = t.restore(1)
        assert t.to_df().count() == 20

    def test_vacuum_sees_precheckpoint_tombstones(self, spark,
                                                  tmp_table_dir):
        df = spark.range(10).select(F.col("id"))
        t = DeltaTable(spark, tmp_table_dir).write(df)
        t = t.write(df, mode="overwrite")          # v1: tombstones v0 files
        for i in range(9):                         # push past checkpoint
            t = t.write(df.withColumn("id", F.col("id") + i))
        assert t.version == 10
        assert last_checkpoint_version(t.log_location) == 10
        reopened = DeltaTable(spark, tmp_table_dir)
        doomed = reopened.vacuum(retention_hours=0.0, dry_run=True)
        assert len(doomed) > 0  # v0's overwritten files are still seen

    def test_clone_preserves_full_history(self, spark, tmp_table_dir):
        t = _build(spark, tmp_table_dir, 12)
        dst = tmp_table_dir + "_clone"
        c = t.clone(dst)
        assert c.versions == t.versions
        assert c.to_df().count() == t.to_df().count()


class TestZOrderAndChanges:
    def test_zorder_identity_and_pruning(self, spark, tmp_table_dir,
                                         lineitem):
        from xdlake_spark.plans.skipping import prune_manifest
        before = lineitem.count()
        t = DeltaTable(spark, tmp_table_dir).write(lineitem)
        t = t.optimize(zorder_by=["l_partkey", "l_suppkey"],
                       target_file_size=25 * 1024)
        assert t.to_df().count() == before
        assert len(t.adds) > 1
        # clustering makes min/max tight: a narrow partkey range must
        # skip at least one file
        pruned = prune_manifest(t.adds, "l_partkey <= 5", [])
        assert len(pruned) < len(t.adds)

    def test_table_changes_window(self, spark, tmp_table_dir):
        df = spark.range(10).select(F.col("id"))
        t = DeltaTable(spark, tmp_table_dir).write(df)                 # v0
        t = t.write(df.withColumn("id", F.col("id") + 100))            # v1
        t = t.write(df.withColumn("id", F.col("id") + 200))            # v2
        chg = t.table_changes(0, 1)
        assert sorted(r["id"] for r in chg.collect()) == \
            list(range(100, 110))
        assert t.table_changes(0).count() == 20    # v1+v2
        assert t.table_changes(2).count() == 0

    def test_table_changes_excludes_compaction(self, spark, tmp_table_dir):
        df = spark.range(10).select(F.col("id"))
        t = DeltaTable(spark, tmp_table_dir).write(df)                 # v0
        t = t.write(df.withColumn("id", F.col("id") + 100))            # v1
        t = t.optimize(target_file_size=10 * 1024 * 1024)              # v2
        assert t.version == 2
        assert t.table_changes(1).count() == 0     # rewrite, not data
