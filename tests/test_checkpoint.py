"""Log checkpointing: parquet state snapshot + _last_checkpoint pointer."""

import os

import pytest
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


class TestCheckpointProtocolFeatures:
    """A checkpoint written without reader/writerFeatures columns (a
    pre-feature build of this engine, or a foreign writer) must not
    strip a v3/v7 table's feature lists — the protocol gates key on
    them. read_checkpoint refuses such a protocol; DeltaLog.load then
    replays the JSON log, which carries the truth."""

    @staticmethod
    def _strip_features_from_checkpoint(log_dir, version):
        """Rewrite the checkpoint parquet without feature columns,
        simulating a pre-feature-schema writer."""
        import io

        import pyarrow as pa
        import pyarrow.parquet as pq

        path = os.path.join(log_dir, checkpoint_filename(version))
        table = pq.read_table(path)
        rows = table.to_pylist()
        for row in rows:
            if row.get("protocol"):
                row["protocol"] = {
                    "minReaderVersion": row["protocol"]["minReaderVersion"],
                    "minWriterVersion": row["protocol"]["minWriterVersion"]}
        old = table.schema
        fields = []
        for f in old:
            if f.name == "protocol":
                fields.append(pa.field("protocol", pa.struct([
                    pa.field("minReaderVersion", pa.int32()),
                    pa.field("minWriterVersion", pa.int32())])))
            else:
                fields.append(f)
        stripped = pa.Table.from_pylist(rows, schema=pa.schema(fields))
        buf = io.BytesIO()
        pq.write_table(stripped, buf)
        with open(path, "wb") as fh:
            fh.write(buf.getvalue())

    @staticmethod
    def _graft_v3_protocol(log_dir):
        import json as _json

        log_file = os.path.join(log_dir, f"{0:020d}.json")
        lines = []
        with open(log_file) as fh:
            for line in fh:
                obj = _json.loads(line)
                if "protocol" in obj:
                    obj["protocol"] = {
                        "minReaderVersion": 3, "minWriterVersion": 7,
                        "readerFeatures": ["collations"],
                        "writerFeatures": ["collations"]}
                lines.append(_json.dumps(obj))
        with open(log_file, "w") as fh:
            fh.write("\n".join(lines) + "\n")

    def test_stripped_checkpoint_falls_back_to_json_truth(
            self, spark, tmp_table_dir):
        import pytest

        _build(spark, tmp_table_dir, 12)
        log_dir = os.path.join(tmp_table_dir, "_delta_log")
        self._graft_v3_protocol(log_dir)
        # re-checkpoint so it captures the v3 protocol, then strip the
        # feature columns the way a pre-feature writer would
        from xdlake_spark.log.checkpoint import write_checkpoint

        loc = Location.resolve(log_dir)
        write_checkpoint(loc, DeltaLog.load(loc, use_checkpoint=False))
        self._strip_features_from_checkpoint(log_dir, 11)
        log = DeltaLog.load(loc)
        # fell back to full replay: every JSON entry parsed, features
        # recovered from version 0
        assert 0 in log.entries
        assert log.protocol().extra.get("readerFeatures") \
            == ["collations"]
        # and the reader gate still refuses the scan
        t = DeltaTable(spark, tmp_table_dir)
        with pytest.raises(NotImplementedError, match="collations"):
            t.to_df().count()

    def test_stripped_checkpoint_with_cleaned_log_refuses(
            self, spark, tmp_table_dir):
        """If the JSON tail was cleaned up (no version 0), the fallback
        would silently lose protocol/metaData — refuse instead."""
        import pytest

        _build(spark, tmp_table_dir, 12)
        log_dir = os.path.join(tmp_table_dir, "_delta_log")
        self._graft_v3_protocol(log_dir)
        # checkpoint write happens at v10 with features intact; re-write
        # checkpoint from the now-v3 log so it would carry features,
        # then strip them AND remove early JSON entries
        from xdlake_spark.log.checkpoint import write_checkpoint

        loc = Location.resolve(log_dir)
        write_checkpoint(loc, DeltaLog.load(loc, use_checkpoint=False))
        self._strip_features_from_checkpoint(log_dir, 11)
        for v in range(0, 10):
            os.remove(os.path.join(log_dir, f"{v:020d}.json"))
        with pytest.raises(ValueError, match="readerFeatures"):
            DeltaLog.load(loc)


class TestForeignCheckpointRead:
    """Cross-engine checkpoint read: a classic checkpoint parquet in
    delta-spark's column layout (txn struct, add.tags,
    remove.partitionValues, no feature columns on a v1/v2 protocol)
    hand-built to the protocol spec's struct layout — proves the fast
    path opens tables checkpointed by other engines, matching the
    reference's cross-engine log posture."""

    def test_reads_delta_spark_layout(self, spark, tmp_table_dir):
        import io
        import json as _json

        import pyarrow as pa
        import pyarrow.parquet as pq

        t = _build(spark, tmp_table_dir, 3)  # versions 0..2, no checkpoint
        log_dir = os.path.join(tmp_table_dir, "_delta_log")
        full = DeltaLog.load(Location.resolve(log_dir),
                             use_checkpoint=False)
        md = full.metadata()
        adds = full.add_actions()

        # delta-spark classic checkpoint layout (superset/reordering of
        # ours, plus txn and tags/partitionValues on remove)
        schema = pa.schema([
            pa.field("txn", pa.struct([
                pa.field("appId", pa.string()),
                pa.field("version", pa.int64()),
                pa.field("lastUpdated", pa.int64())])),
            pa.field("add", pa.struct([
                pa.field("path", pa.string()),
                pa.field("partitionValues",
                         pa.map_(pa.string(), pa.string())),
                pa.field("size", pa.int64()),
                pa.field("modificationTime", pa.int64()),
                pa.field("dataChange", pa.bool_()),
                pa.field("stats", pa.string()),
                pa.field("tags", pa.map_(pa.string(), pa.string()))])),
            pa.field("remove", pa.struct([
                pa.field("path", pa.string()),
                pa.field("deletionTimestamp", pa.int64()),
                pa.field("dataChange", pa.bool_()),
                pa.field("extendedFileMetadata", pa.bool_()),
                pa.field("partitionValues",
                         pa.map_(pa.string(), pa.string())),
                pa.field("size", pa.int64())])),
            pa.field("metaData", pa.struct([
                pa.field("id", pa.string()),
                pa.field("name", pa.string()),
                pa.field("description", pa.string()),
                pa.field("format", pa.struct([
                    pa.field("provider", pa.string()),
                    pa.field("options",
                             pa.map_(pa.string(), pa.string()))])),
                pa.field("schemaString", pa.string()),
                pa.field("partitionColumns", pa.list_(pa.string())),
                pa.field("configuration",
                         pa.map_(pa.string(), pa.string())),
                pa.field("createdTime", pa.int64())])),
            pa.field("protocol", pa.struct([
                pa.field("minReaderVersion", pa.int32()),
                pa.field("minWriterVersion", pa.int32())])),
        ])
        blank = {f.name: None for f in schema}
        rows = [
            {**blank, "protocol": {"minReaderVersion": 1,
                                   "minWriterVersion": 2}},
            {**blank, "txn": {"appId": "some-foreign-stream",
                              "version": 7, "lastUpdated": 1}},
            {**blank, "metaData": {
                "id": md.id, "name": None, "description": None,
                "format": {"provider": "parquet", "options": []},
                "schemaString": md.schemaString,
                "partitionColumns": list(md.partitionColumns),
                "configuration": [], "createdTime": md.createdTime}},
        ]
        for add in adds.values():
            rows.append({**blank, "add": {
                "path": add.path,
                "partitionValues": list(
                    (add.partitionValues or {}).items()),
                "size": add.size,
                "modificationTime": add.modificationTime,
                "dataChange": False, "stats": add.stats,
                "tags": [("INSERTION_TIME", "1")]}})
        table = pa.Table.from_pylist(rows, schema=schema)
        buf = io.BytesIO()
        pq.write_table(table, buf)
        with open(os.path.join(log_dir, checkpoint_filename(2)),
                  "wb") as fh:
            fh.write(buf.getvalue())
        with open(os.path.join(log_dir, "_last_checkpoint"), "w") as fh:
            fh.write(_json.dumps({"version": 2, "size": len(rows)}))

        log = DeltaLog.load(Location.resolve(log_dir))
        # the checkpoint fast path was actually taken (v0/v1 JSONs
        # skipped), and the state matches the full replay
        assert set(log.entries) == {2}
        assert set(log.add_actions()) == set(adds)
        assert log.schema() == full.schema()
        assert DeltaTable(spark, tmp_table_dir).to_df().count() == 30


class TestCheckpointTxnAndLayouts:
    """Round-6 checkpoint upgrades: txn watermarks survive the collapse,
    and all three spec layouts (classic / multi-part / v2+sidecar) read
    back to the same replayed state."""

    def test_txn_watermark_survives_checkpoint(self, spark, tmp_table_dir):
        from xdlake_spark.log import SetTransaction, append_table_entry

        t = _build(spark, tmp_table_dir, 9)  # versions 0..8
        entry = append_table_entry(
            [], [], txn=SetTransaction(appId="stream-app", version=41,
                                       lastUpdated=1))
        t = t._commit(entry)  # v9
        df = spark.range(5).select(
            F.col("id"), F.lit("0").alias("cat"))
        t = t.write(df)  # v10 -> checkpoint written at 10

        log_dir = os.path.join(tmp_table_dir, "_delta_log")
        loc = Location.resolve(log_dir)
        assert last_checkpoint_version(loc) == 10
        fast = DeltaLog.load(loc)
        # fast path taken: the txn's own JSON (v9) was NOT re-parsed
        assert set(fast.entries) == {10}
        # ...yet the idempotence watermark is still known (the
        # checkpoint carries the latest txn per appId, per spec)
        assert fast.latest_txn_version("stream-app") == 41
        assert DeltaTable(spark, tmp_table_dir).txn_version(
            "stream-app") == 41

    def test_txn_chains_across_checkpoints(self, spark, tmp_table_dir):
        """A second checkpoint (loaded from the first, lazy JSON) must
        re-carry the watermark it learned from checkpoint rows."""
        from xdlake_spark.log import SetTransaction, append_table_entry
        from xdlake_spark.log.checkpoint import write_checkpoint

        t = _build(spark, tmp_table_dir, 2)  # v0..1
        t = t._commit(append_table_entry(
            [], [], txn=SetTransaction(appId="app", version=5)))  # v2
        log_dir = Location.resolve(
            os.path.join(tmp_table_dir, "_delta_log"))
        write_checkpoint(log_dir, DeltaLog.load(log_dir))  # cp at v2
        t = DeltaTable(spark, tmp_table_dir)
        df = spark.range(3).select(F.col("id"), F.lit("0").alias("cat"))
        t = t.write(df)  # v3
        # second checkpoint built FROM the checkpointed load
        write_checkpoint(log_dir, DeltaLog.load(log_dir))  # cp at v3
        fast = DeltaLog.load(log_dir)
        assert set(fast.entries) == {3}
        assert fast.latest_txn_version("app") == 5

    def test_multipart_roundtrip(self, spark, tmp_table_dir):
        from xdlake_spark.log.checkpoint import (multipart_filename,
                                                 write_checkpoint)

        t = _build(spark, tmp_table_dir, 3)  # v0..2, 9 adds + md + proto
        log_dir = os.path.join(tmp_table_dir, "_delta_log")
        loc = Location.resolve(log_dir)
        full = DeltaLog.load(loc, use_checkpoint=False)
        n = write_checkpoint(loc, full, part_size=4)
        n_parts = -(-n // 4)
        assert n_parts > 1
        assert not os.path.exists(
            os.path.join(log_dir, checkpoint_filename(2)))
        for i in range(1, n_parts + 1):
            assert os.path.exists(os.path.join(
                log_dir, multipart_filename(2, i, n_parts)))

        fast = DeltaLog.load(loc)
        assert set(fast.entries) == {2}
        assert set(fast.add_actions()) == set(full.add_actions())
        assert fast.schema() == full.schema()
        assert DeltaTable(spark, tmp_table_dir).to_df().count() == 30

    def test_multipart_missing_part_refuses_fast_path(
            self, spark, tmp_table_dir):
        """An incomplete part set must not silently replay a partial
        state — the loader falls back to full JSON replay."""
        from xdlake_spark.log.checkpoint import (multipart_filename,
                                                 write_checkpoint)

        t = _build(spark, tmp_table_dir, 3)
        log_dir = os.path.join(tmp_table_dir, "_delta_log")
        loc = Location.resolve(log_dir)
        n = write_checkpoint(loc, DeltaLog.load(loc, use_checkpoint=False),
                             part_size=4)
        n_parts = -(-n // 4)
        os.remove(os.path.join(log_dir,
                               multipart_filename(2, n_parts, n_parts)))
        log = DeltaLog.load(loc)  # falls back (JSON reaches version 0)
        assert set(log.entries) == {0, 1, 2}
        assert DeltaTable(spark, tmp_table_dir).to_df().count() == 30

    def test_v2_write_and_read(self, spark, tmp_table_dir):
        from xdlake_spark.log import SetTransaction, append_table_entry
        from xdlake_spark.log.checkpoint import write_checkpoint

        t = _build(spark, tmp_table_dir, 2)
        t = t._commit(append_table_entry(
            [], [], txn=SetTransaction(appId="app", version=3)))  # v2
        log_dir = os.path.join(tmp_table_dir, "_delta_log")
        loc = Location.resolve(log_dir)
        full = DeltaLog.load(loc, use_checkpoint=False)
        write_checkpoint(loc, full, v2=True)
        assert not os.path.exists(
            os.path.join(log_dir, checkpoint_filename(2)))
        uuid_named = [n for n in os.listdir(log_dir)
                      if n.startswith(f"{2:020d}.checkpoint.")
                      and n.endswith(".parquet")]
        assert len(uuid_named) == 1

        fast = DeltaLog.load(loc)
        assert set(fast.entries) == {2}
        assert set(fast.add_actions()) == set(full.add_actions())
        assert fast.latest_txn_version("app") == 3
        assert DeltaTable(spark, tmp_table_dir).to_df().count() == 20

    def test_v2_sidecar_sharded_write_roundtrip(self, spark,
                                                 tmp_table_dir):
        """VERDICT r7 item 2: past sidecar_size file actions, OUR v2
        writer shards add/remove rows into _delta_log/_sidecars/
        parquet files named by sidecar actions in the manifest; the
        reader reassembles the exact state and VACUUM leaves the live
        sidecars alone."""
        from xdlake_spark.log.checkpoint import write_checkpoint

        t = _build(spark, tmp_table_dir, 3)       # several adds
        t = t.delete("id < 3")                     # and a tombstone
        log_dir = os.path.join(tmp_table_dir, "_delta_log")
        loc = Location.resolve(log_dir)
        full = DeltaLog.load(loc, use_checkpoint=False)
        write_checkpoint(loc, full, v2=True, sidecar_size=2)

        side_dir = os.path.join(log_dir, "_sidecars")
        sidecars = os.listdir(side_dir)
        assert len(sidecars) >= 2, "file actions were not sharded"
        manifest = [n for n in os.listdir(log_dir)
                    if n.startswith(f"{full.version:020d}.checkpoint.")
                    and n.endswith(".parquet")]
        assert len(manifest) == 1
        # the manifest itself holds no file actions, only pointers
        import pyarrow.parquet as _pq
        mt = _pq.read_table(
            os.path.join(log_dir, manifest[0])).to_pylist()
        assert not any(r.get("add") or r.get("remove") for r in mt)
        assert sum(1 for r in mt if r.get("sidecar")) == len(sidecars)

        fast = DeltaLog.load(loc)
        assert set(fast.entries) == {full.version}
        assert set(fast.add_actions()) == set(full.add_actions())
        t2 = DeltaTable(spark, tmp_table_dir)
        assert t2.to_df().count() == t.to_df().count()

        # vacuum (even with zero retention) must not touch sidecars
        t2.vacuum(retention_hours=0.0)
        assert sorted(os.listdir(side_dir)) == sorted(sidecars)
        assert DeltaTable(spark, tmp_table_dir).to_df().count() == \
            t.to_df().count()

    def test_v2_inline_below_threshold(self, spark, tmp_table_dir):
        from xdlake_spark.log.checkpoint import write_checkpoint

        t = _build(spark, tmp_table_dir, 2)
        log_dir = os.path.join(tmp_table_dir, "_delta_log")
        loc = Location.resolve(log_dir)
        full = DeltaLog.load(loc, use_checkpoint=False)
        write_checkpoint(loc, full, v2=True)   # default threshold
        assert not os.path.exists(os.path.join(log_dir, "_sidecars"))
        fast = DeltaLog.load(loc)
        assert set(fast.add_actions()) == set(full.add_actions())

    def test_v2_commit_path_writes_v2_when_protocol_demands(
            self, spark, tmp_table_dir):
        from xdlake_spark.log import DeltaLogEntry
        from xdlake_spark.log.actions import Protocol, TableCommit

        t = _build(spark, tmp_table_dir, 9)  # v0..8
        up = Protocol(minReaderVersion=3, minWriterVersion=7)
        up.extra = {
            "readerFeatures": ["v2Checkpoint"],
            "writerFeatures": ["appendOnly", "invariants",
                               "v2Checkpoint"]}
        t = t._commit(DeltaLogEntry([up, TableCommit(
            operation="UPGRADE PROTOCOL")]))  # v9
        df = spark.range(5).select(F.col("id"), F.lit("0").alias("cat"))
        t = t.write(df)  # v10 -> auto checkpoint, must be v2 form
        log_dir = os.path.join(tmp_table_dir, "_delta_log")
        assert not os.path.exists(
            os.path.join(log_dir, checkpoint_filename(10)))
        assert last_checkpoint_version(Location.resolve(log_dir)) == 10
        loc = Location.resolve(log_dir)
        fast = DeltaLog.load(loc)
        assert set(fast.entries) == {10}
        assert DeltaTable(spark, tmp_table_dir).to_df().count() == 95

    def test_v2_json_manifest_with_sidecars(self, spark, tmp_table_dir):
        """Foreign-engine v2 layout: JSON manifest + parquet sidecars
        under _delta_log/_sidecars/ (hand-built to the spec)."""
        import io
        import json as _json

        import pyarrow as pa
        import pyarrow.parquet as pq

        from xdlake_spark.log.checkpoint import _SCHEMA

        t = _build(spark, tmp_table_dir, 3)  # v0..2
        log_dir = os.path.join(tmp_table_dir, "_delta_log")
        full = DeltaLog.load(Location.resolve(log_dir),
                             use_checkpoint=False)
        md = full.metadata()
        adds = list(full.add_actions().values())

        # two sidecars, adds split between them
        os.makedirs(os.path.join(log_dir, "_sidecars"), exist_ok=True)
        blank = {f.name: None for f in _SCHEMA}
        sidecar_names = []
        for i, chunk in enumerate([adds[:len(adds) // 2],
                                   adds[len(adds) // 2:]]):
            rows = [{**blank, "add": {
                "path": a.path,
                "partitionValues": list((a.partitionValues or {}).items()),
                "size": a.size, "modificationTime": a.modificationTime,
                "dataChange": False, "stats": a.stats,
                "deletionVector": None}} for a in chunk]
            buf = io.BytesIO()
            pq.write_table(pa.Table.from_pylist(rows, schema=_SCHEMA), buf)
            name = f"sidecar-{i}.parquet"
            with open(os.path.join(log_dir, "_sidecars", name),
                      "wb") as fh:
                fh.write(buf.getvalue())
            sidecar_names.append(name)

        manifest = [
            {"checkpointMetadata": {"version": 2}},
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": {
                "id": md.id,
                "format": {"provider": "parquet", "options": {}},
                "schemaString": md.schemaString,
                "partitionColumns": list(md.partitionColumns),
                "configuration": {}, "createdTime": md.createdTime}},
            {"txn": {"appId": "foreign-stream", "version": 9}},
        ] + [{"sidecar": {"path": n, "sizeInBytes": 1,
                          "modificationTime": 1}}
             for n in sidecar_names]
        mname = f"{2:020d}.checkpoint." \
                "0f0e0d0c-0b0a-0908-0706-050403020100.json"
        with open(os.path.join(log_dir, mname), "w") as fh:
            fh.write("\n".join(_json.dumps(m) for m in manifest))
        with open(os.path.join(log_dir, "_last_checkpoint"), "w") as fh:
            fh.write(_json.dumps({"version": 2, "size": len(manifest)}))

        log = DeltaLog.load(Location.resolve(log_dir))
        assert set(log.entries) == {2}
        assert set(log.add_actions()) == {a.path for a in adds}
        assert log.latest_txn_version("foreign-stream") == 9
        assert DeltaTable(spark, tmp_table_dir).to_df().count() == 30


class TestCheckpointIntervalProperty:
    def test_table_property_drives_interval(self, spark,
                                            tmp_table_dir):
        """delta.checkpointInterval overrides the handle attribute:
        interval 3 produces a checkpoint at v3 where the default (10)
        would not."""
        df = spark.range(5)
        t = DeltaTable(spark, tmp_table_dir).write(df)
        t = t.set_properties({"delta.checkpointInterval": "3"})
        t = t.write(df)                               # v2
        names = set(os.listdir(os.path.join(tmp_table_dir,
                                            "_delta_log")))
        assert not any(".checkpoint." in n for n in names)
        t = t.write(df)                               # v3 -> checkpoint
        names = set(os.listdir(os.path.join(tmp_table_dir,
                                            "_delta_log")))
        assert checkpoint_filename(3) in names
        # expired-log cleanup rode the checkpoint, but the 30-day
        # default retention keeps every young commit
        assert "00000000000000000000.json" in names

    def test_auto_cleanup_respects_retention_config(self, spark,
                                                    tmp_table_dir):
        """With delta.logRetentionDuration = 0 hours, the cleanup that
        rides the checkpoint expires everything below it."""
        df = spark.range(5)
        t = DeltaTable(spark, tmp_table_dir).write(df)
        t = t.set_properties(
            {"delta.checkpointInterval": "3",
             "delta.logRetentionDuration": "interval 0 hours"})
        t = t.write(df).write(df)                     # v2, v3
        names = set(os.listdir(os.path.join(tmp_table_dir,
                                            "_delta_log")))
        assert checkpoint_filename(3) in names
        assert "00000000000000000000.json" not in names
        # 3 data commits x 5 rows (v1 is the properties commit)
        assert DeltaTable(spark, tmp_table_dir).count() == 15

    def test_cleanup_opt_out(self, spark, tmp_table_dir):
        df = spark.range(5)
        t = DeltaTable(spark, tmp_table_dir).write(df)
        t = t.set_properties(
            {"delta.checkpointInterval": "3",
             "delta.logRetentionDuration": "interval 0 hours",
             "delta.enableExpiredLogCleanup": "false"})
        t = t.write(df).write(df)
        names = set(os.listdir(os.path.join(tmp_table_dir,
                                            "_delta_log")))
        assert checkpoint_filename(3) in names
        assert "00000000000000000000.json" in names


class TestMetadataCleanup:
    """cleanup_metadata() — delta.logRetentionDuration expiry: log
    files strictly below the newest checkpoint AND older than the
    retention window are deleted; everything at/after the checkpoint,
    _last_checkpoint, and sidecars referenced by retained manifests
    survive; replay-from-checkpoint and young-version time travel
    keep working."""

    def test_expires_and_reloads(self, spark, tmp_table_dir):
        t = _build(spark, tmp_table_dir, 12)  # checkpoint at v10
        n = t.count()
        doomed = t.cleanup_metadata(retention_hours=0.0)
        assert "00000000000000000009.json" in doomed
        assert all(not d.startswith("00000000000000000010")
                   and not d.startswith("00000000000000000011")
                   for d in doomed)
        t2 = DeltaTable(spark, tmp_table_dir)
        assert t2.count() == n and t2.version == 11
        with pytest.raises(Exception):
            t2.load_as_version(3).to_df().count()

    def test_retention_window_protects_young_commits(self, spark,
                                                     tmp_table_dir):
        t = _build(spark, tmp_table_dir, 12)
        # default 30-day retention: every commit is seconds old
        assert t.cleanup_metadata(dry_run=True) == []
        # table-config interval parses and behaves the same
        t = t.set_properties(
            {"delta.logRetentionDuration": "interval 2 weeks"})
        assert t.cleanup_metadata(dry_run=True) == []

    def test_no_checkpoint_is_a_noop(self, spark, tmp_table_dir):
        t = _build(spark, tmp_table_dir, 3)   # below the interval
        assert t.cleanup_metadata(retention_hours=0.0) == []

    def test_bad_interval_refused(self, spark, tmp_table_dir):
        t = _build(spark, tmp_table_dir, 12)
        t = t.set_properties(
            {"delta.logRetentionDuration": "sometimes"})
        with pytest.raises(ValueError, match="logRetentionDuration"):
            t.cleanup_metadata(dry_run=True)

    def test_superseded_checkpoint_expires_too(self, spark,
                                               tmp_table_dir):
        t = _build(spark, tmp_table_dir, 21)  # checkpoints at 10, 20
        doomed = t.cleanup_metadata(retention_hours=0.0)
        assert "00000000000000000010.checkpoint.parquet" in doomed
        assert DeltaTable(spark, tmp_table_dir).count() == t.count()

    def test_sidecars_of_retained_v2_checkpoint_survive(self, spark,
                                                        tmp_table_dir):
        from xdlake_spark.log.checkpoint import write_checkpoint
        t = _build(spark, tmp_table_dir, 12)
        log_dir = os.path.join(tmp_table_dir, "_delta_log")
        loc = Location.resolve(log_dir)
        full = DeltaLog.load(loc, use_checkpoint=False)
        # newest checkpoint becomes a v2 manifest with sidecars
        write_checkpoint(loc, full, v2=True, sidecar_size=2)
        import json as _json
        _refreshed = DeltaTable(spark, tmp_table_dir)
        live_sidecars = set(os.listdir(os.path.join(log_dir,
                                                    "_sidecars")))
        # plant an unreferenced (orphan) sidecar older than any window
        orphan = os.path.join(log_dir, "_sidecars", "orphan.parquet")
        with open(orphan, "wb") as f:
            f.write(b"junk")
        doomed = _refreshed.cleanup_metadata(retention_hours=0.0)
        assert "_sidecars/orphan.parquet" in doomed
        remaining = set(os.listdir(os.path.join(log_dir, "_sidecars")))
        assert live_sidecars <= remaining
        assert DeltaTable(spark, tmp_table_dir).count() == t.count()


class TestHilbertOptimize:
    def test_hilbert_identity_pruning_and_tighter_than_z(
            self, spark, tmp_table_dir, lineitem):
        from xdlake_spark.plans.skipping import prune_manifest

        before = lineitem.count()
        t = DeltaTable(spark, f"{tmp_table_dir}/h").write(lineitem)
        t = t.optimize(hilbert_by=["l_partkey", "l_suppkey"],
                       target_file_size=12 * 1024)
        assert t.to_df().count() == before
        assert len(t.adds) > 1
        hist = next(iter(t.history()))
        assert "hilbertClusterBy" in str(
            hist.get("operationMetrics") or hist)
        pruned = prune_manifest(t.adds, "l_partkey <= 5", [])
        assert len(pruned) < len(t.adds)
        # the multi-column bounding box prunes too — the whole point
        # of curve clustering over a single-column sort
        pruned2 = prune_manifest(
            t.adds, "l_partkey <= 5 AND l_suppkey <= 3", [])
        assert len(pruned2) <= len(pruned)
        assert len(pruned2) < len(t.adds)

    def test_zorder_and_hilbert_mutually_exclusive(
            self, spark, tmp_table_dir, lineitem):
        import pytest

        t = DeltaTable(spark, f"{tmp_table_dir}/x").write(
            lineitem.limit(10))
        with pytest.raises(ValueError, match="not both"):
            t.optimize(zorder_by=["l_partkey"], hilbert_by=["l_suppkey"])
