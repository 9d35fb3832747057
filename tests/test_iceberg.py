"""Iceberg snapshot generation (log/iceberg.py, DeltaTable.generate
mode='iceberg' — delta-spark UniForm parity): the written
metadata.json + Avro manifest list + manifest must describe exactly
the table's live file set, typed partition values included, parsed
back with the independent from-spec Avro reader."""

import json
import os

import pytest
from pyspark.sql import functions as F

from xdlake_spark import DeltaTable
from xdlake_spark.log.avro import read_avro_file


def _read_snapshot(table_dir):
    meta_dir = os.path.join(table_dir, "metadata")
    hint = int(open(os.path.join(meta_dir, "version-hint.text")).read())
    md = json.load(open(os.path.join(meta_dir,
                                     f"v{hint}.metadata.json")))
    snap = next(s for s in md["snapshots"]
                if s["snapshot-id"] == md["current-snapshot-id"])
    _, manifests, _ = read_avro_file(
        open(snap["manifest-list"], "rb").read())
    entries = []
    for m in manifests:
        _, es, mmeta = read_avro_file(
            open(m["manifest_path"], "rb").read())
        entries.extend(es)
    return md, snap, manifests, entries


class TestIcebergSnapshot:
    def test_partitioned_table_round_trip(self, spark, lineitem,
                                          tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(
            lineitem.limit(400), partition_by=["l_returnflag"])
        t = t.write(lineitem.limit(100), mode="append")
        t.generate("iceberg")
        md, snap, manifests, entries = _read_snapshot(tmp_table_dir)

        # live file set matches exactly (absolute paths)
        want = {t.location.absloc(a.path).url: a
                for a in t.adds.values()}
        got = {e["data_file"]["file_path"]: e for e in entries}
        assert set(got) == set(want)
        for p, e in got.items():
            a = want[p]
            assert e["data_file"]["file_size_in_bytes"] == a.size
            assert e["data_file"]["record_count"] == \
                json.loads(a.stats)["numRecords"]
            assert e["data_file"]["file_format"] == "PARQUET"
            assert e["data_file"]["partition"]["l_returnflag"] == \
                a.partitionValues["l_returnflag"]
            assert e["status"] == 1

        # row accounting: manifest list == sum of entries == table count
        assert manifests[0]["added_files_count"] == len(entries)
        assert manifests[0]["added_rows_count"] == t.to_df().count()
        assert int(snap["summary"]["total-records"]) == \
            t.to_df().count()

        # schema: every Delta column present with a unique field id
        fields = md["schemas"][0]["fields"]
        assert [f["name"] for f in fields] == \
            [f.name for f in t.schema.fields]
        ids = [f["id"] for f in fields]
        assert len(set(ids)) == len(ids)
        assert md["last-column-id"] >= max(ids)
        # partition spec points at the partition column's field id
        spec = md["partition-specs"][0]["fields"][0]
        by_name = {f["name"]: f for f in fields}
        assert spec["source-id"] == by_name["l_returnflag"]["id"]
        assert spec["transform"] == "identity"
        assert spec["field-id"] == 1000

    def test_int_partition_values_typed(self, spark, lineitem,
                                        tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(
            lineitem.limit(200).withColumn(
                "bucket", (F.col("l_orderkey") % 3).cast("int")),
            partition_by=["bucket"])
        t.generate("iceberg")
        _, _, _, entries = _read_snapshot(tmp_table_dir)
        vals = {e["data_file"]["partition"]["bucket"] for e in entries}
        assert vals <= {0, 1, 2}
        assert all(isinstance(v, int) for v in vals)

    def test_date_partition_as_epoch_days(self, spark, lineitem,
                                          tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(
            lineitem.limit(50).withColumn(
                "d", F.lit("2020-01-03").cast("date")),
            partition_by=["d"])
        t.generate("iceberg")
        _, _, _, entries = _read_snapshot(tmp_table_dir)
        days = {e["data_file"]["partition"]["d"] for e in entries}
        assert days == {18264}  # 2020-01-03 = epoch day 18264

    def test_unpartitioned_table(self, spark, lineitem,
                                 tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(120))
        t.generate("iceberg")
        md, _, _, entries = _read_snapshot(tmp_table_dir)
        assert md["partition-specs"] == [{"spec-id": 0, "fields": []}]
        assert all(e["data_file"]["partition"] == {} for e in entries)

    def test_snapshot_tracks_current_version(self, spark, lineitem,
                                             tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(100))
        t.generate("iceberg")
        _, _, _, e1 = _read_snapshot(tmp_table_dir)
        t = t.delete("l_quantity > 30")
        t.generate("iceberg")
        md2, _, _, e2 = _read_snapshot(tmp_table_dir)
        # r12: the chained manifest is incremental — live files plus
        # status=2 tombstones for the parent files the delete dropped;
        # readers skip the tombstones
        live2 = [e for e in e2 if e["status"] != 2]
        assert {e["data_file"]["file_path"] for e in live2} == \
            {t.location.absloc(a.path).url for a in t.adds.values()}
        assert sum(e["data_file"]["record_count"] for e in live2) == \
            t.to_df().count()
        assert any(e["status"] == 2 for e in e2)  # CoW delete dropped a file
        # version hint advanced with the Delta version
        hint = int(open(os.path.join(tmp_table_dir, "metadata",
                                     "version-hint.text")).read())
        assert hint == t.version + 1

    def test_snapshot_chain_carries_history(self, spark, lineitem,
                                            tmp_table_dir):
        """r11: successive generations CHAIN — the new snapshot
        records parent-snapshot-id, prior snapshots stay listed,
        sequence numbers advance, and the superseded metadata.json
        lands in metadata-log. Regeneration at the same Delta version
        is idempotent (no duplicate snapshot)."""
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(80))
        t.generate("iceberg")
        md1, snap1, _, _ = _read_snapshot(tmp_table_dir)
        t.generate("iceberg")                 # same version: no-op
        md1b, _, _, _ = _read_snapshot(tmp_table_dir)
        assert len(md1b["snapshots"]) == 1
        t = t.write(lineitem.limit(20), mode="append")
        t.generate("iceberg")
        md2, snap2, _, _ = _read_snapshot(tmp_table_dir)
        assert len(md2["snapshots"]) == 2
        assert snap2["parent-snapshot-id"] == snap1["snapshot-id"]
        assert snap2["sequence-number"] == 2
        assert md2["last-sequence-number"] == 2
        assert len(md2["snapshot-log"]) == 2
        assert md2["metadata-log"][-1]["metadata-file"].endswith(
            "v1.metadata.json")
        # schema change resets the chain (old snapshots would lie)
        t = t.add_columns({"extra": "string"})
        t.generate("iceberg")
        md3, snap3, _, _ = _read_snapshot(tmp_table_dir)
        assert len(md3["snapshots"]) == 1
        assert "parent-snapshot-id" not in md3["snapshots"][0]
        assert md3["last-sequence-number"] == 1

    def test_same_version_regen_preserves_chain(self, spark, lineitem,
                                                tmp_table_dir):
        """r11 review: regenerating at the same Delta version when the
        chain is LONGER than one must rewrite the identical state —
        never reset the accumulated history or regress sequence
        numbers."""
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(60))
        t.generate("iceberg")
        t = t.write(lineitem.limit(20), mode="append")
        t.generate("iceberg")
        md2, snap2, _, _ = _read_snapshot(tmp_table_dir)
        t.generate("iceberg")                 # regen at same version
        md2b, snap2b, _, _ = _read_snapshot(tmp_table_dir)
        assert len(md2b["snapshots"]) == 2
        assert md2b["last-sequence-number"] == 2
        assert snap2b["parent-snapshot-id"] == \
            snap2["parent-snapshot-id"]
        assert md2b["metadata-log"] == md2["metadata-log"]
        assert len(md2b["snapshot-log"]) == 2

    def test_import_append_validates_schema_and_partitioning(
            self, spark, lineitem, tmp_table_dir):
        """r11 review: appending an Iceberg snapshot into an existing
        table with different partitioning or schema must refuse, like
        import_refs — never a silent commit of mismatched adds."""
        a = DeltaTable(spark, f"{tmp_table_dir}/a").write(
            lineitem.limit(40), partition_by=["l_returnflag"])
        a.generate("iceberg")
        b = DeltaTable(spark, f"{tmp_table_dir}/b").write(
            lineitem.limit(10))          # unpartitioned target
        with pytest.raises(ValueError):
            b.import_iceberg(f"{tmp_table_dir}/a", mode="append")
        c = DeltaTable(spark, f"{tmp_table_dir}/c").write(
            lineitem.limit(10).select("l_orderkey"),
            )                             # narrower schema
        with pytest.raises(ValueError):
            c.import_iceberg(f"{tmp_table_dir}/a", mode="append")

    def test_dangling_position_deletes_are_inert(self, spark,
                                                 lineitem,
                                                 tmp_table_dir):
        """r11 review: position deletes referencing files absent from
        the snapshot (rewritten before delete compaction) are INERT
        per the spec's applicability rules — import succeeds with no
        deletion vector, not an error."""
        a = DeltaTable(spark, tmp_table_dir).write(
            lineitem.limit(50).coalesce(1))
        a.generate("iceberg")
        self._add_position_deletes(
            tmp_table_dir, "file:///nonexistent/rewritten.parquet",
            [0, 1])
        b = DeltaTable(spark, f"{tmp_table_dir}_b").import_iceberg(
            tmp_table_dir)
        assert b.to_df().count() == 50
        assert not any((x.extra or {}).get("deletionVector")
                       for x in b.adds.values())

    def test_uniform_property_regenerates_on_commit(self, spark,
                                                    lineitem,
                                                    tmp_table_dir):
        """r11: delta.universalFormat.enabledFormats=iceberg (the
        delta-spark UniForm trigger) regenerates the Iceberg snapshot
        after every commit — best-effort, chained."""
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(60))
        t = t.set_properties(
            {"delta.universalFormat.enabledFormats": "iceberg"})
        meta = os.path.join(tmp_table_dir, "metadata")
        assert os.path.exists(os.path.join(meta, "version-hint.text"))
        h1 = int(open(os.path.join(meta, "version-hint.text")).read())
        t = t.write(lineitem.limit(20), mode="append")
        h2 = int(open(os.path.join(meta, "version-hint.text")).read())
        assert h2 == h1 + 1
        md, snap, _, entries = _read_snapshot(tmp_table_dir)
        assert sum(e["data_file"]["record_count"]
                   for e in entries) == 80
        assert len(md["snapshots"]) == 2
        # r12 (icebergCompatV2 invariant, delta-spark parity): a DV
        # commit on a UniForm table is REFUSED outright — a skipped
        # regeneration would leave Iceberg readers serving deleted
        # rows indefinitely
        with pytest.raises(ValueError, match="icebergCompatV2"):
            t.delete("l_quantity > 40", mode="merge-on-read")
        # copy-on-write delete works and regenerates
        t = t.delete("l_quantity > 40", mode="copy-on-write")
        h3 = int(open(os.path.join(meta, "version-hint.text")).read())
        assert h3 == h2 + 1
        _, _, _, e3 = _read_snapshot(tmp_table_dir)
        live3 = [e for e in e3 if e["status"] != 2]
        assert sum(e["data_file"]["record_count"]
                   for e in live3) == t.to_df().count()

    def test_refuses_deletion_vectors(self, spark, lineitem,
                                      tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(200))
        t = t.delete("l_quantity > 40", mode="merge-on-read")
        with pytest.raises(ValueError, match="deletion vector"):
            t.generate("iceberg")
        # purge the DVs, then it works
        t = t.reorg_purge()
        t.generate("iceberg")
        _, _, _, entries = _read_snapshot(tmp_table_dir)
        assert sum(e["data_file"]["record_count"] for e in entries) == \
            t.to_df().count()

    def test_refuses_statless_files(self, spark, lineitem,
                                    tmp_table_dir):
        """A live add without numRecords (stats-less foreign writer)
        must refuse loudly — Iceberg requires record_count — with a
        pointer to recompute_stats()."""
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(80))
        for a in t.adds.values():
            a.stats = None
        with pytest.raises(ValueError, match="recompute_stats"):
            t.generate("iceberg")
        fresh = DeltaTable(spark, tmp_table_dir)  # stats intact on disk
        fresh.generate("iceberg")
        _, _, _, entries = _read_snapshot(tmp_table_dir)
        assert sum(e["data_file"]["record_count"] for e in entries) == 80

    def test_import_round_trip(self, spark, lineitem, tmp_table_dir):
        """generate('iceberg') then import_iceberg into a fresh table:
        schema, partitioning, row count (metadata-only, from the
        imported numRecords stats), and the full data must survive."""
        a = DeltaTable(spark, f"{tmp_table_dir}/a").write(
            lineitem.limit(300), partition_by=["l_returnflag"])
        a = a.delete("l_quantity > 44")
        a.generate("iceberg")
        b = DeltaTable(spark, f"{tmp_table_dir}/b").import_iceberg(
            f"{tmp_table_dir}/a")
        assert b.partition_columns == ["l_returnflag"]
        assert [f.name for f in b.schema.fields] == \
            [f.name for f in a.schema.fields]
        assert b.count() == a.count()      # stats-driven count
        ga = sorted(tuple(r) for r in a.to_df().collect())
        gb = sorted(tuple(r) for r in
                    b.to_df().select(*a.to_df().columns).collect())
        assert ga == gb

    def test_import_date_partition_round_trip(self, spark, lineitem,
                                              tmp_table_dir):
        a = DeltaTable(spark, f"{tmp_table_dir}/a").write(
            lineitem.limit(60).withColumn(
                "d", F.lit("2021-06-30").cast("date")),
            partition_by=["d"])
        a.generate("iceberg")
        b = DeltaTable(spark, f"{tmp_table_dir}/b").import_iceberg(
            f"{tmp_table_dir}/a")
        vals = {a_.partitionValues["d"] for a_ in b.adds.values()}
        assert vals == {"2021-06-30"}
        assert b.to_df().filter(F.col("d") ==
                                "2021-06-30").count() == 60

    def test_import_existing_table_requires_mode(self, spark,
                                                 lineitem,
                                                 tmp_table_dir):
        a = DeltaTable(spark, f"{tmp_table_dir}/a").write(
            lineitem.limit(40))
        a.generate("iceberg")
        b = DeltaTable(spark, f"{tmp_table_dir}/b").write(
            lineitem.limit(10))
        with pytest.raises(FileExistsError):
            b.import_iceberg(f"{tmp_table_dir}/a")
        b2 = b.import_iceberg(f"{tmp_table_dir}/a", mode="overwrite")
        assert b2.to_df().count() == 40

    def _add_position_deletes(self, table_dir, data_file_url,
                              positions):
        """Craft an Iceberg v2 position-delete file + delete manifest
        and splice a content=1 entry into the snapshot's manifest
        list — the state a merge-on-read Iceberg writer produces."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from xdlake_spark.log.avro import write_avro_file
        meta_dir = os.path.join(table_dir, "metadata")
        del_path = os.path.join(meta_dir, "pos-delete-0.parquet")
        pq.write_table(pa.table({
            "file_path": [data_file_url] * len(positions),
            "pos": pa.array(positions, type=pa.int64())}), del_path)

        md, snap, manifests, _ = _read_snapshot(table_dir)
        mschema, entries, mmeta = read_avro_file(
            open(manifests[0]["manifest_path"], "rb").read())
        dentry = json.loads(json.dumps(entries[0]))  # deep copy shape
        dentry["data_file"].update({
            "content": 1, "file_path": del_path,
            "file_format": "PARQUET",
            "record_count": len(positions),
            "file_size_in_bytes": os.path.getsize(del_path),
            "partition": {k: None
                          for k in dentry["data_file"]["partition"]}})
        dman_path = os.path.join(meta_dir, "delete-m0.avro")
        open(dman_path, "wb").write(
            write_avro_file(mschema, [dentry], metadata={
                **{k: v for k, v in mmeta.items()
                   if not k.startswith("avro.")},
                "content": "deletes"}))
        lschema, mlist, lmeta = read_avro_file(
            open(snap["manifest-list"], "rb").read())
        dm = json.loads(json.dumps(mlist[0]))
        dm.update({"manifest_path": dman_path, "content": 1,
                   "manifest_length": os.path.getsize(dman_path),
                   "added_files_count": 1, "added_rows_count":
                   len(positions)})
        open(snap["manifest-list"], "wb").write(
            write_avro_file(lschema, mlist + [dm]))

    def test_import_position_deletes_as_dv(self, spark, lineitem,
                                           tmp_table_dir):
        """Iceberg v2 position deletes convert to Delta deletion
        vectors on import: the scan excludes exactly the deleted row
        positions, count() subtracts the cardinality, and the protocol
        declares deletionVectors."""
        import pyarrow.parquet as pq
        a = DeltaTable(spark, f"{tmp_table_dir}/a").write(
            lineitem.limit(100).coalesce(1))
        a.generate("iceberg")
        (data_rel,) = a.adds
        data_url = a.location.absloc(data_rel).url
        self._add_position_deletes(f"{tmp_table_dir}/a", data_url,
                                   [1, 3, 5, 97])
        b = DeltaTable(spark, f"{tmp_table_dir}/b").import_iceberg(
            f"{tmp_table_dir}/a")
        # expected: the parquet's rows minus positions 1,3,5,97
        pdf = pq.read_table(data_url).to_pandas()
        keep = pdf.drop(index=[1, 3, 5, 97])
        got = sorted(map(tuple, b.to_df().select(
            *[c for c in keep.columns]).collect()))
        want = sorted(map(tuple, keep.itertuples(index=False,
                                                 name=None)))
        assert len(got) == 96
        assert [r[:2] for r in got] == [r[:2] for r in want]
        assert b.count() == 96                  # stats minus DV
        proto = b.log.protocol()
        assert "deletionVectors" in \
            (proto.extra or {}).get("readerFeatures", [])

    def _add_equality_deletes(self, table_dir, cols, rows, seq=2):
        """Craft an Iceberg v2 EQUALITY-delete file (parquet of the
        equality columns' VALUES) + delete manifest whose entry
        carries equality_ids, and splice it into the manifest list —
        the state a streaming upsert Iceberg writer produces."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from xdlake_spark.log.avro import write_avro_file
        meta_dir = os.path.join(table_dir, "metadata")
        del_path = os.path.join(meta_dir, "eq-delete-0.parquet")
        pq.write_table(pa.table(
            {c: [r[i] for r in rows] for i, c in enumerate(cols)}),
            del_path)
        md, snap, manifests, _ = _read_snapshot(table_dir)
        ids_by_name = {f["name"]: f["id"]
                       for f in md["schemas"][0]["fields"]}
        mschema, entries, mmeta = read_avro_file(
            open(manifests[0]["manifest_path"], "rb").read())
        # the writer's data_file record has no equality_ids field —
        # extend the schema the way a real equality-delete writer's
        # manifest does (array of source field ids, field-id 135)
        eschema = json.loads(json.dumps(mschema))
        df_schema = next(f for f in eschema["fields"]
                         if f["name"] == "data_file")["type"]
        df_schema["fields"].append(
            {"name": "equality_ids",
             "type": ["null", {"type": "array", "items": "int",
                               "element-id": 136}],
             "default": None, "field-id": 135})
        dentry = json.loads(json.dumps(entries[0]))
        dentry["sequence_number"] = seq
        dentry["file_sequence_number"] = seq
        dentry["data_file"].update({
            "content": 2, "file_path": del_path,
            "file_format": "PARQUET",
            "record_count": len(rows),
            "file_size_in_bytes": os.path.getsize(del_path),
            "equality_ids": [ids_by_name[c] for c in cols],
            "partition": {k: None
                          for k in dentry["data_file"]["partition"]}})
        dman_path = os.path.join(meta_dir, "eq-delete-m0.avro")
        open(dman_path, "wb").write(
            write_avro_file(eschema, [dentry], metadata={
                **{k: v for k, v in mmeta.items()
                   if not k.startswith("avro.")},
                "content": "deletes"}))
        lschema, mlist, lmeta = read_avro_file(
            open(snap["manifest-list"], "rb").read())
        dm = json.loads(json.dumps(mlist[0]))
        dm.update({"manifest_path": dman_path, "content": 1,
                   "manifest_length": os.path.getsize(dman_path),
                   "sequence_number": seq,
                   "added_files_count": 1,
                   "added_rows_count": len(rows)})
        open(snap["manifest-list"], "wb").write(
            write_avro_file(lschema, mlist + [dm]))

    def test_import_equality_deletes_as_dv(self, spark, lineitem,
                                           tmp_table_dir):
        """r12: Iceberg v2 EQUALITY deletes convert to DVs on import —
        one Spark job semi-joins the affected files against the delete
        VALUES (null-safe, seq-gated) and the matching positions
        become bitmaps; the scan then excludes exactly those rows."""
        import pyarrow.parquet as pq
        a = DeltaTable(spark, f"{tmp_table_dir}/a").write(
            lineitem.limit(100).coalesce(1))
        a.generate("iceberg")
        (data_rel,) = a.adds
        data_url = a.location.absloc(data_rel).url
        pdf = pq.read_table(data_url).to_pandas()
        victims = pdf.iloc[[2, 5, 9]]
        keys = list(map(tuple, victims[["l_orderkey",
                                        "l_linenumber"]].values))
        self._add_equality_deletes(
            f"{tmp_table_dir}/a", ["l_orderkey", "l_linenumber"],
            [(int(k), int(ln)) for k, ln in keys])
        b = DeltaTable(spark, f"{tmp_table_dir}/b").import_iceberg(
            f"{tmp_table_dir}/a")
        got = b.to_df().select("l_orderkey", "l_linenumber").collect()
        got_keys = {(r["l_orderkey"], r["l_linenumber"]) for r in got}
        # every surviving (orderkey, linenumber) pair excludes the
        # deleted ones; row count matches the value-level expectation
        want = pdf[~pdf.apply(
            lambda r: (r["l_orderkey"], r["l_linenumber"]) in
            set(keys), axis=1)]
        assert len(got) == len(want)
        assert not (set(keys) & got_keys)
        assert b.count() == len(want)          # stats minus DV
        proto = b.log.protocol()
        assert "deletionVectors" in \
            (proto.extra or {}).get("readerFeatures", [])

    def test_equality_delete_sequence_gate_is_strict(
            self, spark, lineitem, tmp_table_dir):
        """Spec: an equality delete applies only to files with
        sequence number STRICTLY below the delete's — a delete at the
        data file's own seq (same commit) must not touch it."""
        import pyarrow.parquet as pq
        a = DeltaTable(spark, tmp_table_dir).write(
            lineitem.limit(40).coalesce(1))
        a.generate("iceberg")
        (data_rel,) = a.adds
        pdf = pq.read_table(
            a.location.absloc(data_rel).url).to_pandas()
        k = int(pdf.iloc[0]["l_orderkey"])
        ln = int(pdf.iloc[0]["l_linenumber"])
        self._add_equality_deletes(
            tmp_table_dir, ["l_orderkey", "l_linenumber"],
            [(k, ln)], seq=1)               # same seq as the data
        b = DeltaTable(spark, f"{tmp_table_dir}_b").import_iceberg(
            tmp_table_dir)
        assert b.to_df().count() == len(pdf)   # nothing deleted

    def test_import_bucket_partitioned_unpartitioned_scan(
            self, spark, lineitem, tmp_table_dir):
        """r12: a bucket[N]-partitioned Iceberg table imports as an
        UNPARTITIONED Delta table — the bucket id is layout, not a
        column value; the data files hold every column, so the scan is
        value-exact."""
        a = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(80))
        a.generate("iceberg")
        md, snap, _, _ = _read_snapshot(tmp_table_dir)
        oid = next(f["id"] for f in md["schemas"][0]["fields"]
                   if f["name"] == "l_orderkey")
        hint = int(open(os.path.join(tmp_table_dir, "metadata",
                                     "version-hint.text")).read())
        mpath = os.path.join(tmp_table_dir, "metadata",
                             f"v{hint}.metadata.json")
        md["partition-specs"] = [{"spec-id": 0, "fields": [
            {"name": "l_orderkey_bucket", "transform": "bucket[4]",
             "source-id": oid, "field-id": 1000}]}]
        md["last-partition-id"] = 1000
        json.dump(md, open(mpath, "w"))
        b = DeltaTable(spark, f"{tmp_table_dir}_b").import_iceberg(
            tmp_table_dir)
        assert b.partition_columns == []
        assert b.to_df().count() == 80
        assert sorted(r["l_orderkey"] for r in
                      b.to_df().select("l_orderkey").collect()) == \
            sorted(r["l_orderkey"] for r in
                   a.to_df().select("l_orderkey").collect())

    def test_import_mixed_spec_keeps_identity_columns(
            self, spark, lineitem, tmp_table_dir):
        """A mixed identity+truncate spec keeps the identity column as
        a real Delta partition column (subset declaration — prunes
        correctly, just less than the full Iceberg spec could)."""
        a = DeltaTable(spark, tmp_table_dir).write(
            lineitem.limit(120), partition_by=["l_returnflag"])
        a.generate("iceberg")
        md, snap, _, _ = _read_snapshot(tmp_table_dir)
        rid = next(f["id"] for f in md["schemas"][0]["fields"]
                   if f["name"] == "l_linestatus")
        hint = int(open(os.path.join(tmp_table_dir, "metadata",
                                     "version-hint.text")).read())
        mpath = os.path.join(tmp_table_dir, "metadata",
                             f"v{hint}.metadata.json")
        md["partition-specs"][0]["fields"].append(
            {"name": "l_linestatus_trunc", "transform": "truncate[1]",
             "source-id": rid, "field-id": 1001})
        json.dump(md, open(mpath, "w"))
        b = DeltaTable(spark, f"{tmp_table_dir}_b").import_iceberg(
            tmp_table_dir)
        assert b.partition_columns == ["l_returnflag"]
        assert b.to_df().count() == 120
        # partition pruning on the kept identity column still works
        flags = {a.partitionValues["l_returnflag"]
                 for a in b.adds.values()}
        one = sorted(flags)[0]
        assert b.to_df(where=f"l_returnflag = '{one}'").count() == \
            a.to_df(where=f"l_returnflag = '{one}'").count()

    def test_import_refuses_unknown_transform(self, spark, lineitem,
                                              tmp_table_dir):
        a = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(20))
        a.generate("iceberg")
        md, _, _, _ = _read_snapshot(tmp_table_dir)
        oid = md["schemas"][0]["fields"][0]["id"]
        hint = int(open(os.path.join(tmp_table_dir, "metadata",
                                     "version-hint.text")).read())
        mpath = os.path.join(tmp_table_dir, "metadata",
                             f"v{hint}.metadata.json")
        md["partition-specs"] = [{"spec-id": 0, "fields": [
            {"name": "z", "transform": "zorder",
             "source-id": oid, "field-id": 1000}]}]
        json.dump(md, open(mpath, "w"))
        with pytest.raises(ValueError, match="transform"):
            DeltaTable(spark, f"{tmp_table_dir}_b").import_iceberg(
                tmp_table_dir)

    def test_import_refuses_unresolvable_equality_ids(
            self, spark, lineitem, tmp_table_dir):
        a = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(30))
        a.generate("iceberg")
        (data_rel,) = a.adds
        self._add_position_deletes(
            tmp_table_dir, a.location.absloc(data_rel).url, [0])
        # content=2 without equality_ids: a malformed writer — refuse
        md, snap, manifests, _ = _read_snapshot(tmp_table_dir)
        from xdlake_spark.log.avro import write_avro_file
        dman = os.path.join(tmp_table_dir, "metadata",
                            "delete-m0.avro")
        mschema, entries, _ = read_avro_file(open(dman, "rb").read())
        entries[0]["data_file"]["content"] = 2
        open(dman, "wb").write(write_avro_file(mschema, entries))
        with pytest.raises(ValueError, match="equality_ids"):
            DeltaTable(spark, f"{tmp_table_dir}_b").import_iceberg(
                tmp_table_dir)

    def test_manifest_carries_iceberg_metadata_keys(self, spark,
                                                    lineitem,
                                                    tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(
            lineitem.limit(60), partition_by=["l_returnflag"])
        t.generate("iceberg")
        md, snap, manifests, _ = _read_snapshot(tmp_table_dir)
        _, _, mmeta = read_avro_file(
            open(manifests[0]["manifest_path"], "rb").read())
        assert mmeta["format-version"] == "2"
        assert mmeta["content"] == "data"
        assert json.loads(mmeta["schema"]) == md["schemas"][0]
        assert json.loads(mmeta["partition-spec"]) == \
            md["partition-specs"][0]["fields"]


class TestIncrementalManifests:
    """r12 (review follow-up): chained generations write INCREMENTAL
    manifests — carried files are status=0 EXISTING with their original
    sequence numbers and adding snapshot, new files status=1 ADDED at
    the new sequence, dropped parent files status=2 DELETED — so
    Iceberg incremental/changelog consumers see the actual delta, not
    a full re-add of the table every generation."""

    def test_append_marks_carried_files_existing(self, spark, lineitem,
                                                 tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(60))
        t.generate("iceberg")
        _, _, _, e1 = _read_snapshot(tmp_table_dir)
        assert all(e["status"] == 1 for e in e1)    # first: all ADDED
        sid1 = {e["snapshot_id"] for e in e1}
        t = t.write(lineitem.limit(20), mode="append")
        t.generate("iceberg")
        md2, snap2, manifests2, e2 = _read_snapshot(tmp_table_dir)
        existing = [e for e in e2 if e["status"] == 0]
        added = [e for e in e2 if e["status"] == 1]
        assert len(existing) >= 1 and len(added) >= 1
        # carried files keep ORIGINAL seq + adding snapshot
        assert all(e["sequence_number"] == 1 for e in existing)
        assert all(e["snapshot_id"] in sid1 for e in existing)
        assert all(e["sequence_number"] == 2 for e in added)
        assert snap2["summary"]["operation"] == "append"
        assert snap2["summary"]["added-data-files"] == str(len(added))
        assert manifests2[0]["existing_files_count"] == len(existing)
        assert manifests2[0]["min_sequence_number"] == 1

    def test_delete_writes_tombstones_and_overwrite_op(
            self, spark, lineitem, tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(100))
        t.generate("iceberg")
        t = t.delete("l_quantity > 30")     # CoW: drops + adds a file
        t.generate("iceberg")
        md, snap, manifests, entries = _read_snapshot(tmp_table_dir)
        dels = [e for e in entries if e["status"] == 2]
        assert dels, "CoW delete must tombstone the dropped file"
        assert snap["summary"]["operation"] == "overwrite"
        # tombstones carry the delete's sequence number but the file's
        # original add sequence
        assert all(e["sequence_number"] == 2 for e in dels)
        assert all(e["file_sequence_number"] == 1 for e in dels)
        assert manifests[0]["deleted_files_count"] == len(dels)
        # totals count live files only
        live = [e for e in entries if e["status"] != 2]
        assert snap["summary"]["total-data-files"] == str(len(live))
        # the importer (a real reader) skips tombstones
        b = DeltaTable(spark, f"{tmp_table_dir}_imp").import_iceberg(
            tmp_table_dir)
        assert b.to_df().count() == t.to_df().count()

    def test_regen_is_still_idempotent(self, spark, lineitem,
                                       tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(60))
        t.generate("iceberg")
        t = t.write(lineitem.limit(20), mode="append")
        t.generate("iceberg")
        _, _, _, e_a = _read_snapshot(tmp_table_dir)
        t.generate("iceberg")               # regen at same version
        md, _, _, e_b = _read_snapshot(tmp_table_dir)
        key = lambda e: (e["data_file"]["file_path"], e["status"],
                         e["sequence_number"])
        assert sorted(map(key, e_a)) == sorted(map(key, e_b))
        assert len(md["snapshots"]) == 2


class TestIcebergCompatV2:
    """r12: the icebergCompatV2 writer feature (delta-spark UniForm
    parity) — declared on enablement, DV-refusing while active,
    writable when a foreign table carries it."""

    def test_enablement_declares_feature(self, spark, lineitem,
                                         tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(40))
        t = t.set_properties(
            {"delta.universalFormat.enabledFormats": "iceberg"})
        proto = t.log.protocol()
        wf = set((proto.extra or {}).get("writerFeatures") or [])
        assert "icebergCompatV2" in wf
        assert t.iceberg_compat_enabled

    def test_enablement_on_dv_table_raises(self, spark, lineitem,
                                           tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(200))
        t = t.delete("l_quantity > 40", mode="merge-on-read")
        assert any((a.extra or {}).get("deletionVector")
                   for a in t.adds.values())
        for props in (
                {"delta.universalFormat.enabledFormats": "iceberg"},
                {"delta.enableIcebergCompatV2": "true"}):
            with pytest.raises(ValueError, match="reorg_purge"):
                t.set_properties(props)
        # after purging, enablement succeeds
        t = t.reorg_purge()
        t = t.set_properties(
            {"delta.enableIcebergCompatV2": "true"})
        assert t.iceberg_compat_enabled

    def test_dv_write_refused_while_active(self, spark, lineitem,
                                           tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(200))
        t = t.set_properties(
            {"delta.enableIcebergCompatV2": "true"})
        with pytest.raises(ValueError, match="icebergCompatV2"):
            t.delete("l_quantity > 40", mode="merge-on-read")
        # CoW stays allowed
        n = t.to_df().count()
        t = t.delete("l_quantity > 40", mode="copy-on-write")
        assert t.to_df().count() < n

    def test_foreign_table_carrying_feature_is_writable(
            self, spark, lineitem, tmp_table_dir):
        """A table whose protocol demands icebergCompatV2 (e.g.
        written by delta-spark UniForm) passes our writer gate."""
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(40))
        import json as _json
        log_file = os.path.join(tmp_table_dir, "_delta_log",
                                f"{0:020d}.json")
        lines = []
        for line in open(log_file):
            obj = _json.loads(line)
            if "protocol" in obj:
                obj["protocol"] = {
                    "minReaderVersion": 1, "minWriterVersion": 7,
                    "writerFeatures": ["icebergCompatV2"]}
            lines.append(_json.dumps(obj))
        open(log_file, "w").write("\n".join(lines) + "\n")
        t2 = DeltaTable(spark, tmp_table_dir)
        t2 = t2.write(lineitem.limit(10), mode="append")
        assert t2.to_df().count() == 50

    def test_failed_uniform_generation_records_staleness(
            self, spark, lineitem, tmp_table_dir, monkeypatch):
        """ADVICE r11 (medium): a failed post-commit Iceberg
        regeneration must not be swallowed silently — the staleness is
        recorded durably next to the metadata, and cleared when a
        later generation succeeds."""
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(40))
        t = t.set_properties(
            {"delta.universalFormat.enabledFormats": "iceberg"})
        import xdlake_spark.log.iceberg as ice

        def boom(table):
            raise RuntimeError("simulated conversion failure")
        real = ice.generate_iceberg_metadata
        monkeypatch.setattr(ice, "generate_iceberg_metadata", boom)
        t = t.write(lineitem.limit(10), mode="append")
        marker = os.path.join(tmp_table_dir, "metadata",
                              "_conversion_stale.json")
        assert os.path.exists(marker)
        rec = json.load(open(marker))
        assert rec["failed_delta_version"] == t.version
        assert "simulated" in rec["error"]
        # a later successful commit clears the marker
        monkeypatch.setattr(ice, "generate_iceberg_metadata", real)
        t = t.write(lineitem.limit(5), mode="append")
        assert not os.path.exists(marker)


class TestIncrementalManifestWalk:
    """Seeded random operation walk differential (r12): after EVERY
    generation in a random append/delete/optimize sequence, the
    chained manifest's entry statuses must reconstruct exactly —
    ADDED = live-but-not-in-parent, EXISTING = live-and-in-parent
    (with the parent's sequence numbers), DELETED = parent-but-not-
    live — and the importer (a real reader) must agree with the Delta
    table at every step."""

    def test_random_walk_statuses_reconstruct(self, spark, lineitem,
                                              tmp_table_dir):
        import random
        rng = random.Random(1234)
        t = DeltaTable(spark, tmp_table_dir).write(
            lineitem.limit(120).coalesce(2))
        t.generate("iceberg")
        _, _, _, prev_entries = _read_snapshot(tmp_table_dir)
        prev_live = {e["data_file"]["file_path"]:
                     (e["sequence_number"], e["snapshot_id"])
                     for e in prev_entries if e["status"] != 2}
        for step in range(6):
            op = rng.choice(["append", "delete", "optimize"])
            if op == "append":
                t = t.write(lineitem.limit(rng.randint(5, 30))
                            .coalesce(1), mode="append")
            elif op == "delete":
                q = rng.randint(10, 45)
                t = t.delete(f"l_quantity > {q}")
            else:
                t = t.optimize(target_file_size=64 * 1024)
            t.generate("iceberg")
            md, snap, manifests, entries = _read_snapshot(
                tmp_table_dir)
            live_want = {t.location.absloc(p).url
                         for p in t.adds}
            added = {e["data_file"]["file_path"]: e for e in entries
                     if e["status"] == 1}
            existing = {e["data_file"]["file_path"]: e
                        for e in entries if e["status"] == 0}
            deleted = {e["data_file"]["file_path"] for e in entries
                       if e["status"] == 2}
            # live set reconstructs exactly
            assert set(added) | set(existing) == live_want, \
                (step, op)
            assert not (set(added) & set(existing))
            # ADDED are new vs parent; EXISTING carry parent seq+snap
            assert not (set(added) & set(prev_live)), (step, op)
            for p, e in existing.items():
                ps, psnap = prev_live[p]
                assert e["sequence_number"] == ps
                assert e["snapshot_id"] == psnap
            # DELETED are exactly the parent files no longer live
            assert deleted == set(prev_live) - live_want, (step, op)
            # summary agrees with the entry statuses
            assert snap["summary"]["operation"] == (
                "append" if not deleted else "overwrite")
            assert int(snap["summary"]["total-data-files"]) == \
                len(live_want)
            # the importer (reader semantics) agrees with the table
            imp = DeltaTable(
                spark, f"{tmp_table_dir}_imp{step}").import_iceberg(
                tmp_table_dir)
            assert imp.to_df().count() == t.to_df().count(), (step, op)
            prev_live = {p: (e["sequence_number"], e["snapshot_id"])
                         for p, e in {**existing, **added}.items()}
