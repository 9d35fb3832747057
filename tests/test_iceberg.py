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
        assert {e["data_file"]["file_path"] for e in e2} == \
            {t.location.absloc(a.path).url for a in t.adds.values()}
        assert sum(e["data_file"]["record_count"] for e in e2) == \
            t.to_df().count()
        # version hint advanced with the Delta version
        hint = int(open(os.path.join(tmp_table_dir, "metadata",
                                     "version-hint.text")).read())
        assert hint == t.version + 1

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

    def test_import_refuses_delete_manifests(self, spark, lineitem,
                                             tmp_table_dir):
        """A manifest-list entry with content=1 (delete manifest) must
        refuse — merge-on-read Iceberg state cannot become plain
        adds."""
        a = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(50))
        a.generate("iceberg")
        md, snap, _, _ = _read_snapshot(tmp_table_dir)
        from xdlake_spark.log.avro import write_avro_file
        schema, manifests, meta = read_avro_file(
            open(snap["manifest-list"], "rb").read())
        manifests[0]["content"] = 1
        open(snap["manifest-list"], "wb").write(
            write_avro_file(schema, manifests))
        with pytest.raises(ValueError, match="DELETE manifests"):
            DeltaTable(spark, f"{tmp_table_dir}_b").import_iceberg(
                tmp_table_dir)

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
