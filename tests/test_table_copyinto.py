"""COPY INTO-style idempotent parquet ingestion (table.py copy_into)."""

import json

import pytest

from xdlake_spark import DeltaTable

from .utils import gen_pdf


@pytest.fixture()
def srcdir(spark, tmp_path):
    d = tmp_path / "src"
    spark.createDataFrame(gen_pdf(30)).coalesce(1) \
        .write.parquet(str(d / "batch1"))
    return d


class TestCopyInto:
    def test_creates_and_loads(self, spark, tmp_table_dir, srcdir):
        t = DeltaTable(spark, tmp_table_dir)
        t = t.copy_into(str(srcdir / "batch1"))
        assert t.to_df().count() == 30
        h = next(iter(t.history()))
        assert h["operation"] == "COPY INTO"
        assert h["operationParameters"]["numSourceFiles"] >= 1

    def test_repeat_is_noop(self, spark, tmp_table_dir, srcdir):
        t = DeltaTable(spark, tmp_table_dir).copy_into(str(srcdir))
        v = t.version
        t2 = t.copy_into(str(srcdir))
        assert t2.version == v  # no new commit
        assert t2.to_df().count() == 30

    def test_incremental_new_files_only(self, spark, tmp_table_dir,
                                        srcdir):
        t = DeltaTable(spark, tmp_table_dir).copy_into(str(srcdir))
        spark.createDataFrame(gen_pdf(10)).coalesce(1) \
            .write.parquet(str(srcdir / "batch2"))
        t = t.copy_into(str(srcdir))
        assert t.to_df().count() == 40
        h = next(iter(t.history()))
        assert h["operationParameters"]["skippedSourceFiles"] >= 1
        # domain carries one digest per loaded file
        dm = t.log.domain_metadata(DeltaTable.COPY_INTO_DOMAIN)
        assert len(json.loads(dm.configuration)["ingested"]) >= 2

    def test_retry_after_external_append_no_duplicates(
            self, spark, tmp_table_dir, srcdir):
        # interleaved normal writes don't confuse the digest tracking
        t = DeltaTable(spark, tmp_table_dir).copy_into(str(srcdir))
        t = t.write(spark.createDataFrame(gen_pdf(5)).coalesce(1),
                    mode="append")
        t = t.copy_into(str(srcdir))
        assert t.to_df().count() == 35

    def test_missing_source_raises(self, spark, tmp_table_dir,
                                   tmp_path):
        t = DeltaTable(spark, tmp_table_dir)
        with pytest.raises(ValueError, match="no parquet files"):
            t.copy_into(str(tmp_path / "empty"))


class TestOptimizeWrite:
    def test_coalesces_fragmented_input(self, spark, tmp_table_dir):
        df = spark.createDataFrame(gen_pdf(200)).repartition(16)
        t = DeltaTable(spark, tmp_table_dir).write(df,
                                                   optimize_write=True)
        assert len(t.file_uris()) < 16
        assert t.to_df().count() == 200

    def test_off_by_default_preserves_partitions(self, spark,
                                                 tmp_path):
        df = spark.createDataFrame(gen_pdf(200)).repartition(16)
        t = DeltaTable(spark, str(tmp_path / "t2")).write(df)
        assert len(t.file_uris()) == 16

    def test_clusters_on_hive_partitions(self, spark, tmp_path):
        df = spark.createDataFrame(gen_pdf(300)).repartition(12)
        t = DeltaTable(spark, str(tmp_path / "t3")).write(
            df, partition_by=["cats"], optimize_write=True)
        # one file per hive dir (all rows of a cat hash to one task)
        by_cat = {}
        for u in t.file_uris():
            key = [p for p in u.split("/") if p.startswith("cats=")][0]
            by_cat.setdefault(key, []).append(u)
        assert all(len(v) == 1 for v in by_cat.values())
        assert t.to_df().count() == 300


class TestCopyIntoCheckpoint:
    def test_idempotence_survives_checkpoint(self, spark,
                                             tmp_table_dir, srcdir):
        """The ingested-file digest set lives in a metadata domain;
        the Delta spec says checkpoints MUST carry live domainMetadata
        — so a log loaded from its checkpoint still skips loaded
        files."""
        from xdlake_spark.log import DeltaLog
        from xdlake_spark.log.checkpoint import write_checkpoint
        from xdlake_spark.sources.storage import Location

        t = DeltaTable(spark, tmp_table_dir).copy_into(str(srcdir))
        log_loc = Location.resolve(f"{tmp_table_dir}/_delta_log")
        write_checkpoint(log_loc,
                         DeltaLog.load(log_loc, use_checkpoint=False))
        # fresh handle reads via the checkpoint fast path
        t2 = DeltaTable(spark, tmp_table_dir)
        assert t2.log.domain_metadata(DeltaTable.COPY_INTO_DOMAIN)
        v = t2.version
        t3 = t2.copy_into(str(srcdir))
        assert t3.version == v          # still a no-op
        assert t3.to_df().count() == 30


    def test_creating_commit_declares_domain_feature(
            self, spark, tmp_table_dir, srcdir):
        """ADVICE r7: COPY INTO creating a table must carry the
        domainMetadata writer feature ON the v0 protocol — a
        domainMetadata action under plain (1,2) violates the spec."""
        t = DeltaTable(spark, tmp_table_dir).copy_into(str(srcdir))
        proto = t.log.protocol()
        assert proto.minWriterVersion == 7
        assert "domainMetadata" in \
            (proto.extra or {}).get("writerFeatures", [])
        # exactly ONE protocol action in the creating commit
        log_file = f"{tmp_table_dir}/_delta_log/{0:020d}.json"
        protos = [json.loads(l) for l in open(log_file)
                  if "protocol" in json.loads(l)]
        assert len(protos) == 1
        # and the domain survived alongside it
        assert t.log.domain_metadata(DeltaTable.COPY_INTO_DOMAIN)


class TestAutoCompact:
    def _seed(self, spark, path, partition_by=None, props=None):
        t = DeltaTable(spark, path).write(
            spark.createDataFrame(gen_pdf(20)),
            partition_by=partition_by or [])
        return t.set_properties({
            "delta.autoOptimize.autoCompact": "true",
            "xdlake.autoCompact.minNumFiles": "4", **(props or {})})

    def test_compacts_after_threshold(self, spark, tmp_path):
        t = self._seed(spark, str(tmp_path / "t"))
        for _ in range(4):  # fragment: 1 small file per append
            t = t.write(spark.createDataFrame(gen_pdf(10)).coalesce(1),
                        mode="append")
        # threshold crossed -> auto OPTIMIZE ran (exact trigger commit
        # depends on how many files the seed write produced)
        ops = [h["operation"] for h in t.history()]
        assert "OPTIMIZE" in ops
        assert len(t.file_uris()) < 5
        assert t.to_df().count() == 60

    def test_off_by_default(self, spark, tmp_path):
        t = DeltaTable(spark, str(tmp_path / "t")).write(
            spark.createDataFrame(gen_pdf(20)).coalesce(1))
        for _ in range(5):
            t = t.write(spark.createDataFrame(gen_pdf(10)).coalesce(1),
                        mode="append")
        assert next(t.history())["operation"] != "OPTIMIZE"
        assert len(t.file_uris()) == 6

    def test_scoped_to_written_partitions(self, spark, tmp_path):
        import pandas as pd
        t = self._seed(spark, str(tmp_path / "t"),
                       partition_by=["cats"])
        other_before = {u for u in t.file_uris() if "cats=S" not in u}
        for _ in range(4):
            pdf = gen_pdf(12)
            pdf["cats"] = "S"        # fragment ONLY the S partition
            t = t.write(spark.createDataFrame(pdf).coalesce(1),
                        mode="append")
        ops = [h["operation"] for h in t.history()]
        assert "OPTIMIZE" in ops
        s_files = [u for u in t.file_uris() if "cats=S" in u]
        # S compacted at some point; at most compacted + trailing appends
        assert len(s_files) <= 3
        # untouched partitions kept their original files
        other_after = {u for u in t.file_uris() if "cats=S" not in u}
        assert other_before == other_after
        assert t.to_df().count() == 20 + 48


class TestDistributedVacuum:
    def test_distributed_path_deletes_everything(self, spark,
                                                 tmp_path):
        import glob
        t = DeltaTable(spark, str(tmp_path / "t"))
        t = t.write(spark.createDataFrame(gen_pdf(40)).repartition(8))
        t = t.write(spark.createDataFrame(gen_pdf(10)).coalesce(1),
                    mode="overwrite")   # tombstones the 8 files
        doomed = t.vacuum(retention_hours=0, dry_run=True)
        assert len(doomed) == 8
        gone = t.vacuum(retention_hours=0, distributed_threshold=1)
        assert sorted(gone) == sorted(doomed)
        left = {p.split("/")[-1]
                for p in glob.glob(f"{tmp_path}/t/*.parquet")}
        assert not any(d.split("/")[-1] in left for d in doomed)
        assert t.to_df().count() == 10  # live data intact


class TestAutoCompactNullPartition:
    def test_null_partition_compacts_only_itself(self, spark,
                                                 tmp_path):
        """ADVICE r7: a null partition value must NOT widen
        auto-compact to the whole table — it gets an IS NULL disjunct
        and other partitions keep their files."""
        pdf = gen_pdf(20)
        t = DeltaTable(spark, str(tmp_path / "t")).write(
            spark.createDataFrame(pdf), partition_by=["cats"])
        t = t.set_properties({
            "delta.autoOptimize.autoCompact": "true",
            "xdlake.autoCompact.minNumFiles": "4"})
        other_before = {u for u in t.file_uris()
                        if "__HIVE_DEFAULT_PARTITION__" not in u}
        for _ in range(4):
            frag = gen_pdf(12)
            frag["cats"] = None      # fragment ONLY the null partition
            t = t.write(
                spark.createDataFrame(frag, schema=t.schema)
                .coalesce(1), mode="append")
        ops = [h["operation"] for h in t.history()]
        assert "OPTIMIZE" in ops
        null_files = [u for u in t.file_uris()
                      if "__HIVE_DEFAULT_PARTITION__" in u]
        assert len(null_files) <= 3
        other_after = {u for u in t.file_uris()
                       if "__HIVE_DEFAULT_PARTITION__" not in u}
        assert other_before == other_after   # history untouched
        assert t.to_df().count() == 20 + 48
        assert t.to_df().filter("cats IS NULL").count() == 48
