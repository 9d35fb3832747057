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
