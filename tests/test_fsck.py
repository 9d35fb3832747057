"""FSCK REPAIR TABLE: manifest-vs-storage drift detection
(table.py fsck)."""

import glob
import os

from xdlake_spark import DeltaTable

from .utils import gen_pdf


class TestFsck:
    def test_healthy_table_is_clean(self, spark, tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(
            spark.createDataFrame(gen_pdf(60)), partition_by=["cats"])
        assert t.fsck() == []
        assert t.fsck(dry_run=False) == []  # no commit when clean
        assert t.version == 0

    def test_missing_data_file_detected_and_repaired(self, spark,
                                                     tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(
            spark.createDataFrame(gen_pdf(90)), partition_by=["cats"])
        victim = sorted(glob.glob(f"{tmp_table_dir}/cats=S/*.parquet"))[0]
        lost = spark.read.parquet(victim).count()
        os.remove(victim)
        broken = t.fsck()
        assert len(broken) == 1 and "cats=S" in broken[0]
        assert t.version == 0  # dry run commits nothing
        t2 = t.fsck(dry_run=False)
        assert t2.version == 1
        assert t2.to_df().count() == 90 - lost
        h = next(t2.history())
        assert h["operation"] == "FSCK"
        assert h["operationParameters"]["numMissingFiles"] == 1
        assert t2.fsck() == []  # now clean

    def test_missing_dv_file_detected(self, spark, tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(
            spark.createDataFrame(gen_pdf(60)).coalesce(2))
        t = t.delete("flag = true", mode="merge-on-read")
        dvs = glob.glob(f"{tmp_table_dir}/deletion_vector_*.bin")
        assert dvs
        os.remove(dvs[0])
        broken = t.fsck()
        assert broken  # the DV'd adds are unreadable
        t2 = t.fsck(dry_run=False)
        assert t2.to_df().count() >= 0  # scans again without failing
        assert t2.fsck() == []
