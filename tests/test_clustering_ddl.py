"""Liquid clustering (CLUSTER BY + clustered OPTIMIZE), delta-spark
parity — table.py cluster_by / clustering_columns / optimize pickup."""

import json

import pytest
from pyspark.sql import functions as F

from xdlake_spark import DeltaTable

from .utils import gen_pdf


def _write(spark, path, n=40):
    return DeltaTable(spark, path).write(
        spark.createDataFrame(gen_pdf(n)).coalesce(2))


class TestClusterBy:
    def test_sets_domain_and_feature(self, spark, tmp_table_dir):
        t = _write(spark, tmp_table_dir)
        t = t.cluster_by(["i64", "f64"])
        assert t.clustering_columns() == ["i64", "f64"]
        proto = t.log.protocol()
        assert proto.minWriterVersion == 7
        wf = set((proto.extra or {}).get("writerFeatures") or [])
        assert {"clustering", "domainMetadata"} <= wf
        dm = t.log.domain_metadata("delta.clustering")
        cfg = json.loads(dm.configuration)
        assert cfg["clusteringColumns"] == [["i64"], ["f64"]]

    def test_cluster_by_none_clears(self, spark, tmp_table_dir):
        t = _write(spark, tmp_table_dir).cluster_by(["i64"])
        t = t.cluster_by([])
        assert t.clustering_columns() == []
        # bare OPTIMIZE falls back to plain compaction (no KeyError /
        # no hilbert on an empty column list)
        t.optimize()

    def test_validation(self, spark, tmp_table_dir):
        t = _write(spark, tmp_table_dir)
        with pytest.raises(ValueError, match="not in schema"):
            t.cluster_by(["nope"])
        with pytest.raises(ValueError, match="at most 4"):
            t.cluster_by(["i64", "f64", "txt", "flag", "cats"])

    def test_partition_overlap_refused(self, spark, tmp_table_dir):
        df = spark.createDataFrame(gen_pdf(20))
        t = DeltaTable(spark, tmp_table_dir).write(df,
                                                   partition_by=["cats"])
        with pytest.raises(ValueError, match="partition"):
            t.cluster_by(["cats"])

    def test_optimize_picks_up_clustering(self, spark, tmp_table_dir):
        t = _write(spark, tmp_table_dir, n=200)
        t = t.cluster_by(["i64"])
        before = t.to_df().orderBy("i64").collect()
        t = t.optimize(target_file_size=1 << 14)
        # newest commit is the optimize; clustered maintenance runs the
        # hilbert path, which records its cluster-by metric
        newest = next(iter(t.history()))
        assert "hilbertClusterBy" in json.dumps(newest)
        assert "i64" in json.dumps(
            newest.get("operationMetrics") or {})
        assert t.to_df().orderBy("i64").collect() == before

    def test_explicit_zorder_overrides_clustering(self, spark,
                                                  tmp_table_dir):
        t = _write(spark, tmp_table_dir, n=100)
        t = t.cluster_by(["i64"])
        t = t.optimize(zorder_by=["f64"], target_file_size=1 << 14)
        newest = next(iter(t.history()))
        assert "zOrderBy" in json.dumps(newest)
        assert "hilbertClusterBy" not in json.dumps(newest)

    def test_foreign_clustering_table_now_writable(self, spark,
                                                   tmp_table_dir):
        # a table demanding the clustering writer feature commits fine
        t = _write(spark, tmp_table_dir)
        log_file = f"{tmp_table_dir}/_delta_log/{0:020d}.json"
        lines = []
        for line in open(log_file):
            obj = json.loads(line)
            if "protocol" in obj:
                obj["protocol"] = {
                    "minReaderVersion": 1, "minWriterVersion": 7,
                    "writerFeatures": ["clustering", "domainMetadata"]}
            lines.append(json.dumps(obj))
        open(log_file, "w").write("\n".join(lines) + "\n")
        t2 = DeltaTable(spark, tmp_table_dir)
        t3 = t2.write(spark.createDataFrame(gen_pdf(5)).coalesce(1),
                      mode="append")
        assert t3.to_df().count() == 45

    def test_survives_checkpoint_and_clone(self, spark, tmp_table_dir,
                                           tmp_path):
        t = _write(spark, tmp_table_dir).cluster_by(["i64"])
        t = t.write(spark.createDataFrame(gen_pdf(10)).coalesce(1),
                    mode="append")
        from xdlake_spark.log import DeltaLog
        from xdlake_spark.log.checkpoint import write_checkpoint
        loc = t.log_location
        write_checkpoint(loc, DeltaLog.load(loc, use_checkpoint=False))
        t2 = DeltaTable(spark, tmp_table_dir)
        assert t2.clustering_columns() == ["i64"]
        c = t2.clone(str(tmp_path / "clone"))
        assert c.clustering_columns() == ["i64"]

    def test_column_mapping_stores_physical_names(self, spark,
                                                  tmp_table_dir):
        t = _write(spark, tmp_table_dir)
        t = t.enable_column_mapping()
        t = t.rename_column("i64", "ident")
        t = t.cluster_by(["ident"])
        dm = t.log.domain_metadata("delta.clustering")
        stored = json.loads(dm.configuration)["clusteringColumns"]
        # physical name (the ORIGINAL parquet name) in the domain,
        # logical name back out of the accessor
        assert stored == [["i64"]]
        assert t.clustering_columns() == ["ident"]
