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


class TestIncrementalClustering:
    """Bare optimize() on a clustered table is INCREMENTAL (r9 VERDICT
    item 1): ZCube-tagged adds; only unclustered files + undersized
    cubes rewrite; back-to-back optimize is a no-op; full=True forces
    the whole-table re-cluster."""

    def _cluster_and_optimize(self, spark, path, n=120):
        t = _write(spark, path, n=n).cluster_by(["i64"])
        return t.optimize(target_file_size=1 << 14, min_cube_size=0)

    def test_rewritten_adds_carry_cube_tags(self, spark,
                                            tmp_table_dir):
        t = self._cluster_and_optimize(spark, tmp_table_dir)
        for a in t.adds.values():
            tags = (a.extra or {}).get("tags") or {}
            assert tags.get("ZCUBE_ID")
            assert json.loads(tags["ZCUBE_ZORDER_BY"]) == ["i64"]
            assert tags.get("ZCUBE_ZORDER_CURVE") == "hilbert"
            assert (a.extra or {}).get("clusteringProvider") \
                == "liquidClustering"
        # all files of one maintenance run share a single cube id
        ids = {(a.extra["tags"])["ZCUBE_ID"] for a in t.adds.values()}
        assert len(ids) == 1

    def test_second_optimize_is_noop_without_new_data(
            self, spark, tmp_table_dir):
        t = self._cluster_and_optimize(spark, tmp_table_dir)
        v = t.version
        t2 = t.optimize(target_file_size=1 << 14, min_cube_size=0)
        assert t2.version == v          # no commit at all

    def test_append_then_optimize_rewrites_only_new_files(
            self, spark, tmp_table_dir):
        t = self._cluster_and_optimize(spark, tmp_table_dir)
        stable = set(t.adds)
        t = t.write(spark.createDataFrame(gen_pdf(10)).coalesce(1),
                    mode="append")
        fresh = set(t.adds) - stable
        assert fresh                     # the untagged new file(s)
        before = t.to_df().orderBy("i64", "txt").collect()
        t2 = t.optimize(target_file_size=1 << 14, min_cube_size=0)
        # every stable-cube file SURVIVES; every fresh file rewrote
        assert stable <= set(t2.adds)
        assert not (fresh & set(t2.adds))
        newest = t2.log.entries[t2.version]
        assert {r.path for r in newest.removes} == fresh
        assert t2.to_df().orderBy("i64", "txt").collect() == before

    def test_undersized_cube_merges_with_new_data(self, spark,
                                                  tmp_table_dir):
        # default MIN_CUBE_SIZE (100 GB) marks every small cube
        # partial: appending makes the next optimize merge old cube +
        # new files into a fresh cube (delta's small-cube compaction)
        t = _write(spark, tmp_table_dir, n=60).cluster_by(["i64"])
        t = t.optimize(target_file_size=1 << 14)
        cube1 = set(t.adds)
        t = t.write(spark.createDataFrame(gen_pdf(10)).coalesce(1),
                    mode="append")
        t2 = t.optimize(target_file_size=1 << 14)
        assert not (cube1 & set(t2.adds))   # old partial cube merged
        ids = {((a.extra or {}).get("tags") or {}).get("ZCUBE_ID")
               for a in t2.adds.values()}
        assert len(ids) == 1

    def test_single_partial_cube_alone_does_not_rechurn(
            self, spark, tmp_table_dir):
        # one undersized cube and NO new files: rewriting would just
        # reproduce the same cube — optimize must no-op even under the
        # default 100 GB min cube size
        t = _write(spark, tmp_table_dir, n=60).cluster_by(["i64"])
        t = t.optimize(target_file_size=1 << 14)
        v = t.version
        t2 = t.optimize(target_file_size=1 << 14)
        assert t2.version == v

    def test_full_forces_whole_table_recluster(self, spark,
                                               tmp_table_dir):
        t = self._cluster_and_optimize(spark, tmp_table_dir)
        old = set(t.adds)
        t2 = t.optimize(target_file_size=1 << 14, min_cube_size=0,
                        full=True)
        assert not (old & set(t2.adds))

    def test_alter_cluster_by_invalidates_old_cubes(self, spark,
                                                    tmp_table_dir):
        t = self._cluster_and_optimize(spark, tmp_table_dir)
        old = set(t.adds)
        t = t.cluster_by(["f64"])
        t2 = t.optimize(target_file_size=1 << 14, min_cube_size=0)
        assert not (old & set(t2.adds))  # different columns: rewrite
        for a in t2.adds.values():
            tags = (a.extra or {}).get("tags") or {}
            assert json.loads(tags["ZCUBE_ZORDER_BY"]) == ["f64"]

    def test_tags_survive_checkpoint_reload(self, spark,
                                            tmp_table_dir):
        t = self._cluster_and_optimize(spark, tmp_table_dir)
        v = t.version
        from xdlake_spark.log import DeltaLog
        from xdlake_spark.log.checkpoint import write_checkpoint
        loc = t.log_location
        write_checkpoint(loc, DeltaLog.load(loc, use_checkpoint=False))
        t2 = DeltaTable(spark, tmp_table_dir)
        tags = {p: ((a.extra or {}).get("tags") or {}).get("ZCUBE_ID")
                for p, a in t2.adds.items()}
        assert all(tags.values()), tags
        # and the reloaded handle still treats the cube as clustered:
        # optimize stays a no-op
        t3 = t2.optimize(target_file_size=1 << 14, min_cube_size=0)
        assert t3.version == v

    def test_tags_survive_json_commit_roundtrip(self, spark,
                                                tmp_table_dir):
        t = self._cluster_and_optimize(spark, tmp_table_dir)
        v = t.version
        t2 = DeltaTable(spark, tmp_table_dir)   # fresh JSON replay
        t3 = t2.optimize(target_file_size=1 << 14, min_cube_size=0)
        assert t3.version == v
