"""Filter pushdown in the xdlake batch data source
(sources/datasource.py _XdlakeBatchReader.pushFilters)."""

import pytest
from pyspark.sql import functions as F

from xdlake_spark import DeltaTable
from xdlake_spark.sources.datasource import _XdlakeBatchReader, register


@pytest.fixture()
def registered(spark):
    try:
        register(spark)
    except Exception:
        pass
    return spark


@pytest.fixture()
def table(registered, tmp_table_dir):
    li = registered.read.parquet(
        "/root/testdata/sf0.001/lineitem.parquet")
    DeltaTable(registered, tmp_table_dir).write(
        li, partition_by=["l_returnflag"])
    return tmp_table_dir


class TestReaderPruning:
    """Drive the reader class directly (the engine calls pushFilters
    then partitions) — deterministic, no worker plumbing."""

    def test_partition_filter_prunes_files(self, registered, table):
        from pyspark.sql.datasource import EqualTo
        r = _XdlakeBatchReader(table)
        total = len(r.partitions())
        r2 = _XdlakeBatchReader(table)
        kept = r2.pushFilters([EqualTo(("l_returnflag",), "R")])
        assert len(list(kept)) == 1      # every filter handed back
        parts = r2.partitions()
        assert 0 < len(parts) < total
        assert all("l_returnflag=R" in p.url for p in parts)
        # partition-column filter never becomes a row filter
        assert all(not p.row_filters for p in parts)

    def test_stats_filter_prunes_and_rides_to_read(self, registered,
                                                   table):
        from pyspark.sql.datasource import GreaterThan
        r = _XdlakeBatchReader(table)
        r.pushFilters([GreaterThan(("l_quantity",), 49.0)])
        parts = r.partitions()
        assert all(p.row_filters == [("l_quantity", ">", 49.0)]
                   for p in parts)

    def test_unsupported_filters_ignored(self, registered, table):
        from pyspark.sql.datasource import StringContains
        r = _XdlakeBatchReader(table)
        r.pushFilters([StringContains(("l_returnflag",), "R")])
        assert r._nodes == []            # sound: no pruning claimed


class TestPushdownE2E:
    def test_results_match_native_scan(self, registered, table):
        df = (registered.read.format("xdlake").load(table)
              .filter("l_returnflag = 'R' AND l_quantity > 40"))
        want = (DeltaTable(registered, table)
                .to_df(where="l_returnflag = 'R' AND l_quantity > 40")
                .count())
        assert df.count() == want and want > 0

    def test_in_and_null_semantics(self, registered, table):
        got = (registered.read.format("xdlake").load(table)
               .filter(F.col("l_linenumber").isin(1, 2))
               .count())
        want = (DeltaTable(registered, table)
                .to_df(where="l_linenumber IN (1, 2)").count())
        assert got == want

    def test_dv_table_filtered_read_exact(self, registered, tmp_path):
        """Row-level pushdown must NOT misalign deletion-vector masks:
        DV'd files skip it, results stay exact."""
        li = registered.read.parquet(
            "/root/testdata/sf0.001/lineitem.parquet")
        loc = str(tmp_path / "t")
        t = DeltaTable(registered, loc).write(li)
        t = t.delete("l_quantity < 10", mode="merge-on-read")
        got = (registered.read.format("xdlake").load(loc)
               .filter("l_quantity > 40").count())
        want = t.to_df(where="l_quantity > 40").count()
        assert got == want and got > 0

    def test_all_files_pruned_returns_empty(self, registered, table):
        got = (registered.read.format("xdlake").load(table)
               .filter("l_quantity > 1e9").count())
        assert got == 0


class TestNullPushdown:
    def test_isnotnull_prunes_all_null_files(self, registered,
                                             tmp_path):
        t = DeltaTable(registered, str(tmp_path / "t"))
        t = t.write(registered.createDataFrame(
            [(1, None), (2, None)], "k long, v string").coalesce(1))
        t = t.write(registered.createDataFrame(
            [(3, "x")], "k long, v string").coalesce(1), mode="append")
        from pyspark.sql.datasource import IsNotNull, IsNull
        from xdlake_spark.sources.datasource import _XdlakeBatchReader
        r = _XdlakeBatchReader(str(tmp_path / "t"))
        r.pushFilters([IsNotNull(("v",))])
        assert len(r.partitions()) == 1   # the all-null file pruned
        r2 = _XdlakeBatchReader(str(tmp_path / "t"))
        r2.pushFilters([IsNull(("v",))])
        assert len(r2.partitions()) == 1  # the no-null file pruned
        # e2e exactness
        df = registered.read.format("xdlake").load(str(tmp_path / "t"))
        assert df.filter("v IS NOT NULL").count() == 1
        assert df.filter("v IS NULL").count() == 2
