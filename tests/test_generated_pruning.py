"""Generated-column partition pruning (plans/skipping.py
derive_partition_nodes + table.py _pruned_adds): predicates on a raw
timestamp prune partitions GENERATED from it."""

import datetime
import json

import pytest
from pyspark.sql import functions as F

from xdlake_spark import DeltaTable
from xdlake_spark.plans.skipping import (Comparison, InList,
                                         derive_partition_nodes)


class TestDerive:
    def _one(self, sql, expr="CAST(ts AS DATE)", pcol="d"):
        return derive_partition_nodes(sql, {pcol: expr})

    def test_cast_date_ops(self):
        n, = self._one("ts >= TIMESTAMP '2024-03-05 06:30:00'")
        assert (n.column, n.op, n.value) == \
            ("d", ">=", datetime.date(2024, 3, 5))
        n, = self._one("ts > TIMESTAMP '2024-03-05 23:59:00'")
        assert n.op == ">="                      # strict weakens
        n, = self._one("ts < TIMESTAMP '2024-03-05 00:30:00'")
        assert (n.op, n.value) == ("<=", datetime.date(2024, 3, 5))
        n, = self._one("ts = TIMESTAMP '2024-03-05 12:00:00'")
        assert (n.op, n.value) == ("=", datetime.date(2024, 3, 5))
        assert self._one("ts != TIMESTAMP '2024-03-05 12:00:00'") == []

    def test_year_format_trunc(self):
        n, = self._one("ts >= TIMESTAMP '2024-03-05 06:30:00'",
                       "YEAR(ts)", "y")
        assert (n.op, n.value) == (">=", 2024)
        n, = self._one("ts <= TIMESTAMP '2024-03-05 06:30:00'",
                       "DATE_FORMAT(ts, 'yyyy-MM')", "ym")
        assert (n.op, n.value) == ("<=", "2024-03")
        n, = self._one("ts > TIMESTAMP '2024-03-05 06:30:00'",
                       "DATE_TRUNC('HOUR', ts)", "h")
        assert (n.op, n.value) == \
            (">=", datetime.datetime(2024, 3, 5, 6))
        n, = self._one("ts > TIMESTAMP '2024-03-05 06:30:00'",
                       "DATE_TRUNC('WEEK', ts)", "w")
        assert (n.op, n.value) == \
            (">=", datetime.datetime(2024, 3, 4))  # Monday

    def test_between_and_conjunction(self):
        ns = self._one("ts BETWEEN TIMESTAMP '2024-03-05 00:00:00' "
                       "AND TIMESTAMP '2024-03-07 12:00:00' "
                       "AND event_type = 'click'")
        assert [(n.op, n.value) for n in ns] == \
            [(">=", datetime.date(2024, 3, 5)),
             ("<=", datetime.date(2024, 3, 7))]

    def test_in_list(self):
        n, = self._one("ts IN (TIMESTAMP '2024-03-05 01:00:00', "
                       "TIMESTAMP '2024-04-01 02:00:00')")
        assert isinstance(n, InList)
        assert n.values == [datetime.date(2024, 3, 5),
                            datetime.date(2024, 4, 1)]

    def test_or_not_and_unknown_derive_nothing(self):
        assert self._one("ts >= TIMESTAMP '2024-03-05 00:00:00' "
                         "OR event_type = 'x'") == []
        assert self._one(
            "NOT (ts >= TIMESTAMP '2024-03-05 00:00:00')") == []
        assert self._one("some_udf(ts) = 3") == []
        assert self._one("ts >= TIMESTAMP '2024-03-05 00:00:00'",
                         "HOUR(ts)", "h") == []  # non-monotonic expr


def _graft_generation(table_dir, col, expr):
    """Stamp delta.generationExpression on a column in the v0 log."""
    log_file = f"{table_dir}/_delta_log/{0:020d}.json"
    lines = []
    for line in open(log_file):
        obj = json.loads(line)
        md = obj.get("metaData")
        if md:
            schema = json.loads(md["schemaString"])
            for f_ in schema["fields"]:
                if f_["name"] == col:
                    f_["metadata"] = {
                        "delta.generationExpression": expr}
            md["schemaString"] = json.dumps(schema)
        lines.append(json.dumps(obj))
    open(log_file, "w").write("\n".join(lines) + "\n")


class TestScanPruning:
    @pytest.fixture()
    def table(self, spark, tmp_table_dir):
        ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
              .withColumn("d", F.to_date("ts")))
        t = DeltaTable(spark, tmp_table_dir).write(ev, partition_by=["d"])
        _graft_generation(tmp_table_dir, "d", "CAST(ts AS DATE)")
        return DeltaTable(spark, tmp_table_dir)

    def test_ts_filter_prunes_generated_date_partitions(self, spark,
                                                        table):
        total_files = len(table.to_df().inputFiles())
        where = ("ts >= TIMESTAMP '2024-01-03 06:00:00' AND "
                 "ts < TIMESTAMP '2024-01-05 06:00:00'")
        df = table.to_df(where=where)
        pruned_files = len(df.inputFiles())
        assert pruned_files < total_files
        # only the 3 covered dates' partitions may survive
        assert pruned_files <= 3 * (total_files // max(
            1, len(set(f.split("d=")[1].split("/")[0]
                       for f in table.to_df().inputFiles()))) + 1)
        # exactness: pruned scan == unpruned filter
        want = table.to_df().filter(where).count()
        assert df.count() == want and want > 0

    def test_row_id_read_path_prunes_too(self, spark, tmp_table_dir):
        ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
              .withColumn("d", F.to_date("ts")))
        t = DeltaTable(spark, tmp_table_dir).write(ev, partition_by=["d"])
        _graft_generation(tmp_table_dir, "d", "CAST(ts AS DATE)")
        t = DeltaTable(spark, tmp_table_dir)
        t = t.enable_row_tracking()
        where = "ts < TIMESTAMP '2024-01-02 00:00:00'"
        df = t.to_df_with_row_ids(where=where)
        assert len(df.inputFiles()) < len(t.to_df().inputFiles())
        assert df.count() == t.to_df().filter(where).count()


class TestMutationPruning:
    def test_delete_on_raw_ts_prunes_generated_partitions(
            self, spark, tmp_table_dir):
        ev = (spark.read.parquet(
            "/root/testdata/sf0.001/events.parquet")
            .withColumn("d", F.to_date("ts")))
        t = DeltaTable(spark, tmp_table_dir).write(ev,
                                                   partition_by=["d"])
        _graft_generation(tmp_table_dir, "d", "CAST(ts AS DATE)")
        t = DeltaTable(spark, tmp_table_dir)
        n_before_files = len(t.adds)
        where = "ts < TIMESTAMP '2024-01-02 00:00:00'"
        want_kept = t.to_df().filter(
            "NOT (ts < TIMESTAMP '2024-01-02 00:00:00')").count()
        t2 = t.delete(where)
        assert t2.to_df().count() == want_kept
        # only files of the covered date partitions were touched
        removed = set(t.adds) - set(t2.adds)
        assert removed
        assert all("d=2024-01-01" in p for p in removed)
        assert len(t2.adds) >= n_before_files - len(removed)

    def test_update_on_raw_ts_prunes_generated_partitions(
            self, spark, tmp_path):
        ev = (spark.read.parquet(
            "/root/testdata/sf0.001/events.parquet")
            .withColumn("d", F.to_date("ts")))
        loc = str(tmp_path / "t")
        t = DeltaTable(spark, loc).write(ev, partition_by=["d"])
        _graft_generation(loc, "d", "CAST(ts AS DATE)")
        t = DeltaTable(spark, loc)
        t2 = t.update({"value": "value + 1000"},
                      "ts < TIMESTAMP '2024-01-02 00:00:00'")
        removed = set(t.adds) - set(t2.adds)
        assert removed and all("d=2024-01-01" in p for p in removed)
        got = t2.to_df().filter(
            "ts < TIMESTAMP '2024-01-02 00:00:00'") \
            .agg(F.min("value")).collect()[0][0]
        assert got >= 1000
