"""MERGE schema evolution (table.py merge(schema_evolution=True)):
source-only columns join the table schema atomically with the merge."""

import pytest

from xdlake_spark import DeltaTable


def _t(spark, path, rows, ddl):
    return DeltaTable(spark, path).write(spark.createDataFrame(rows, ddl))


class TestMergeEvolution:
    def test_new_column_via_update_and_insert(self, spark,
                                              tmp_table_dir):
        t = _t(spark, tmp_table_dir,
               [(1, "a"), (2, "b")], "k long, v string")
        src = spark.createDataFrame(
            [(2, "B", 9.5), (3, "c", 7.0)],
            "k long, v string, score double")
        t2 = t.merge(src, "t.k = s.k",
                     when_matched_update={"v": "s.v",
                                          "score": "s.score"},
                     when_not_matched_insert={"k": "s.k", "v": "s.v",
                                              "score": "s.score"},
                     schema_evolution=True)
        assert [f.name for f in t2.schema.fields] == \
            ["k", "v", "score"]
        got = {r.k: (r.v, r.score) for r in t2.to_df().collect()}
        # untouched row reads the new column as NULL
        assert got == {1: ("a", None), 2: ("B", 9.5), 3: ("c", 7.0)}

    def test_insert_only_evolution(self, spark, tmp_table_dir):
        t = _t(spark, tmp_table_dir, [(1, "a")], "k long, v string")
        src = spark.createDataFrame([(9, "z", 42)],
                                    "k long, v string, n long")
        t2 = t.merge(src, "t.k = s.k",
                     when_not_matched_insert={"k": "s.k", "v": "s.v",
                                              "n": "s.n"},
                     schema_evolution=True)
        got = {r.k: (r.v, r.n) for r in t2.to_df().collect()}
        assert got == {1: ("a", None), 9: ("z", 42)}
        # insert-only merge: every original file stays live, unrewritten
        v0 = set(DeltaTable(spark, tmp_table_dir)
                 .load_as_version(0).adds)
        assert v0 <= set(t2.adds)

    def test_off_by_default_unknown_column_fails(self, spark,
                                                 tmp_table_dir):
        t = _t(spark, tmp_table_dir, [(1, "a")], "k long, v string")
        src = spark.createDataFrame([(1, "A", 1.0)],
                                    "k long, v string, score double")
        with pytest.raises(Exception):
            t.merge(src, "t.k = s.k",
                    when_matched_update={"score": "s.score"})
        # table untouched
        t2 = DeltaTable(spark, tmp_table_dir)
        assert [f.name for f in t2.schema.fields] == ["k", "v"]

    def test_evolution_with_nmbs_clause(self, spark, tmp_table_dir):
        t = _t(spark, tmp_table_dir,
               [(1, "a"), (2, "b"), (3, "c")], "k long, v string")
        src = spark.createDataFrame([(1, "A", True)],
                                    "k long, v string, fresh boolean")
        t2 = t.merge(src, "t.k = s.k",
                     when_matched_update={"v": "s.v",
                                          "fresh": "s.fresh"},
                     when_not_matched_by_source_update={
                         "fresh": "false"},
                     schema_evolution=True)
        got = {r.k: (r.v, r.fresh) for r in t2.to_df().collect()}
        assert got == {1: ("A", True), 2: ("b", False),
                       3: ("c", False)}

    def test_time_travel_sees_pre_evolution_schema(self, spark,
                                                   tmp_table_dir):
        t = _t(spark, tmp_table_dir, [(1, "a")], "k long, v string")
        src = spark.createDataFrame([(2, "b", 1.5)],
                                    "k long, v string, w double")
        t2 = t.merge(src, "t.k = s.k",
                     when_not_matched_insert={"k": "s.k", "v": "s.v",
                                              "w": "s.w"},
                     schema_evolution=True)
        old = t2.load_as_version(0)
        assert [f.name for f in old.schema.fields] == ["k", "v"]
        assert old.to_df().count() == 1
