"""MERGE dynamic file pruning (table.py _equi_join_pairs + source-
bounds prune): a small keyed source scans only overlapping target
files."""

import pytest

from xdlake_spark import DeltaTable
from xdlake_spark.table import _equi_join_pairs


class TestEquiPairs:
    def test_forms(self):
        assert _equi_join_pairs("t.k = s.k") == [("k", "k")]
        assert _equi_join_pairs("s.a = t.b") == [("b", "a")]
        assert _equi_join_pairs(
            "t.k = s.k AND t.d = s.dd AND t.v > s.v") == \
            [("k", "k"), ("d", "dd")]
        assert _equi_join_pairs("t.`q k` = s.k") == []  # quoted space

    def test_unsound_shapes_refused(self):
        assert _equi_join_pairs("t.k = s.k OR t.j = s.j") == []
        assert _equi_join_pairs("(t.k = s.k) AND t.j = s.j") == []
        assert _equi_join_pairs("t.k != s.k") == []
        assert _equi_join_pairs("t.k = t.j") == []


@pytest.fixture()
def spy_scan(monkeypatch):
    seen = []
    orig = DeltaTable._scan

    def wrapper(self, adds):
        seen.append(len(adds))
        return orig(self, adds)

    monkeypatch.setattr(DeltaTable, "_scan", wrapper)
    return seen


def _ranged_table(spark, path):
    """4 files with disjoint k ranges: [0,25), [25,50), ..."""
    t = DeltaTable(spark, path)
    for lo in range(0, 100, 25):
        df = spark.createDataFrame(
            [(k, f"v{k}") for k in range(lo, lo + 25)],
            "k long, v string")
        t = t.write(df.coalesce(1), mode="append")
    assert len(t.file_uris()) == 4
    return t


class TestMergeDfp:
    def test_small_source_scans_one_file(self, spark, tmp_table_dir,
                                         spy_scan):
        t = _ranged_table(spark, tmp_table_dir)
        src = spark.createDataFrame(
            [(30, "UPD"), (31, "UPD")], "k long, v string")
        spy_scan.clear()
        t2 = t.merge(src, "t.k = s.k",
                     when_matched_update={"v": "s.v"},
                     when_not_matched_insert={"k": "s.k", "v": "s.v"})
        assert spy_scan[0] == 1          # probe saw only file [25,50)
        got = {r.k: r.v for r in t2.to_df().collect()}
        assert got[30] == "UPD" and got[31] == "UPD"
        assert len(got) == 100 and got[0] == "v0"

    def test_insert_of_out_of_range_key_still_lands(self, spark,
                                                    tmp_path,
                                                    spy_scan):
        t = _ranged_table(spark, str(tmp_path / "t"))
        src = spark.createDataFrame(
            [(500, "NEW"), (30, "UPD")], "k long, v string")
        spy_scan.clear()
        t2 = t.merge(src, "t.k = s.k",
                     when_matched_update={"v": "s.v"},
                     when_not_matched_insert={"k": "s.k", "v": "s.v"})
        # global bounds [30, 500] intersect files 2..4 but not [0,25)
        assert spy_scan[0] == 3
        got = {r.k: r.v for r in t2.to_df().collect()}
        assert got[500] == "NEW" and got[30] == "UPD"
        assert len(got) == 101

    def test_nmbs_clause_keeps_full_scan(self, spark, tmp_path,
                                         spy_scan):
        t = _ranged_table(spark, str(tmp_path / "t"))
        src = spark.createDataFrame([(30, "UPD")], "k long, v string")
        spy_scan.clear()
        t2 = t.merge(src, "t.k = s.k",
                     when_matched_update={"v": "s.v"},
                     when_not_matched_by_source_delete="t.k >= 75")
        assert spy_scan[0] == 4          # NMBS inspects every row
        got = {r.k: r.v for r in t2.to_df().collect()}
        assert len(got) == 75 and got[30] == "UPD"

    def test_or_condition_keeps_full_scan(self, spark, tmp_path,
                                          spy_scan):
        t = _ranged_table(spark, str(tmp_path / "t"))
        src = spark.createDataFrame([(30, "UPD")], "k long, v string")
        spy_scan.clear()
        t2 = t.merge(src, "t.k = s.k OR t.v = s.v",
                     when_not_matched_insert={"k": "s.k", "v": "s.v"})
        assert spy_scan[0] == 4
        assert t2.to_df().count() == 100  # k=30 matched, no insert

    def test_all_null_source_keys_no_prune_crash(self, spark,
                                                 tmp_path):
        t = _ranged_table(spark, str(tmp_path / "t"))
        src = spark.createDataFrame([(None, "x")], "k long, v string")
        t2 = t.merge(src, "t.k = s.k",
                     when_matched_update={"v": "s.v"},
                     when_not_matched_insert={"k": "s.k", "v": "s.v"})
        # null key matches nothing -> inserted as a new row
        assert t2.to_df().count() == 101


class TestNaNKeys:
    def test_nan_source_key_disables_pruning_not_correctness(
            self, spark, tmp_table_dir, spy_scan):
        """ADVICE r7: F.max over a float key containing NaN returns
        NaN, and every stats comparison against NaN is False — naive
        DFP would prune ALL target files, skip the matched update and
        re-insert duplicates. NaN bounds must disable pruning."""
        import math
        t = DeltaTable(spark, tmp_table_dir)
        for lo in range(0, 100, 25):
            df = spark.createDataFrame(
                [(float(k), f"v{k}") for k in range(lo, lo + 25)],
                "k double, v string")
            t = t.write(df.coalesce(1), mode="append")
        src = spark.createDataFrame(
            [(float("nan"), "NANROW"), (30.0, "UPD")],
            "k double, v string")
        spy_scan.clear()
        t2 = t.merge(src, "t.k = s.k",
                     when_matched_update={"v": "s.v"},
                     when_not_matched_insert={"k": "s.k", "v": "s.v"})
        got = {r.k: r.v for r in t2.to_df().collect()}
        assert got[30.0] == "UPD"
        assert any(math.isnan(k) for k in got)  # NaN row inserted once
        assert t2.to_df().count() == 101
        assert t2.to_df().filter("v = 'UPD'").count() == 1

    def test_clean_float_keys_still_prune(self, spark, tmp_table_dir,
                                          spy_scan):
        t = DeltaTable(spark, tmp_table_dir)
        for lo in range(0, 100, 25):
            df = spark.createDataFrame(
                [(float(k), f"v{k}") for k in range(lo, lo + 25)],
                "k double, v string")
            t = t.write(df.coalesce(1), mode="append")
        src = spark.createDataFrame([(30.0, "UPD")],
                                    "k double, v string")
        spy_scan.clear()
        t2 = t.merge(src, "t.k = s.k",
                     when_matched_update={"v": "s.v"})
        assert any(n == 1 for n in spy_scan)  # pruned to one file
        assert t2.to_df().filter("v = 'UPD'").count() == 1
