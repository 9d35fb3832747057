"""Unit tests for the manifest-pruning predicate parser + evaluator —
no Spark needed."""

import json

from xdlake_spark.log.actions import Add
from xdlake_spark.plans.skipping import (
    BoolOp,
    Comparison,
    InList,
    IsNull,
    NotOp,
    Unknown,
    parse_predicate,
    prune_manifest,
)


def mk_add(path="f.parquet", pvals=None, num=100, mins=None, maxs=None,
           nulls=None):
    stats = {"numRecords": num, "minValues": mins or {},
             "maxValues": maxs or {}, "nullCount": nulls or {}}
    return Add(path=path, size=1, partitionValues=pvals or {},
               stats=json.dumps(stats))


class TestParser:
    def test_comparison(self):
        t = parse_predicate("x > 5")
        assert isinstance(t, Comparison)
        assert (t.column, t.op, t.value) == ("x", ">", 5)

    def test_ops_normalized(self):
        assert parse_predicate("x == 5").op == "="
        assert parse_predicate("x <> 5").op == "!="

    def test_string_literal_with_quote(self):
        t = parse_predicate("name = 'O''Brien'")
        assert t.value == "O'Brien"

    def test_and_or_not_precedence(self):
        t = parse_predicate("a > 1 AND b < 2 OR NOT c = 3")
        assert isinstance(t, BoolOp) and t.op == "or"
        assert isinstance(t.operands[0], BoolOp)
        assert t.operands[0].op == "and"
        assert isinstance(t.operands[1], NotOp)

    def test_parens(self):
        t = parse_predicate("a = 1 AND (b = 2 OR c = 3)")
        assert t.op == "and"
        assert isinstance(t.operands[1], BoolOp)

    def test_in_between_isnull(self):
        t = parse_predicate("x IN (1, 2, 3)")
        assert isinstance(t, InList) and t.values == [1, 2, 3]
        t = parse_predicate("x BETWEEN 1 AND 5")
        assert t.op == "and"
        t = parse_predicate("x IS NOT NULL")
        assert isinstance(t, IsNull) and t.negated

    def test_typed_literals(self):
        t = parse_predicate("d >= DATE '2024-01-02'")
        import datetime
        assert t.value == datetime.date(2024, 1, 2)
        t = parse_predicate("ts < TIMESTAMP '2024-01-02 03:04:05'")
        assert t.value == datetime.datetime(2024, 1, 2, 3, 4, 5)

    def test_unparseable_degrades_to_unknown(self):
        assert isinstance(parse_predicate("substr(x, 1, 2) = 'ab'"), Unknown)
        assert isinstance(parse_predicate("x + 1 > 2"), Unknown)


class TestPrune:
    def test_partition_equality(self):
        adds = {"a": mk_add(pvals={"c": "R"}), "b": mk_add(pvals={"c": "N"})}
        out = prune_manifest(adds, "c = 'R'", ["c"])
        assert set(out) == {"a"}

    def test_partition_numeric_cast(self):
        adds = {"a": mk_add(pvals={"y": "2023"}),
                "b": mk_add(pvals={"y": "2024"})}
        assert set(prune_manifest(adds, "y >= 2024", ["y"])) == {"b"}

    def test_minmax_interval(self):
        adds = {"lo": mk_add(mins={"q": 0.0}, maxs={"q": 10.0}),
                "hi": mk_add(mins={"q": 40.0}, maxs={"q": 50.0})}
        assert set(prune_manifest(adds, "q > 30", [])) == {"hi"}
        assert set(prune_manifest(adds, "q <= 5", [])) == {"lo"}
        assert set(prune_manifest(adds, "q = 45", [])) == {"hi"}
        assert set(prune_manifest(adds, "q > 100", [])) == set()

    def test_and_or_combination(self):
        adds = {"a": mk_add(pvals={"c": "R"}, mins={"q": 0}, maxs={"q": 10}),
                "b": mk_add(pvals={"c": "R"}, mins={"q": 40}, maxs={"q": 50}),
                "x": mk_add(pvals={"c": "N"}, mins={"q": 40}, maxs={"q": 50})}
        out = prune_manifest(adds, "c = 'R' AND q > 30", ["c"])
        assert set(out) == {"b"}
        out = prune_manifest(adds, "c = 'N' OR q < 5", ["c"])
        assert set(out) == {"a", "x"}

    def test_in_list(self):
        adds = {"a": mk_add(pvals={"c": "R"}), "b": mk_add(pvals={"c": "N"}),
                "x": mk_add(pvals={"c": "A"})}
        out = prune_manifest(adds, "c IN ('R', 'N')", ["c"])
        assert set(out) == {"a", "b"}

    def test_null_checks(self):
        adds = {"allnull": mk_add(num=10, nulls={"v": 10}),
                "nonull": mk_add(num=10, nulls={"v": 0},
                                 mins={"v": 1}, maxs={"v": 2})}
        out = prune_manifest(adds, "v IS NOT NULL", [])
        assert set(out) == {"nonull"}
        out = prune_manifest(adds, "v IS NULL", [])
        assert set(out) == {"allnull"}

    def test_not_is_sound_never_skips(self):
        adds = {"a": mk_add(mins={"q": 0}, maxs={"q": 10})}
        assert set(prune_manifest(adds, "NOT (q > 50)", [])) == {"a"}

    def test_unknown_predicate_keeps_all(self):
        adds = {"a": mk_add(), "b": mk_add(path="g")}
        assert len(prune_manifest(adds, "weird_func(x) = 1", [])) == 2

    def test_timestamp_stats_strings(self):
        adds = {
            "old": mk_add(mins={"d": "1995-01-01T00:00:00"},
                          maxs={"d": "1996-01-01T00:00:00"}),
            "new": mk_add(mins={"d": "2000-01-01T00:00:00"},
                          maxs={"d": "2001-01-01T00:00:00"}),
        }
        out = prune_manifest(
            adds, "d > TIMESTAMP '1999-06-01 00:00:00'", [])
        assert set(out) == {"new"}

    def test_missing_stats_kept(self):
        adds = {"nostats": Add(path="n", size=1),
                "pruned": mk_add(mins={"q": 0}, maxs={"q": 1})}
        out = prune_manifest(adds, "q > 5", [])
        assert set(out) == {"nostats"}


class TestSoundness:
    """Regressions for unsound-pruning bugs: a kept file costs I/O, a
    wrongly-skipped file costs correctness."""

    def test_date_literal_vs_timestamp_stats(self):
        # Spark promotes DATE 'd' to midnight when compared to a ts
        # column; a file whose max ts is INSIDE day d satisfies
        # ts > DATE 'd' and must be kept (truncating the stat to a date
        # used to floor the max and wrongly prune it)
        adds = {"inside": mk_add(mins={"ts": "2024-01-01T00:00:00"},
                                 maxs={"ts": "2024-01-02T10:00:00"})}
        out = prune_manifest(adds, "ts > DATE '2024-01-02'", [])
        assert set(out) == {"inside"}
        # a file strictly before midnight of day d is still prunable
        adds = {"before": mk_add(mins={"ts": "2024-01-01T00:00:00"},
                                 maxs={"ts": "2024-01-01T23:59:59"})}
        assert set(prune_manifest(adds, "ts > DATE '2024-01-02'", [])) == set()
        # and date-column stats against a date literal keep working
        adds = {"d": mk_add(mins={"dt": "2024-01-01"},
                            maxs={"dt": "2024-01-03"})}
        assert set(prune_manifest(adds, "dt >= DATE '2024-01-02'", [])) == {"d"}
        assert set(prune_manifest(adds, "dt > DATE '2024-01-03'", [])) == set()

    def test_int_compare_exact_above_2_53(self):
        # float folding would make 2^53 == 2^53+1 and wrongly prune
        v = 9007199254740992  # 2^53
        adds = {"a": mk_add(mins={"x": v}, maxs={"x": v})}
        assert set(prune_manifest(adds, f"x < {v + 1}", [])) == {"a"}
        assert set(prune_manifest(adds, f"x > {v}", [])) == set()
        assert set(prune_manifest(adds, f"x = {v}", [])) == {"a"}

    def test_nonfinite_stats_leave_interval_unbounded(self, tmp_path):
        import math
        import pyarrow as pa
        import pyarrow.parquet as pq
        from xdlake_spark.log.statistics import Statistics

        p = str(tmp_path / "inf.parquet")
        pq.write_table(pa.table({
            "x": pa.array([1.0, float("inf"), -2.0]),
            "y": pa.array([float("nan"), 3.0, 4.0]),
            "z": pa.array([1.0, 2.0, 3.0]),
        }), p)
        s = Statistics.from_parquet_file(p)
        # non-finite min/max -> whole interval omitted (unbounded), so
        # e.g. 'x > 1e308' can never wrongly prune this file
        assert "x" not in s.minValues and "x" not in s.maxValues
        # NaN never appears in footer stats (parquet writers skip NaN
        # when folding min/max — y reads back as [3.0, 4.0]); nothing to
        # poison at the footer level, same as delta-rs
        assert s.maxValues["y"] == 4.0
        # finite columns keep their stats
        assert s.minValues["z"] == 1.0 and s.maxValues["z"] == 3.0
        adds = {"f": Add(path="f", size=1, stats=s.to_json())}
        assert set(prune_manifest(adds, "x > 1e308", [])) == {"f"}

    def test_nan_partition_value_never_pruned(self):
        """Spark's total order has NaN == NaN and NaN > every double;
        Python's float comparisons return False for everything. A
        'NaN' float partition value must therefore never be pruned
        (r8 ADVICE): x = 'NaN' and x > 1.0 both MATCH in Spark."""
        adds = {"n": mk_add(pvals={"x": "NaN"}),
                "one": mk_add(pvals={"x": "1.0"})}
        types = {"x": "double"}
        # every comparison keeps the NaN file (None = can't decide)
        for pred in ("x = 'NaN'", "x > 1.0", "x >= 1.0", "x < 1.0",
                     "x != 1.0", "x = 1.0"):
            assert "n" in prune_manifest(adds, pred, ["x"], types), pred
        # and pruning of normal values still works alongside
        assert set(prune_manifest(adds, "x > 1.5", ["x"], types)) == {"n"}
        # NaN literal side: refuse too (keep everything)
        assert set(prune_manifest(adds, "x = 'NaN'", ["x"], types)) \
            == {"n", "one"}

    def test_nan_minmax_stats_never_prune(self):
        """Synthetic NaN min/max stats (a foreign writer could emit
        them) must leave the file kept, not silently skipped."""
        adds = {"f": mk_add(mins={"q": float("nan")},
                            maxs={"q": float("nan")})}
        for pred in ("q > 30", "q <= 5", "q = 45"):
            assert set(prune_manifest(adds, pred, [])) == {"f"}, pred
