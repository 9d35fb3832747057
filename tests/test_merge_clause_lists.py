"""Ordered clause lists for ALL THREE MERGE clause families (r12).

r11 added ``when_matched=[...]`` with first-match-wins; this round
completes the surface with ``when_not_matched=[...]`` (ordered insert
clauses) and ``when_not_matched_by_source=[...]`` — delta-spark's full
builder-chain semantics (each ``whenNotMatched(cond).insert(...)`` /
``whenNotMatchedBySource(cond).update|delete(...)`` call appends one
ordered clause; a row takes the FIRST applicable clause). The reference
only reads MERGE logs (/root/reference/tests/test_compatibility.py:
132-154); delta-spark clause semantics are the spec here.
"""

import pandas as pd
import pytest

from tests.utils import gen_pdf
from xdlake_spark.table import DeltaTable


class TestNotMatchedClauseList:
    def test_ordered_insert_clauses_first_match_wins(self, spark,
                                                     tmp_table_dir):
        """Three insert clauses: a source row satisfying several gates
        takes the EARLIEST; one satisfying none is dropped."""
        pdf = gen_pdf()
        t = DeltaTable(spark, f"{tmp_table_dir}/t")
        t = t.write(spark.createDataFrame(pdf))
        hi = int(pdf["order"].max())
        # 4 brand-new keys: hi+1 .. hi+4
        src = gen_pdf(4)
        src["order"] = [hi + 1.0, hi + 2.0, hi + 3.0, hi + 4.0]
        t2 = t.merge(
            spark.createDataFrame(src), "t.order = s.order",
            when_not_matched=[
                # clause 1 takes hi+1 AND hi+2 …
                {"insert": {"order": "s.order", "i64": "111"},
                 "condition": f"s.order <= {hi + 2}"},
                # … so clause 2's wider gate only catches hi+3
                {"insert": {"order": "s.order", "i64": "222"},
                 "condition": f"s.order <= {hi + 3}"},
                # hi+4 satisfies NO gate -> dropped, not inserted
            ])
        got = t2.to_pandas().set_index("order")
        assert len(got) == len(pdf) + 3
        assert got.loc[hi + 1, "i64"] == 111
        assert got.loc[hi + 2, "i64"] == 111
        assert got.loc[hi + 3, "i64"] == 222   # clause order decided
        assert hi + 4 not in got.index
        # unassigned columns of inserted rows are NULL
        assert pd.isna(got.loc[hi + 1, "txt"])

    def test_insert_clause_order_changes_result(self, spark,
                                                tmp_table_dir):
        """Swapping two overlapping insert clauses changes values —
        the list is ORDERED, not a set."""
        pdf = gen_pdf()
        hi = int(pdf["order"].max())
        src = gen_pdf(1)
        src["order"] = [hi + 1.0]
        a = {"insert": {"order": "s.order", "i64": "1"}}
        b = {"insert": {"order": "s.order", "i64": "2"}}
        vals = []
        for clauses in ([a, b], [b, a]):
            t = DeltaTable(spark, f"{tmp_table_dir}/o{len(vals)}")
            t = t.write(spark.createDataFrame(pdf))
            t2 = t.merge(spark.createDataFrame(src),
                         "t.order = s.order", when_not_matched=clauses)
            vals.append(int(t2.to_pandas().set_index("order")
                            .loc[hi + 1, "i64"]))
        assert vals == [1, 2]

    def test_insert_list_equals_kwargs_sugar(self, spark,
                                             tmp_table_dir):
        pdf = gen_pdf()
        hi = int(pdf["order"].max())
        src = gen_pdf(3)
        src["order"] = [hi + 1.0, hi + 2.0, hi + 3.0]
        results = []
        for style in ("kwargs", "list"):
            t = DeltaTable(spark, f"{tmp_table_dir}/{style}")
            t = t.write(spark.createDataFrame(pdf))
            kw = (dict(when_not_matched_insert={"order": "s.order",
                                                "i64": "s.i64"},
                       when_not_matched_insert_condition=
                       f"s.order <= {hi + 2}")
                  if style == "kwargs" else
                  dict(when_not_matched=[
                      {"insert": {"order": "s.order", "i64": "s.i64"},
                       "condition": f"s.order <= {hi + 2}"}]))
            t2 = t.merge(spark.createDataFrame(src),
                         "t.order = s.order", **kw)
            results.append(t2.to_pandas().sort_values("order")
                           .reset_index(drop=True))
        pd.testing.assert_frame_equal(results[0], results[1])

    def test_insert_clause_defaults_per_clause(self, spark,
                                               tmp_table_dir):
        """A column one clause assigns and another leaves to its
        DEFAULT resolves per row by the claiming clause."""
        pdf = gen_pdf()
        hi = int(pdf["order"].max())
        t = DeltaTable(spark, f"{tmp_table_dir}/t")
        t = t.write(spark.createDataFrame(pdf))
        t = t.set_column_default("i64", "77")
        src = gen_pdf(2)
        src["order"] = [hi + 1.0, hi + 2.0]
        t2 = t.merge(
            spark.createDataFrame(src), "t.order = s.order",
            when_not_matched=[
                {"insert": {"order": "s.order", "i64": "5"},
                 "condition": f"s.order = {hi + 1}"},
                {"insert": {"order": "s.order"}},    # i64 -> DEFAULT
            ])
        got = t2.to_pandas().set_index("order")
        assert got.loc[hi + 1, "i64"] == 5
        assert got.loc[hi + 2, "i64"] == 77

    def test_insert_list_validation(self, spark, tmp_table_dir):
        pdf = gen_pdf()
        t = DeltaTable(spark, f"{tmp_table_dir}/t").write(
            spark.createDataFrame(pdf))
        src = spark.createDataFrame(gen_pdf(1))
        with pytest.raises(ValueError, match="not both"):
            t.merge(src, "t.order = s.order",
                    when_not_matched=[{"insert": {"order": "s.order"}}],
                    when_not_matched_insert={"order": "s.order"})
        with pytest.raises(ValueError, match="not both"):
            t.merge(src, "t.order = s.order",
                    when_not_matched=[{"insert": {"order": "s.order"}}],
                    when_not_matched_insert_condition="1=1")
        with pytest.raises(ValueError, match="needs 'insert'"):
            t.merge(src, "t.order = s.order",
                    when_not_matched=[{"condition": "1=1"}])
        with pytest.raises(ValueError, match="needs 'insert'"):
            t.merge(src, "t.order = s.order",
                    when_not_matched=[{"insert": {"order": "s.order"},
                                       "update": {"i64": "1"}}])
        with pytest.raises(ValueError, match="must map"):
            t.merge(src, "t.order = s.order",
                    when_not_matched=[{"insert": {}}])
        with pytest.raises(ValueError, match="unknown column"):
            t.merge(src, "t.order = s.order",
                    when_not_matched=[{"insert": {"nope": "1"}}])

    def test_generated_column_mixed_assignment_refused(self, spark,
                                                       tmp_table_dir):
        """A generated column assigned by SOME insert clauses only is
        verify-vs-compute ambiguous per row — refused loudly; assigned
        by ALL (verified) or by NONE (computed) both work."""
        import json

        pdf = gen_pdf()
        hi = int(pdf["order"].max())
        t = DeltaTable(spark, f"{tmp_table_dir}/t")
        t = t.write(spark.createDataFrame(pdf))
        # graft i32 := i64 + 1 into the v0 metaData (same pattern as
        # TestLegacyWriterVersionGate._graft) — existing random rows
        # don't satisfy it, but MERGE only touches inserted rows here
        log_file = f"{tmp_table_dir}/t/_delta_log/{0:020d}.json"
        lines = []
        with open(log_file) as fh:
            for line in fh:
                obj = json.loads(line)
                if "metaData" in obj:
                    schema = json.loads(obj["metaData"]["schemaString"])
                    for f in schema["fields"]:
                        if f["name"] == "i32":
                            f["metadata"] = {
                                "delta.generationExpression": "i64 + 1"}
                    obj["metaData"]["schemaString"] = json.dumps(schema)
                lines.append(json.dumps(obj))
        with open(log_file, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        t = DeltaTable(spark, f"{tmp_table_dir}/t")
        src = gen_pdf(2)[["order", "i64"]]
        src["order"] = [hi + 1.0, hi + 2.0]
        src["i64"] = [10, 20]
        sdf = spark.createDataFrame(src)
        with pytest.raises(ValueError, match="ALL"):
            t.merge(sdf, "t.order = s.order", when_not_matched=[
                {"insert": {"order": "s.order", "i64": "s.i64",
                            "i32": "s.i64 + 1"},
                 "condition": f"s.order = {hi + 1}"},
                {"insert": {"order": "s.order", "i64": "s.i64"}}])
        # assigned by NONE -> computed per row
        t2 = t.merge(sdf, "t.order = s.order", when_not_matched=[
            {"insert": {"order": "s.order", "i64": "s.i64"},
             "condition": f"s.order = {hi + 1}"},
            {"insert": {"order": "s.order", "i64": "s.i64"}}])
        got = t2.to_pandas().set_index("order")
        assert got.loc[hi + 1, "i32"] == 11
        assert got.loc[hi + 2, "i32"] == 21
        # assigned by ALL -> verified (correct values accepted);
        # chained on t2 so the commit is against the current head
        src2 = src.copy()
        src2["order"] = [hi + 3.0, hi + 4.0]
        src2["i64"] = [30, 40]
        t3 = t2.merge(
            spark.createDataFrame(src2), "t.order = s.order",
            when_not_matched=[
                {"insert": {"order": "s.order", "i64": "s.i64",
                            "i32": "s.i64 + 1"},
                 "condition": f"s.order = {hi + 3}"},
                {"insert": {"order": "s.order", "i64": "s.i64",
                            "i32": "s.i64 + 1"}}])
        got3 = t3.to_pandas().set_index("order")
        assert got3.loc[hi + 3, "i32"] == 31
        assert got3.loc[hi + 4, "i32"] == 41


class TestNotMatchedBySourceClauseList:
    def test_ordered_by_source_clauses_first_match_wins(
            self, spark, tmp_table_dir):
        """A target row with no source match satisfying BOTH the
        update and the delete conditions takes the earlier (update)
        clause; later rows fall through in order."""
        pdf = gen_pdf()
        orders = sorted(pdf["order"])
        o0, o1, o2 = orders[0], orders[1], orders[2]
        # source matches everything EXCEPT the first three rows
        src = pdf[pdf["order"] > o2]
        t = DeltaTable(spark, f"{tmp_table_dir}/t")
        t = t.write(spark.createDataFrame(pdf))
        t2 = t.merge(
            spark.createDataFrame(src), "t.order = s.order",
            when_not_matched_by_source=[
                # o0 satisfies BOTH this and the delete below
                {"update": {"i64": "888"},
                 "condition": f"t.order IN ({o0}, {o1})"},
                {"delete": f"t.order IN ({o0}, {o2})"},
            ])
        got = t2.to_pandas().set_index("order")
        assert got.loc[o0, "i64"] == 888      # clause 1 won over delete
        assert got.loc[o1, "i64"] == 888
        assert o2 not in got.index            # clause 2 deleted
        assert len(got) == len(pdf) - 1
        # matched rows untouched
        rest = got.drop(index=[o0, o1])
        assert (rest["i64"] == pdf.set_index("order").loc[
            rest.index, "i64"]).all()

    def test_by_source_clause_order_changes_result(self, spark,
                                                   tmp_table_dir):
        pdf = gen_pdf()
        o0 = float(sorted(pdf["order"])[0])
        src = pdf[pdf["order"] != o0]
        for clauses, survives in (
                ([{"update": {"i64": "333"}}, {"delete": True}], True),
                ([{"delete": True}, {"update": {"i64": "333"}}], False)):
            t = DeltaTable(spark, f"{tmp_table_dir}/o{survives}")
            t = t.write(spark.createDataFrame(pdf))
            t2 = t.merge(spark.createDataFrame(src),
                         "t.order = s.order",
                         when_not_matched_by_source=clauses)
            got = t2.to_pandas().set_index("order")
            if survives:
                assert got.loc[o0, "i64"] == 333
            else:
                assert o0 not in got.index

    def test_by_source_list_equals_kwargs_sugar(self, spark,
                                                tmp_table_dir):
        """Scalar kwargs == [update-clause, delete-clause]: the
        documented 'update wins when both apply' is first-match-wins
        over that order."""
        pdf = gen_pdf()
        lo = float(pdf["order"].min())
        src = pdf[pdf["order"] > lo + 9]
        results = []
        for style in ("kwargs", "list"):
            t = DeltaTable(spark, f"{tmp_table_dir}/{style}")
            t = t.write(spark.createDataFrame(pdf))
            kw = (dict(
                when_not_matched_by_source_update={"i64": "-1"},
                when_not_matched_by_source_update_condition=
                f"t.order < {lo + 5}",
                when_not_matched_by_source_delete=f"t.order < {lo + 7}")
                if style == "kwargs" else
                dict(when_not_matched_by_source=[
                    {"update": {"i64": "-1"},
                     "condition": f"t.order < {lo + 5}"},
                    {"delete": f"t.order < {lo + 7}"}]))
            t2 = t.merge(spark.createDataFrame(src),
                         "t.order = s.order", **kw)
            results.append(t2.to_pandas().sort_values("order")
                           .reset_index(drop=True))
        pd.testing.assert_frame_equal(results[0], results[1])

    def test_by_source_list_with_matched_clauses(self, spark,
                                                 tmp_table_dir):
        """All three families as lists in ONE merge, over the same
        join — each family's chain gated on its own side."""
        pdf = gen_pdf()
        orders = sorted(pdf["order"])
        lo, hi = orders[0], orders[-1]
        src = pdf[pdf["order"] >= orders[2]].copy()
        extra = gen_pdf(1)
        extra["order"] = [hi + 1.0]
        src = pd.concat([src, extra])
        t = DeltaTable(spark, f"{tmp_table_dir}/t")
        t = t.write(spark.createDataFrame(pdf))
        t2 = t.merge(
            spark.createDataFrame(src), "t.order = s.order",
            when_matched=[
                {"update": {"i64": "100"},
                 "condition": f"s.order = {orders[2]}"},
                {"update": {"i64": "200"}}],
            when_not_matched=[
                {"insert": {"order": "s.order", "i64": "300"}}],
            when_not_matched_by_source=[
                {"update": {"i64": "400"},
                 "condition": f"t.order = {lo}"},
                {"delete": True}])
        got = t2.to_pandas().set_index("order")
        assert got.loc[orders[2], "i64"] == 100
        assert (got.loc[orders[3]:hi, "i64"] == 200).all()
        assert got.loc[hi + 1, "i64"] == 300
        assert got.loc[lo, "i64"] == 400
        assert orders[1] not in got.index
        assert len(got) == len(pdf) - 1 + 1

    def test_by_source_list_validation(self, spark, tmp_table_dir):
        pdf = gen_pdf()
        t = DeltaTable(spark, f"{tmp_table_dir}/t").write(
            spark.createDataFrame(pdf))
        src = spark.createDataFrame(gen_pdf(1))
        with pytest.raises(ValueError, match="not both"):
            t.merge(src, "t.order = s.order",
                    when_not_matched_by_source=[{"delete": True}],
                    when_not_matched_by_source_delete=True)
        with pytest.raises(ValueError, match="not both"):
            t.merge(src, "t.order = s.order",
                    when_not_matched_by_source=[{"delete": True}],
                    when_not_matched_by_source_update_condition="1=1")
        with pytest.raises(ValueError, match="exactly one"):
            t.merge(src, "t.order = s.order",
                    when_not_matched_by_source=[{"condition": "1=1"}])
        with pytest.raises(ValueError, match="unknown column"):
            t.merge(src, "t.order = s.order",
                    when_not_matched_by_source=[
                        {"update": {"nope": "1"}}])

    def test_nmbs_only_clause_list(self, spark, tmp_table_dir):
        """Clause list on the semi/anti (NMBS-only) rewrite path —
        no matched clause, matched rows pass through verbatim."""
        pdf = gen_pdf()
        orders = sorted(pdf["order"])
        o0, o1 = orders[0], orders[1]
        src = pdf[pdf["order"] > o1]
        t = DeltaTable(spark, f"{tmp_table_dir}/t")
        t = t.write(spark.createDataFrame(pdf))
        t2 = t.merge(
            spark.createDataFrame(src), "t.order = s.order",
            when_not_matched_by_source=[
                {"update": {"i64": "7"}, "condition": f"t.order = {o0}"},
                {"delete": True}])
        got = t2.to_pandas().set_index("order")
        assert got.loc[o0, "i64"] == 7
        assert o1 not in got.index
        assert len(got) == len(pdf) - 1
