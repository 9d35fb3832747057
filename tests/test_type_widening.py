"""Delta typeWidening: widen_column DDL + upcast-on-scan of old files
(table.py widen_column / _check_type_widening_readable)."""

import json

import pytest
from pyspark.sql import functions as F

from xdlake_spark import DeltaTable

from .utils import gen_pdf


class TestWidenColumn:
    def test_int_to_long_old_files_upcast(self, spark, tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(
            spark.createDataFrame([(i, f"r{i}") for i in range(30)],
                                  "i32 int, txt string"))
        t = t.widen_column("i32", "bigint")
        # metadata-only: no files rewritten
        assert t.version == 1
        assert t.schema["i32"].dataType.simpleString() == "bigint"
        assert dict(t.schema["i32"].metadata)["delta.typeChanges"] == \
            [{"fromType": "integer", "toType": "long"}]
        proto = t.log.protocol()
        assert "typeWidening" in proto.extra["readerFeatures"]
        assert "typeWidening" in proto.extra["writerFeatures"]
        # old narrow files read through the wide schema
        df = t.to_df()
        assert df.schema["i32"].dataType.simpleString() == "bigint"
        assert df.count() == 30
        # new writes land wide, mixed files scan together
        t = t.write(spark.createDataFrame(
            [(9_000_000_000, "wide")], "i32 long, txt string"),
            mode="append", schema_mode="merge")
        assert t.to_df().filter("i32 = 9000000000").count() == 1
        assert t.to_df().count() == 31

    def test_float_to_double_and_stats_skipping(self, spark,
                                                tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(
            spark.createDataFrame([(i, float(i)) for i in range(20)],
                                  "k long, v float").coalesce(2))
        t = t.widen_column("v", "double")
        assert t.to_df().filter("v > 10.5").count() == 9
        # old footer stats (floats) still drive the manifest prune
        assert t.count("v >= 0.0") == 20

    def test_widening_chain_recorded(self, spark, tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(
            spark.createDataFrame([(1,)], "c short"))
        t = t.widen_column("c", "int").widen_column("c", "bigint")
        assert dict(t.schema["c"].metadata)["delta.typeChanges"] == \
            [{"fromType": "short", "toType": "integer"},
             {"fromType": "integer", "toType": "long"}]
        assert t.to_df().collect()[0].c == 1

    def test_unsupported_transitions_refused(self, spark,
                                             tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(
            spark.createDataFrame(gen_pdf(5)))
        with pytest.raises(ValueError, match="unsupported type"):
            t.widen_column("i64", "int")       # narrowing
        with pytest.raises(ValueError, match="unsupported type"):
            t.widen_column("txt", "bigint")    # nonsense
        with pytest.raises(ValueError, match="unsupported type"):
            t.widen_column("ts", "date")
        with pytest.raises(ValueError, match="Unknown column"):
            t.widen_column("nope", "bigint")

    def test_partition_column_refused(self, spark, tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(
            spark.createDataFrame([(1, 2)], "a int, p int"),
            partition_by=["p"])
        with pytest.raises(ValueError, match="partition column"):
            t.widen_column("p", "bigint")

    def test_foreign_unreadable_widening_refused(self, spark,
                                                 tmp_table_dir):
        """A foreign table recording date -> timestampNTZ widening must
        refuse the scan — Spark would not upcast it."""
        t = DeltaTable(spark, tmp_table_dir).write(
            spark.createDataFrame(gen_pdf(5)))
        log_file = f"{tmp_table_dir}/_delta_log/{0:020d}.json"
        lines = []
        for line in open(log_file):
            obj = json.loads(line)
            if "protocol" in obj:
                obj["protocol"] = {
                    "minReaderVersion": 3, "minWriterVersion": 7,
                    "readerFeatures": ["typeWidening"],
                    "writerFeatures": ["typeWidening"]}
            if "metaData" in obj:
                sch = json.loads(obj["metaData"]["schemaString"])
                for f_ in sch["fields"]:
                    if f_["name"] == "ts":
                        f_["metadata"] = {"delta.typeChanges": [
                            {"fromType": "date",
                             "toType": "timestamp_ntz"}]}
                obj["metaData"]["schemaString"] = json.dumps(sch)
            lines.append(json.dumps(obj))
        open(log_file, "w").write("\n".join(lines) + "\n")
        t2 = DeltaTable(spark, tmp_table_dir)
        with pytest.raises(NotImplementedError, match="widened"):
            t2.to_df().count()


    def test_foreign_nested_unreadable_widening_refused(
            self, spark, tmp_table_dir):
        """ADVICE r7: delta.typeChanges recorded on a NESTED field
        (spec: carries a fieldPath) must also be checked — an
        unsupported nested widening passing the reader gate would
        misread instead of refusing."""
        df = spark.sql(
            "SELECT id, named_struct('d', DATE'2024-01-01') AS s "
            "FROM range(5)")
        DeltaTable(spark, tmp_table_dir).write(df)
        log_file = f"{tmp_table_dir}/_delta_log/{0:020d}.json"
        lines = []
        for line in open(log_file):
            obj = json.loads(line)
            if "protocol" in obj:
                obj["protocol"] = {
                    "minReaderVersion": 3, "minWriterVersion": 7,
                    "readerFeatures": ["typeWidening"],
                    "writerFeatures": ["typeWidening"]}
            if "metaData" in obj:
                sch = json.loads(obj["metaData"]["schemaString"])
                for f_ in sch["fields"]:
                    if f_["name"] == "s":
                        for inner in f_["type"]["fields"]:
                            if inner["name"] == "d":
                                inner["metadata"] = {
                                    "delta.typeChanges": [
                                        {"fromType": "date",
                                         "toType": "timestamp_ntz",
                                         "fieldPath": "s.d"}]}
                obj["metaData"]["schemaString"] = json.dumps(sch)
            lines.append(json.dumps(obj))
        open(log_file, "w").write("\n".join(lines) + "\n")
        t2 = DeltaTable(spark, tmp_table_dir)
        with pytest.raises(NotImplementedError, match="s.d"):
            t2.to_df().count()
