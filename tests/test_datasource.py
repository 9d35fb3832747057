"""The ``xdlake`` Spark format: batch + streaming reads via the Python
DataSource API (sources/datasource.py)."""

import tempfile

import pytest
from pyspark.sql import functions as F

from xdlake_spark import DeltaTable
from xdlake_spark.sources.datasource import register


@pytest.fixture(scope="module")
def registered(spark):
    register(spark)
    return spark


class TestBatchFormat:
    def test_snapshot_read_matches_table(self, registered, tmp_table_dir,
                                         lineitem):
        li = lineitem.limit(500)
        t = DeltaTable(registered, tmp_table_dir).write(
            li, partition_by=["l_returnflag"])
        df = registered.read.format("xdlake").load(tmp_table_dir)
        assert df.count() == 500
        assert set(df.columns) == set(li.columns)
        # partition values re-typed correctly through the arrow path
        a = sorted(r["l_returnflag"] for r in
                   df.select("l_returnflag").distinct().collect())
        b = sorted(r["l_returnflag"] for r in
                   t.to_df().select("l_returnflag").distinct().collect())
        assert a == b

    def test_respects_deletes(self, registered, tmp_table_dir, lineitem):
        t = DeltaTable(registered, tmp_table_dir).write(lineitem)
        t = t.delete("l_quantity > 25")
        df = registered.read.format("xdlake").load(tmp_table_dir)
        assert df.count() == t.to_df().count()
        assert df.filter("l_quantity > 25").count() == 0


class TestBatchTimeTravel:
    """versionAsOf / timestampAsOf reader options (delta-spark
    parity): the batch reader pins the log replay — and the inferred
    SCHEMA — at the requested version."""

    def test_version_as_of(self, registered, tmp_table_dir, lineitem):
        t = DeltaTable(registered, tmp_table_dir).write(
            lineitem.limit(100))
        t.write(lineitem.limit(300))
        rd = registered.read.format("xdlake")
        assert rd.option("versionAsOf", 0).load(
            tmp_table_dir).count() == 100
        assert rd.option("versionAsOf", 1).load(
            tmp_table_dir).count() == 400
        assert rd.load(tmp_table_dir).count() == 400

    def test_timestamp_as_of(self, registered, tmp_table_dir,
                             lineitem):
        import time
        t = DeltaTable(registered, tmp_table_dir).write(
            lineitem.limit(100))
        after_v0 = int(time.time() * 1000)
        time.sleep(1.1)
        t.write(lineitem.limit(300))
        got = (registered.read.format("xdlake")
               .option("timestampAsOf", after_v0)
               .load(tmp_table_dir).count())
        assert got == 100

    def test_schema_pinned_at_version(self, registered, tmp_table_dir,
                                      spark):
        t = DeltaTable(registered, tmp_table_dir).write(spark.range(3))
        t.write(spark.sql("SELECT id, id * 2 AS extra FROM range(2)"),
                schema_mode="merge")
        old = (registered.read.format("xdlake")
               .option("versionAsOf", 0).load(tmp_table_dir))
        assert old.columns == ["id"]

    def test_option_validation(self, registered, tmp_table_dir,
                               lineitem):
        import pytest as _pytest
        DeltaTable(registered, tmp_table_dir).write(lineitem.limit(10))
        rd = registered.read.format("xdlake")
        with _pytest.raises(Exception, match="mutually exclusive"):
            (rd.option("versionAsOf", 0).option("timestampAsOf", 1)
             .load(tmp_table_dir).count())
        with _pytest.raises(Exception, match="no version committed"):
            (registered.read.format("xdlake")
             .option("timestampAsOf", 1).load(tmp_table_dir).count())


class TestStreamingFormat:
    def test_incremental_tail(self, registered, tmp_table_dir, lineitem):
        li = lineitem.limit(300)
        t = DeltaTable(registered, tmp_table_dir).write(li)
        out, ckpt = tempfile.mkdtemp(), tempfile.mkdtemp()

        def drain():
            q = (registered.readStream.format("xdlake").load(tmp_table_dir)
                 .writeStream.format("parquet").option("path", out)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)

        drain()
        assert registered.read.parquet(out).count() == 300
        t.write(li.limit(50).withColumn(
            "l_orderkey", F.col("l_orderkey") + 9_000_000))
        drain()
        got = registered.read.parquet(out)
        assert got.count() == 350  # only the delta was re-read
        assert got.filter("l_orderkey >= 9000000").count() == 50


class TestSkipChangeCommits:
    def test_dv_delete_commit_skipped(self, registered, tmp_table_dir,
                                      lineitem):
        """With skipChangeCommits, a merge-on-read DELETE's re-adds are
        not re-emitted; without it the surviving rows of the DV'd file
        come through again (ignoreChanges-style)."""
        li = lineitem.limit(200)
        t = DeltaTable(registered, tmp_table_dir).write(li)
        out, ckpt = tempfile.mkdtemp(), tempfile.mkdtemp()

        def drain(skip):
            q = (registered.readStream.format("xdlake")
                 .option("skipChangeCommits", str(skip).lower())
                 .load(tmp_table_dir)
                 .writeStream.format("parquet").option("path", out)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)

        drain(True)
        assert registered.read.parquet(out).count() == 200
        t = t.delete("l_quantity > 25", mode="merge-on-read")
        append = li.limit(10).withColumn(
            "l_orderkey", F.col("l_orderkey") + 9_000_000)
        t.write(append)
        drain(True)
        got = registered.read.parquet(out)
        # delete commit skipped entirely; append flowed through
        assert got.count() == 210
        assert got.filter("l_orderkey >= 9000000").count() == 10


class TestStreamingSink:
    def test_per_batch_commits_and_idempotence(self, registered,
                                               tmp_table_dir, lineitem):
        ev = lineitem.select("l_orderkey", "l_quantity")
        loc = tmp_table_dir + "/t"
        DeltaTable(registered, loc).write(ev.limit(0))  # declare schema
        src = tmp_table_dir + "/src"
        ckpt = tmp_table_dir + "/ck"
        ev.limit(100).write.parquet(src)

        def drain():
            q = (registered.readStream.schema(ev.schema).parquet(src)
                 .writeStream.format("xdlake").option("path", loc)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)

        drain()
        t = DeltaTable(registered, loc)
        assert t.to_df().count() == 100
        assert t.version == 1
        # per-file stats flow in, so filtered scans prune
        assert all(a.stats for a in t.adds.values())
        # no new source data -> no new table version
        drain()
        assert DeltaTable(registered, loc).version == 1


class TestPartitionedStreamingSink:
    """writeStream.format('xdlake') into a PARTITIONED table: each
    task splits its slice by the table's partition columns, files land
    in Hive-encoded directories, adds carry partitionValues (nulls as
    JSON null / __HIVE_DEFAULT_PARTITION__ dirs), and manifest pruning
    works over the streamed files."""

    def test_partitioned_sink_end_to_end(self, registered,
                                         tmp_table_dir, spark):
        import os
        seed = spark.createDataFrame([(0, "a", 1.0)],
                                     "id long, cat string, v double")
        DeltaTable(registered, f"{tmp_table_dir}/t").write(
            seed, partition_by=["cat"])
        rows = [(i, "abc"[i % 3] if i % 7 else None, float(i))
                for i in range(1, 30)]
        DeltaTable(registered, f"{tmp_table_dir}/src").write(
            spark.createDataFrame(rows,
                                  "id long, cat string, v double"))
        q = (registered.readStream.format("xdlake")
             .load(f"{tmp_table_dir}/src")
             .writeStream.format("xdlake")
             .option("checkpointLocation", f"{tmp_table_dir}/ckpt")
             .trigger(availableNow=True)
             .start(f"{tmp_table_dir}/t"))
        q.awaitTermination(120)
        t = DeltaTable(registered, f"{tmp_table_dir}/t")
        assert t.count() == 30
        dirs = {d for d in os.listdir(f"{tmp_table_dir}/t")
                if d.startswith("cat=")}
        assert "cat=__HIVE_DEFAULT_PARTITION__" in dirs
        assert {"cat=a", "cat=b", "cat=c"} <= dirs
        # adds carry typed-back partition values; pruning works
        got = {r["id"] for r in
               t.to_df(where="cat = 'a'").collect()}
        expect = {0} | {i for i in range(1, 30)
                        if i % 7 and "abc"[i % 3] == "a"}
        assert got == expect
        nulls = t.to_df(where="cat IS NULL").count()
        assert nulls == len([i for i in range(1, 30) if i % 7 == 0])

    def test_boolean_partition_values_delta_cased(self, registered,
                                                  tmp_table_dir,
                                                  spark):
        """Boolean partition values must serialize as Delta's
        lowercase 'true'/'false' — Python str() would write
        'True'/'False', which foreign engines comparing
        partitionValues exactly (or parsing Hive dirs) mismatch
        (r8 ADVICE)."""
        import os
        DeltaTable(registered, f"{tmp_table_dir}/src").write(
            spark.createDataFrame(
                [(i, i % 2 == 0) for i in range(10)],
                "id long, flag boolean"))
        q = (registered.readStream.format("xdlake")
             .load(f"{tmp_table_dir}/src")
             .writeStream.format("xdlake")
             .option("checkpointLocation", f"{tmp_table_dir}/ckpt")
             .option("partitionBy", "flag")
             .trigger(availableNow=True)
             .start(f"{tmp_table_dir}/t"))
        q.awaitTermination(120)
        t = DeltaTable(registered, f"{tmp_table_dir}/t")
        dirs = {d for d in os.listdir(f"{tmp_table_dir}/t")
                if d.startswith("flag=")}
        assert dirs == {"flag=true", "flag=false"}
        pvs = {a.partitionValues["flag"] for a in t.adds.values()}
        assert pvs == {"true", "false"}
        assert t.to_df(where="flag = true").count() == 5

    def test_sink_creates_missing_table(self, registered,
                                        tmp_table_dir, spark):
        """delta-spark writeStream parity: the first batch CREATES the
        table from the stream schema + partitionBy option."""
        DeltaTable(registered, f"{tmp_table_dir}/src").write(
            spark.createDataFrame(
                [(i, "ab"[i % 2], float(i)) for i in range(20)],
                "id long, cat string, v double"))
        q = (registered.readStream.format("xdlake")
             .load(f"{tmp_table_dir}/src")
             .writeStream.format("xdlake")
             .option("checkpointLocation", f"{tmp_table_dir}/ckpt")
             .option("partitionBy", "cat")
             .trigger(availableNow=True)
             .start(f"{tmp_table_dir}/t"))
        q.awaitTermination(120)
        t = DeltaTable(registered, f"{tmp_table_dir}/t")
        assert t.count() == 20
        assert t.partition_columns == ["cat"]
        assert t.version == 0
        assert next(iter(t.history()))["operation"] == "CREATE TABLE"

    def test_schema_drift_refused(self, registered, tmp_table_dir,
                                  spark):
        DeltaTable(registered, f"{tmp_table_dir}/t").write(
            spark.createDataFrame([(1, "a")], "id long, cat string"))
        DeltaTable(registered, f"{tmp_table_dir}/src").write(
            spark.createDataFrame([(1, 2)], "id long, other int"))
        q = (registered.readStream.format("xdlake")
             .load(f"{tmp_table_dir}/src")
             .writeStream.format("xdlake")
             .option("checkpointLocation", f"{tmp_table_dir}/ckpt")
             .trigger(availableNow=True)
             .start(f"{tmp_table_dir}/t"))
        import pytest as _pytest
        with _pytest.raises(Exception, match="does not match"):
            q.awaitTermination(120)
        assert DeltaTable(registered, f"{tmp_table_dir}/t").count() == 1

    def test_missing_partition_column_refused(self, registered,
                                              tmp_table_dir, spark):
        """Create-mode partitionBy naming a column absent from the
        stream schema is refused (an existing table's drifted stream
        hits the schema-match check instead — see
        test_schema_drift_refused)."""
        DeltaTable(registered, f"{tmp_table_dir}/src").write(
            spark.createDataFrame([(1,)], "id long"))
        import pytest as _pytest
        q = (registered.readStream.format("xdlake")
             .load(f"{tmp_table_dir}/src")
             .writeStream.format("xdlake")
             .option("checkpointLocation", f"{tmp_table_dir}/ckpt")
             .option("partitionBy", "cat")
             .trigger(availableNow=True)
             .start(f"{tmp_table_dir}/t"))
        # the refusal surfaces when the async stream materializes
        with _pytest.raises(Exception, match="partition columns"):
            q.awaitTermination(120)
        import os
        assert not os.path.exists(
            f"{tmp_table_dir}/t/_delta_log")    # nothing created


class TestStreamingDedupIntoSink:
    def test_watermark_dedup_feeds_delta_sink(self, registered,
                                              tmp_table_dir):
        """End-to-end ingest pipeline: file stream -> bounded-state
        dedup within the watermark -> xdlake streaming sink. The table
        receives exactly the deduped set, with one ACID commit per
        micro-batch and batch-id idempotence on replay."""
        from pyspark.sql import functions as F

        from xdlake_spark.streaming.stateful import \
            streaming_dedup_within_watermark
        spark = registered
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet")
        base = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
        d1 = docs.limit(40).withColumn("ts", base)
        d2 = (docs.limit(25)
              .withColumn("doc_id", F.col("doc_id") + 1000)
              .withColumn("ts", base + F.expr("INTERVAL 1 MINUTE")))
        src = f"{tmp_table_dir}/src"
        d1.write.parquet(src)
        d2.write.mode("append").parquet(src)

        loc = f"{tmp_table_dir}/t"
        ckpt = f"{tmp_table_dir}/ck"
        stream = (spark.readStream.schema(d1.schema)
                  .option("maxFilesPerTrigger", "1").parquet(src))
        deduped = streaming_dedup_within_watermark(stream, "ts")

        from xdlake_spark import DeltaTable
        DeltaTable(spark, loc).write(deduped.sparkSession.createDataFrame(
            [], deduped.schema))  # declare schema

        def drain():
            q = (deduped.writeStream.format("xdlake")
                 .option("path", loc)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)

        drain()
        t = DeltaTable(spark, loc)
        got = t.to_pandas()
        # exactly the 40 distinct texts landed; close dups suppressed
        assert len(got) == 40
        assert got["fingerprint"].is_unique
        assert (got["doc_id"] < 1000).all()
        # replay with no new data: no extra commits, no extra rows
        v = t.version
        drain()
        t2 = DeltaTable(spark, loc)
        assert t2.version == v and t2.to_df().count() == 40


class TestStreamingChangeFeed:
    """readStream.format('xdlake').option('readChangeFeed', 'true'):
    streams row-level changes — cdc files verbatim for commits that
    have them, insert/delete derivation otherwise."""

    def test_cdf_stream_end_to_end(self, registered, tmp_table_dir,
                                   lineitem):
        li = lineitem.limit(200).select("l_orderkey", "l_linenumber",
                                        "l_quantity")
        t = DeltaTable(registered, tmp_table_dir).write(
            li.coalesce(1))                                     # v0
        t = t.set_properties(
            {"delta.enableChangeDataFeed": "true"})             # v1
        t = t.delete("l_quantity > 30")                         # v2 cdc
        out, ckpt = tempfile.mkdtemp(), tempfile.mkdtemp()

        def drain():
            q = (registered.readStream.format("xdlake")
                 .option("readChangeFeed", "true").load(tmp_table_dir)
                 .writeStream.format("parquet").option("path", out)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)

        drain()
        got = registered.read.parquet(out)
        assert set(got.columns) == {"l_orderkey", "l_linenumber",
                                    "l_quantity", "_change_type",
                                    "_commit_version"}
        n_del = li.filter("l_quantity > 30").count()
        assert got.filter("_change_type = 'insert'").count() == 200
        assert got.filter(
            "_change_type = 'insert' AND _commit_version = 0").count() \
            == 200
        assert got.filter(
            "_change_type = 'delete' AND _commit_version = 2").count() \
            == n_del
        # incremental: a new append arrives as inserts only
        t.write(li.limit(10).withColumn(
            "l_orderkey", F.col("l_orderkey") + 7_000_000),
            mode="append")
        drain()
        got = registered.read.parquet(out)
        assert got.filter("l_orderkey >= 7000000").count() == 10
        assert got.filter(
            "l_orderkey >= 7000000 AND _change_type = 'insert'") \
            .count() == 10

    def test_batch_cdf_option_refused(self, registered, tmp_table_dir,
                                      lineitem):
        DeltaTable(registered, tmp_table_dir).write(lineitem.limit(10))
        import pytest as _p
        with _p.raises(Exception, match="readChangeFeed"):
            (registered.read.format("xdlake")
             .option("readChangeFeed", "true")
             .load(tmp_table_dir).count())


class TestBatchWriter:
    """df.write.format('xdlake') (r9): the batch sink — create with
    partitionBy, append with OCC retry semantics, full overwrite,
    schema-drift refusal; interoperates with the native scan and time
    travel on the same log."""

    def test_create_append_overwrite_roundtrip(self, registered,
                                               tmp_path, lineitem):
        spark = registered
        loc = str(tmp_path / "t")
        li = lineitem.select("l_orderkey", "l_returnflag",
                             "l_quantity")
        (li.limit(100).write.format("xdlake")
         .option("partitionBy", "l_returnflag")
         .mode("append").save(loc))
        t = DeltaTable(spark, loc)
        assert t.version == 0 and t.count() == 100
        assert t.partition_columns == ["l_returnflag"]
        assert next(iter(t.history()))["operation"] == "CREATE TABLE"
        li.limit(50).write.format("xdlake").mode("append").save(loc)
        t = DeltaTable(spark, loc)
        assert t.count() == 150
        li.limit(20).write.format("xdlake").mode("overwrite").save(loc)
        t = DeltaTable(spark, loc)
        assert t.count() == 20
        assert t.load_as_version(1).count() == 150
        # partition pruning over the written layout
        pruned = t.to_df(where="l_returnflag = 'R'").inputFiles()
        assert len(pruned) < len(t.adds) or len(t.adds) == 1
        # format read agrees
        assert (spark.read.format("xdlake").load(loc).count()
                == 20)

    def test_schema_drift_refused(self, registered, tmp_path,
                                  lineitem):
        loc = str(tmp_path / "t")
        lineitem.limit(5).select("l_orderkey").write.format(
            "xdlake").mode("append").save(loc)
        import pytest as _p
        with _p.raises(Exception, match="schema"):
            (registered.range(3).write.format("xdlake")
             .mode("append").save(loc))

    def test_partition_by_on_existing_refused(self, registered,
                                              tmp_path, lineitem):
        loc = str(tmp_path / "t")
        lineitem.limit(5).select("l_orderkey").write.format(
            "xdlake").mode("append").save(loc)
        import pytest as _p
        with _p.raises(Exception, match="partitionBy"):
            (lineitem.limit(5).select("l_orderkey")
             .write.format("xdlake").option("partitionBy",
                                            "l_orderkey")
             .mode("append").save(loc))

    def test_dynamic_partition_overwrite_option(self, registered,
                                                tmp_path):
        spark = registered
        loc = str(tmp_path / "t")
        df = spark.createDataFrame([(i, "abc"[i % 3])
                                    for i in range(30)],
                                   "id long, cat string")
        (df.write.format("xdlake").option("partitionBy", "cat")
         .mode("append").save(loc))
        new = spark.createDataFrame([(100, "a"), (200, "b")],
                                    "id long, cat string")
        (new.write.format("xdlake")
         .option("partitionOverwriteMode", "dynamic")
         .mode("overwrite").save(loc))
        t = DeltaTable(spark, loc)
        ids = sorted(r.id for r in t.to_df().collect())
        assert ids == sorted(
            [i for i in range(30) if "abc"[i % 3] == "c"]
            + [100, 200])
        h = next(iter(t.history()))
        assert h["operationParameters"].get(
            "partitionOverwriteMode") == "dynamic"
        import pytest as _p
        with _p.raises(Exception, match="replaceWhere"):
            (new.write.format("xdlake")
             .option("replaceWhere", "cat = 'a'")
             .mode("overwrite").save(loc))

    def test_txn_options_make_writes_idempotent(self, registered,
                                                tmp_path):
        """delta-spark's txnAppId/txnVersion writer options (r9): a
        replayed job with the same pair is a pure no-op; a later
        version applies; a lone option is refused."""
        spark = registered
        loc = str(tmp_path / "t")
        df = spark.createDataFrame([(1,), (2,)], "id long")

        def w(v):
            (df.write.format("xdlake").option("txnAppId", "job-a")
             .option("txnVersion", str(v)).mode("append").save(loc))

        w(1)
        t = DeltaTable(spark, loc)
        assert t.count() == 2 and t.txn_version("job-a") == 1
        w(1)                                   # replay
        t = DeltaTable(spark, loc)
        assert t.count() == 2 and t.version == 0
        w(2)
        t = DeltaTable(spark, loc)
        assert t.count() == 4 and t.txn_version("job-a") == 2
        import pytest as _p
        with _p.raises(Exception, match="txn"):
            (df.write.format("xdlake").option("txnAppId", "x")
             .mode("append").save(loc))

    def test_txn_replay_writes_no_orphan_files(self, registered,
                                               tmp_path):
        """A replayed txn job must not leak data files: the planning-
        time watermark check skips the file writes entirely, and an
        empty txn write still records the watermark (r9 review)."""
        import glob
        spark = registered
        loc = str(tmp_path / "t")
        df = spark.createDataFrame([(1,), (2,)], "id long")

        def w(v, d=df):
            (d.write.format("xdlake").option("txnAppId", "j")
             .option("txnVersion", str(v)).mode("append").save(loc))

        w(1)
        before = sorted(glob.glob(f"{loc}/*.parquet"))
        w(1)                                  # replay
        assert sorted(glob.glob(f"{loc}/*.parquet")) == before
        w(2, spark.createDataFrame([], "id long"))   # empty + txn
        t = DeltaTable(spark, loc)
        assert t.txn_version("j") == 2 and t.count() == 2

    def test_sink_respects_stats_column_restriction(self, registered,
                                                    tmp_path):
        """The format sink applies delta.dataSkippingStatsColumns /
        dataSkippingNumIndexedCols exactly like the native write path
        (ADVICE r9: tables configured to restrict stats got full-width
        stats JSON when written through df.write.format('xdlake'))."""
        import json
        spark = registered
        loc = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(i, float(i), f"s{i}") for i in range(10)],
            "a long, b double, c string")
        t = DeltaTable(spark, loc).write(df)
        t = t.set_properties(
            {"delta.dataSkippingStatsColumns": "a"})
        before = set(t.adds)
        df.write.format("xdlake").mode("append").save(loc)
        t = DeltaTable(spark, loc)
        new = [json.loads(t.adds[p].stats)
               for p in set(t.adds) - before]
        assert new
        assert all(set(s["minValues"]) == {"a"} for s in new)
        assert all(set(s["maxValues"]) == {"a"} for s in new)
        assert sum(s["numRecords"] for s in new) == 10
        # numIndexedCols variant through the sink too
        t = t.set_properties(
            {"delta.dataSkippingStatsColumns": None,
             "delta.dataSkippingNumIndexedCols": "2"})
        df.write.format("xdlake").mode("append").save(loc)
        t = DeltaTable(spark, loc)
        stats = json.loads(t.adds[sorted(t.adds)[-1]].stats)
        assert set(stats["minValues"]) <= {"a", "b"}
