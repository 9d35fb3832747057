"""Streaming tests: file-source micro-batch ingest into a delta table, and
windowed aggregations checked batch-vs-stream."""

import shutil

import pytest
from pyspark.sql import functions as F

from xdlake_spark import DeltaTable
from xdlake_spark.streaming.ingest import (
    session_windows,
    sliding_window_counts,
    stream_append,
    tumbling_window_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    from xdlake_spark.sources.readers import read_parquet_any
    return read_parquet_any(spark, f"{SF}/events.parquet")


class TestStreamIngest:
    def test_stream_append_commits_batches(self, spark, tmp_table_dir,
                                           events):
        src = f"{tmp_table_dir}/incoming"
        events.limit(500).write.parquet(src)
        stream = (spark.readStream.schema(events.schema).parquet(src))
        q = stream_append(stream, f"{tmp_table_dir}/t",
                          f"{tmp_table_dir}/ckpt")
        q.awaitTermination(120)
        t = DeltaTable(spark, f"{tmp_table_dir}/t")
        assert t.to_df().count() == 500
        h = list(t.history())
        assert h[0].get("streaming") is True
        assert "batchId" in h[0]

    def test_restart_does_not_duplicate(self, spark, tmp_table_dir, events):
        src = f"{tmp_table_dir}/incoming"
        events.limit(200).write.parquet(src)
        for _ in range(2):  # second run: checkpoint says nothing new
            stream = spark.readStream.schema(events.schema).parquet(src)
            q = stream_append(stream, f"{tmp_table_dir}/t",
                              f"{tmp_table_dir}/ckpt")
            q.awaitTermination(120)
        t = DeltaTable(spark, f"{tmp_table_dir}/t")
        assert t.to_df().count() == 200


class TestStreamStaticJoin:
    def test_stream_enriched_by_broadcast_dim(self, spark, tmp_table_dir,
                                              events):
        """Stream-static join: a streaming fact source enriched by a
        broadcast static dimension — the standard streaming-ETL
        enrichment shape (the dim re-resolves per micro-batch, no state
        store involved). Verified batch-vs-stream equivalent."""
        src = f"{tmp_table_dir}/facts"
        events.limit(400).write.parquet(src)
        dim = (events.select("user_id").distinct()
               .withColumn("user_tier",
                           F.when(F.col("user_id") % 3 == 0, "gold")
                           .otherwise("basic")))
        stream = spark.readStream.schema(events.schema).parquet(src)
        out_dir = f"{tmp_table_dir}/enriched"
        q = (stream.join(F.broadcast(dim), "user_id")
             .select("event_id", "user_id", "user_tier")
             .writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", f"{tmp_table_dir}/ck2")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = {(r["event_id"], r["user_tier"])
               for r in spark.read.parquet(out_dir).collect()}
        want = {(r["event_id"], r["user_tier"])
                for r in spark.read.parquet(src)
                .join(dim, "user_id")
                .select("event_id", "user_tier").collect()}
        assert got == want and len(got) == 400


class TestWindows:
    def test_tumbling_batch_counts_total(self, spark, events):
        out = tumbling_window_counts(events, window="1 hour")
        total = out.agg(F.sum("n_events")).collect()[0][0]
        assert total == events.count()

    def test_tumbling_stream_matches_batch(self, spark, tmp_table_dir,
                                           events):
        src = f"{tmp_table_dir}/ev"
        events.write.parquet(src)
        stream = spark.readStream.schema(events.schema).parquet(src)
        agg = tumbling_window_counts(stream, window="1 hour")
        q = (agg.writeStream.format("memory").queryName("tumbling_test")
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = {(r["window_start"], r["event_type"]): r["n_events"]
               for r in spark.sql("select * from tumbling_test").collect()}
        expect = {(r["window_start"], r["event_type"]): r["n_events"]
                  for r in tumbling_window_counts(
                      events, window="1 hour").collect()}
        assert got == expect

    def test_sliding_windows_overlap(self, spark, events):
        out = sliding_window_counts(events, window="1 hour",
                                    slide="30 minutes")
        # each event lands in 2 overlapping windows
        total = out.agg(F.sum("n_events")).collect()[0][0]
        assert total == 2 * events.count()

    def test_session_windows(self, spark, events):
        out = session_windows(events, gap="30 minutes")
        rows = out.collect()
        assert rows
        total = sum(r["n_events"] for r in rows)
        assert total == events.count()
        assert all(r["session_end"] > r["session_start"] for r in rows)


class TestStreamStreamJoin:
    def test_interval_join_stream_equals_batch(self, spark,
                                               tmp_table_dir, events):
        """Stream-stream interval join under watermarks == the batch
        range join on the same data (inner joins emit eagerly; the
        watermark only bounds state)."""
        from xdlake_spark.operators.temporal import range_join
        from xdlake_spark.streaming.join import stream_interval_join

        src = f"{tmp_table_dir}/ev"
        ev = events.limit(400).select("event_id", "user_id", "ts")
        ev.write.parquet(src)

        batch = range_join(ev, ev, by="user_id", on="ts",
                           lower="0 seconds", upper="15 minutes")
        want = sorted((r.l_event_id, r.r_event_id)
                      for r in batch.select("l_event_id",
                                            "r_event_id").collect())

        ls = spark.readStream.schema(ev.schema).parquet(src)
        rs = spark.readStream.schema(ev.schema).parquet(src)
        out = stream_interval_join(ls, rs, key="user_id", on="ts",
                                   upper="15 minutes")
        assert out.isStreaming
        q = (out.select("event_id", "r_event_id")
             .writeStream.format("memory").queryName("ssj_test")
             .outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        got = sorted((r.event_id, r.r_event_id) for r in
                     spark.sql("SELECT * FROM ssj_test").collect())
        assert got == want and len(want) > 0

    def test_batch_passthrough_matches_range_join(self, spark, events):
        from xdlake_spark.operators.temporal import range_join
        from xdlake_spark.streaming.join import stream_interval_join
        ev = events.limit(300).select("event_id", "user_id", "ts")
        a = sorted((r.event_id, r.r_event_id) for r in
                   stream_interval_join(ev, ev, upper="10 minutes")
                   .select("event_id", "r_event_id").collect())
        b = sorted((r.l_event_id, r.r_event_id) for r in
                   range_join(ev, ev, by="user_id", on="ts",
                              lower="0 seconds", upper="10 minutes")
                   .select("l_event_id", "r_event_id").collect())
        assert a == b

    def test_rejects_unknown_join_type(self, spark, events):
        from xdlake_spark.streaming.join import stream_interval_join
        with pytest.raises(ValueError, match="unsupported"):
            stream_interval_join(events, events, how="fullOuter")
