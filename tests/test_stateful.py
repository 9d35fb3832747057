"""Stateful streaming operator tests: dedup-across-batches and running
per-user stats, checked stream-vs-batch."""

import pytest
from pyspark.sql import functions as F

from xdlake_spark.sources.readers import read_parquet_any
from xdlake_spark.streaming.stateful import running_user_stats, streaming_dedup

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return read_parquet_any(spark, f"{SF}/events.parquet")


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


class TestStreamingDedup:
    def test_stream_emits_each_fingerprint_once(self, spark, tmp_table_dir,
                                                documents):
        # two batches with overlapping content: batch2 duplicates batch1
        src = f"{tmp_table_dir}/in"
        d1 = documents.limit(50)
        d2 = (documents.limit(30)
              .withColumn("doc_id", F.col("doc_id") + 1000))  # dup texts
        d1.write.parquet(src)
        d2.write.mode("append").parquet(src)
        stream = (spark.readStream.schema(documents.schema)
                  .option("maxFilesPerTrigger", "1").parquet(src))
        out = streaming_dedup(stream)
        q = (out.writeStream.format("memory").queryName("dedup_stream")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = spark.sql("select * from dedup_stream").collect()
        fps = [r["fingerprint"] for r in rows]
        assert len(fps) == len(set(fps))  # each fingerprint exactly once
        assert len(fps) == 50             # 30 dups suppressed
        # keeper is the lowest doc_id in its group
        assert all(r["doc_id"] < 1000 for r in rows)

    def test_batch_fallback_matches(self, spark, documents):
        out = streaming_dedup(documents.limit(50)).collect()
        assert len(out) == 50


class TestStreamingDedupWithinWatermark:
    def test_close_duplicates_suppressed(self, spark, tmp_table_dir,
                                         documents):
        from xdlake_spark.streaming.stateful import \
            streaming_dedup_within_watermark
        src = f"{tmp_table_dir}/in_wm"
        base = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
        d1 = documents.limit(40).withColumn("ts", base)
        # duplicates arriving 1 minute later — inside the watermark
        d2 = (documents.limit(25)
              .withColumn("doc_id", F.col("doc_id") + 1000)
              .withColumn("ts", base + F.expr("INTERVAL 1 MINUTE")))
        d1.write.parquet(src)
        d2.write.mode("append").parquet(src)
        schema = d1.schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1").parquet(src))
        out = streaming_dedup_within_watermark(stream, "ts",
                                               watermark="10 minutes")
        q = (out.writeStream.format("memory").queryName("dedup_wm")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = spark.sql("select * from dedup_wm").collect()
        fps = [r["fingerprint"] for r in rows]
        assert len(fps) == len(set(fps)) == 40  # 25 close dups dropped

    def test_batch_fallback_keeps_first(self, spark, documents):
        from xdlake_spark.streaming.stateful import \
            streaming_dedup_within_watermark
        d = (documents.limit(30)
             .withColumn("ts", F.to_timestamp(
                 F.lit("2024-01-01 00:00:00"))))
        dup = d.withColumn("doc_id", F.col("doc_id") + 5000)
        out = streaming_dedup_within_watermark(
            d.unionByName(dup), "ts").collect()
        assert len(out) == 30
        assert all(r["doc_id"] < 5000 for r in out)


class TestRunningUserStats:
    def test_stream_final_state_matches_batch(self, spark, tmp_table_dir,
                                              events):
        src = f"{tmp_table_dir}/ev"
        ev = events.limit(1000)
        ev.write.parquet(src)
        stream = (spark.readStream.schema(events.schema)
                  .option("maxFilesPerTrigger", "1").parquet(src))
        out = running_user_stats(stream)
        q = (out.writeStream.format("memory").queryName("user_stats")
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination(120)
        # last emitted row per user = final running totals
        got = {}
        for r in spark.sql("select * from user_stats").collect():
            got[r["user_id"]] = (r["n_events"], round(r["sum_value"], 6))
        expect = {r["user_id"]: (r["n_events"], round(r["sum_value"], 6))
                  for r in running_user_stats(ev).collect()}
        # stream emits cumulative updates; final value must match batch
        for uid, (n, s) in expect.items():
            assert got[uid] == (n, s)
