"""Streaming source admission control (maxFilesPerTrigger) and
live-set initial snapshot (sources/datasource.py offset model)."""

import tempfile

import pytest
from pyspark.sql import functions as F

from xdlake_spark import DeltaTable
from xdlake_spark.sources.datasource import _XdlakeStreamReader, register


@pytest.fixture()
def registered(spark):
    try:
        register(spark)
    except Exception:
        pass  # already registered on this session
    return spark


@pytest.fixture()
def lineitem(spark):
    return spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")


class TestReaderProtocol:
    """Drive the reader exactly as MicroBatchExecution does (observed
    order: latestOffset BEFORE initialOffset on a fresh stream), so the
    admission control is pinned deterministically — no trigger timing."""

    def _table(self, spark, path, lineitem, commits, files_per=1):
        t = DeltaTable(spark, path)
        for k in range(commits):
            df = lineitem.limit(10 * files_per).withColumn(
                "l_orderkey", F.col("l_orderkey") + k)
            t = t.write(df.repartition(files_per), mode="append")
        return t

    def test_fresh_stream_snapshot_then_capped_tail(
            self, registered, tmp_table_dir, lineitem):
        t = self._table(registered, tmp_table_dir, lineitem, 3)
        r = _XdlakeStreamReader(tmp_table_dir, max_files=2)
        o1 = r.latestOffset()            # engine asks latest FIRST
        init = r.initialOffset()
        assert init["snapshot"] == -2
        assert o1 == {"version": 2, "index": -1}
        batch0 = r.partitions(init, o1)  # live snapshot, uncapped
        assert len(batch0) == 3
        assert r.latestOffset() == o1    # caught up: same offset

        for k in range(5):               # backlog of 5 single-file adds
            t = t.write(lineitem.limit(5).coalesce(1), mode="append")
        offs, sizes = [o1], []
        while True:
            nxt = r.latestOffset()
            if nxt == offs[-1]:
                break
            sizes.append(len(r.partitions(offs[-1], nxt)))
            offs.append(nxt)
        assert sizes == [2, 2, 1]        # <= cap per batch, all consumed
        assert offs[-1] == {"version": 7, "index": 1}

    def test_cap_splits_inside_a_version(self, registered, tmp_path,
                                         lineitem):
        path = str(tmp_path / "t")
        self._table(registered, path, lineitem, 1, files_per=1)
        r = _XdlakeStreamReader(path, max_files=3)
        o1 = r.latestOffset()
        init = r.initialOffset()
        r.partitions(init, o1)
        t = DeltaTable(registered, path)
        t.write(lineitem.limit(40).repartition(4), mode="append")
        o2 = r.latestOffset()
        assert o2 == {"version": 1, "index": 3}   # mid-version offset
        assert len(r.partitions(o1, o2)) == 3
        o3 = r.latestOffset()
        assert o3 == {"version": 1, "index": 4}
        assert len(r.partitions(o2, o3)) == 1
        assert r.latestOffset() == o3

    def test_restart_is_uncapped_catchup_then_caps(
            self, registered, tmp_path, lineitem):
        path = str(tmp_path / "t")
        t = self._table(registered, path, lineitem, 4)
        # a fresh reader with NO initialOffset call = restarted stream
        r = _XdlakeStreamReader(path, max_files=1)
        o1 = r.latestOffset()
        assert o1 == {"version": 3, "index": -1}  # blind catch-up
        # checkpointed start says v0 consumed: span (v0, v3] = 3 files
        assert len(r.partitions({"version": 0}, o1)) == 3
        t.write(lineitem.limit(5).coalesce(1), mode="append")
        t2 = DeltaTable(registered, path)
        t2.write(lineitem.limit(5).coalesce(1), mode="append")
        o2 = r.latestOffset()
        assert o2 == {"version": 4, "index": 1}   # capped from now on
        assert len(r.partitions(o1, o2)) == 1

    def test_capped_start_on_resumed_checkpoint_refused(
            self, registered, tmp_path, lineitem):
        """cappedStart is only restart-safe on a FRESH checkpoint: a
        resumed query whose checkpointed position is AHEAD of the
        startingVersion pin must fail loudly instead of planning a
        backwards batch (r8 ADVICE)."""
        path = str(tmp_path / "t")
        self._table(registered, path, lineitem, 5)
        # restarted stream (no initialOffset): cappedStart pins v0,
        # but the checkpoint already consumed through v3
        r = _XdlakeStreamReader(path, max_files=1, starting_version=1,
                                capped_start=True)
        o1 = r.latestOffset()   # blind pin: behind the checkpoint
        with pytest.raises(ValueError, match="cappedStart"):
            r.partitions({"version": 3, "index": -1}, o1)
        # a FRESH checkpoint (start == the pin) keeps working
        r2 = _XdlakeStreamReader(path, max_files=1, starting_version=1,
                                 capped_start=True)
        o = r2.latestOffset()
        assert o == {"version": 1, "index": 1}
        assert len(r2.partitions({"version": 0, "index": -1}, o)) == 1

    def test_skipped_change_commit_advances_with_zero_files(
            self, registered, tmp_path, lineitem):
        path = str(tmp_path / "t")
        t = self._table(registered, path, lineitem, 1)
        r = _XdlakeStreamReader(path, max_files=2,
                                skip_change_commits=True)
        o1 = r.latestOffset()
        r.partitions(r.initialOffset(), o1)
        t = t.delete("l_quantity > 25")           # change commit
        t.write(lineitem.limit(5).coalesce(1), mode="append")
        o2 = r.latestOffset()
        assert o2 == {"version": 2, "index": 1}
        parts = r.partitions(o1, o2)
        assert len(parts) == 1                    # delete emitted nothing


class TestMaxFilesPerTriggerE2E:
    def test_live_tail_batches_are_bounded(self, registered,
                                           tmp_table_dir, lineitem):
        t = DeltaTable(registered, tmp_table_dir).write(
            lineitem.limit(10).coalesce(1))
        sizes = []
        q = (registered.readStream.format("xdlake")
             .option("maxFilesPerTrigger", "2").load(tmp_table_dir)
             .writeStream.foreachBatch(
                 lambda df, bid: sizes.append(df.count()))
             .option("checkpointLocation", tempfile.mkdtemp())
             .trigger(processingTime="0 seconds").start())
        try:
            q.processAllAvailable()        # initial snapshot (1 file)
            for k in range(6):             # backlog builds while live
                t = t.write(lineitem.limit(10).coalesce(1),
                            mode="append")
            q.processAllAvailable()
        finally:
            q.stop()
        assert sum(sizes) == 70
        # every batch after the snapshot admits <= 2 files x 10 rows
        assert all(s <= 20 for s in sizes[1:])

    def test_bad_option_values_fail_at_load(self, registered,
                                            tmp_table_dir, lineitem):
        DeltaTable(registered, tmp_table_dir).write(lineitem.limit(5))
        with pytest.raises(Exception, match="maxFilesPerTrigger"):
            (registered.readStream.format("xdlake")
             .option("maxFilesPerTrigger", "0").load(tmp_table_dir))


class TestLiveSetSnapshot:
    def test_initial_snapshot_dedups_rewrites(self, registered,
                                              tmp_table_dir, lineitem):
        """A fresh stream over a table with a historical CoW delete
        must emit the LIVE rows once — not the original file plus the
        rewrite's survivors (per-version replay double-counted them)."""
        li = lineitem.limit(200)
        t = DeltaTable(registered, tmp_table_dir).write(li)
        t = t.delete("l_quantity > 25")      # CoW rewrite commit
        live = t.to_df().count()
        assert live < 200
        out, ckpt = tempfile.mkdtemp(), tempfile.mkdtemp()
        q = (registered.readStream.format("xdlake").load(tmp_table_dir)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        assert registered.read.parquet(out).count() == live

    def test_tail_after_snapshot_still_incremental(self, registered,
                                                   tmp_table_dir,
                                                   lineitem):
        li = lineitem.limit(100)
        t = DeltaTable(registered, tmp_table_dir).write(li)
        t = t.delete("l_quantity > 40")
        live = t.to_df().count()
        out, ckpt = tempfile.mkdtemp(), tempfile.mkdtemp()

        def drain():
            q = (registered.readStream.format("xdlake")
                 .load(tmp_table_dir)
                 .writeStream.format("parquet").option("path", out)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)

        drain()
        assert registered.read.parquet(out).count() == live
        # restart with new appends: only the delta flows
        t.write(li.limit(30).withColumn(
            "l_orderkey", F.col("l_orderkey") + 9_000_000))
        drain()
        got = registered.read.parquet(out)
        assert got.count() == live + 30
        assert got.filter("l_orderkey >= 9000000").count() == 30


class TestStartingVersionAndBytes:
    def _table(self, spark, path, lineitem, commits):
        t = DeltaTable(spark, path)
        for k in range(commits):
            t = t.write(lineitem.limit(10).coalesce(1), mode="append")
        return t

    def test_starting_version_skips_history(self, registered,
                                            tmp_path, lineitem):
        path = str(tmp_path / "t")
        self._table(registered, path, lineitem, 4)  # versions 0..3
        r = _XdlakeStreamReader(path, starting_version=2)
        init = r.initialOffset()
        assert init == {"version": 1, "index": -1}
        o1 = r.latestOffset()
        parts = r.partitions(init, o1)
        assert len(parts) == 2          # versions 2 and 3 only

    def test_starting_version_latest_sees_only_new(self, registered,
                                                   tmp_path, lineitem):
        path = str(tmp_path / "t")
        t = self._table(registered, path, lineitem, 3)
        r = _XdlakeStreamReader(path, starting_version="latest")
        init = r.initialOffset()
        # current head (v2) recorded as consumed: only new commits flow
        assert init == {"version": 2, "index": -1}
        o1 = r.latestOffset()
        assert r.partitions(init, o1) == []         # nothing yet
        t.write(lineitem.limit(5).coalesce(1), mode="append")
        o2 = r.latestOffset()
        assert len(r.partitions(o1, o2)) == 1

    def test_max_bytes_admits_at_least_one_file(self, registered,
                                                tmp_path, lineitem):
        path = str(tmp_path / "t")
        t = self._table(registered, path, lineitem, 1)
        r = _XdlakeStreamReader(path, max_bytes=1)  # < any file
        o1 = r.latestOffset()
        r.partitions(r.initialOffset(), o1)
        for _ in range(3):
            t = t.write(lineitem.limit(10).coalesce(1), mode="append")
        sizes = []
        offs = [o1]
        while True:
            nxt = r.latestOffset()
            if nxt == offs[-1]:
                break
            sizes.append(len(r.partitions(offs[-1], nxt)))
            offs.append(nxt)
        assert sizes == [1, 1, 1]       # progress guarantee: 1 per batch

    def test_bad_values_fail_at_load(self, registered, tmp_table_dir,
                                     lineitem):
        DeltaTable(registered, tmp_table_dir).write(lineitem.limit(5))
        with pytest.raises(Exception, match="maxBytesPerTrigger"):
            (registered.readStream.format("xdlake")
             .option("maxBytesPerTrigger", "0").load(tmp_table_dir))
        with pytest.raises(Exception, match="startingVersion"):
            (registered.readStream.format("xdlake")
             .option("startingVersion", "-3").load(tmp_table_dir))


class TestAvailableNow:
    def _backlog(self, spark, path, lineitem, commits=6):
        t = DeltaTable(spark, path)
        for _ in range(commits):
            t = t.write(lineitem.limit(5).coalesce(1), mode="append")
        return t

    def test_native_trigger_drains_and_terminates(self, registered,
                                                  tmp_path, lineitem):
        """trigger(availableNow=True): the AvailableNow wrapper snaps
        latestOffset once -> ONE batch covering the backlog, then the
        query terminates (the Python DataSource API exposes no
        admission control to the wrapper — pinned here so a behavior
        change is noticed)."""
        path = str(tmp_path / "t")
        self._backlog(registered, path, lineitem)
        batches = []
        q = (registered.readStream.format("xdlake")
             .option("maxFilesPerTrigger", "2")
             .option("startingVersion", "0")
             .load(path)
             .writeStream.foreachBatch(
                 lambda df, bid: batches.append(df.count()))
             .trigger(availableNow=True)
             .option("checkpointLocation", str(tmp_path / "cp"))
             .start())
        q.awaitTermination(120)
        assert not q.isActive          # terminates on its own
        assert sum(batches) == 30      # full backlog drained

    def test_backfill_capped_batches_then_stop(self, registered,
                                               tmp_path, lineitem):
        """VERDICT r7 item 6: the backfill helper drains the backlog
        in maxFilesPerTrigger-bounded batches and stops; a second run
        over the same checkpoint drains only the delta."""
        from xdlake_spark.streaming.backfill import \
            available_now_backfill
        path = str(tmp_path / "t")
        t = self._backlog(registered, path, lineitem)
        seen = []
        res = available_now_backfill(
            registered, path,
            lambda df, bid: seen.append(df.count()),
            checkpoint_location=str(tmp_path / "cp"),
            max_files_per_trigger=2, timeout_s=180)
        assert res["reached"] and res["target_version"] == 5
        assert res["n_rows"] == 30
        assert res["n_batches"] >= 3           # capped: 2 files/batch
        assert max(seen) <= 10                 # 2 files x 5 rows

        t.write(lineitem.limit(5).coalesce(1), mode="append")
        seen2 = []
        res2 = available_now_backfill(
            registered, path,
            lambda df, bid: seen2.append(df.count()),
            checkpoint_location=str(tmp_path / "cp"),
            max_files_per_trigger=2, timeout_s=180)
        assert res2["reached"] and res2["target_version"] == 6
        assert res2["n_rows"] == 5             # only the delta

    def test_backfill_pins_target_version(self, registered, tmp_path,
                                          lineitem):
        """endingVersion pin: commits racing in during the drain are
        NOT admitted (left for the next run)."""
        from xdlake_spark.streaming.backfill import \
            available_now_backfill
        path = str(tmp_path / "t")
        t = self._backlog(registered, path, lineitem, commits=4)

        raced = {"done": False}

        def fn(df, bid):
            if not raced["done"]:
                # a commit lands while the backfill is mid-drain
                t.write(lineitem.limit(7).coalesce(1), mode="append")
                raced["done"] = True

        res = available_now_backfill(
            registered, path, fn,
            checkpoint_location=str(tmp_path / "cp"),
            max_files_per_trigger=1, timeout_s=180)
        assert res["reached"] and res["target_version"] == 3
        assert res["n_rows"] == 20             # racing commit excluded

    def test_ending_version_reader_clamp(self, registered, tmp_path,
                                         lineitem):
        path = str(tmp_path / "t")
        self._backlog(registered, path, lineitem, commits=5)
        r = _XdlakeStreamReader(path, starting_version=0,
                                ending_version=2, capped_start=True,
                                max_files=10)
        offs = [r.latestOffset()]
        assert offs[0] == {"version": 2, "index": 1}
        parts = r.partitions({"version": -1, "index": -1}, offs[0])
        assert len(parts) == 3                 # versions 0..2 only
        assert r.latestOffset() == offs[0]     # clamped: never past 2


class TestCdfRateLimits:
    """readChangeFeed now composes with maxFilesPerTrigger /
    maxBytesPerTrigger and startingVersion (r9): the same
    (version, index) admission walk runs over the CDF unit order, so
    a big change commit splits across capped micro-batches and the
    union of all capped batches equals the uncapped change feed."""

    def _cdf_table(self, spark, path, lineitem):
        li = lineitem.limit(100).select("l_orderkey", "l_linenumber",
                                        "l_quantity")
        t = DeltaTable(spark, path).write(li.repartition(3))    # v0
        t = t.write(li.limit(20).repartition(2), mode="append")  # v1
        t = t.delete("l_quantity > 40")                          # v2
        return t

    def test_capped_batches_cover_the_uncapped_feed(
            self, registered, tmp_path, lineitem):
        path = str(tmp_path / "t")
        self._cdf_table(registered, path, lineitem)
        r = _XdlakeStreamReader(path, read_change_feed=True,
                                max_files=2)
        uncapped = _XdlakeStreamReader(path, read_change_feed=True)
        o_all = uncapped.latestOffset()
        all_parts = uncapped.partitions(
            {"version": -1, "index": -1}, o_all)
        offs = [{"version": -1, "index": -1}]
        sizes, parts = [], []
        o1 = r.latestOffset()
        r._last = offs[0]          # pin the walk's start (fresh pos)
        while True:
            nxt = r.latestOffset()
            if nxt == offs[-1]:
                break
            batch = r.partitions(offs[-1], nxt)
            sizes.append(len(batch))
            parts.extend(batch)
            offs.append(nxt)
        assert max(sizes) <= 2 and len(sizes) >= 3
        assert [p.url for p in parts] == [p.url for p in all_parts]
        assert [p.fixed_change for p in parts] == \
            [p.fixed_change for p in all_parts]

    def test_old_versiononly_offsets_resume(self, registered,
                                            tmp_path, lineitem):
        """Pre-r9 checkpoints stored {'version': v} with no index —
        they must resume as 'whole version consumed'."""
        path = str(tmp_path / "t")
        self._cdf_table(registered, path, lineitem)
        r = _XdlakeStreamReader(path, read_change_feed=True)
        r._last = {"version": 1}          # legacy offset shape
        o = r.latestOffset()
        parts = r.partitions({"version": 1}, o)
        assert {p.commit_version for p in parts} == {2}

    def test_cdf_starting_version_skips_history(self, registered,
                                                tmp_path, lineitem):
        path = str(tmp_path / "t")
        self._cdf_table(registered, path, lineitem)
        r = _XdlakeStreamReader(path, read_change_feed=True,
                                starting_version=2)
        init = r.initialOffset()
        o = r.latestOffset()
        parts = r.partitions(init, o)
        assert parts and {p.commit_version for p in parts} == {2}

    def test_cdf_stream_capped_equals_batch_change_feed(
            self, registered, tmp_path, lineitem):
        """End to end under caps: the capped CDF stream's accumulated
        output matches batch change_feed row-for-row."""
        import tempfile
        path = str(tmp_path / "t")
        t = self._cdf_table(registered, path, lineitem)
        out, ckpt = tempfile.mkdtemp(), tempfile.mkdtemp()
        q = (registered.readStream.format("xdlake")
             .option("readChangeFeed", "true")
             .option("maxFilesPerTrigger", "1").load(path)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        got = registered.read.parquet(out).select(
            "l_orderkey", "l_linenumber", "_change_type",
            "_commit_version")
        want = t.change_feed(-1, t.version).select(  # (start, end]
            "l_orderkey", "l_linenumber", "_change_type",
            "_commit_version")
        assert got.count() == want.count()
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0


class TestCdfBackfill:
    def test_cdf_backfill_capped_batches_then_stop(self, registered,
                                                   tmp_path, lineitem):
        """r9: available_now_backfill(read_change_feed=True) drains
        the CHANGE history in rate-limited batches and terminates;
        accumulated rows equal the batch change feed."""
        from xdlake_spark.streaming.backfill import \
            available_now_backfill
        path = str(tmp_path / "t")
        li = lineitem.limit(60).select("l_orderkey", "l_linenumber",
                                       "l_quantity")
        t = DeltaTable(registered, path).write(li.repartition(3))
        t = t.delete("l_quantity > 40")
        seen = []
        res = available_now_backfill(
            registered, path,
            lambda df, bid: seen.extend(df.collect()),
            checkpoint_location=str(tmp_path / "ck"),
            read_change_feed=True,
            max_files_per_trigger=1, timeout_s=180)
        assert res["reached"] and res["n_batches"] >= 3
        want = t.change_feed(-1, t.version).count()
        assert res["n_rows"] == want == len(seen)
        with pytest.raises(ValueError, match="contradictory"):
            available_now_backfill(
                registered, path, lambda df, bid: None,
                checkpoint_location=str(tmp_path / "ck2"),
                read_change_feed=True, skip_change_commits=True)

    def test_cdf_capped_start_on_resumed_checkpoint_refused(
            self, registered, tmp_path, lineitem):
        """The cappedStart backwards-pin guard applies to CDF too
        (r9 review): a silent empty backwards span would rewind _last
        and redeliver already-processed change versions."""
        path = str(tmp_path / "t")
        t = DeltaTable(registered, path).write(lineitem.limit(20))
        t = t.write(lineitem.limit(10), mode="append")
        t.delete("l_quantity > 40")
        r = _XdlakeStreamReader(path, read_change_feed=True,
                                starting_version=1, capped_start=True,
                                max_files=1)
        o1 = r.latestOffset()            # blind pin behind checkpoint
        with pytest.raises(ValueError, match="cappedStart"):
            r.partitions({"version": 2, "index": -1}, o1)


class TestStartingTimestampOption:
    """r12 (delta-spark parity): the streaming source accepts
    startingTimestamp — resolved to the EARLIEST version committed at
    or after the timestamp against the log's ICT-aware clock, then
    treated exactly like startingVersion."""

    def _source(self, path, **opts):
        from xdlake_spark.sources.datasource import XdlakeDataSource
        return XdlakeDataSource({"path": path, **opts})

    def test_resolves_to_first_version_at_or_after(
            self, registered, tmp_table_dir, lineitem):
        t = DeltaTable(registered, tmp_table_dir)
        for _ in range(3):
            t = t.write(lineitem.limit(5).coalesce(1), mode="append")
        hist = {h["version"]:
                int(h.get("inCommitTimestamp", h.get("timestamp")))
                for h in t.history()}
        src = self._source(tmp_table_dir,
                           startingTimestamp=str(hist[1]))
        assert src._starting_version() == 1
        # a timestamp just past v1's commit resolves to v2
        src = self._source(tmp_table_dir,
                           startingTimestamp=str(hist[1] + 1))
        assert src._starting_version() in (1, 2)  # ==1 only if ts equal
        if hist[2] > hist[1]:
            assert src._starting_version() == 2

    def test_mutually_exclusive_and_too_late(self, registered,
                                             tmp_table_dir, lineitem):
        import pytest
        t = DeltaTable(registered, tmp_table_dir).write(
            lineitem.limit(5))
        src = self._source(tmp_table_dir, startingVersion="0",
                           startingTimestamp="0")
        with pytest.raises(ValueError, match="mutually exclusive"):
            src._starting_version()
        hist = {h["version"]:
                int(h.get("inCommitTimestamp", h.get("timestamp")))
                for h in t.history()}
        src = self._source(tmp_table_dir,
                           startingTimestamp=str(hist[0] + 10_000))
        with pytest.raises(ValueError, match="at or after"):
            src._starting_version()
