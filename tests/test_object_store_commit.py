"""Cloud-store commit protocol (sources/storage.py put_if_absent, r11):
on an object store with no create-exclusive open, commits go through a
CONDITIONAL PUT (S3 If-None-Match / GCS generation-match semantics)
when the backend exposes one — exercised here against an in-process
emulated object store (tests/emulated_store.py) with two racing
writers, plus the naive check-then-write fallback's lost-update mode
pinned for contrast (why commit_context locking matters there)."""

import threading

import pytest
from pyspark.sql import functions as F

from xdlake_spark import DeltaTable
from xdlake_spark.sources.storage import (Location, _REGISTRY,
                                          register_filesystem)

from .emulated_store import EmulatedObjectStore


@pytest.fixture
def emu_prefix():
    """Register an emulated store under a unique prefix; unregister on
    teardown so other tests never resolve into it."""
    registered = []

    def _register(prefix, store):
        register_filesystem(prefix, store)
        registered.append(prefix.rstrip("/"))
        return store

    yield _register
    for p in registered:
        _REGISTRY.pop(p, None)


class TestConditionalPut:
    def test_racing_writers_exactly_one_winner(self, emu_prefix):
        """Two writers commit the same version simultaneously through
        the conditional-put path: exactly one wins, the loser gets
        FileExistsError, and the stored bytes are the winner's —
        atomic even with PUT latency injected."""
        store = emu_prefix("emuA://b", EmulatedObjectStore(
            check_write_delay_s=0.02))
        loc = Location.resolve("emuA://b/t/_delta_log/"
                               "00000000000000000000.json")
        barrier = threading.Barrier(2)
        results: list = []

        def commit(i):
            barrier.wait()
            try:
                loc.put_if_absent(b"writer-%d" % i)
                results.append(("won", i))
            except FileExistsError:
                results.append(("lost", i))

        ts = [threading.Thread(target=commit, args=(i,))
              for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        outcomes = sorted(r[0] for r in results)
        assert outcomes == ["lost", "won"]
        winner = next(i for o, i in results if o == "won")
        assert loc.read_bytes() == b"writer-%d" % winner
        assert store.conditional_put_count == 2

    def test_many_racers_single_winner(self, emu_prefix):
        store = emu_prefix("emuB://b", EmulatedObjectStore())
        loc = Location.resolve("emuB://b/t/_delta_log/v.json")
        barrier = threading.Barrier(8)
        wins: list = []

        def commit(i):
            barrier.wait()
            try:
                loc.put_if_absent(b"%d" % i)
                wins.append(i)
            except FileExistsError:
                pass

        ts = [threading.Thread(target=commit, args=(i,))
              for i in range(8)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert len(wins) == 1
        assert store.conditional_put_count == 8

    def test_naive_backend_loses_updates(self, emu_prefix):
        """The check-then-write fallback (backends with NO conditional
        put) silently loses a commit when two writers race inside the
        PUT-latency window — the exact failure conditional put (or a
        commit_context lock) exists to close. Pinned so the fallback's
        weakness stays documented behavior, not a surprise."""
        store = emu_prefix("emuC://b", EmulatedObjectStore(
            check_write_delay_s=0.05, conditional_put=False))
        loc = Location.resolve("emuC://b/t/_delta_log/v.json")
        barrier = threading.Barrier(2)
        errors: list = []

        def commit(i):
            barrier.wait()
            try:
                loc.put_if_absent(b"writer-%d" % i)
            except FileExistsError as e:
                errors.append(e)

        ts = [threading.Thread(target=commit, args=(i,))
              for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        # both writers think they committed; one update is silently gone
        assert errors == []
        assert store.put_count == 2

    def test_backend_specific_pipe_file_errors_fall_through(
            self, emu_prefix):
        """r11 review: a backend whose pipe_file rejects mode='create'
        with a backend-specific exception (older fsspec forwards the
        kwarg to the store call) must fall through to check-then-write
        instead of failing every commit."""
        class LegacyStore(EmulatedObjectStore):
            def __init__(self):
                super().__init__(conditional_put=False)

            def pipe_file(self, path, value, **kw):
                if kw:
                    raise RuntimeError("Unknown parameter: mode")
                raise AssertionError("unreachable")

        store = emu_prefix("emuH://b", LegacyStore())
        loc = Location.resolve("emuH://b/t/v.json")
        loc.put_if_absent(b"data")           # falls through, succeeds
        assert loc.read_bytes() == b"data"
        with pytest.raises(FileExistsError):
            loc.put_if_absent(b"other")
        assert store.put_count == 1

    def test_put_landed_but_client_saw_error_is_success(
            self, emu_prefix):
        """r12 (ADVICE r11): the conditional put can LAND server-side
        while the client sees a transient error (timeout after a 200).
        The fallback must read the object back and treat identical
        bytes as OUR win — raising FileExistsError would make the
        commit caller rebase and re-apply the same entry at the next
        version, double-applying its actions."""
        class FlakyStore(EmulatedObjectStore):
            def __init__(self):
                super().__init__(conditional_put=False)

            def pipe_file(self, path, value, **kw):
                key = self._key(path)
                if key in self._objects:       # honest conditional put
                    raise FileExistsError(path)
                # the write lands...
                self._objects[key] = bytes(value)
                self.put_count += 1
                # ...but the client sees a transient failure
                raise TimeoutError("connection reset after 200 OK")

        store = emu_prefix("emuI://b", FlakyStore())
        loc = Location.resolve("emuI://b/t/v.json")
        loc.put_if_absent(b"mine")           # must NOT raise
        assert loc.read_bytes() == b"mine"
        assert store.put_count == 1          # no duplicate write
        # but a real lost race (different bytes on the object) still
        # surfaces as the conflict it is
        loc2 = Location.resolve("emuI://b/t/v2.json")
        store._objects[store._key("emuI://b/t/v2.json")] = b"theirs"
        with pytest.raises(FileExistsError):
            loc2.put_if_absent(b"mine")
        assert loc2.read_bytes() == b"theirs"

    def test_sequential_conflict_still_raises_on_naive(self,
                                                       emu_prefix):
        """Outside a race, the naive fallback still detects an existing
        version file and raises — OCC works; only the window is weak."""
        emu_prefix("emuD://b", EmulatedObjectStore(conditional_put=False))
        loc = Location.resolve("emuD://b/t/v.json")
        loc.put_if_absent(b"first")
        with pytest.raises(FileExistsError):
            loc.put_if_absent(b"second")
        assert loc.read_bytes() == b"first"


class TestTableOnEmulatedStore:
    """Full DeltaTable lifecycle with the LOG on the emulated object
    store (data parquet stays local — Spark's data path on a real
    cluster goes through s3a/gs Hadoop connectors; this module only
    carries the KB-scale log)."""

    def test_lifecycle_and_reopen(self, spark, lineitem, emu_prefix,
                                  tmp_table_dir):
        store = emu_prefix("emuE://bucket", EmulatedObjectStore())
        log = "emuE://bucket/t1/_delta_log"
        t = DeltaTable(spark, tmp_table_dir, log)
        t = t.write(lineitem.limit(100))
        t = t.write(lineitem.limit(50), mode="append")
        t = t.delete("l_quantity > 45")
        # every commit (and its .crc) went through conditional put
        assert store.conditional_put_count >= 3
        t2 = DeltaTable(spark, tmp_table_dir, log)
        assert t2.version == 2
        assert t2.to_df().count() == t.to_df().count()
        assert t2.verify_checksum() == []
        # time travel still replays from the store
        assert DeltaTable(spark, tmp_table_dir, log,
                          version=1).to_df().count() == 150

    def test_checkpoint_written_and_replayed_on_store(
            self, spark, lineitem, emu_prefix, tmp_table_dir):
        """Parquet checkpoints ride Location.write_bytes, so they work
        on any registered store — the reopen must take the checkpoint
        fast path from the emulated store and still verify."""
        store = emu_prefix("emuG://bucket", EmulatedObjectStore())
        log = "emuG://bucket/t3/_delta_log"
        t = DeltaTable(spark, tmp_table_dir, log).write(
            lineitem.limit(60))
        t = t.set_properties({"delta.checkpointInterval": "2"})
        for _ in range(3):
            t = t.write(lineitem.limit(10), mode="append")
        names = store.ls("emuG://bucket/t3/_delta_log")
        assert any(".checkpoint" in n for n in names)
        assert any(n.endswith("_last_checkpoint") for n in names)
        t2 = DeltaTable(spark, tmp_table_dir, log)
        assert t2.version == t.version
        assert t2.to_df().count() == t.to_df().count()
        assert t2.verify_checksum() == []

    def test_concurrent_handles_second_commit_raises(
            self, spark, lineitem, emu_prefix, tmp_table_dir):
        emu_prefix("emuF://bucket", EmulatedObjectStore())
        log = "emuF://bucket/t2/_delta_log"
        DeltaTable(spark, tmp_table_dir, log).write(lineitem.limit(40))
        a = DeltaTable(spark, tmp_table_dir, log)
        b = DeltaTable(spark, tmp_table_dir, log)
        a.write(lineitem.limit(5), mode="append")
        with pytest.raises(FileExistsError):
            b.write(lineitem.limit(5), mode="append")

    def test_mutation_matrix_on_store(self, spark, lineitem,
                                      emu_prefix, tmp_table_dir):
        """r12: the representative table-lifecycle slice — write, DV
        delete, update, MERGE, OPTIMIZE, restore, VACUUM — with every
        commit (and crc) flowing through the store's conditional put;
        the nearest in-sandbox substitute for the reference's live-
        cloud matrix (/root/reference/tests/test_xdlake_cloud.py)."""
        store = emu_prefix("emuJ://bucket", EmulatedObjectStore())
        log = "emuJ://bucket/tm/_delta_log"
        t = DeltaTable(spark, tmp_table_dir, log).write(
            lineitem.limit(200))
        n0 = t.to_df().count()
        # merge-on-read DELETE: DV bitmap local, descriptor committed
        # through the store
        t = t.delete("l_quantity > 45", mode="merge-on-read")
        n1 = t.to_df().count()
        assert n1 < n0
        assert any((a.extra or {}).get("deletionVector")
                   for a in t.adds.values())
        t = t.update({"l_quantity": "l_quantity + 100"},
                     "l_quantity < 3")
        assert t.to_df(where="l_quantity >= 100").count() > 0
        src = (t.to_df().limit(5)
               .select("l_orderkey", "l_linenumber")
               .withColumn("l_linestatus", F.lit("M")))
        t = t.merge(src, "t.l_orderkey = s.l_orderkey AND "
                         "t.l_linenumber = s.l_linenumber",
                    when_matched_update={"l_linestatus": "s.l_linestatus"})
        assert t.to_df(where="l_linestatus = 'M'").count() > 0
        t = t.optimize()
        assert t.to_df().count() == n1
        # time travel replays the DV state through the store (before
        # vacuum reclaims the no-longer-live bitmap)
        assert DeltaTable(spark, tmp_table_dir, log,
                          version=1).to_df().count() == n1
        t = t.restore(0)
        assert t.to_df().count() == n0
        t.vacuum(retention_hours=0)     # returns removed paths
        t = DeltaTable(spark, tmp_table_dir, log)
        # history replays through the store and shows every mutation
        ops = {h["operation"] for h in t.history()}
        assert {"DELETE", "UPDATE", "MERGE", "RESTORE"} <= ops
        assert any("CREATE" in o or o == "WRITE" for o in ops)
        # a fresh handle sees the same state and a valid crc chain
        t2 = DeltaTable(spark, tmp_table_dir, log)
        assert t2.version == t.version
        assert t2.to_df().count() == n0
        assert t2.verify_checksum() == []
        # every commit + its crc went through the conditional put —
        # at least write/delete/update/merge/restore each commit with
        # a crc: >= 10 conditional puts, and the naive check-then-
        # write fallback was never exercised
        assert store.conditional_put_count >= 10
        assert store.put_count == 0


class TestStreamingOnEmulatedStore:
    """r12 matrix growth: the streaming sink's per-micro-batch commits
    (and the exactly-once MERGE watermark) ride the store's
    conditional put when the _delta_log lives on an object store —
    the cloud deployment shape of a streaming ingest."""

    def test_stream_append_commits_through_store(
            self, spark, lineitem, emu_prefix, tmp_table_dir):
        from xdlake_spark.streaming.ingest import stream_append
        store = emu_prefix("emuS://bucket", EmulatedObjectStore())
        log = "emuS://bucket/st/_delta_log"
        src = f"{tmp_table_dir}/incoming"
        lineitem.limit(300).write.parquet(src)
        stream = spark.readStream.schema(lineitem.schema).parquet(src)
        q = stream_append(stream, f"{tmp_table_dir}/t",
                          f"{tmp_table_dir}/ckpt", log_location=log)
        q.awaitTermination(120)
        t = DeltaTable(spark, f"{tmp_table_dir}/t", log)
        assert t.to_df().count() == 300
        assert list(t.history())[0].get("streaming") is True
        assert store.conditional_put_count >= 2   # commit + crc
        assert store.put_count == 0

    def test_stream_upsert_replay_is_noop_on_store(
            self, spark, lineitem, emu_prefix, tmp_table_dir):
        """A replayed micro-batch must see the SetTransaction
        watermark THROUGH the store and skip — the exactly-once
        guarantee depends on the cloud log, not local state."""
        from xdlake_spark.streaming.ingest import stream_upsert
        emu_prefix("emuT://bucket", EmulatedObjectStore())
        log = "emuT://bucket/su/_delta_log"
        loc = f"{tmp_table_dir}/t"
        base = (lineitem.limit(50)
                .select("l_orderkey", "l_linenumber", "l_quantity")
                .dropDuplicates(["l_orderkey", "l_linenumber"]))
        DeltaTable(spark, loc, log).write(base)
        src = f"{tmp_table_dir}/incoming"
        upd = base.withColumn("l_quantity", F.col("l_quantity") + 1000)
        upd.write.parquet(src)
        stream = spark.readStream.schema(upd.schema).parquet(src)
        v_after = None
        for i in range(2):   # second run replays from a fresh ckpt
            q = stream_upsert(stream, loc, f"{tmp_table_dir}/ckpt{i}",
                              keys=["l_orderkey", "l_linenumber"],
                              app_id="emu-upsert",
                              log_location=log)
            q.awaitTermination(120)
            t = DeltaTable(spark, loc, log)
            assert t.to_df(
                where="l_quantity >= 1000").count() == base.count()
            if v_after is None:
                v_after = t.version
            else:   # replay applied nothing: no new version
                assert t.version == v_after

    def test_racing_writers_rebase_on_store(
            self, spark, lineitem, emu_prefix, tmp_table_dir):
        """A predicate-scoped UPDATE and a merge-on-read DELETE race
        on DISJOINT partitions; the loser's conditional put fails and
        the conflict checker rebases it past the winner's
        provably-disjoint commit — both effects land. (MERGE by
        contrast reads the whole target and conservatively refuses —
        table.py's documented conflict semantics.)"""
        store = emu_prefix("emuU://bucket", EmulatedObjectStore())
        log = "emuU://bucket/rm/_delta_log"
        loc = f"{tmp_table_dir}/t"
        base = (lineitem.limit(80)
                .select("l_orderkey", "l_linenumber", "l_quantity")
                .dropDuplicates(["l_orderkey", "l_linenumber"])
                .withColumn("bkt", F.col("l_orderkey") % 2))
        # partitioned so the two merges rewrite DISJOINT files —
        # that is what makes the loser's rebase provably safe
        DeltaTable(spark, loc, log).write(base, partition_by=["bkt"])
        a = DeltaTable(spark, loc, log)
        b = DeltaTable(spark, loc, log)
        a.update({"l_quantity": "111.0"}, where="bkt = 0")
        # b still believes version 0: its commit of version 1 loses
        # the conditional put and must rebase to version 2
        n_b = base.filter("bkt = 1").count()
        b.delete("bkt = 1", mode="merge-on-read")
        t = DeltaTable(spark, loc, log)
        assert t.version == 2
        assert t.to_df(where="l_quantity = 111.0").count() > 0
        assert t.to_df(where="bkt = 1").count() == 0
        assert t.count() == base.count() - n_b
        assert store.put_count == 0
