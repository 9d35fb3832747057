"""Minor log compaction ({start}.{end}.compacted.json — delta-spark
parity): DeltaTable.compact_log() writes a reconciled net-effect file,
snapshot loads read it instead of the covered JSONs, per-version
consumers (history, CDF) are untouched, and log retention expires
compacted files once a checkpoint supersedes them."""

import os

import pytest

from xdlake_spark import DeltaTable
from xdlake_spark.log import DeltaLog, compacted_filename


def _log_files(loc):
    return sorted(os.listdir(os.path.join(loc, "_delta_log")))


def _build(spark, lineitem, loc, n_appends=4):
    t = DeltaTable(spark, loc).write(lineitem.limit(100))
    for i in range(n_appends):
        t = t.write(lineitem.limit(20 + i), mode="append")
    return t


class TestCompactionReplay:
    def test_reopen_uses_compacted_and_state_matches(
            self, spark, lineitem, tmp_table_dir):
        t = _build(spark, lineitem, tmp_table_dir)
        want_adds = dict(t.adds)
        name = t.compact_log(1, 3)
        assert name == compacted_filename(1, 3)
        assert name in _log_files(tmp_table_dir)
        t2 = DeltaTable(spark, tmp_table_dir)
        assert t2.log._compacted_used == [(1, 3)]
        assert set(t2.adds) == set(want_adds)
        assert t2.version == t.version
        assert t2.log.versions == t.log.versions
        assert t2.to_df().count() == t.to_df().count()

    def test_full_range_compaction(self, spark, lineitem,
                                   tmp_table_dir):
        t = _build(spark, lineitem, tmp_table_dir)
        t.compact_log()                      # [0, head]
        t2 = DeltaTable(spark, tmp_table_dir)
        assert t2.log._compacted_used == [(0, t.version)]
        assert set(t2.adds) == set(t.adds)
        # metadata/protocol come from the compacted entry
        assert t2.schema == t.schema

    def test_net_effect_add_then_remove_is_tombstone(
            self, spark, lineitem, tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(200))
        t = t.write(lineitem.limit(50), mode="append")
        t = t.delete()                       # remove everything
        t = t.write(lineitem.limit(30), mode="append")
        expect = set(t.adds)
        t.compact_log(0, t.version)
        t2 = DeltaTable(spark, tmp_table_dir)
        assert t2.log._compacted_used
        assert set(t2.adds) == expect
        assert t2.to_df().count() == 30
        # tombstones survive reconciliation for VACUUM
        entry = t2.log.entries[t.version]
        assert entry.removes

    def test_txn_watermarks_and_schema_evolution_survive(
            self, spark, lineitem, tmp_table_dir):
        from pyspark.sql import functions as F
        t = DeltaTable(spark, tmp_table_dir).write(
            lineitem.limit(40), txn=("app-x", 3))
        t = t.write(lineitem.limit(10), mode="append", txn=("app-x", 9))
        evolved = lineitem.limit(5).withColumn("extra", F.lit(1))
        t = t.write(evolved, mode="append", schema_mode="merge")
        t.compact_log(0, t.version)
        t2 = DeltaTable(spark, tmp_table_dir)
        assert t2.log._compacted_used
        assert t2.log.latest_txn_version("app-x") == 9
        assert "extra" in [f.name for f in t2.schema.fields]

    def test_time_travel_inside_range_falls_back_to_json(
            self, spark, lineitem, tmp_table_dir):
        t = _build(spark, lineitem, tmp_table_dir)
        t.compact_log(1, 4)
        pinned = DeltaTable(spark, tmp_table_dir).load_as_version(2)
        assert pinned.log._compacted_used == []
        assert pinned.version == 2
        # pin at the range end CAN use the compacted file
        at_end = DeltaTable(spark, tmp_table_dir).load_as_version(4)
        assert at_end.log._compacted_used == [(1, 4)]

    def test_history_still_per_version(self, spark, lineitem,
                                       tmp_table_dir):
        t = _build(spark, lineitem, tmp_table_dir)
        want = [(h["version"], h.get("operation"))
                for h in t.history()]
        t.compact_log(0, t.version)
        t2 = DeltaTable(spark, tmp_table_dir)
        assert t2.log._compacted_used
        got = [(h["version"], h.get("operation")) for h in t2.history()]
        assert got == want

    def test_cdf_unaffected(self, spark, lineitem, tmp_table_dir):
        t = _build(spark, lineitem, tmp_table_dir, n_appends=3)
        before = t.table_changes(0).count()
        t.compact_log(0, t.version)
        after = DeltaTable(spark, tmp_table_dir).table_changes(0).count()
        assert after == before

    def test_put_if_absent_idempotent(self, spark, lineitem,
                                      tmp_table_dir):
        t = _build(spark, lineitem, tmp_table_dir)
        a = t.compact_log(1, 3)
        b = t.compact_log(1, 3)              # second call: no error
        assert a == b

    def test_greedy_cover_prefers_longest(self, spark, lineitem,
                                          tmp_table_dir):
        t = _build(spark, lineitem, tmp_table_dir, n_appends=5)
        t.compact_log(1, 2)
        t.compact_log(1, 4)
        t2 = DeltaTable(spark, tmp_table_dir)
        assert t2.log._compacted_used == [(1, 4)]
        assert set(t2.adds) == set(t.adds)

    def test_bad_ranges_raise(self, spark, lineitem, tmp_table_dir):
        t = _build(spark, lineitem, tmp_table_dir, n_appends=1)
        with pytest.raises(ValueError):
            t.compact_log(1, 1)
        with pytest.raises(ValueError):
            t.compact_log(0, 99)


class TestCompactionWithCheckpointAndCleanup:
    def test_composes_with_checkpoint(self, spark, lineitem,
                                      tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(60))
        t = t.set_properties({"delta.checkpointInterval": "3"})
        for i in range(4):
            t = t.write(lineitem.limit(10 + i), mode="append")
        from xdlake_spark.log.checkpoint import last_checkpoint_version
        cp = last_checkpoint_version(t.log_location)
        assert cp is not None and cp + 2 <= t.version
        t.compact_log(cp + 1, t.version)
        t2 = DeltaTable(spark, tmp_table_dir)
        assert t2.log._compacted_used == [(cp + 1, t.version)]
        assert set(t2.adds) == set(t.adds)
        assert t2.verify_checksum() == []

    def test_cleanup_expires_superseded_compactions(
            self, spark, lineitem, tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(60))
        t = t.write(lineitem.limit(10), mode="append")
        t = t.write(lineitem.limit(10), mode="append")
        t.compact_log(0, 2)
        # checkpoint beyond the compacted range, then expire
        t = t.set_properties({"delta.checkpointInterval": "2"})
        t = t.write(lineitem.limit(10), mode="append")
        doomed = t.cleanup_metadata(retention_hours=0.0)
        assert compacted_filename(0, 2) in doomed
        assert compacted_filename(0, 2) not in _log_files(tmp_table_dir)
        # the table still opens and scans
        t2 = DeltaTable(spark, tmp_table_dir)
        assert t2.to_df().count() == t.to_df().count()

    def test_default_range_starts_after_checkpoint(
            self, spark, lineitem, tmp_table_dir):
        """r11 (ADVICE): the loader only consumes compacted ranges
        starting strictly after the newest checkpoint, so a no-args
        compact_log() on a checkpointed table must default its start
        past the checkpoint — not write a file replay never reads."""
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(60))
        t = t.set_properties({"delta.checkpointInterval": "3"})
        for i in range(4):
            t = t.write(lineitem.limit(10 + i), mode="append")
        from xdlake_spark.log.checkpoint import last_checkpoint_version
        cp = last_checkpoint_version(t.log_location)
        assert cp is not None and cp + 2 <= t.version
        name = t.compact_log()               # no explicit range
        assert name == compacted_filename(cp + 1, t.version)
        t2 = DeltaTable(spark, tmp_table_dir)
        assert t2.log._compacted_used == [(cp + 1, t.version)]
        assert set(t2.adds) == set(t.adds)

    def test_cleanup_expires_orphaned_compaction(
            self, spark, lineitem, tmp_table_dir):
        """r11 (ADVICE): once the JSONs a compacted file covers were
        expired by an earlier cleanup, no commit timestamp survives
        for its end version — the file must still expire (it only
        accelerates replay of unreachable versions), not be retained
        forever."""
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(60))
        t = t.write(lineitem.limit(10), mode="append")
        t = t.write(lineitem.limit(10), mode="append")
        t.compact_log(0, 2)
        t = t.set_properties({"delta.checkpointInterval": "2"})
        t = t.write(lineitem.limit(10), mode="append")   # ckpt at 4
        # simulate the earlier cleanup that already removed the
        # covered JSONs but (crash, race) left the compacted file
        for v in (0, 1, 2):
            os.remove(os.path.join(tmp_table_dir, "_delta_log",
                                   f"{v:020}.json"))
        t2 = DeltaTable(spark, tmp_table_dir)
        doomed = t2.cleanup_metadata(retention_hours=0.0)
        assert compacted_filename(0, 2) in doomed
        assert compacted_filename(0, 2) not in _log_files(tmp_table_dir)
        assert DeltaTable(spark, tmp_table_dir).to_df().count() \
            == t.to_df().count()

    def test_unreadable_compacted_falls_back(self, spark, lineitem,
                                             tmp_table_dir):
        t = _build(spark, lineitem, tmp_table_dir)
        name = t.compact_log(1, 3)
        path = os.path.join(tmp_table_dir, "_delta_log", name)
        with open(path, "w") as f:
            f.write("{not json\n")
        t2 = DeltaTable(spark, tmp_table_dir)
        assert t2.log._compacted_used == []
        assert set(t2.adds) == set(t.adds)


class TestCompactEntriesUnit:
    def test_remove_then_readd_stays_add(self):
        from xdlake_spark.log import (Add, DeltaLogEntry, Remove,
                                      compact_entries)
        a1 = Add(path="f1", size=1, modificationTime=0,
                 partitionValues={})
        entries = {
            0: DeltaLogEntry([a1]),
            1: DeltaLogEntry([a1.to_remove(),
                              Add(path="f1", size=1,
                                  modificationTime=1,
                                  partitionValues={},
                                  extra={"deletionVector": {
                                      "storageType": "u",
                                      "pathOrInlineDv": "x",
                                      "offset": 1, "sizeInBytes": 2,
                                      "cardinality": 3}})]),
        }
        net = compact_entries(entries, 0, 1)
        assert len(net.adds) == 1
        assert net.adds[0].extra.get("deletionVector")
        assert not net.removes

    def test_missing_version_raises(self):
        from xdlake_spark.log import DeltaLogEntry, compact_entries
        with pytest.raises(ValueError, match="missing"):
            compact_entries({0: DeltaLogEntry([])}, 0, 2)


class TestCompactEntriesProperty:
    """Hypothesis: for ANY action sequence, replaying [compacted(a,b)]
    + the remaining commits must reproduce exactly the state of
    replaying every commit — live files, tombstone set, txn
    watermarks, domains, metadata/protocol identity. Driver-side only
    (no Spark), so hundreds of random logs run in seconds."""

    @staticmethod
    def _random_log(draw):
        from hypothesis import strategies as st
        from xdlake_spark.log import (Add, DeltaLogEntry,
                                      DomainMetadata, SetTransaction)
        n_versions = draw(st.integers(2, 8))
        paths = [f"p{i}" for i in range(draw(st.integers(1, 6)))]
        live: dict = {}
        entries = {}
        for v in range(n_versions):
            actions = []
            for _ in range(draw(st.integers(0, 4))):
                p = draw(st.sampled_from(paths))
                if p in live and draw(st.booleans()):
                    actions.append(live.pop(p).to_remove())
                else:
                    a = Add(path=p, size=draw(st.integers(1, 100)),
                            modificationTime=v, partitionValues={})
                    live[p] = a
                    actions.append(a)
            if draw(st.booleans()):
                actions.append(SetTransaction(
                    appId=draw(st.sampled_from(["x", "y"])),
                    version=draw(st.integers(0, 20))))
            if draw(st.booleans()):
                actions.append(DomainMetadata(
                    domain=draw(st.sampled_from(["d1", "d2"])),
                    configuration="{}",
                    removed=draw(st.booleans())))
            entries[v] = DeltaLogEntry(actions)
        return entries

    def test_compacted_replay_equals_full_replay(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st
        from xdlake_spark.log import DeltaLog, compact_entries

        def state(log):
            adds = log.add_actions()
            txns = {app: log.latest_txn_version(app)
                    for app in ("x", "y")}
            doms = {d: (dm.configuration, dm.removed)
                    for d, dm in log.live_domain_metadata().items()}
            return ({p: (a.size, a.modificationTime)
                     for p, a in adds.items()}, txns, doms)

        @settings(max_examples=200, deadline=None)
        @given(st.data())
        def run(data):
            entries = self._random_log(data.draw)
            versions = sorted(entries)
            a = data.draw(st.sampled_from(versions[:-1]))
            b = data.draw(st.sampled_from(
                [v for v in versions if v > a]))
            net = compact_entries(entries, a, b)
            collapsed = {v: e for v, e in entries.items()
                         if v < a or v > b}
            collapsed[b] = net
            assert state(DeltaLog(collapsed)) \
                == state(DeltaLog(entries))
            # tombstones: every path removed-and-not-re-added inside
            # [a, b] must still carry a remove in the net entry
            lastact: dict = {}
            for v in range(a, b + 1):
                for act in entries[v].actions:
                    if hasattr(act, "path"):
                        lastact[act.path] = type(act).__name__
            net_removes = {r.path for r in net.removes}
            for p, kind in lastact.items():
                if kind == "Remove":
                    assert p in net_removes

        run()
