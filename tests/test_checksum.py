"""Per-version checksum files (log/checksum.py — delta-spark
VersionChecksum parity): every commit writes ``{version:020}.crc``,
``DeltaTable.verify_checksum()`` validates the reconstructed snapshot
against it, mismatches are loud, foreign tables without checksums
return None, and log cleanup expires them with their JSON."""

import json
import os

from xdlake_spark import DeltaTable
from xdlake_spark.log.checksum import (checksum_filename,
                                       compute_checksum, read_checksum)


def _crc_files(loc):
    log_dir = os.path.join(loc, "_delta_log")
    return sorted(n for n in os.listdir(log_dir) if n.endswith(".crc"))


class TestChecksumWrite:
    def test_every_commit_writes_a_crc(self, spark, lineitem,
                                       tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(200))
        t = t.write(lineitem.limit(100), mode="append")
        t = t.delete("l_quantity > 45")
        assert _crc_files(tmp_table_dir) == [
            checksum_filename(v) for v in (0, 1, 2)]

    def test_crc_payload_matches_snapshot(self, spark, lineitem,
                                          tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(
            lineitem.limit(300), partition_by=["l_returnflag"])
        crc = read_checksum(t.log_location, t.version)
        assert crc is not None
        assert crc["numFiles"] == len(t.adds)
        assert crc["tableSizeBytes"] == sum(
            a.size for a in t.adds.values())
        assert crc["numMetadata"] == 1 and crc["numProtocol"] == 1
        assert crc["metadata"]["id"] == t.log.metadata().id
        assert crc["numDeletionVectorsOpt"] == 0
        assert crc["numDeletedRecordsOpt"] == 0

    def test_dv_delete_counts_deleted_records(self, spark, lineitem,
                                              tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(500))
        n_hit = t.to_df(where="l_quantity > 40").count()
        assert n_hit > 0
        t = t.delete("l_quantity > 40", mode="merge-on-read")
        crc = read_checksum(t.log_location, t.version)
        assert crc["numDeletionVectorsOpt"] >= 1
        assert crc["numDeletedRecordsOpt"] == n_hit
        assert t.verify_checksum() == []

    def test_set_transactions_and_domains_recorded(self, spark,
                                                   lineitem,
                                                   tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(
            lineitem.limit(100), txn=("app-a", 7))
        t = t.cluster_by(["l_partkey"])
        crc = read_checksum(t.log_location, t.version)
        assert {"appId": "app-a", "version": 7} \
            in crc["setTransactions"]
        assert any(d["domain"] == "delta.clustering"
                   for d in crc["domainMetadata"])
        assert t.verify_checksum() == []


class TestChecksumVerify:
    def test_clean_table_verifies_at_every_version(self, spark,
                                                   lineitem,
                                                   tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(200))
        t = t.write(lineitem.limit(50), mode="append")
        t = t.update({"l_quantity": "l_quantity + 1"},
                     "l_quantity < 3")
        for v in (0, 1, 2):
            assert t.load_as_version(v).verify_checksum() == [], v

    def test_verify_after_checkpoint_fast_path(self, spark, lineitem,
                                               tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(80))
        t = t.set_properties({"delta.checkpointInterval": "2"})
        for _ in range(3):
            t = t.write(lineitem.limit(40), mode="append")
        # reopen: state comes from the checkpoint + newer JSON
        t2 = DeltaTable(spark, tmp_table_dir)
        assert t2.verify_checksum() == []

    def test_corrupted_crc_reports_mismatches(self, spark, lineitem,
                                              tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(120))
        path = os.path.join(tmp_table_dir, "_delta_log",
                            checksum_filename(t.version))
        crc = json.load(open(path))
        crc["numFiles"] += 1
        crc["tableSizeBytes"] -= 17
        json.dump(crc, open(path, "w"))
        problems = t.verify_checksum()
        assert len(problems) == 2
        assert any("numFiles" in p for p in problems)
        assert any("tableSizeBytes" in p for p in problems)

    def test_foreign_table_without_crc_returns_none(self, spark,
                                                    lineitem,
                                                    tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(60))
        for n in _crc_files(tmp_table_dir):
            os.remove(os.path.join(tmp_table_dir, "_delta_log", n))
        assert DeltaTable(spark, tmp_table_dir).verify_checksum() \
            is None

    def test_tolerates_foreign_optional_fields(self, spark, lineitem,
                                               tmp_table_dir):
        """Fields this engine does not produce (delta-spark histogram,
        txnId) must not fail verification; fields it produces but a
        foreign writer omitted are simply not checked."""
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(60))
        path = os.path.join(tmp_table_dir, "_delta_log",
                            checksum_filename(t.version))
        crc = json.load(open(path))
        crc["txnId"] = "11111111-2222-3333-4444-555555555555"
        crc["histogramOpt"] = {"sortedBinBoundaries": [0],
                               "fileCounts": [1],
                               "totalBytes": [1]}
        del crc["numDeletedRecordsOpt"]
        json.dump(crc, open(path, "w"))
        assert t.verify_checksum() == []

    def test_compute_is_deterministic(self, spark, lineitem,
                                      tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(90))
        a = compute_checksum(t.log)
        b = compute_checksum(DeltaTable(spark, tmp_table_dir).log)
        assert a == b


class TestIncrementalChecksum:
    """r11: the .crc is DERIVED from the previous version's crc plus
    the commit's actions (delta-spark's incremental model) — O(commit)
    driver work, not an O(live files) manifest fold per commit."""

    def test_derived_equals_full_fold_across_operations(
            self, spark, lineitem, tmp_table_dir):
        """Every commit kind must write exactly the payload the full
        fold would have produced — appends, partitioned overwrite,
        CoW + DV deletes, update, optimize, stat re-adds (replace-in-
        place), properties, restore."""
        t = DeltaTable(spark, tmp_table_dir).write(
            lineitem.limit(300), partition_by=["l_returnflag"])
        steps = [
            lambda t: t.write(lineitem.limit(100), mode="append"),
            lambda t: t.delete("l_quantity > 47"),
            lambda t: t.delete("l_quantity > 44", mode="merge-on-read"),
            lambda t: t.update({"l_quantity": "l_quantity + 1"},
                               "l_quantity < 3"),
            lambda t: t.set_properties({"user.tag": "x"}),
            lambda t: t.optimize(),
            lambda t: t.recompute_stats(all_files=True),
            lambda t: t.restore(2),
        ]
        for step in steps:
            t = step(t)
            stored = read_checksum(t.log_location, t.version)
            fresh = DeltaTable(spark, tmp_table_dir)
            assert stored == compute_checksum(fresh.log), t.version
            assert fresh.verify_checksum() == []

    def test_commit_does_not_fold_manifest(self, spark, lineitem,
                                           tmp_table_dir,
                                           monkeypatch):
        """With a prior crc present, the commit's checksum write must
        never call the full fold — proven by making the fold a bomb."""
        from xdlake_spark.log import checksum as cs
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(80))
        real = cs.compute_checksum

        def _bomb(log):
            raise AssertionError("full manifest fold during commit")

        monkeypatch.setattr(cs, "compute_checksum", _bomb)
        t = t.write(lineitem.limit(40), mode="append")
        monkeypatch.setattr(cs, "compute_checksum", real)
        stored = read_checksum(t.log_location, t.version)
        assert stored is not None
        assert stored == compute_checksum(
            DeltaTable(spark, tmp_table_dir).log)

    def test_replace_in_place_adds_net_out(self, spark, lineitem,
                                           tmp_table_dir):
        """ANALYZE-style stat re-adds (adds with NO removes for
        already-live paths) must not double-count files or bytes."""
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(150))
        before = read_checksum(t.log_location, t.version)
        t = t.recompute_stats(all_files=True)
        after = read_checksum(t.log_location, t.version)
        assert after["numFiles"] == before["numFiles"]
        assert after["tableSizeBytes"] == before["tableSizeBytes"]
        assert t.verify_checksum() == []

    def test_missing_prev_crc_falls_back_to_full_fold(
            self, spark, lineitem, tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(60))
        for n in _crc_files(tmp_table_dir):
            os.remove(os.path.join(tmp_table_dir, "_delta_log", n))
        t = t.write(lineitem.limit(30), mode="append")
        stored = read_checksum(t.log_location, t.version)
        assert stored is not None
        assert stored == compute_checksum(
            DeltaTable(spark, tmp_table_dir).log)

    def test_verify_tolerates_uncomputable_numeric_field(
            self, spark, lineitem, tmp_table_dir):
        """r11 (ADVICE): a stored numeric the snapshot cannot
        recompute (e.g. inCommitTimestampOpt after the head JSON
        expired) is skipped, not reported as a mismatch against 0."""
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(60))
        path = os.path.join(tmp_table_dir, "_delta_log",
                            checksum_filename(t.version))
        crc = json.load(open(path))
        assert "inCommitTimestampOpt" not in compute_checksum(t.log)
        crc["inCommitTimestampOpt"] = 1700000000000
        json.dump(crc, open(path, "w"))
        assert t.verify_checksum() == []


class TestChecksumLifecycle:
    def test_cleanup_metadata_expires_crc_with_json(self, spark,
                                                    lineitem,
                                                    tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(80))
        t = t.set_properties({"delta.checkpointInterval": "2"})
        for _ in range(4):
            t = t.write(lineitem.limit(20), mode="append")
        doomed = t.cleanup_metadata(retention_hours=0.0, dry_run=True)
        crc_doomed = [n for n in doomed if n.endswith(".crc")]
        json_doomed = [n for n in doomed if n.endswith(".json")]
        assert crc_doomed and json_doomed
        assert {n[:20] for n in crc_doomed} \
            <= {n[:20] for n in json_doomed}
        t.cleanup_metadata(retention_hours=0.0)
        left = _crc_files(tmp_table_dir)
        assert checksum_filename(t.version) in left
        for n in crc_doomed:
            assert n not in left

    def test_lost_commit_race_keeps_winner_crc(self, spark, lineitem,
                                               tmp_table_dir):
        """put-if-absent: a replayed checksum write for an existing
        version is a silent no-op, never an error or an overwrite."""
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(50))
        from xdlake_spark.log.checksum import write_version_checksum
        path = os.path.join(tmp_table_dir, "_delta_log",
                            checksum_filename(t.version))
        before = open(path, "rb").read()
        write_version_checksum(t.log_location, t.log)
        assert open(path, "rb").read() == before


class TestPeriodicResync:
    def test_inherited_bad_crc_self_heals_at_interval(
            self, spark, lineitem, tmp_table_dir):
        """r12 (ADVICE r11): derivation seeds from the previous crc,
        so a wrong crc left by a foreign/partial writer propagates
        into every derived crc — until the periodic full-fold resync
        (every 10th version, the checkpoint cadence) recomputes from
        the manifest and heals the chain."""
        t = DeltaTable(spark, tmp_table_dir).write(lineitem.limit(50))
        # corrupt v0's crc the way a buggy foreign writer would
        crc_path = os.path.join(tmp_table_dir, "_delta_log",
                                checksum_filename(0))
        bad = json.load(open(crc_path))
        bad["tableSizeBytes"] = int(bad["tableSizeBytes"]) + 12345
        open(crc_path, "w").write(json.dumps(bad))
        # versions 1..9 derive from the corrupted seed -> all inherit
        # the +12345 offset
        for _ in range(9):
            t = t.write(lineitem.limit(5), mode="append")
        assert t.version == 9
        stored9 = read_checksum(t.log_location, 9)
        true9 = compute_checksum(DeltaTable(spark, tmp_table_dir).log)
        assert stored9["tableSizeBytes"] == \
            true9["tableSizeBytes"] + 12345          # still poisoned
        # version 10 (interval commit) recomputes the full fold
        t = t.write(lineitem.limit(5), mode="append")
        assert t.version == 10
        stored10 = read_checksum(t.log_location, 10)
        fresh = DeltaTable(spark, tmp_table_dir)
        assert stored10 == compute_checksum(fresh.log)  # healed
        assert fresh.verify_checksum() == []
        # and versions after it derive from the HEALED seed
        t = t.write(lineitem.limit(5), mode="append")
        stored11 = read_checksum(t.log_location, 11)
        assert stored11 == compute_checksum(
            DeltaTable(spark, tmp_table_dir).log)
