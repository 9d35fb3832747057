"""Streaming MERGE upsert sink (streaming/ingest.py stream_upsert):
per-batch MERGE with SetTransaction idempotence."""

import glob
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from xdlake_spark import DeltaTable
from xdlake_spark.sources.datasource import register
from xdlake_spark.streaming.ingest import stream_upsert


@pytest.fixture()
def registered(spark):
    try:
        register(spark)
    except Exception:
        pass
    return spark


def _kv(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, n long")


class TestMergeTxn:
    def test_txn_stamped_atomically(self, spark, tmp_table_dir):
        t = DeltaTable(spark, tmp_table_dir).write(
            _kv(spark, [(1, "a", 1), (2, "b", 1)]))
        t = t.merge(_kv(spark, [(2, "B", 2), (3, "c", 1)]),
                    "t.k = s.k",
                    when_matched_update={"v": "s.v", "n": "s.n"},
                    when_not_matched_insert={"k": "s.k", "v": "s.v",
                                             "n": "s.n"},
                    txn=("app-1", 7))
        assert t.txn_version("app-1") == 7
        assert t.txn_version("other") is None
        got = {r.k: (r.v, r.n) for r in t.to_df().collect()}
        assert got == {1: ("a", 1), 2: ("B", 2), 3: ("c", 1)}

    def test_insert_condition_gates_unmatched_rows(self, spark,
                                                   tmp_table_dir):
        """whenNotMatchedInsert(condition=...) parity (r9): unmatched
        source rows failing the gate are dropped, not inserted."""
        t = DeltaTable(spark, tmp_table_dir).write(
            _kv(spark, [(1, "a", 1)]))
        t = t.merge(_kv(spark, [(2, "keep", 5), (3, "drop", 99)]),
                    "t.k = s.k",
                    when_not_matched_insert={"k": "s.k", "v": "s.v",
                                             "n": "s.n"},
                    when_not_matched_insert_condition="s.n < 10")
        got = {r.k: (r.v, r.n) for r in t.to_df().collect()}
        assert got == {1: ("a", 1), 2: ("keep", 5)}


class TestStreamUpsert:
    def test_upsert_and_replay_is_noop(self, registered, tmp_path):
        spark = registered
        src_loc = str(tmp_path / "src")
        tgt_loc = str(tmp_path / "tgt")
        ckpt = tempfile.mkdtemp()

        DeltaTable(spark, tgt_loc).write(
            _kv(spark, [(1, "a", 1), (2, "b", 1)]))
        DeltaTable(spark, src_loc).write(
            _kv(spark, [(2, "B", 2), (3, "c", 1), (3, "c", 1)]))

        def drain():
            q = stream_upsert(
                spark.readStream.format("xdlake").load(src_loc),
                tgt_loc, ckpt, keys=["k"])
            try:
                q.awaitTermination(120)
            finally:
                q.stop()
                q.awaitTermination(30)

        drain()
        t = DeltaTable(spark, tgt_loc)
        got = {r.k: (r.v, r.n) for r in t.to_df().collect()}
        assert got == {1: ("a", 1), 2: ("B", 2), 3: ("c", 1)}
        v_after = t.version

        # at-least-once replay: wipe the commit marker so Spark re-runs
        # the last micro-batch — the txn watermark must make it a no-op
        for f in glob.glob(f"{ckpt}/commits/*") \
                + glob.glob(f"{ckpt}/commits/.*crc"):
            os.remove(f)
        drain()
        t = DeltaTable(spark, tgt_loc)
        assert t.version == v_after          # no new commit
        got = {r.k: (r.v, r.n) for r in t.to_df().collect()}
        assert got == {1: ("a", 1), 2: ("B", 2), 3: ("c", 1)}

    def test_incremental_second_batch(self, registered, tmp_path):
        spark = registered
        src_loc = str(tmp_path / "src")
        tgt_loc = str(tmp_path / "tgt")
        ckpt = tempfile.mkdtemp()
        DeltaTable(spark, tgt_loc).write(_kv(spark, [(1, "a", 1)]))
        src = DeltaTable(spark, src_loc).write(
            _kv(spark, [(1, "A", 2)]))

        def drain():
            q = stream_upsert(
                spark.readStream.format("xdlake").load(src_loc),
                tgt_loc, ckpt, keys=["k"])
            try:
                q.awaitTermination(120)
            finally:
                q.stop()
                q.awaitTermination(30)

        drain()
        src.write(_kv(spark, [(9, "z", 1)]), mode="append")
        drain()
        got = {r.k: (r.v, r.n)
               for r in DeltaTable(spark, tgt_loc).to_df().collect()}
        assert got == {1: ("A", 2), 9: ("z", 1)}


class TestStreamUpsertScreened:
    """Bloom-screened streaming upsert (streaming/ingest.py
    stream_upsert_screened, r9): identical final table state to the
    unscreened stream_upsert, with the MERGE probe side shrunk to the
    maybe-present set — the screening evidence comes back through the
    stats hook."""

    def _run_both(self, spark, tmp_path, hist_rows, batch_rows):
        from xdlake_spark.streaming.ingest import \
            stream_upsert_screened
        stats: list = []
        tables = {}
        for name, fn, kwargs in (
                ("plain", stream_upsert, {}),
                ("screened", stream_upsert_screened,
                 {"stats": stats, "m_bits": 4096})):
            src_loc = str(tmp_path / f"src_{name}")
            tgt_loc = str(tmp_path / f"tgt_{name}")
            DeltaTable(spark, tgt_loc).write(_kv(spark, hist_rows))
            DeltaTable(spark, src_loc).write(_kv(spark, batch_rows))
            q = fn(spark.readStream.format("xdlake").load(src_loc),
                   tgt_loc, tempfile.mkdtemp(), keys=["k"], **kwargs)
            try:
                q.awaitTermination(120)
            finally:
                q.stop()
                q.awaitTermination(30)
            tables[name] = DeltaTable(spark, tgt_loc)
        return tables, stats

    def test_identical_state_fewer_probe_rows(self, registered,
                                              tmp_path):
        spark = registered
        hist = [(i, "h", 1) for i in range(20)]
        # batch: 5 duplicates of history + 40 certainly-new keys
        batch = [(i, "H", 2) for i in range(5)] \
            + [(1000 + i, "n", 1) for i in range(40)]
        tables, stats = self._run_both(spark, tmp_path, hist, batch)
        want = {r.k: (r.v, r.n)
                for r in tables["plain"].to_df().collect()}
        got = {r.k: (r.v, r.n)
               for r in tables["screened"].to_df().collect()}
        assert got == want
        assert len(want) == 60
        # the screen's whole point: the merge probe side is (close to)
        # the 5-row duplicate tail, never the 45-row batch — false
        # positives allowed, false negatives not
        [s] = stats
        assert s["batch_rows"] == 45
        assert 5 <= s["probe_rows"] < 20
        assert s["appended"] == s["batch_rows"] - s["probe_rows"]
        assert tables["screened"].count() == 60

    def test_screened_replay_is_noop(self, registered, tmp_path):
        from xdlake_spark.streaming.ingest import \
            stream_upsert_screened
        spark = registered
        src_loc = str(tmp_path / "src")
        tgt_loc = str(tmp_path / "tgt")
        ckpt = tempfile.mkdtemp()
        DeltaTable(spark, tgt_loc).write(_kv(spark, [(1, "a", 1)]))
        DeltaTable(spark, src_loc).write(
            _kv(spark, [(1, "A", 2), (9, "x", 1)]))

        def drain():
            q = stream_upsert_screened(
                spark.readStream.format("xdlake").load(src_loc),
                tgt_loc, ckpt, keys=["k"])
            try:
                q.awaitTermination(120)
            finally:
                q.stop()
                q.awaitTermination(30)

        drain()
        t = DeltaTable(spark, tgt_loc)
        got = {r.k: (r.v, r.n) for r in t.to_df().collect()}
        assert got == {1: ("A", 2), 9: ("x", 1)}
        v_after = t.version
        for f in glob.glob(f"{ckpt}/commits/*") \
                + glob.glob(f"{ckpt}/commits/.*crc"):
            os.remove(f)
        drain()
        t = DeltaTable(spark, tgt_loc)
        assert t.version == v_after
        got = {r.k: (r.v, r.n) for r in t.to_df().collect()}
        assert got == {1: ("A", 2), 9: ("x", 1)}


class TestStreamApplyChanges:
    """CDC replication (streaming/ingest.py stream_apply_changes, r9):
    a readChangeFeed stream from table A applied onto replica B via
    one net-effect MERGE per batch must converge B to A's exact state
    through inserts, updates, CoW deletes and cdc commits — and stay
    idempotent under batch replay."""

    def _drain(self, spark, src_loc, tgt_loc, ckpt):
        from xdlake_spark.streaming.ingest import stream_apply_changes
        q = stream_apply_changes(
            spark.readStream.format("xdlake")
            .option("readChangeFeed", "true").load(src_loc),
            tgt_loc, ckpt, keys=["k"])
        try:
            q.awaitTermination(180)
        finally:
            q.stop()
            q.awaitTermination(30)

    def test_replica_converges_through_dml(self, registered, tmp_path):
        spark = registered
        src_loc, tgt_loc = str(tmp_path / "a"), str(tmp_path / "b")
        ckpt = tempfile.mkdtemp()
        a = DeltaTable(spark, src_loc).write(
            _kv(spark, [(i, "v", 1) for i in range(10)]))     # v0
        a = a.set_properties(
            {"delta.enableChangeDataFeed": "true"})           # v1
        a = a.delete("k >= 7")                                # v2 cdc
        a = a.update({"v": "'up'"}, "k < 3")                  # v3 cdc
        DeltaTable(spark, tgt_loc).write(
            _kv(spark, []).limit(0))                          # empty B
        self._drain(spark, src_loc, tgt_loc, ckpt)
        want = {r.k: (r.v, r.n) for r in a.to_df().collect()}
        got = {r.k: (r.v, r.n)
               for r in DeltaTable(spark, tgt_loc).to_df().collect()}
        assert got == want and len(want) == 7
        # more DML on A: incremental batches apply the delta only
        a = a.write(_kv(spark, [(100, "new", 5)]), mode="append")
        a = a.delete("k = 0")
        self._drain(spark, src_loc, tgt_loc, ckpt)
        want = {r.k: (r.v, r.n) for r in a.to_df().collect()}
        got = {r.k: (r.v, r.n)
               for r in DeltaTable(spark, tgt_loc).to_df().collect()}
        assert got == want
        # delete for a key the replica never held: net no-op, and an
        # insert+delete inside one span nets to absence
        a = a.write(_kv(spark, [(200, "ghost", 1)]), mode="append")
        a = a.delete("k = 200")
        self._drain(spark, src_loc, tgt_loc, ckpt)
        got = {r.k for r in
               DeltaTable(spark, tgt_loc).to_df().collect()}
        assert 200 not in got
        assert got == {r.k for r in a.to_df().collect()}

    def test_apply_replay_is_noop(self, registered, tmp_path):
        spark = registered
        src_loc, tgt_loc = str(tmp_path / "a"), str(tmp_path / "b")
        ckpt = tempfile.mkdtemp()
        a = DeltaTable(spark, src_loc).write(
            _kv(spark, [(1, "a", 1), (2, "b", 1)]))
        a.delete("k = 2")
        DeltaTable(spark, tgt_loc).write(_kv(spark, []).limit(0))
        self._drain(spark, src_loc, tgt_loc, ckpt)
        t = DeltaTable(spark, tgt_loc)
        v_after = t.version
        assert {r.k for r in t.to_df().collect()} == {1}
        for f in glob.glob(f"{ckpt}/commits/*") \
                + glob.glob(f"{ckpt}/commits/.*crc"):
            os.remove(f)
        self._drain(spark, src_loc, tgt_loc, ckpt)
        t = DeltaTable(spark, tgt_loc)
        assert t.version == v_after
        assert {r.k for r in t.to_df().collect()} == {1}

    def test_partial_replay_appends_exact_owed_rows(self, registered,
                                                    tmp_path):
        """Crash between the merge and append commits (r9 review):
        the replay must NOT re-screen with the reseeded filter (not
        replay-stable — previously-fresh rows could misroute into the
        watermark-skipped merge and be lost); the owed append half is
        an exact key anti-join. Simulated by pre-stamping the merge
        watermark for batch 0 with the merge half's table state."""
        from xdlake_spark.streaming.ingest import \
            stream_upsert_screened
        spark = registered
        src_loc, tgt_loc = str(tmp_path / "src"), str(tmp_path / "tgt")
        ckpt = str(tmp_path / "ck")
        # target holds key 1; incoming batch: update(1) + fresh 2, 3
        t = DeltaTable(spark, tgt_loc).write(
            _kv(spark, [(1, "a", 1)]))
        DeltaTable(spark, src_loc).write(
            _kv(spark, [(1, "A", 2), (2, "n", 1), (3, "n", 1)]))
        # simulate the crashed first attempt: the merge half landed
        # (key 1 updated, watermark stamped), the append half did not
        aid = f"stream_upsert:{ckpt}"
        t = t.merge(_kv(spark, [(1, "A", 2)]), "t.k = s.k",
                    when_matched_update={"v": "s.v", "n": "s.n"},
                    when_not_matched_insert={"k": "s.k", "v": "s.v",
                                             "n": "s.n"},
                    txn=(f"{aid}:merge", 0))
        stats: list = []
        q = stream_upsert_screened(
            spark.readStream.format("xdlake").load(src_loc),
            tgt_loc, ckpt, keys=["k"], stats=stats)
        try:
            q.awaitTermination(120)
        finally:
            q.stop()
            q.awaitTermination(30)
        got = {r.k: (r.v, r.n)
               for r in DeltaTable(spark, tgt_loc).to_df().collect()}
        assert got == {1: ("A", 2), 2: ("n", 1), 3: ("n", 1)}
        [s] = stats
        assert s.get("replayed") is True
        assert s["appended"] == 2 and s["probe_rows"] == 0

    def test_same_commit_delete_insert_survivor_lives(
            self, registered, tmp_path):
        """A CoW overwrite on the source (no cdc files) derives
        delete+insert at the SAME _commit_version for every surviving
        key; the net-effect tie-break must let the non-delete win —
        the replica keeps the key (r9 review: alphabetical ordering
        made 'delete' win and wiped live keys)."""
        spark = registered
        src_loc, tgt_loc = str(tmp_path / "a"), str(tmp_path / "b")
        a = DeltaTable(spark, src_loc).write(
            _kv(spark, [(1, "x", 1), (2, "y", 1)]))
        # overwrite keeps key 1 (new value), drops key 2
        a = a.write(_kv(spark, [(1, "X", 9)]), mode="overwrite")
        DeltaTable(spark, tgt_loc).write(_kv(spark, []).limit(0))
        self._drain(spark, src_loc, tgt_loc, tempfile.mkdtemp())
        got = {r.k: (r.v, r.n)
               for r in DeltaTable(spark, tgt_loc).to_df().collect()}
        assert got == {1: ("X", 9)}


class TestStreamUpsertScreenedCreates:
    def test_missing_target_created_by_first_batch(self, registered,
                                                   tmp_path):
        """A screened stream pointed at a NOT-YET-EXISTING table must
        create it on the first batch instead of crashing on the empty
        log's .version (r10 fix)."""
        import tempfile
        from xdlake_spark.streaming.ingest import \
            stream_upsert_screened
        spark = registered
        src_loc = str(tmp_path / "src")
        tgt_loc = str(tmp_path / "tgt")
        DeltaTable(spark, src_loc).write(
            _kv(spark, [(1, "a", 1), (2, "b", 1)]))
        q = stream_upsert_screened(
            spark.readStream.format("xdlake").load(src_loc),
            tgt_loc, tempfile.mkdtemp(), keys=["k"])
        try:
            q.awaitTermination(120)
        finally:
            q.stop()
            q.awaitTermination(30)
        got = {r.k: r.v for r in DeltaTable(spark, tgt_loc)
               .to_df().collect()}
        assert got == {1: "a", 2: "b"}


class TestStreamIngestNearDup:
    """stream_ingest_neardup (r10): per-micro-batch near-dup admission
    — replaying the batches through the sink must land exactly the
    keeper set of the batch operators applied cumulatively, and a
    replayed batch must be a no-op."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    B1 = [(1, "the quick brown fox jumps over the lazy dog"),
          (2, "the quick brown fox jumps over the lazy cat"),
          (3, "completely different text about spark engines here")]
    B2 = [(4, "the quick brown fox jumps over a lazy dog"),
          (5, "another unique document text with novel content "
              "entirely")]
    B3 = [(6, "another unique document texts with novel content "
              "entirely"),
          (7, "seventh doc standalone content nothing shared at all")]

    THRESH = 0.3

    def _batch_twin(self, spark):
        """The cumulative batch pipeline: internal pair dedup, then
        cross-corpus admission against the accumulated keepers."""
        from xdlake_spark.operators.dedup import (
            cross_corpus_dedup, dedup_keepers_from_pairs,
            ngram_jaccard_pairs)
        acc = None
        for rows in (self.B1, self.B2, self.B3):
            b = self._docs(spark, rows)
            pairs = ngram_jaccard_pairs(b, threshold=self.THRESH)
            kept = dedup_keepers_from_pairs(b, pairs)
            if acc is not None:
                kept = cross_corpus_dedup(kept, acc,
                                          threshold=self.THRESH)
            acc = kept if acc is None else acc.unionByName(kept)
        return sorted(r.doc_id for r in acc.collect())

    def test_stream_matches_cumulative_batch_semantics(
            self, registered, tmp_path):
        import tempfile
        from xdlake_spark.streaming.ingest import stream_ingest_neardup
        spark = registered
        src_loc = str(tmp_path / "src")
        tgt_loc = str(tmp_path / "tgt")
        ckpt = tempfile.mkdtemp()
        stats = []

        def drain():
            q = stream_ingest_neardup(
                spark.readStream.format("xdlake").load(src_loc),
                tgt_loc, ckpt, threshold=self.THRESH, stats=stats)
            try:
                q.awaitTermination(180)
            finally:
                q.stop()
                q.awaitTermination(30)

        src = DeltaTable(spark, src_loc).write(
            self._docs(spark, self.B1))
        drain()
        src = src.write(self._docs(spark, self.B2), mode="append")
        drain()
        src = src.write(self._docs(spark, self.B3), mode="append")
        drain()

        got = sorted(r.doc_id
                     for r in DeltaTable(spark, tgt_loc)
                     .to_df().collect())
        want = self._batch_twin(spark)
        assert got == want
        # the fixture is built so every interesting path fires:
        # within-batch near-dup (2), cross-corpus near-dup (4 vs 1,
        # 6 vs 5), and clean admits (3, 5, 7)
        assert 2 not in got and 4 not in got and 6 not in got
        assert {1, 3, 5, 7} <= set(got)

        # replay: draining the already-consumed source again (fresh
        # checkpoint, same batches replayed onto a table that already
        # holds them) must not change the table — the txn watermark
        # path, plus the guarantee that admitted rows are not
        # re-screened against themselves
        v = DeltaTable(spark, tgt_loc).version
        drain()                       # same checkpoint: no new batch
        assert DeltaTable(spark, tgt_loc).version == v
        got2 = sorted(r.doc_id
                      for r in DeltaTable(spark, tgt_loc)
                      .to_df().collect())
        assert got2 == want
        # stats recorded one row per applied batch
        assert [s["batch"] for s in stats] == [0, 1, 2]
        assert stats[0]["batch_rows"] == 3
        assert stats[0]["after_self_dedup"] == 2
        assert stats[0]["admitted"] == 2


class TestStreamIngestSemantic:
    """stream_ingest_semantic (r10): per-micro-batch embedding-cosine
    admission with fixed centroids — within-batch SemDeDup pruning,
    then cluster-bounded screening against the accumulated table;
    replays are watermark no-ops."""

    CENTS = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    THRESH = 0.95

    B1 = [(1, [2.0, 0.0, 0.0, 0.0]),       # cluster 0, on-centroid
          (2, [0.9, 0.1, 0.0, 0.0]),       # near-dup of 1, farther
          #                                  from centroid -> survives
          (3, [0.0, 1.0, 0.0, 0.1])]       # cluster 1, clean
    B2 = [(4, [0.88, 0.12, 0.0, 0.0]),     # near-dup of survivor 2
          (5, [0.1, 0.9, 0.3, 0.0])]       # cluster 1, cos vs 3 ~.93
    B3 = [(6, [0.12, 0.88, 0.31, 0.0]),    # near-dup of 5
          (7, [0.0, 0.6, -0.8, 0.0])]      # cluster 1, clean

    def _emb(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")

    def _twin(self):
        """Arrival-order numpy replay of the admission rules."""
        import numpy as np
        cents = np.array(self.CENTS)
        acc = {}
        for rows in (self.B1, self.B2, self.B3):
            ids = [r[0] for r in rows]
            X = np.array([r[1] for r in rows], dtype="float64")
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            cl = ((X[:, None, :] - cents[None]) ** 2).sum(2).argmin(1)
            kept = []
            for c in sorted(set(cl)):
                idx = [i for i in range(len(ids)) if cl[i] == c]
                cv = cents[c] / np.linalg.norm(cents[c])
                csim = Xn[idx] @ cv
                order = [idx[j] for j in np.lexsort(
                    (np.array(ids)[idx], csim))]
                for pos, i in enumerate(order):
                    prior = max((float(Xn[i] @ Xn[j])
                                 for j in order[:pos]), default=-1.0)
                    if pos == 0 or prior <= self.THRESH:
                        kept.append(i)
            for i in kept:
                c = cl[i]
                clash = any(
                    ac == c and float(Xn[i] @ av) >= self.THRESH
                    for (ac, av) in acc.values())
                if not clash:
                    acc[ids[i]] = (c, Xn[i])
        return sorted(acc)

    def test_stream_matches_twin_and_replays_noop(self, registered,
                                                  tmp_path):
        import tempfile
        from xdlake_spark.streaming.ingest import stream_ingest_semantic
        spark = registered
        src_loc = str(tmp_path / "src")
        tgt_loc = str(tmp_path / "tgt")
        ckpt = tempfile.mkdtemp()
        stats = []

        def drain():
            q = stream_ingest_semantic(
                spark.readStream.format("xdlake").load(src_loc),
                tgt_loc, ckpt, centroids=self.CENTS,
                threshold=self.THRESH, stats=stats)
            try:
                q.awaitTermination(180)
            finally:
                q.stop()
                q.awaitTermination(30)

        src = DeltaTable(spark, src_loc).write(self._emb(spark, self.B1))
        drain()
        src = src.write(self._emb(spark, self.B2), mode="append")
        drain()
        src = src.write(self._emb(spark, self.B3), mode="append")
        drain()

        got = sorted(r.vec_id for r in
                     DeltaTable(spark, tgt_loc).to_df().collect())
        assert got == self._twin()
        # every interesting path fires: within-batch prune (1 loses
        # to the farther-from-centroid 2), cross-corpus prunes
        # (4 vs 2, 6 vs 5), clean admits across both clusters
        assert got == [2, 3, 5, 7]

        v = DeltaTable(spark, tgt_loc).version
        drain()                      # same checkpoint: nothing new
        assert DeltaTable(spark, tgt_loc).version == v
        assert sorted(r.vec_id for r in
                      DeltaTable(spark, tgt_loc).to_df().collect()) \
            == [2, 3, 5, 7]
        assert [s["batch"] for s in stats] == [0, 1, 2]
        assert stats[0] == {"batch": 0, "batch_rows": 3,
                            "after_self_dedup": 2, "admitted": 2}
        assert stats[1]["admitted"] == 1
        assert stats[2]["admitted"] == 1
