"""Structured Streaming integration.

- ``stream_append``: readStream -> foreachBatch -> DeltaTable append. Each
  micro-batch commits one delta version with a STREAMING UPDATE commitInfo
  (exactly-once within a batch via the log's put-if-absent commit; Spark's
  checkpoint provides at-least-once batch replay, and replayed batches
  collide on the version file rather than double-committing).
- windowed/sessionized aggregations over the ``events`` stream shape
  (event_id, ts, user_id, event_type, value) with watermarks for late data.

The reference is batch-only (SURVEY §2.4) — this extends its surface per
the build brief. The aggregation builders work on BOTH batch and streaming
DataFrames (same DataFrame API), which is how tests oracle-check them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..log.actions import Operation, TableCommit
from ..table import DeltaTable


def stream_append(stream_df: DataFrame, table_location: str,
                  checkpoint_dir: str, partition_by: list[str] | None = None,
                  trigger_once: bool = True,
                  log_location: "str | None" = None):
    """Append a streaming DataFrame into a delta table, one commit per
    micro-batch. Returns the StreamingQuery.

    ``log_location`` splits the _delta_log onto a different store than
    the data (the cloud deployment shape: log commits ride the store's
    conditional put while executors write data where they run).
    """
    spark = stream_df.sparkSession

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        table = DeltaTable(spark, table_location, log_location)
        table.write(batch_df, mode="append", partition_by=partition_by,
                    custom_metadata={"streaming": True,
                                     "batchId": int(batch_id)})

    writer = (stream_df.writeStream
              .foreachBatch(commit_batch)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_upsert(stream_df: DataFrame, table_location: str,
                  checkpoint_dir: str, keys: list[str],
                  trigger_once: bool = True,
                  app_id: "str | None" = None,
                  log_location: "str | None" = None):
    """Streaming MERGE upsert (the canonical delta CDC-apply pattern):
    each micro-batch MERGEs into the target on ``keys`` — matched rows
    update, new rows insert. Returns the StreamingQuery.

    Exactly-once on at-least-once batch delivery: every applied batch
    commits a SetTransaction watermark (``app_id``, defaulting to the
    checkpoint dir, x batch id) ATOMICALLY with the merge; a replayed
    batch sees ``txn_version >= batch_id`` and is a pure no-op, so a
    crash between "merge committed" and "offset checkpointed" cannot
    double-apply updates — the guarantee plain appends get from
    version-file collisions does NOT extend to merges (a replayed merge
    of the same rows still rewrites files), hence the watermark.

    Within a batch, later duplicates of a key are dropped
    (``dropDuplicates(keys)``) — Delta's multiple-source-rows-match
    guard would otherwise refuse the merge.
    """
    spark = stream_df.sparkSession
    cols = stream_df.columns
    cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    upd = {c: f"s.{c}" for c in cols if c not in keys}
    ins = {c: f"s.{c}" for c in cols}
    aid = app_id or f"stream_upsert:{checkpoint_dir}"

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        table = DeltaTable(spark, table_location, log_location)
        last = table.txn_version(aid)
        if last is not None and last >= batch_id:
            return  # replayed batch: already applied
        table.merge(batch_df.dropDuplicates(list(keys)), cond,
                    when_matched_update=upd or None,
                    when_not_matched_insert=ins,
                    custom_metadata={"streaming": True,
                                     "batchId": int(batch_id)},
                    txn=(aid, int(batch_id)))

    writer = (stream_df.writeStream
              .foreachBatch(commit_batch)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _with_event_time(df: DataFrame, ts_col: str, watermark: str) -> DataFrame:
    """Watermarks require TimestampType; normalize ntz event time (session
    timezone is pinned UTC, so the wall-clock is unchanged)."""
    from pyspark.sql.types import TimestampNTZType
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df


def tumbling_window_counts(events: DataFrame, window: str = "1 hour",
                           watermark: str = "2 hours",
                           ts_col: str = "ts") -> DataFrame:
    """Per (window, event_type) counts + value stats; watermarked so state
    is bounded on unbounded streams. Works on batch DataFrames too.
    """
    df = _with_event_time(events, ts_col, watermark)
    return (df.groupBy(F.window(ts_col, window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.count("value").alias("n_values"),
                 F.sum("value").alias("sum_value"),
                 F.avg("value").alias("avg_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n_events", "n_values",
                    "sum_value", "avg_value"))


def sliding_window_counts(events: DataFrame, window: str = "1 hour",
                          slide: str = "30 minutes",
                          watermark: str = "2 hours",
                          ts_col: str = "ts") -> DataFrame:
    df = _with_event_time(events, ts_col, watermark)
    return (df.groupBy(F.window(ts_col, window, slide).alias("w"),
                       "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n_events"))


def session_windows(events: DataFrame, gap: str = "30 minutes",
                    watermark: str = "2 hours",
                    ts_col: str = "ts") -> DataFrame:
    """Per-user session windows (gap-based) with event counts."""
    df = _with_event_time(events, ts_col, watermark)
    return (df.groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "user_id", "n_events", "sum_value"))


def stream_upsert_screened(stream_df: DataFrame, table_location: str,
                           checkpoint_dir: str, keys: list[str],
                           trigger_once: bool = True,
                           app_id: "str | None" = None,
                           k: int = 3, m_bits: int = 4096,
                           stats: "list | None" = None):
    """Bloom-screened streaming MERGE upsert — the end-to-end
    incremental-ingest pattern (r9, VERDICT item 8): per micro-batch,
    probe the batch keys against a Bloom filter of every key the
    table has EVER seen; rows the filter rules out (no false
    negatives, operators/sketch.py bloom_build) are certainly new and
    take a plain APPEND — they never reach the merge's target-side
    scan — while only the maybe-present set pays for the exact MERGE.
    On a mostly-fresh stream (the common crawl-ingest case) the merge
    probe side shrinks to the duplicate tail, and the filter itself is
    fixed-size (``m_bits/32`` words) regardless of table cardinality:
    seeded from the table once at stream start, then OR-maintained on
    the driver from each batch's own word table (metadata scale, no
    rescans).

    Commits identical table state to :func:`stream_upsert` (pinned in
    tests/test_streaming_upsert.py with probe-side row counts). Each
    path carries its own SetTransaction watermark (``<app>:merge`` /
    ``<app>:append``). A replay where BOTH landed is a pure no-op; a
    PARTIAL replay (crash between the two commits) must not re-screen
    — the reseeded filter is not replay-stable (it now contains the
    merged keys, so a previously-fresh row could misroute into the
    watermark-skipped merge path and be lost) — so the owed append
    half is computed with an EXACT key anti-join against the table
    instead (replay-only cost; the steady-state path never scans).

    ``stats`` (optional list) receives one dict per applied batch:
    ``{"batch", "batch_rows", "probe_rows", "appended"}`` — the
    screening-effectiveness evidence.
    """
    import numpy as np

    from ..operators.sketch import bloom_build, bloom_screen

    spark = stream_df.sparkSession
    cols = stream_df.columns
    cond = " AND ".join(f"t.{kk} = s.{kk}" for kk in keys)
    upd = {c: f"s.{c}" for c in cols if c not in keys}
    ins = {c: f"s.{c}" for c in cols}
    aid = app_id or f"stream_upsert:{checkpoint_dir}"
    key_expr = F.concat_ws("\x1f", *[F.col(kk).cast("string")
                                     for kk in keys])
    words = np.zeros(m_bits // 32, dtype=np.int64)
    seeded = [False]

    def _filter_df():
        rows = [(int(i), int(words[i]))
                for i in np.nonzero(words)[0]]
        return spark.createDataFrame(rows, "word_i long, bits long")

    def _absorb(df: DataFrame) -> None:
        for r in bloom_build(df.select(key_expr.alias("__k")),
                             "__k", k=k, m_bits=m_bits).collect():
            words[int(r["word_i"])] |= int(r["bits"])

    def _append_fresh(table, fresh: DataFrame, batch_id: int) -> int:
        n = fresh.count()
        if n:
            table.write(fresh, mode="append",
                        custom_metadata={"streaming": True,
                                         "batchId": int(batch_id),
                                         "bloomScreened": True},
                        txn=(f"{aid}:append", int(batch_id)))
        return n

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        table = DeltaTable(spark, table_location)
        if not seeded[0]:
            # one-time seed: every key currently in the table (a
            # missing target is fine — the first batch CREATES it;
            # .version would raise on the empty log)
            if table.log:
                _absorb(table.to_df().select(*keys))
            seeded[0] = True
        batch_df = batch_df.dropDuplicates(list(keys))
        last_m = table.txn_version(f"{aid}:merge")
        last_a = table.txn_version(f"{aid}:append")
        merge_done = last_m is not None and last_m >= batch_id
        append_done = last_a is not None and last_a >= batch_id
        if append_done:
            # program order runs the append strictly after the merge
            # half finished (committed or empty): the batch is fully
            # applied — replay is a pure no-op
            _absorb(batch_df.select(*keys))
            return
        if merge_done:
            # PARTIAL replay (crash between the two commits). The
            # bloom split is NOT replay-stable — the filter reseeds
            # from a table that already holds this batch's merged
            # keys, so re-screening could misroute a previously-fresh
            # row into the (watermark-skipped) merge path and lose it.
            # Use an EXACT key anti-join instead: whatever the table
            # does not hold is precisely what the append half owes.
            existing = table.to_df().select(
                *[F.col(kk) for kk in keys])
            fresh = batch_df.join(existing, list(keys), "left_anti") \
                .select(*cols)
            n_fresh = _append_fresh(table, fresh, batch_id)
            _absorb(batch_df.select(*keys))
            if stats is not None:
                stats.append({"batch": int(batch_id),
                              "batch_rows": int(batch_df.count()),
                              "probe_rows": 0,
                              "appended": int(n_fresh),
                              "replayed": True})
            return
        screened = bloom_screen(
            _filter_df(), batch_df.withColumn("__k", key_expr),
            "__k", k=k, m_bits=m_bits).localCheckpoint(eager=True)
        try:
            fresh = screened.filter(~F.col("maybe_present")) \
                .select(*cols)
            maybe = screened.filter(F.col("maybe_present")) \
                .select(*cols)
            n_batch = screened.count()
            n_maybe = maybe.count()
            if n_maybe:
                table = table.merge(
                    maybe, cond,
                    when_matched_update=upd or None,
                    when_not_matched_insert=ins,
                    custom_metadata={"streaming": True,
                                     "batchId": int(batch_id),
                                     "bloomScreened": True},
                    txn=(f"{aid}:merge", int(batch_id)))
            n_fresh = _append_fresh(table, fresh, batch_id)
            _absorb(batch_df.select(*keys))
        finally:
            # a long-running stream checkpoints every micro-batch —
            # without this the cached blocks accumulate until
            # executor storage pressure evicts them
            screened.unpersist()
        if stats is not None:
            stats.append({"batch": int(batch_id),
                          "batch_rows": int(n_batch),
                          "probe_rows": int(n_maybe),
                          "appended": int(n_fresh)})

    writer = (stream_df.writeStream
              .foreachBatch(commit_batch)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_apply_changes(change_stream: DataFrame,
                         table_location: str, checkpoint_dir: str,
                         keys: list[str], trigger_once: bool = True,
                         app_id: "str | None" = None):
    """CDC REPLICATION: apply a Change Data Feed stream (the
    ``readChangeFeed`` source this engine emits, or any stream with
    ``_change_type`` / ``_commit_version`` columns) onto a replica
    table — the delta-spark ``APPLY CHANGES`` pattern, and the
    standard table-to-table sync a 100 TB lakehouse runs continuously.

    Per micro-batch, one MERGE applies the NET effect per key:
    ``update_preimage`` rows drop (they describe the old state),
    the LAST change per key in commit order wins (a key inserted then
    deleted inside one batch nets to delete), deletes drive
    ``WHEN MATCHED DELETE``, inserts/update_postimages upsert. A
    SetTransaction watermark commits atomically with each merge, so
    at-least-once batch replay is a pure no-op.

    Scale shape: the net-effect reduction is one window over the
    batch keyed on the merge keys (batch-sized state, not
    table-sized); the merge itself uses the engine's dynamic file
    pruning, so a trickle of changes touches only the hit files of
    the replica. Returns the StreamingQuery.
    """
    spark = change_stream.sparkSession
    meta = {"_change_type", "_commit_version"}
    cols = [c for c in change_stream.columns if c not in meta]
    cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    upd = {c: f"s.{c}" for c in cols if c not in keys}
    ins = {c: f"s.{c}" for c in cols}
    aid = app_id or f"stream_apply_changes:{checkpoint_dir}"

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        table = DeltaTable(spark, table_location)
        last = table.txn_version(aid)
        if last is not None and last >= batch_id:
            return
        # net effect per key: newest commit wins; preimages are
        # bookkeeping rows, never applied
        # newest commit wins; WITHIN a commit a non-delete beats the
        # delete — a CoW rewrite (replaceWhere/overwrite without cdc
        # files) derives delete+insert at the SAME version for every
        # surviving key, and the survivor's new value is the net
        # effect (a truly deleted key has no same-version insert)
        w = Window.partitionBy(*keys).orderBy(
            F.col("_commit_version").desc(),
            F.when(F.col("_change_type") == "delete", 1)
            .otherwise(0),
            F.col("_change_type"))     # deterministic final tie-break
        net = (batch_df
               .filter(F.col("_change_type") != "update_preimage")
               .withColumn("__rn", F.row_number().over(w))
               .filter(F.col("__rn") == 1)
               .drop("__rn"))
        table.merge(
            net, cond,
            when_matched_update=upd or None,
            when_matched_update_condition=
            "s._change_type != 'delete'" if upd else None,
            when_matched_delete="s._change_type = 'delete'",
            when_not_matched_insert=ins,
            # a delete for a key the replica never held is a no-op,
            # not an insert
            when_not_matched_insert_condition=
            "s._change_type != 'delete'",
            custom_metadata={"streaming": True,
                             "batchId": int(batch_id),
                             "cdcApply": True},
            txn=(aid, int(batch_id)))

    writer = (change_stream.writeStream
              .foreachBatch(commit_batch)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_ingest_neardup(stream_df: DataFrame, table_location: str,
                          checkpoint_dir: str,
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          k_shingle: int = 3,
                          threshold: float = 0.5,
                          max_doc_freq: "int | None" = None,
                          bucket_cap: int = 2000,
                          trigger_once: bool = True,
                          app_id: "str | None" = None,
                          stats: "list | None" = None,
                          log_location: "str | None" = None):
    """Streaming NEAR-duplicate admission (r9 VERDICT item 4): each
    micro-batch is appended only where it has no jaccard >=
    ``threshold`` near-dup — first within the batch itself (connected
    components over the batch's own pair graph, min-id keeper:
    operators/dedup.py dedup_keepers_from_pairs), then against the
    ACCUMULATED table via the bipartite inverted-index join
    (cross_corpus_dedup: new-vs-corpus only, never corpus-vs-corpus,
    shingle fan-out tiled by ``bucket_cap``). The streaming face of
    the batch ``incremental_dedup_keepers`` pipeline — replaying the
    batches through this sink yields exactly the keeper set of the
    batch operator applied cumulatively (pinned in
    tests/test_streaming_upsert.py).

    Exactly-once on at-least-once batch delivery: every applied batch
    commits a SetTransaction watermark atomically with its append
    (an EMPTY admission still commits the watermark), so a replayed
    batch is a pure no-op — it must be, because re-screening a batch
    whose rows already landed would find them as their own near-dups
    and admit nothing, silently diverging from the first delivery.

    Scale: per batch, cost is (batch shingles) x (corpus inverted
    index) through the tiled bipartite join — the accumulated corpus
    text streams once per batch and never self-joins. ``stats``
    (optional list) receives one dict per applied batch:
    ``{"batch", "batch_rows", "after_self_dedup", "admitted"}``.
    """
    from ..operators.dedup import (cross_corpus_dedup,
                                   dedup_keepers_from_pairs,
                                   ngram_jaccard_pairs)

    spark = stream_df.sparkSession
    cols = stream_df.columns
    aid = app_id or f"stream_ingest_neardup:{checkpoint_dir}"

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        table = DeltaTable(spark, table_location, log_location)
        last = table.txn_version(aid)
        if last is not None and last >= int(batch_id):
            return                      # replayed batch: no-op
        batch = batch_df.dropDuplicates([id_col]) \
            .localCheckpoint(eager=True)
        try:
            n_batch = batch.count() if stats is not None else None
            pairs = ngram_jaccard_pairs(
                batch, text_col, id_col, k_shingle, threshold,
                max_doc_freq, bucket_cap=bucket_cap)
            kept = dedup_keepers_from_pairs(batch, pairs, id_col)
            if table.log and table.count() > 0:
                fresh = cross_corpus_dedup(
                    kept, table.to_df(), text_col, id_col,
                    k_shingle, threshold, max_doc_freq,
                    bucket_cap=bucket_cap)
            else:
                fresh = kept
            n_self = kept.count() if stats is not None else None
            fresh = fresh.select(*cols)
            table.write(fresh, mode="append",
                        custom_metadata={"streaming": True,
                                         "batchId": int(batch_id),
                                         "nearDupScreened": True},
                        txn=(aid, int(batch_id)))
            if stats is not None:
                admitted = (DeltaTable(spark, table_location).count()
                            - (table.count() if table.log else 0))
                stats.append({"batch": int(batch_id),
                              "batch_rows": int(n_batch),
                              "after_self_dedup": int(n_self),
                              "admitted": int(admitted)})
        finally:
            batch.unpersist()

    writer = (stream_df.writeStream
              .foreachBatch(commit_batch)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_ingest_semantic(stream_df: DataFrame, table_location: str,
                           checkpoint_dir: str, centroids,
                           vec_col: str = "embedding",
                           id_col: str = "vec_id",
                           threshold: float = 0.95,
                           trigger_once: bool = True,
                           app_id: "str | None" = None,
                           stats: "list | None" = None,
                           log_location: "str | None" = None):
    """Streaming SEMANTIC (embedding-cosine) admission — the SemDeDup
    face of :func:`stream_ingest_neardup` (r10): each micro-batch is
    appended only where it has no cosine >= ``threshold`` neighbor,
    first within the batch itself (within-cluster prefix pruning,
    operators/dedup.py semdedup with the caller's FIXED ``centroids``)
    then against the ACCUMULATED table. Fixed centroids are what make
    the admission cluster-bounded across the table's whole lifetime:
    batch rows only ever compare against accumulated rows in the SAME
    inverted list, so per-batch cost is
    sum_c (batch_m_c x corpus_m_c) — batch-sized times list-sized,
    never batch x corpus, and the corpus side streams once per batch
    through a broadcast-batch JVM cosine join (no Python in the
    comparison path).

    Exactly-once on at-least-once batch delivery: every applied batch
    commits a SetTransaction watermark atomically with its append (an
    empty admission still commits the watermark), so replays are pure
    no-ops — re-screening rows that already landed would find them as
    their own neighbors and silently admit nothing otherwise.

    ``stats`` (optional list) receives one dict per applied batch:
    ``{"batch", "batch_rows", "after_self_dedup", "admitted"}``.
    """
    import numpy as np

    from ..functions.vectors import cosine
    from ..operators.clustering import assign_to_centroids
    from ..operators.dedup import semdedup

    spark = stream_df.sparkSession
    cols = stream_df.columns
    cents = np.asarray(centroids, dtype="float64")
    aid = app_id or f"stream_ingest_semantic:{checkpoint_dir}"

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        table = DeltaTable(spark, table_location, log_location)
        last = table.txn_version(aid)
        if last is not None and last >= int(batch_id):
            return                      # replayed batch: no-op
        batch = batch_df.dropDuplicates([id_col]) \
            .localCheckpoint(eager=True)
        try:
            n_batch = batch.count() if stats is not None else None
            verdict = semdedup(batch, threshold=threshold,
                               centroids=cents, vec_col=vec_col,
                               id_col=id_col)
            kept = (batch.join(
                verdict.filter("keep").select(id_col, "cluster"),
                id_col))
            n_self = kept.count() if stats is not None else None
            if table.log and table.count() > 0:
                corpus = assign_to_centroids(
                    table.to_df().select(id_col, vec_col), cents,
                    vec_col=vec_col, out_col="cluster")
                kb = kept.select(
                    F.col(id_col).alias("__bid"),
                    F.col(vec_col).alias("__bvec"),
                    F.col("cluster"))
                conflicted = (corpus.join(
                    F.broadcast(kb), "cluster")
                    .filter(cosine(F.col(vec_col), F.col("__bvec"))
                            >= F.lit(float(threshold)))
                    .select(F.col("__bid").alias(id_col)).distinct())
                fresh = kept.join(conflicted, id_col, "left_anti")
            else:
                fresh = kept
            fresh = fresh.select(*cols)
            table.write(fresh, mode="append",
                        custom_metadata={"streaming": True,
                                         "batchId": int(batch_id),
                                         "semanticScreened": True},
                        txn=(aid, int(batch_id)))
            if stats is not None:
                admitted = (DeltaTable(spark, table_location).count()
                            - (table.count() if table.log else 0))
                stats.append({"batch": int(batch_id),
                              "batch_rows": int(n_batch),
                              "after_self_dedup": int(n_self),
                              "admitted": int(admitted)})
        finally:
            batch.unpersist()

    writer = (stream_df.writeStream
              .foreachBatch(commit_batch)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
