"""Bounded backfill-then-stop ("Trigger.AvailableNow" semantics) for
the ``xdlake`` streaming source.

Spark's native ``trigger(availableNow=True)`` wraps a Python data
source in ``AvailableNowMicroBatchStreamWrapper``, which snapshots the
source's ``latestOffset()`` ONCE at query start and runs a single
micro-batch straight to it — the Python DataSource API (pyspark 4.1)
has no ``SupportsTriggerAvailableNow``/``SupportsAdmissionControl``
bridge, so rate limits cannot split that batch. The drain still
terminates correctly, but as ONE unbounded batch: fine for small
backlogs, hostile at 100 TB.

:func:`available_now_backfill` provides the production shape above the
API instead: pin the target version at start, run the source under a
continuous trigger WITH its rate limits, and stop the query as soon as
the checkpointed offset reaches the target — a million-file backlog
drains in ``maxFilesPerTrigger``-bounded batches, holds per-trigger
state constant, and the job exits when caught up (re-running later
resumes from the checkpoint and drains only the delta).
"""

from __future__ import annotations

import json
import time
from typing import Callable

__all__ = ["available_now_backfill"]


def _parse_offset(raw) -> "dict | None":
    """Progress offsets arrive as strings — JSON from some paths,
    Python-repr (single quotes) from the Python-data-source runner."""
    if isinstance(raw, dict):
        return raw
    if not raw:
        return None
    import ast
    for loader in (json.loads, ast.literal_eval):
        try:
            off = loader(raw)
            if isinstance(off, str):
                off = loader(off)
            if isinstance(off, dict):
                return off
        except (ValueError, TypeError, SyntaxError):
            continue
    return None


def _drained(progress: "dict | None", target: int) -> bool:
    """True at the drain fixpoint: the reader (clamped at
    ``endingVersion`` = target) reports startOffset == endOffset — no
    further admission is possible, everything up to the pinned target
    is committed."""
    if not progress:
        return False
    src = (progress.get("sources") or [{}])[0]
    start, end = src.get("startOffset"), src.get("endOffset")
    if start is None or end is None or start != end:
        return False
    off = _parse_offset(end)
    # sanity: the fixpoint must sit at (or past) the pinned target
    return off is None or int(off.get("version", -1)) >= target \
        or target < 0


def available_now_backfill(
        spark, path: str, batch_fn: Callable,
        *, checkpoint_location: str,
        max_files_per_trigger: int | None = None,
        max_bytes_per_trigger: int | None = None,
        starting_version: "int | str | None" = 0,
        skip_change_commits: bool = False,
        read_change_feed: bool = False,
        poll_interval_s: float = 0.25,
        timeout_s: float = 3600.0) -> dict:
    """Drain the table's backlog through ``batch_fn(df, batch_id)`` in
    rate-limited micro-batches, then stop.

    The target is the table's version WHEN THE CALL STARTS — commits
    racing in behind the backfill are left for the next run, exactly
    like delta-spark's ``Trigger.AvailableNow``. ``starting_version``
    defaults to 0 (full history; the reader admission-controls from the
    very first batch when it is set). Returns
    ``{"n_batches", "n_rows", "target_version", "reached"}``.

    Scale shape: per-trigger work is bounded by the rate limits; the
    driver's poll loop reads only query-progress JSON. A restart with
    the same ``checkpoint_location`` resumes mid-backlog (the first
    catch-up batch after a BLIND restart is uncapped — the Python
    DataSource API hands the reader no start position; use
    ``max_files_per_trigger`` with fresh checkpoints for strictly
    bounded batches).
    """
    from ..log import DeltaLog
    from ..sources.storage import Location

    if read_change_feed and skip_change_commits:
        raise ValueError("read_change_feed and skip_change_commits "
                         "are contradictory")
    log = DeltaLog.load(Location.resolve(path).join("_delta_log"))
    target = log.version if log else -1
    # capped-from-batch-0 is only restart-safe on a FRESH checkpoint
    # (a capped blind offset could regress a resumed stream)
    fresh = not Location.resolve(checkpoint_location).join(
        "offsets").exists()

    counts = {"n_batches": 0, "n_rows": 0}

    def _fn(df, bid):
        n = df.count()
        counts["n_batches"] += 1
        counts["n_rows"] += n
        batch_fn(df, bid)

    reader = (spark.readStream.format("xdlake")
              .option("skipChangeCommits", str(skip_change_commits)))
    if read_change_feed:
        # r9: CDF composes with the rate caps, so a change-history
        # backfill (reprocess every change, bounded batches, stop at
        # the pinned version) is the same drain loop
        reader = reader.option("readChangeFeed", "true")
    if target >= 0:
        # pin the drain target INSIDE the reader: commits racing in
        # behind the backfill are never admitted, exactly like the
        # AvailableNow wrapper's prepared offset
        reader = reader.option("endingVersion", str(target))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    if max_bytes_per_trigger is not None:
        reader = reader.option("maxBytesPerTrigger",
                               str(max_bytes_per_trigger))
    if starting_version is not None:
        reader = reader.option("startingVersion", str(starting_version))
        if fresh:
            reader = reader.option("cappedStart", "true")

    q = (reader.load(path)
         .writeStream.foreachBatch(_fn)
         .option("checkpointLocation", checkpoint_location)
         .trigger(processingTime="0 seconds")
         .start())
    reached = False
    deadline = time.monotonic() + timeout_s
    try:
        if target < 0:
            reached = True  # empty table: nothing to drain
        while not reached and time.monotonic() < deadline:
            if not q.isActive:
                break
            if _drained(q.lastProgress, target):
                reached = True
                break
            time.sleep(poll_interval_s)
        exc = q.exception()
        if q.isActive and exc is None:
            q.stop()
        q.awaitTermination(30)
        if exc is not None:
            raise exc
    finally:
        if q.isActive:
            q.stop()
    return {**counts, "target_version": target, "reached": reached}
