"""Per-version checksum files (delta-spark VersionChecksum parity).

delta-spark writes ``_delta_log/{version:020}.crc`` beside every commit
it performs: a one-line JSON summary of the post-commit snapshot state
(live file count, table size, protocol, metadata, deletion-vector
totals). Readers use it to validate that incremental state
reconstruction — log replay, checkpoint fast paths — reproduced the
writer's view; a mismatch means log corruption or a replay bug, caught
at the METADATA level before any wrong query result ships. The
reference engine has no checksum layer (its log replay is a plain dict
fold, reference delta_log/__init__.py:336-346); this module is
delta-spark parity beyond reference surface.

Everything here is driver-side KB-scale JSON — no Spark job. At 100 TB
the .crc is the cheapest possible state validation: one small-file
read versus re-listing millions of data files.

Format notes (tolerant by construction, like log/actions.py):
- fields this engine does not produce are preserved on read and
  ignored by verification;
- a missing .crc is NOT an error — foreign writers (delta-rs, the
  reference) do not write them;
- writes are put-if-absent: on a lost optimistic-concurrency race the
  winner's checksum (same version, same state) already stands.
"""

from __future__ import annotations

import json
from typing import Any

__all__ = ["checksum_filename", "compute_checksum",
           "derive_checksum", "read_checksum",
           "write_version_checksum", "verify_checksum"]


def checksum_filename(version: int) -> str:
    """``{version:020}.crc`` (delta-spark ChecksumHook layout)."""
    return f"{version:020}.crc"


def compute_checksum(log) -> dict[str, Any]:
    """Summarize a :class:`DeltaLog` snapshot into the VersionChecksum
    payload: live-file count/bytes, DV totals, protocol, metadata,
    live domain metadata, latest txn watermark per app, and the
    in-commit timestamp when the table records them."""
    from . import SetTransaction

    adds = log.add_actions()
    size = 0
    n_dv = 0
    n_deleted = 0
    for a in adds.values():
        size += int(a.size or 0)
        desc = (a.extra or {}).get("deletionVector")
        if desc:
            n_dv += 1
            n_deleted += int(desc.get("cardinality") or 0)
    payload: dict[str, Any] = {
        "tableSizeBytes": size,
        "numFiles": len(adds),
        "numMetadata": 1,
        "numProtocol": 1,
        "metadata": log.metadata().to_json()["metaData"],
        "protocol": log.protocol().to_json()["protocol"],
        "numDeletionVectorsOpt": n_dv,
        "numDeletedRecordsOpt": n_deleted,
    }
    domains = log.live_domain_metadata()
    if domains:
        payload["domainMetadata"] = [
            dm.to_json()["domainMetadata"]
            for _, dm in sorted(domains.items())]
    txns: dict[str, int] = {}
    for v in sorted(log.entries):
        for a in log.entries[v].actions:
            if isinstance(a, SetTransaction):
                if a.version > txns.get(a.appId, -1):
                    txns[a.appId] = a.version
    if txns:
        payload["setTransactions"] = [
            {"appId": app, "version": ver}
            for app, ver in sorted(txns.items())]
    ict = log.last_ict()
    if ict is not None:
        payload["inCommitTimestampOpt"] = ict
    return payload


def _file_stat(add) -> tuple[int, int, int]:
    """(size, has_dv, dv_cardinality) for one add action — the three
    numbers a file contributes to the checksum sums."""
    dv = (add.extra or {}).get("deletionVector") or {}
    return (int(add.size or 0),
            1 if dv else 0,
            int(dv.get("cardinality") or 0) if dv else 0)


def derive_checksum(prev: dict[str, Any], entry,
                    prev_adds: dict[str, Any],
                    log) -> dict[str, Any] | None:
    """Incremental VersionChecksum (delta-spark's model): the next
    crc from the PREVIOUS version's crc plus this commit's actions —
    O(commit) work instead of the O(live files) full-manifest fold of
    :func:`compute_checksum`, which matters at 100 TB commit rates
    where a table holds millions of live adds but a commit touches a
    handful.

    ``prev_adds`` is the pre-commit live-file dict the writer already
    materialized (table handle construction) — used only for O(1)
    lookups, never iterated — so replace-in-place commits (ANALYZE
    stat re-adds, DV rewrites, double imports of the same foreign
    file) net out exactly instead of double-counting.

    Returns None when the previous crc lacks a required field
    (foreign/partial writer) — the caller falls back to the full
    fold. The derived payload is action-for-action identical to
    ``compute_checksum`` on the post-commit snapshot (pinned by
    tests/test_checksum.py's equivalence sweep).
    """
    from . import DomainMetadata, SetTransaction
    from .actions import Add, Protocol, Remove, TableMetadata

    for key in ("tableSizeBytes", "numFiles", "numDeletionVectorsOpt",
                "numDeletedRecordsOpt", "metadata", "protocol"):
        if prev.get(key) is None:
            return None
    n = int(prev["numFiles"])
    size = int(prev["tableSizeBytes"])
    n_dv = int(prev["numDeletionVectorsOpt"])
    n_deleted = int(prev["numDeletedRecordsOpt"])
    metadata = prev["metadata"]
    protocol = prev["protocol"]
    txns = {t["appId"]: int(t["version"])
            for t in prev.get("setTransactions") or []}
    domains = {d["domain"]: d
               for d in prev.get("domainMetadata") or []}

    # replay-accurate per-path state WITHIN this entry: last action
    # wins, and an add replacing a live file subtracts the old file's
    # numbers first (same-path remove+add, stat re-adds, re-imports)
    cur: dict[str, Any] = {}

    def _live_before(path):
        return cur[path] if path in cur else prev_adds.get(path)

    for a in entry.actions:
        if isinstance(a, Add):
            old = _live_before(a.path)
            if old is not None:
                s, d, c = _file_stat(old)
                size -= s
                n_dv -= d
                n_deleted -= c
            else:
                n += 1
            s, d, c = _file_stat(a)
            size += s
            n_dv += d
            n_deleted += c
            cur[a.path] = a
        elif isinstance(a, Remove):
            old = _live_before(a.path)
            if old is not None:
                s, d, c = _file_stat(old)
                n -= 1
                size -= s
                n_dv -= d
                n_deleted -= c
            cur[a.path] = None
        elif isinstance(a, TableMetadata):
            metadata = a.to_json()["metaData"]
        elif isinstance(a, Protocol):
            protocol = a.to_json()["protocol"]
        elif isinstance(a, SetTransaction):
            if a.version > txns.get(a.appId, -1):
                txns[a.appId] = a.version
        elif isinstance(a, DomainMetadata):
            if a.removed:
                domains.pop(a.domain, None)
            else:
                domains[a.domain] = a.to_json()["domainMetadata"]

    payload: dict[str, Any] = {
        "tableSizeBytes": size,
        "numFiles": n,
        "numMetadata": 1,
        "numProtocol": 1,
        "metadata": metadata,
        "protocol": protocol,
        "numDeletionVectorsOpt": n_dv,
        "numDeletedRecordsOpt": n_deleted,
    }
    if domains:
        payload["domainMetadata"] = [
            domains[k] for k in sorted(domains)]
    if txns:
        payload["setTransactions"] = [
            {"appId": app, "version": ver}
            for app, ver in sorted(txns.items())]
    ict = log.last_ict()
    if ict is not None:
        payload["inCommitTimestampOpt"] = ict
    return payload


def write_version_checksum(log_location, log, entry=None,
                           prev_adds=None, full_every: int = 10) -> None:
    """Best-effort put-if-absent of the snapshot checksum for the
    log's newest version. Never raises: a checksum is a validation
    aid, not a commit requirement (mirrors the checkpoint policy in
    table._commit).

    When the committed ``entry`` and the pre-commit live-file dict
    ``prev_adds`` are supplied AND the previous version's crc exists,
    the payload is DERIVED incrementally (O(commit) — see
    :func:`derive_checksum`); otherwise falls back to the full
    manifest fold.

    ``full_every``: every N-th version recomputes the FULL fold even
    when derivation is possible (default matches the checkpoint
    interval). Derivation seeds from the previous crc, so a wrong or
    stale crc left by a foreign/partial writer would otherwise
    propagate into every subsequent derived crc forever; the periodic
    resync bounds the damage to one interval and self-heals the chain
    (r11 review)."""
    try:
        payload = None
        if entry is not None and prev_adds is not None \
                and log.version > 0 \
                and (full_every <= 0 or log.version % full_every):
            prev = read_checksum(log_location, log.version - 1)
            if prev is not None:
                payload = derive_checksum(prev, entry, prev_adds, log)
        if payload is None:
            payload = compute_checksum(log)
        name = checksum_filename(log.version)
        data = (json.dumps(payload, separators=(",", ":"),
                           sort_keys=True) + "\n").encode()
        log_location.join(name).put_if_absent(data)
    except Exception:
        pass


def read_checksum(log_location, version: int) -> dict[str, Any] | None:
    """The stored checksum for ``version``, or None when absent or
    unparseable (foreign writer, expired by log cleanup)."""
    try:
        raw = log_location.join(checksum_filename(version)).read_bytes()
        obj = json.loads(raw)
        return obj if isinstance(obj, dict) else None
    except Exception:
        return None


def _canon(obj: Any) -> Any:
    """Comparison canonicalization: JSON round-trip drops dict order
    and tuple-vs-list differences; None-valued keys are pruned (the
    tolerant action serializer emits them, foreign writers omit)."""
    if isinstance(obj, dict):
        return {k: _canon(v) for k, v in sorted(obj.items())
                if v is not None}
    if isinstance(obj, (list, tuple)):
        return [_canon(v) for v in obj]
    return obj


def verify_checksum(log, crc: dict[str, Any]) -> list[str]:
    """Compare a stored checksum against the reconstructed snapshot;
    returns human-readable mismatch descriptions (empty = state
    verified). Only fields present in the STORED checksum are
    checked — foreign engines may omit any optional field — and
    ``metadata.createdTime``-style advisory fields ride the tolerant
    dict comparison."""
    ours = compute_checksum(log)
    problems: list[str] = []
    for key in ("tableSizeBytes", "numFiles", "numMetadata",
                "numProtocol", "numDeletionVectorsOpt",
                "numDeletedRecordsOpt", "inCommitTimestampOpt"):
        if key not in crc or crc[key] is None:
            continue
        if key not in ours or ours[key] is None:
            # symmetric tolerance: the snapshot cannot recompute this
            # field (e.g. inCommitTimestampOpt after the head JSON was
            # expired, so last_ict() is None) — a valid stored value
            # must not be reported as a mismatch against 0.
            continue
        try:
            stored = int(crc[key])
        except (TypeError, ValueError):
            problems.append(f"{key}: crc value {crc[key]!r} is not "
                            "numeric")
            continue
        if stored != int(ours[key]):
            problems.append(
                f"{key}: crc={crc[key]} computed={ours[key]}")
    for key in ("metadata", "protocol"):
        if key in crc and crc[key] is not None \
                and _canon(crc[key]) != _canon(ours[key]):
            problems.append(f"{key} differs from computed snapshot")
    if "setTransactions" in crc and crc["setTransactions"] is not None:
        want = {(t.get("appId"), int(t.get("version")))
                for t in crc["setTransactions"]}
        have = {(t["appId"], t["version"])
                for t in ours.get("setTransactions", [])}
        if want != have:
            problems.append("setTransactions differ from computed "
                            "snapshot")
    if "domainMetadata" in crc and crc["domainMetadata"] is not None:
        want_d = {d.get("domain"): _canon(d)
                  for d in crc["domainMetadata"]}
        have_d = {d["domain"]: _canon(d)
                  for d in ours.get("domainMetadata", [])}
        if want_d != have_d:
            problems.append("domainMetadata differs from computed "
                            "snapshot")
    return problems
