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
           "read_checksum", "write_version_checksum",
           "verify_checksum"]


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


def write_version_checksum(log_location, log) -> None:
    """Best-effort put-if-absent of the snapshot checksum for the
    log's newest version. Never raises: a checksum is a validation
    aid, not a commit requirement (mirrors the checkpoint policy in
    table._commit)."""
    try:
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
        try:
            stored = int(crc[key])
        except (TypeError, ValueError):
            problems.append(f"{key}: crc value {crc[key]!r} is not "
                            "numeric")
            continue
        if stored != int(ours.get(key, 0)):
            problems.append(
                f"{key}: crc={crc[key]} computed={ours.get(key, 0)}")
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
