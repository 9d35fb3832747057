"""Delta log checkpoints: parquet snapshots of the replayed state.

The reference replays every ``NNNN.json`` on each table open
(/root/reference/xdlake/delta_log/__init__.py:250-277) — O(commits) small
reads per open, which at 100 TB table rates (thousands of commits) makes
opening a table slower than querying it. The Delta protocol's answer is
the checkpoint: every N commits, write the *replayed* state (protocol,
metaData, live adds, unexpired remove tombstones) as
``{version:020}.checkpoint.parquet`` plus a ``_last_checkpoint`` pointer,
so a reader parses one parquet file + only the JSON entries after it.

Layout follows the Delta spec's classic checkpoint: one parquet file, one
row per action, one struct column per action type (protocol / metaData /
add / remove / txn), exactly one non-null struct per row. Reading also
understands the spec's two other checkpoint layouts written by foreign
engines:

- **multi-part classic**: ``{v:020}.checkpoint.{i:010}.{n:010}.parquet``,
  actions distributed arbitrarily across the ``n`` parts
  (``_last_checkpoint`` carries ``"parts"``); written by this engine too
  when ``part_size`` caps rows per file so a 100 TB table's multi-million
  -file manifest parallelizes across writers/readers;
- **v2 / UUID-named**: ``{v:020}.checkpoint.{uuid}.{parquet|json}`` — a
  manifest holding protocol/metaData/txn plus ``sidecar`` actions that
  point at add/remove-bearing parquet files under ``_delta_log/_sidecars/``
  (reader feature ``v2Checkpoint``). File actions may also appear inline.
"""

from __future__ import annotations

import json
import re
from typing import TYPE_CHECKING

import pyarrow as pa
import pyarrow.parquet as pq

from .actions import (Action, Add, Protocol, Remove, SetTransaction,
                      TableMetadata)

if TYPE_CHECKING:
    from . import DeltaLog

LAST_CHECKPOINT = "_last_checkpoint"

#: multi-part classic checkpoint: version, part index (1-based), n parts
_MULTIPART_RE = re.compile(
    r"^(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet$")
#: v2 UUID-named checkpoint manifest
_V2_RE = re.compile(
    r"^(\d{20})\.checkpoint\.[0-9a-fA-F-]{8,}\.(parquet|json)$")


def checkpoint_filename(version: int) -> str:
    return f"{version:020d}.checkpoint.parquet"


def multipart_filename(version: int, part: int, parts: int) -> str:
    return f"{version:020d}.checkpoint.{part:010d}.{parts:010d}.parquet"


#: deletionVector descriptor struct (spec field names/types).
_DV_STRUCT = pa.struct([
    pa.field("storageType", pa.string()),
    pa.field("pathOrInlineDv", pa.string()),
    pa.field("offset", pa.int32()),
    pa.field("sizeInBytes", pa.int32()),
    pa.field("cardinality", pa.int64()),
])

_SCHEMA = pa.schema([
    pa.field("protocol", pa.struct([
        pa.field("minReaderVersion", pa.int32()),
        pa.field("minWriterVersion", pa.int32()),
        # vacuous for tables this engine writes (never past version
        # 1/2), but a foreign v3 table checkpointed here must not have
        # its feature list silently stripped — the reader-protocol gate
        # keys on it
        pa.field("readerFeatures", pa.list_(pa.string())),
        pa.field("writerFeatures", pa.list_(pa.string())),
    ])),
    pa.field("metaData", pa.struct([
        pa.field("id", pa.string()),
        pa.field("name", pa.string()),
        pa.field("description", pa.string()),
        pa.field("format", pa.struct([
            pa.field("provider", pa.string()),
            pa.field("options", pa.map_(pa.string(), pa.string())),
        ])),
        pa.field("schemaString", pa.string()),
        pa.field("partitionColumns", pa.list_(pa.string())),
        pa.field("configuration", pa.map_(pa.string(), pa.string())),
        pa.field("createdTime", pa.int64()),
    ])),
    pa.field("add", pa.struct([
        pa.field("path", pa.string()),
        pa.field("partitionValues", pa.map_(pa.string(), pa.string())),
        pa.field("size", pa.int64()),
        pa.field("modificationTime", pa.int64()),
        pa.field("dataChange", pa.bool_()),
        pa.field("stats", pa.string()),
        # merge-on-read DELETE: without this column a checkpointed DV
        # table would RESURRECT its logically-deleted rows on reload
        pa.field("deletionVector", _DV_STRUCT),
        # row tracking: fresh row ids are baseRowId + row_index; a
        # checkpoint that dropped these would reassign different ids
        pa.field("baseRowId", pa.int64()),
        pa.field("defaultRowCommitVersion", pa.int64()),
        # liquid clustering: ZCUBE_* + clusteringProvider tags mark
        # already-clustered files; a checkpoint that dropped them
        # would turn the next incremental OPTIMIZE into a full
        # rewrite of the whole table
        pa.field("tags", pa.map_(pa.string(), pa.string())),
        pa.field("clusteringProvider", pa.string()),
    ])),
    pa.field("remove", pa.struct([
        pa.field("path", pa.string()),
        pa.field("deletionTimestamp", pa.int64()),
        pa.field("dataChange", pa.bool_()),
        pa.field("extendedFileMetadata", pa.bool_()),
        pa.field("size", pa.int64()),
        pa.field("deletionVector", _DV_STRUCT),  # VACUUM needs it
    ])),
    # Delta spec: a checkpoint MUST carry the latest txn action per
    # appId — without it a checkpointed reload forgets the streaming
    # sink's idempotence watermark and a replayed micro-batch commits
    # twice (latest_txn_version only scans loaded entries)
    pa.field("txn", pa.struct([
        pa.field("appId", pa.string()),
        pa.field("version", pa.int64()),
        pa.field("lastUpdated", pa.int64()),
    ])),
    # Delta spec: a checkpoint MUST carry every live domainMetadata —
    # dropping them would reset the row-id high watermark (and any
    # foreign engine's domains) when old JSON entries stop being read
    pa.field("domainMetadata", pa.struct([
        pa.field("domain", pa.string()),
        pa.field("configuration", pa.string()),
        pa.field("removed", pa.bool_()),
    ])),
])


def _row(kind: str, body: dict) -> dict:
    return {f.name: (body if f.name == kind else None) for f in _SCHEMA}


def write_checkpoint(log_location, log: "DeltaLog",
                     part_size: int = 0, v2: bool = False,
                     sidecar_size: int = 50_000) -> int:
    """Materialize ``log``'s replayed state at its current version.

    Includes: protocol, newest metaData, every live add, every remove
    tombstone whose file is not live (kept so VACUUM still sees them
    after older JSON entries stop being read), and the latest ``txn``
    watermark per appId (streaming idempotence must survive the
    checkpoint collapsing its JSON commit). Returns the number of
    actions written.

    ``part_size`` > 0 caps rows per file: the state is split into the
    spec's multi-part layout (``{v}.checkpoint.{i}.{n}.parquet`` +
    ``"parts"`` in ``_last_checkpoint``) so a huge table's manifest is
    written — and later read — as parallel chunks instead of one
    monolithic file.

    ``v2`` + more than ``sidecar_size`` file actions shards the
    add/remove rows into ``_delta_log/_sidecars/{uuid}.parquet`` files
    referenced by ``sidecar`` actions in the manifest (the spec's v2
    sidecar layout): at 100 TB a multi-million-add checkpoint becomes
    a small manifest plus parallel-readable/writable shards instead of
    one monolithic parquet. Below the threshold file actions stay
    inline (single-writer commits remain one PUT).
    """
    version = log.version
    rows: list[dict] = []

    proto = log.protocol()
    rows.append(_row("protocol", {
        "minReaderVersion": proto.minReaderVersion,
        "minWriterVersion": proto.minWriterVersion,
        "readerFeatures": (proto.extra or {}).get("readerFeatures"),
        "writerFeatures": (proto.extra or {}).get("writerFeatures"),
    }))
    md = log.metadata()
    rows.append(_row("metaData", {
        "id": md.id, "name": md.name, "description": md.description,
        "format": {"provider": md.format.get("provider", "parquet"),
                   "options": list((md.format.get("options") or {}).items())},
        "schemaString": md.schemaString,
        "partitionColumns": list(md.partitionColumns),
        "configuration": list((md.configuration or {}).items()),
        "createdTime": md.createdTime,
    }))

    live = log.add_actions()
    for add in live.values():
        rows.append(_row("add", {
            "path": add.path,
            "partitionValues": list((add.partitionValues or {}).items()),
            "size": add.size,
            "modificationTime": add.modificationTime,
            "dataChange": False,
            "stats": add.stats,
            "deletionVector": (add.extra or {}).get("deletionVector"),
            "baseRowId": (add.extra or {}).get("baseRowId"),
            "defaultRowCommitVersion":
                (add.extra or {}).get("defaultRowCommitVersion"),
            "tags": (list(((add.extra or {}).get("tags") or {})
                          .items()) or None),
            "clusteringProvider":
                (add.extra or {}).get("clusteringProvider"),
        }))

    # newest tombstone per non-live path
    tombstones: dict[str, Remove] = {}
    for v in sorted(log.entries):
        for rm in log.entries[v].removes:
            if rm.path not in live:
                tombstones[rm.path] = rm
    for rm in tombstones.values():
        rows.append(_row("remove", {
            "path": rm.path,
            "deletionTimestamp": rm.deletionTimestamp,
            "dataChange": False,
            "extendedFileMetadata": rm.extendedFileMetadata,
            "size": rm.size,
            "deletionVector": (rm.extra or {}).get("deletionVector"),
        }))

    # latest txn watermark per appId (a prior checkpoint's txn rows are
    # in log.entries[cp_v], so watermarks chain across checkpoints)
    txns: dict[str, SetTransaction] = {}
    for v in sorted(log.entries):
        for a in log.entries[v].actions:
            if isinstance(a, SetTransaction):
                prev = txns.get(a.appId)
                if prev is None or a.version > prev.version:
                    txns[a.appId] = a
    for t in txns.values():
        rows.append(_row("txn", {
            "appId": t.appId, "version": t.version,
            "lastUpdated": t.lastUpdated,
        }))

    for dm in log.live_domain_metadata().values():
        rows.append(_row("domainMetadata", {
            "domain": dm.domain, "configuration": dm.configuration,
            "removed": False,
        }))

    import io

    def _write_rows(chunk: list[dict], name: str,
                    schema: pa.Schema = _SCHEMA) -> None:
        buf = io.BytesIO()
        pq.write_table(pa.Table.from_pylist(chunk, schema=schema), buf)
        log_location.join(name).write_bytes(buf.getvalue())

    pointer = {"version": version, "size": len(rows)}
    if v2:
        # v2 manifest: UUID-named, carries a checkpointMetadata row.
        # File actions stay inline up to sidecar_size (single-writer
        # commits remain one PUT), beyond it they shard into
        # _sidecars/*.parquet referenced by sidecar actions.
        import time as _time
        import uuid as _uuid
        schema = _v2_schema()
        blank = {f.name: None for f in schema}
        manifest = [{**blank,
                     "checkpointMetadata": {"version": version}}]
        file_rows = [r for r in rows
                     if r.get("add") or r.get("remove")]
        if sidecar_size and len(file_rows) > sidecar_size:
            manifest += [{**r, "checkpointMetadata": None,
                          "sidecar": None}
                         for r in rows
                         if not (r.get("add") or r.get("remove"))]
            now_ms = int(_time.time() * 1000)
            for i in range(0, len(file_rows), sidecar_size):
                chunk = file_rows[i:i + sidecar_size]
                name = f"{_uuid.uuid4()}.parquet"
                buf = io.BytesIO()
                pq.write_table(
                    pa.Table.from_pylist(chunk, schema=_SCHEMA), buf)
                data = buf.getvalue()
                log_location.join("_sidecars", name).write_bytes(data)
                manifest.append({**blank, "sidecar": {
                    "path": name, "sizeInBytes": len(data),
                    "modificationTime": now_ms}})
        else:
            manifest += [{**r, "checkpointMetadata": None,
                          "sidecar": None} for r in rows]
        _write_rows(manifest, f"{version:020d}.checkpoint."
                              f"{_uuid.uuid4()}.parquet", schema)
        pointer["size"] = len(rows) + 1
    elif part_size and len(rows) > part_size:
        chunks = [rows[i:i + part_size]
                  for i in range(0, len(rows), part_size)]
        for i, chunk in enumerate(chunks, start=1):
            _write_rows(chunk, multipart_filename(version, i, len(chunks)))
        pointer["parts"] = len(chunks)
    else:
        _write_rows(rows, checkpoint_filename(version))
    log_location.join(LAST_CHECKPOINT).write_bytes(
        json.dumps(pointer).encode())
    return len(rows)


def _v2_schema() -> pa.Schema:
    """Classic schema + the v2-only manifest columns."""
    return pa.schema(list(_SCHEMA) + [
        pa.field("checkpointMetadata", pa.struct([
            pa.field("version", pa.int64()),
        ])),
        pa.field("sidecar", pa.struct([
            pa.field("path", pa.string()),
            pa.field("sizeInBytes", pa.int64()),
            pa.field("modificationTime", pa.int64()),
        ])),
    ])


def last_checkpoint_meta(log_location) -> dict | None:
    """Parsed ``_last_checkpoint`` JSON, or None if absent/corrupt."""
    loc = log_location.join(LAST_CHECKPOINT)
    try:
        if not loc.exists():
            return None
        meta = json.loads(loc.read_bytes())
        int(meta["version"])
        return meta
    except (ValueError, KeyError, TypeError, OSError):
        return None


def last_checkpoint_version(log_location) -> int | None:
    meta = last_checkpoint_meta(log_location)
    return int(meta["version"]) if meta is not None else None


def read_checkpoint(log_location, version: int) -> list[Action]:
    """Parse the checkpoint at ``version`` back into action objects.

    Dispatches on the three spec layouts: classic single-file,
    multi-part classic (all parts read and concatenated), and v2
    UUID-named manifests (parquet or json) whose ``sidecar`` actions
    are followed into ``_delta_log/_sidecars/``.
    """
    single = log_location.join(checkpoint_filename(version))
    if single.exists():
        actions, sidecars = _parse_parquet(single.read_bytes())
        return actions + _read_sidecars(log_location, sidecars)

    names = log_location.list_files()
    parts = sorted(
        (int(m.group(2)), int(m.group(3)), n) for n in names
        if (m := _MULTIPART_RE.match(n)) and int(m.group(1)) == version)
    if parts:
        # every filename declares the total part count — demand a
        # complete, consistent 1..n set (a missing part would silently
        # drop a slice of the table's live files)
        declared = {t for _, t, _ in parts}
        if len(declared) != 1 or \
                [p for p, _, _ in parts] != list(range(1, parts[0][1] + 1)):
            raise ValueError(
                f"multi-part checkpoint at version {version} is "
                f"incomplete: found parts "
                f"{[(p, t) for p, t, _ in parts]}")
        actions = []
        for _, _, name in parts:
            acts, sidecars = _parse_parquet(
                log_location.join(name).read_bytes())
            if sidecars:
                raise ValueError(
                    "sidecar action in a multi-part classic checkpoint")
            actions.extend(acts)
        return actions

    v2 = sorted(n for n in names
                if (m := _V2_RE.match(n)) and int(m.group(1)) == version)
    if v2:
        name = v2[-1]  # any complete manifest is valid; pick stably
        data = log_location.join(name).read_bytes()
        if name.endswith(".json"):
            actions, sidecars = _parse_json_manifest(data)
        else:
            actions, sidecars = _parse_parquet(data)
        return actions + _read_sidecars(log_location, sidecars)

    raise FileNotFoundError(
        f"no checkpoint files found at version {version}")


def _read_sidecars(log_location, sidecar_paths: list[str]) -> list[Action]:
    """Read v2 sidecar parquet files (add/remove actions only)."""
    from ..sources.storage import Location

    out: list[Action] = []
    for path in sidecar_paths:
        if "://" in path:
            loc = Location.resolve(
                path, storage_options=log_location.storage_options)
        else:
            loc = log_location.join("_sidecars", path)
        acts, nested = _parse_parquet(loc.read_bytes())
        if nested:
            raise ValueError(f"sidecar {path} itself declares sidecars")
        for a in acts:
            if not isinstance(a, (Add, Remove)):
                raise ValueError(
                    f"sidecar {path} holds a non-file action "
                    f"{type(a).__name__}")
        out.extend(acts)
    return out


def _parse_json_manifest(data: bytes) -> tuple[list[Action], list[str]]:
    """A v2 checkpoint manifest in JSON form: one action per line, same
    vocabulary as a commit file plus ``sidecar``/``checkpointMetadata``."""
    from .actions import load_action

    actions: list[Action] = []
    sidecars: list[str] = []
    for line in data.splitlines():
        if not line.strip():
            continue
        obj = json.loads(line)
        if "sidecar" in obj:
            sidecars.append(obj["sidecar"]["path"])
        elif "checkpointMetadata" in obj:
            continue  # carries only {version, tags}; nothing to replay
        else:
            a = load_action(obj)
            if isinstance(a, (Protocol, TableMetadata, Add, Remove,
                              SetTransaction)):
                actions.append(a)
    _check_protocol_features(actions)
    return actions, sidecars


def _check_protocol_features(actions: list[Action]) -> None:
    """A v3/v7 protocol parsed from any checkpoint form must carry its
    feature lists — otherwise the gates would wave the table through
    with its real demands unknown (see the parquet-path twin below)."""
    for a in actions:
        if isinstance(a, Protocol):
            extra = a.extra or {}
            if a.minReaderVersion >= 3 and "readerFeatures" not in extra:
                raise ValueError(
                    f"checkpoint protocol has minReaderVersion="
                    f"{a.minReaderVersion} but no readerFeatures — "
                    "feature list was stripped; replay the JSON log")
            if a.minWriterVersion >= 7 and "writerFeatures" not in extra:
                raise ValueError(
                    f"checkpoint protocol has minWriterVersion="
                    f"{a.minWriterVersion} but no writerFeatures — "
                    "feature list was stripped; replay the JSON log")


def _parse_parquet(data: bytes) -> tuple[list[Action], list[str]]:
    """Parse one checkpoint-layout parquet (classic file, multi-part
    part, v2 manifest, or sidecar) into (actions, sidecar paths)."""
    import io
    table = pq.read_table(io.BytesIO(data))
    actions: list[Action] = []
    sidecars: list[str] = []
    for row in table.to_pylist():
        if row.get("protocol"):
            p = row["protocol"]
            # keep whatever extra fields the checkpoint carries — from
            # OUR checkpoints that is exactly the reader/writer feature
            # lists (_SCHEMA persists only those; other foreign protocol
            # keys do NOT survive a write_checkpoint), from a foreign
            # classic checkpoint it is whatever its schema held. The
            # protocol gates key on the feature lists, which round-trip.
            extra = {k: v for k, v in p.items()
                     if k not in ("minReaderVersion", "minWriterVersion")
                     and v is not None}
            min_r = p["minReaderVersion"] or 1
            min_w = p["minWriterVersion"] or 2
            # A v3/v7 protocol MUST carry its feature lists (Delta spec);
            # a checkpoint whose schema lacks the columns (pre-feature
            # builds of this engine, some foreign writers) would
            # otherwise silently strip them — and the protocol gates
            # would wave through a table whose real demands are unknown.
            # Raising here sends DeltaLog.load to full JSON replay,
            # which recovers the true lists.
            if min_r >= 3 and "readerFeatures" not in extra:
                raise ValueError(
                    f"checkpoint protocol has minReaderVersion={min_r} "
                    "but no readerFeatures column — feature list was "
                    "stripped; replay the JSON log instead")
            if min_w >= 7 and "writerFeatures" not in extra:
                raise ValueError(
                    f"checkpoint protocol has minWriterVersion={min_w} "
                    "but no writerFeatures column — feature list was "
                    "stripped; replay the JSON log instead")
            actions.append(Protocol(
                minReaderVersion=min_r,
                minWriterVersion=min_w,
                extra=extra))
        elif row.get("metaData"):
            m = row["metaData"]
            fmt = m.get("format") or {}
            actions.append(TableMetadata(
                schemaString=m["schemaString"], id=m["id"],
                name=m.get("name"), description=m.get("description"),
                format={"provider": (fmt.get("provider") or "parquet"),
                        "options": dict(fmt.get("options") or [])},
                partitionColumns=list(m.get("partitionColumns") or []),
                configuration=dict(m.get("configuration") or []),
                createdTime=m.get("createdTime") or 0))
        elif row.get("add"):
            a = row["add"]
            add = Add(
                path=a["path"],
                partitionValues=dict(a.get("partitionValues") or []),
                size=a.get("size") or 0,
                modificationTime=a.get("modificationTime") or 0,
                dataChange=bool(a.get("dataChange")),
                stats=a.get("stats"))
            dv = a.get("deletionVector")
            if dv and dv.get("storageType") is not None:
                add.extra = {"deletionVector": {
                    k: v for k, v in dv.items() if v is not None}}
            if a.get("baseRowId") is not None:
                add.extra = {**(add.extra or {}),
                             "baseRowId": int(a["baseRowId"])}
            if a.get("defaultRowCommitVersion") is not None:
                add.extra = {**(add.extra or {}),
                             "defaultRowCommitVersion":
                                 int(a["defaultRowCommitVersion"])}
            if a.get("tags"):
                add.extra = {**(add.extra or {}),
                             "tags": dict(a["tags"])}
            if a.get("clusteringProvider") is not None:
                add.extra = {**(add.extra or {}),
                             "clusteringProvider":
                                 a["clusteringProvider"]}
            actions.append(add)
        elif row.get("remove"):
            r = row["remove"]
            rm = Remove(
                path=r["path"],
                deletionTimestamp=r.get("deletionTimestamp") or 0,
                dataChange=bool(r.get("dataChange")),
                extendedFileMetadata=bool(r.get("extendedFileMetadata")),
                size=r.get("size"))
            dv = r.get("deletionVector")
            if dv and dv.get("storageType") is not None:
                rm.extra = {"deletionVector": {
                    k: v for k, v in dv.items() if v is not None}}
            actions.append(rm)
        elif row.get("txn"):
            t = row["txn"]
            if t.get("appId") is not None:
                actions.append(SetTransaction(
                    appId=t["appId"], version=t.get("version") or 0,
                    lastUpdated=t.get("lastUpdated")))
        elif row.get("domainMetadata"):
            d = row["domainMetadata"]
            if d.get("domain") is not None:
                from .actions import DomainMetadata
                actions.append(DomainMetadata(
                    domain=d["domain"],
                    configuration=d.get("configuration") or "",
                    removed=bool(d.get("removed"))))
        elif row.get("sidecar"):
            s = row["sidecar"]
            if s.get("path"):
                sidecars.append(s["path"])
    return actions, sidecars
