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
add / remove), exactly one non-null struct per row.
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING

import pyarrow as pa
import pyarrow.parquet as pq

from .actions import Action, Add, Protocol, Remove, TableMetadata

if TYPE_CHECKING:
    from . import DeltaLog

LAST_CHECKPOINT = "_last_checkpoint"


def checkpoint_filename(version: int) -> str:
    return f"{version:020d}.checkpoint.parquet"


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
    ])),
    pa.field("remove", pa.struct([
        pa.field("path", pa.string()),
        pa.field("deletionTimestamp", pa.int64()),
        pa.field("dataChange", pa.bool_()),
        pa.field("extendedFileMetadata", pa.bool_()),
        pa.field("size", pa.int64()),
        pa.field("deletionVector", _DV_STRUCT),  # VACUUM needs it
    ])),
])


def _row(kind: str, body: dict) -> dict:
    return {f.name: (body if f.name == kind else None) for f in _SCHEMA}


def write_checkpoint(log_location, log: "DeltaLog") -> int:
    """Materialize ``log``'s replayed state at its current version.

    Includes: protocol, newest metaData, every live add, and every
    remove tombstone whose file is not live (kept so VACUUM still sees
    them after older JSON entries stop being read). Returns the number
    of actions written.
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

    table = pa.Table.from_pylist(rows, schema=_SCHEMA)
    import io
    buf = io.BytesIO()
    pq.write_table(table, buf)
    log_location.join(checkpoint_filename(version)).write_bytes(
        buf.getvalue())
    log_location.join(LAST_CHECKPOINT).write_bytes(json.dumps(
        {"version": version, "size": len(rows)}).encode())
    return len(rows)


def last_checkpoint_version(log_location) -> int | None:
    loc = log_location.join(LAST_CHECKPOINT)
    try:
        if not loc.exists():
            return None
        return int(json.loads(loc.read_bytes())["version"])
    except (ValueError, KeyError, OSError):
        return None


def read_checkpoint(log_location, version: int) -> list[Action]:
    """Parse a checkpoint parquet back into action objects."""
    import io
    data = log_location.join(checkpoint_filename(version)).read_bytes()
    table = pq.read_table(io.BytesIO(data))
    actions: list[Action] = []
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
    return actions
