"""Delta transaction-log action types.

Implements the action vocabulary of the Delta protocol as exercised by the
reference implementation (parity target: /root/reference/xdlake/delta_log/
actions.py:20-248): ``protocol``, ``metaData``, ``commitInfo``, ``add``,
``remove``. Design goals shared with the reference:

- tolerant deserialization: unknown JSON keys are preserved in ``extra`` and
  re-emitted on serialization, so logs written by delta-rs / delta-spark
  (deletionVector, baseRowId, clusteringProvider, engineInfo, ...) round-trip
  without loss (reference: actions.py:49-55);
- a name->class registry so a log line ``{"add": {...}}`` dispatches to the
  right dataclass (reference: actions.py:20-28).

This module is pure Python: no Spark, no I/O. It runs on the driver only —
the log is KB-scale JSON and never touches executors.
"""

from __future__ import annotations

import dataclasses
import json
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, ClassVar


def timestamp_ms() -> int:
    """Current wall-clock in epoch milliseconds (Delta log convention)."""
    return int(time.time() * 1000)


@dataclass(kw_only=True)
class Action:
    """Base class: registry + tolerant (de)serialization."""

    #: JSON key this action serializes under; "" on the abstract base.
    action_name: ClassVar[str] = ""
    _registry: ClassVar[dict[str, type["Action"]]] = {}

    #: Unknown fields from foreign-engine logs, preserved verbatim.
    extra: dict[str, Any] = field(default_factory=dict)

    def __init_subclass__(cls, **kwargs: Any) -> None:
        super().__init_subclass__(**kwargs)
        name = cls.__dict__.get("action_name", "")
        if name:
            Action._registry[name] = cls

    @classmethod
    def from_json(cls, obj: dict[str, Any]) -> "Action":
        known = {f.name for f in dataclasses.fields(cls)} - {"extra"}
        kwargs = {k: v for k, v in obj.items() if k in known}
        extra = {k: v for k, v in obj.items() if k not in known}
        return cls(**kwargs, extra=extra)

    def to_json(self) -> dict[str, Any]:
        """Serialize to ``{action_name: {fields...}}``."""
        body: dict[str, Any] = {}
        for f in dataclasses.fields(self):
            if f.name == "extra":
                continue
            body[f.name] = getattr(self, f.name)
        body.update(self.extra)
        return {self.action_name: body}


def load_action(obj: dict[str, Any]) -> Action:
    """Dispatch one parsed log line to its action class.

    Unknown action types (e.g. ``checkpointMetadata``, future protocol
    additions) are preserved as :class:`UnknownAction` rather than
    failing — required for reading logs written by other engines.
    """
    for key, body in obj.items():
        cls = Action._registry.get(key)
        if cls is not None:
            return cls.from_json(body)
    return UnknownAction(raw=obj)


@dataclass(kw_only=True)
class UnknownAction(Action):
    """An action type this engine does not know; carried verbatim."""

    raw: dict[str, Any] = field(default_factory=dict)

    def to_json(self) -> dict[str, Any]:
        return self.raw


@dataclass(kw_only=True)
class Protocol(Action):
    """Reader/writer version gate (reference: actions.py:57-62)."""

    action_name: ClassVar[str] = "protocol"

    minReaderVersion: int = 1
    minWriterVersion: int = 2


def _default_format() -> dict[str, Any]:
    return {"provider": "parquet", "options": {}}


@dataclass(kw_only=True)
class TableMetadata(Action):
    """Table identity + schema + partitioning (reference: actions.py:70-95).

    ``schemaString`` holds the JSON-serialized Spark ``StructType`` — the
    Delta schema wire format is identical to ``StructType.jsonValue()``.
    """

    action_name: ClassVar[str] = "metaData"

    schemaString: str
    id: str = field(default_factory=lambda: str(uuid.uuid4()))
    name: str | None = None
    description: str | None = None
    format: dict[str, Any] = field(default_factory=_default_format)
    partitionColumns: list[str] = field(default_factory=list)
    configuration: dict[str, Any] = field(default_factory=dict)
    createdTime: int = field(default_factory=timestamp_ms)

    @property
    def schema_json(self) -> dict[str, Any]:
        return json.loads(self.schemaString)


@dataclass(kw_only=True)
class SetTransaction(Action):
    """``txn``: application transaction watermark (Delta protocol) —
    the idempotence record streaming writers use: a sink that already
    committed ``version`` for its ``appId`` skips the replay. Written
    by delta-spark / delta-rs streaming sinks with exactly this shape."""

    action_name: ClassVar[str] = "txn"

    appId: str
    version: int
    lastUpdated: int | None = None


class Operation:
    """Commit operation names (reference: actions.py:104-113)."""

    CREATE_TABLE = "CREATE TABLE"
    WRITE = "WRITE"
    DELETE = "DELETE"
    UPDATE = "UPDATE"
    RESTORE = "RESTORE"
    MERGE = "MERGE"
    OPTIMIZE = "OPTIMIZE"
    VACUUM_START = "VACUUM START"
    VACUUM_END = "VACUUM END"
    STREAMING_UPDATE = "STREAMING UPDATE"


@dataclass(kw_only=True)
class DomainMetadata(Action):
    """``domainMetadata``: a named key/value domain attached to the
    table state (Delta protocol Domain Metadata). Log replay keeps the
    newest action per domain; ``removed=True`` tombstones the domain.
    This engine writes the ``delta.rowTracking`` domain (row-id high
    watermark) and round-trips any foreign domain verbatim."""

    action_name: ClassVar[str] = "domainMetadata"

    domain: str
    configuration: str = ""
    removed: bool = False


@dataclass(kw_only=True)
class Cdc(Action):
    """``cdc``: a change-data file under ``_change_data/`` carrying the
    row-level changes of one commit (Delta protocol Change Data Feed).
    Rows in the file have the table schema plus a ``_change_type``
    column (insert / delete / update_preimage / update_postimage).
    When a commit has cdc actions, CDF readers use them INSTEAD of
    deriving changes from its add/remove actions."""

    action_name: ClassVar[str] = "cdc"

    path: str
    size: int = 0
    partitionValues: dict[str, str] = field(default_factory=dict)
    dataChange: bool = False


@dataclass(kw_only=True)
class TableCommit(Action):
    """``commitInfo``: operation name, parameters, metrics
    (reference: actions.py:104-150)."""

    action_name: ClassVar[str] = "commitInfo"

    timestamp: int = field(default_factory=timestamp_ms)
    operation: str = Operation.WRITE
    operationParameters: dict[str, Any] = field(default_factory=dict)
    operationMetrics: dict[str, Any] | None = None
    readVersion: int | None = None
    clientVersion: str = "xdlake-spark/0.1.0"

    @classmethod
    def create(cls, *, location: str, timestamp: int | None = None,
               metadata: dict[str, Any] | None = None,
               table_metadata: "TableMetadata | None" = None) -> "TableCommit":
        params: dict[str, Any] = {"location": location,
                                  "mode": "ErrorIfExists", "protocol": {}}
        if table_metadata is not None:
            # CREATE commitInfo carries the table metadata (incl.
            # partitionColumns) as a JSON string under "metadata" — the
            # reference resolves partition columns from exactly this key
            # (reference delta_log/__init__.py:96-97, actions.py:144-152)
            params["metadata"] = json.dumps(
                table_metadata.to_json()[TableMetadata.action_name])
        c = cls(operation=Operation.CREATE_TABLE, operationParameters=params)
        if timestamp is not None:
            c.timestamp = timestamp
        c.extra.update(metadata or {})
        return c

    @classmethod
    def write(cls, *, mode: str, partition_by: list[str] | None = None,
              metadata: dict[str, Any] | None = None) -> "TableCommit":
        params: dict[str, Any] = {"mode": mode}
        if partition_by:
            params["partitionBy"] = json.dumps(partition_by)
        c = cls(operation=Operation.WRITE, operationParameters=params)
        c.extra.update(metadata or {})
        return c

    @classmethod
    def delete(cls, *, predicate: str, read_version: int,
               metrics: dict[str, Any],
               metadata: dict[str, Any] | None = None) -> "TableCommit":
        c = cls(operation=Operation.DELETE,
                operationParameters={"predicate": predicate},
                operationMetrics=metrics, readVersion=read_version)
        c.extra.update(metadata or {})
        return c

    @classmethod
    def update(cls, *, predicate: str, read_version: int,
               metrics: dict[str, Any],
               metadata: dict[str, Any] | None = None) -> "TableCommit":
        c = cls(operation=Operation.UPDATE,
                operationParameters={"predicate": predicate},
                operationMetrics=metrics, readVersion=read_version)
        c.extra.update(metadata or {})
        return c

    @classmethod
    def restore(cls, *, restore_version: int, read_version: int,
                metadata: dict[str, Any] | None = None) -> "TableCommit":
        c = cls(operation=Operation.RESTORE,
                operationParameters={"version": restore_version},
                readVersion=read_version)
        c.extra.update(metadata or {})
        return c

    @classmethod
    def optimize(cls, *, read_version: int, metrics: dict[str, Any],
                 metadata: dict[str, Any] | None = None) -> "TableCommit":
        c = cls(operation=Operation.OPTIMIZE,
                operationParameters={"predicate": "[]", "auto": False},
                operationMetrics=metrics, readVersion=read_version)
        c.extra.update(metadata or {})
        return c

    @classmethod
    def merge(cls, *, predicate: str, read_version: int,
              metrics: dict[str, Any],
              metadata: dict[str, Any] | None = None) -> "TableCommit":
        c = cls(operation=Operation.MERGE,
                operationParameters={"predicate": predicate},
                operationMetrics=metrics, readVersion=read_version)
        c.extra.update(metadata or {})
        return c


@dataclass(kw_only=True)
class Add(Action):
    """One live data file (reference: actions.py:201-218).

    ``partitionValues`` are *strings* per the Delta protocol; readers re-type
    them against the table schema. ``stats`` is an embedded JSON string with
    numRecords / minValues / maxValues / nullCount.
    """

    action_name: ClassVar[str] = "add"

    path: str
    size: int = 0
    modificationTime: int = field(default_factory=timestamp_ms)
    partitionValues: dict[str, str] = field(default_factory=dict)
    dataChange: bool = True
    stats: str | None = None

    @property
    def stats_dict(self) -> dict[str, Any] | None:
        if not self.stats:
            return None
        try:
            return json.loads(self.stats)
        except (ValueError, TypeError):
            return None

    def to_remove(self, *, data_change: bool = True) -> "Remove":
        """Tombstone for this file (reference: actions.py:230-248).

        Carries the add's deletionVector descriptor through (protocol
        'remove' SHOULD include it) so VACUUM can later reclaim the
        orphaned DV file alongside the data file."""
        rm = Remove(
            path=self.path,
            dataChange=data_change,
            deletionTimestamp=timestamp_ms(),
            extendedFileMetadata=True,
            partitionValues=dict(self.partitionValues),
            size=self.size,
        )
        dv = (self.extra or {}).get("deletionVector")
        if dv:
            rm.extra = {**(rm.extra or {}), "deletionVector": dv}
        return rm


@dataclass(kw_only=True)
class Remove(Action):
    """Tombstone for a data file (reference: actions.py:220-228)."""

    action_name: ClassVar[str] = "remove"

    path: str
    dataChange: bool = True
    deletionTimestamp: int = field(default_factory=timestamp_ms)
    extendedFileMetadata: bool = True
    partitionValues: dict[str, str] = field(default_factory=dict)
    size: int | None = None
