"""``xdlake`` as a first-class Spark data source (Python DataSource API).

Registers a format usable as both a batch source and — the real point —
a STREAMING source that tails the transaction log by version:

    from xdlake_spark.sources.datasource import register
    register(spark)
    df = spark.read.format("xdlake").load(path)              # snapshot
    s  = (spark.readStream.format("xdlake").load(path)       # tail
          .writeStream...)

Offsets are log versions, so each micro-batch reads exactly the data
files ADDED in ``(start_version, end_version]`` with ``dataChange``
(compaction rewrites are skipped) — the same contract as
``DeltaTable.table_changes``. One InputPartition per file: executors read
their file with pyarrow and yield Arrow batches, the driver only plans
manifests. The reference is batch-only (SURVEY §2.4 — streaming absent);
this extends it.

For heavy batch analytics prefer ``DeltaTable.to_df`` — that path scans
parquet natively in the JVM. This source trades a Python/Arrow hop for
incremental semantics, which is the right trade for a streaming tail.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamReader,
                                    DataSourceStreamWriter, InputPartition,
                                    WriterCommitMessage)
from pyspark.sql.types import StructType


class _FilePartition(InputPartition):
    def __init__(self, url: str, partition_values: dict,
                 schema_json: str, fixed_change: "str | None" = None,
                 commit_version: "int | None" = None,
                 deleted_rows: "list[int] | None" = None):
        self.url = url
        self.partition_values = partition_values
        self.schema_json = schema_json
        #: CDF mode: constant _change_type for derived changes
        #: ("insert"/"delete"); None = the file itself carries the
        #: column (a cdc file) or the stream is not in CDF mode.
        self.fixed_change = fixed_change
        #: CDF mode: _commit_version value; None outside CDF mode.
        self.commit_version = commit_version
        #: Deletion-vector row indexes for this file (decoded on the
        #: driver — per-file KB/MB scale); executor drops them.
        self.deleted_rows = deleted_rows


def _read_file_partition(part: _FilePartition):
    """Executor-side: one parquet file -> arrow batches aligned to the
    table schema (partition columns re-attached from the manifest; in
    CDF mode ``_change_type``/``_commit_version`` attached from the
    partition plan or read from the cdc file itself)."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import StructType as _St

    from ..log.schema import partition_value_to_python, spark_type_to_arrow

    spark_schema = _St.fromJson(json.loads(part.schema_json))
    cdf = part.commit_version is not None
    arrow_schema = pa.schema([
        pa.field(f.name, spark_type_to_arrow(f.dataType), f.nullable)
        for f in spark_schema.fields
        if f.name not in ("_change_type", "_commit_version")])
    path = part.url
    if path.startswith("file://"):
        path = path[len("file://"):]
    table = pq.read_table(path)
    if part.deleted_rows:
        import numpy as np
        mask = np.ones(table.num_rows, dtype=bool)
        idx = np.asarray(part.deleted_rows, dtype=np.int64)
        mask[idx[idx < table.num_rows]] = False
        table = table.filter(pa.array(mask))
    n = table.num_rows
    cols = []
    for field in arrow_schema:
        if field.name in table.column_names:
            cols.append(table.column(field.name).cast(field.type))
        else:
            v = partition_value_to_python(
                part.partition_values.get(field.name),
                spark_schema[field.name].dataType)
            cols.append(pa.array([v] * n).cast(field.type))
    fields = list(arrow_schema)
    if cdf:
        if part.fixed_change is not None:
            change = pa.array([part.fixed_change] * n)
        elif "_change_type" in table.column_names:
            change = table.column("_change_type").cast(pa.string())
        else:
            raise ValueError(
                f"cdc file {part.url} lacks a _change_type column")
        cols.append(change)
        fields.append(pa.field("_change_type", pa.string()))
        cols.append(pa.array([part.commit_version] * n, pa.int64()))
        fields.append(pa.field("_commit_version", pa.int64()))
    out = pa.table(cols, schema=pa.schema(fields))
    for batch in out.to_batches(max_chunksize=65536):
        yield batch


def _dv_rows(loc, add) -> "list[int] | None":
    """Decode an add's deletion vector (if any) into row indexes —
    driver-side, per-file KB/MB scale."""
    desc = (add.extra or {}).get("deletionVector")
    if not desc:
        return None
    from ..log.dv import deleted_row_indexes
    return [int(i) for i in deleted_row_indexes(loc, desc)]


def _plan_partitions(location_url: str, start_v: int,
                     end_v: int,
                     skip_change_commits: bool = False,
                     ) -> list[_FilePartition]:
    """Driver-side: manifest of files added in (start_v, end_v].

    ``skip_change_commits`` is Delta's ``skipChangeCommits``: a commit
    that REMOVES data (delete/update/merge — copy-on-write rewrites
    and deletion-vector re-adds alike) is skipped wholesale, so the
    stream emits only pure appends and never re-emits rows a rewrite
    or DV re-add carried.  Without it such commits re-emit their
    surviving rows (the historical behavior, matching Delta's
    ignoreChanges)."""
    from ..log import DeltaLog
    from .storage import Location

    loc = Location.resolve(location_url)
    log = DeltaLog.load(loc.join("_delta_log"), use_checkpoint=False)
    if not log:
        return []
    schema_json = log.schema().json()
    parts: list[_FilePartition] = []
    for v in sorted(log.entries):
        if start_v < v <= end_v:
            entry = log.entries[v]
            if skip_change_commits and any(
                    rm.dataChange for rm in entry.removes):
                continue
            for add in entry.adds:
                if add.dataChange:
                    parts.append(_FilePartition(
                        loc.absloc(add.path).url,
                        dict(add.partitionValues or {}), schema_json,
                        deleted_rows=_dv_rows(loc, add)))
    return parts


def _plan_cdf_partitions(location_url: str, start_v: int,
                         end_v: int) -> list[_FilePartition]:
    """Driver-side CDF planner for (start_v, end_v]: per version, cdc
    files when the commit has them, else insert-derivation from
    dataChange adds and delete-derivation from dataChange removes
    (scanning the tombstoned file — valid until VACUUM), matching
    ``DeltaTable.change_feed``."""
    from ..log import DeltaLog
    from .storage import Location

    loc = Location.resolve(location_url)
    log = DeltaLog.load(loc.join("_delta_log"), use_checkpoint=False)
    if not log:
        return []
    schema_json = log.schema().json()
    parts: list[_FilePartition] = []
    for v in sorted(log.entries):
        if not (start_v < v <= end_v):
            continue
        entry = log.entries[v]
        cdcs = entry.cdcs
        if cdcs:
            for c in cdcs:
                parts.append(_FilePartition(
                    loc.absloc(c.path).url,
                    dict(c.partitionValues or {}), schema_json,
                    fixed_change=None, commit_version=v))
            continue
        for add in entry.adds:
            if add.dataChange:
                parts.append(_FilePartition(
                    loc.absloc(add.path).url,
                    dict(add.partitionValues or {}), schema_json,
                    fixed_change="insert", commit_version=v))
        dels = {r.path for r in entry.removes if r.dataChange}
        if dels:
            add_of = {}
            for pv in sorted(log.entries):
                if pv >= v:
                    break
                for a in log.entries[pv].adds:
                    if a.path in dels:
                        add_of[a.path] = a  # latest add before v wins
            for a in add_of.values():
                parts.append(_FilePartition(
                    loc.absloc(a.path).url,
                    dict(a.partitionValues or {}), schema_json,
                    fixed_change="delete", commit_version=v))
    return parts


class _XdlakeStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, read_change_feed: bool = False,
                 skip_change_commits: bool = False):
        self.path = path
        self.read_change_feed = read_change_feed
        self.skip_change_commits = skip_change_commits

    def _current_version(self) -> int:
        from ..log import DeltaLog
        from .storage import Location
        log = DeltaLog.load(
            Location.resolve(self.path).join("_delta_log"))
        return log.version if log else -1

    def initialOffset(self) -> dict:
        return {"version": -1}  # stream starts with the full snapshot

    def latestOffset(self) -> dict:
        return {"version": self._current_version()}

    def partitions(self, start: dict, end: dict):
        if self.read_change_feed:
            return _plan_cdf_partitions(self.path,
                                        int(start["version"]),
                                        int(end["version"]))
        return _plan_partitions(self.path, int(start["version"]),
                                int(end["version"]),
                                self.skip_change_commits)

    def read(self, partition) -> Iterator:
        yield from _read_file_partition(partition)

    def commit(self, end: dict) -> None:
        pass  # offsets are durable in the checkpoint; nothing to ack


class _XdlakeBatchReader(DataSourceReader):
    def __init__(self, path: str):
        self.path = path

    def partitions(self):
        from ..log import DeltaLog
        from .storage import Location
        log = DeltaLog.load(
            Location.resolve(self.path).join("_delta_log"))
        if not log:
            return []
        # snapshot = everything up to the current version; the shared
        # planner skips nothing at start=-1 but honors remove-replay by
        # scanning the LIVE set instead of the raw adds
        loc = Location.resolve(self.path)
        schema_json = log.schema().json()
        return [
            _FilePartition(loc.absloc(p).url,
                           dict(a.partitionValues or {}), schema_json,
                           deleted_rows=_dv_rows(loc, a))
            for p, a in log.add_actions().items()
        ]

    def read(self, partition) -> Iterator:
        yield from _read_file_partition(partition)


class XdlakeDataSource(DataSource):
    """Spark format name ``xdlake``: batch + streaming reads of a delta
    table written by this library (or any flat-schema delta table)."""

    @classmethod
    def name(cls) -> str:
        return "xdlake"

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("xdlake source requires .load(<table path>)")
        return path

    def _cdf(self) -> bool:
        return str(self.options.get("readChangeFeed", "false")
                   ).lower() == "true"

    def schema(self) -> StructType:
        from pyspark.sql.types import LongType, StringType, StructField

        from ..log import DeltaLog
        from .storage import Location
        log = DeltaLog.load(
            Location.resolve(self._path()).join("_delta_log"))
        if not log:
            raise ValueError(f"No delta table at {self._path()}")
        cm = (log.metadata().configuration or {}).get(
            "delta.columnMapping.mode", "none")
        if cm in ("name", "id"):
            raise NotImplementedError(
                "the xdlake format reads files by logical column name; "
                f"this table uses column mapping mode {cm!r} — use "
                "DeltaTable.to_df(), which resolves the mapping.")
        schema = log.schema()
        if self._cdf():
            schema = StructType(
                list(schema.fields)
                + [StructField("_change_type", StringType()),
                   StructField("_commit_version", LongType())])
        return schema

    def reader(self, schema: StructType) -> DataSourceReader:
        if self._cdf():
            raise ValueError(
                "readChangeFeed is a STREAMING option "
                "(spark.readStream); for batch use "
                "DeltaTable.change_feed(start, end)")
        return _XdlakeBatchReader(self._path())

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        skip = str(self.options.get("skipChangeCommits", "false")
                   ).lower() == "true"
        return _XdlakeStreamReader(self._path(),
                                   read_change_feed=self._cdf(),
                                   skip_change_commits=skip)

    def streamWriter(self, schema: StructType,
                     overwrite: bool) -> "DataSourceStreamWriter":
        """Streaming SINK: one ACID append commit per micro-batch into an
        EXISTING (unpartitioned) table; replayed batch ids are no-ops.
        Create the table first with ``DeltaTable.write`` (or use
        ``streaming.ingest.stream_append`` for partitioned tables)."""
        return _XdlakeStreamWriter(self._path(), schema.json())


def register(spark) -> None:
    """Register the ``xdlake`` format on a SparkSession."""
    spark.dataSource.register(XdlakeDataSource)


# ---------------------------------------------------------------------------
# Streaming sink: writeStream.format("xdlake") with per-batch ACID commits
# ---------------------------------------------------------------------------


@dataclass
class _WrittenFile(WriterCommitMessage):
    rel_path: str
    size: int
    stats_json: str
    num_rows: int


class _XdlakeStreamWriter(DataSourceStreamWriter):
    """Each executor task writes its partition to one parquet file under
    the table root (versioned later by the commit); the driver composes
    add actions and appends them as ONE log commit per micro-batch, with
    batch-id idempotence so a replayed batch after a failure is a no-op
    (exactly-once table contents on at-least-once task execution)."""

    def __init__(self, path: str, schema_json: str):
        self.path = path
        self.schema_json = schema_json

    def write(self, iterator) -> _WrittenFile:
        import json
        import os
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.types import StructType as _St

        from ..log.schema import spark_type_to_arrow
        from ..log.statistics import Statistics
        from .storage import Location

        spark_schema = _St.fromJson(json.loads(self.schema_json))
        arrow_schema = pa.schema([
            pa.field(f.name, spark_type_to_arrow(f.dataType), f.nullable)
            for f in spark_schema.fields])
        rows = [r.asDict() for r in iterator]
        if not rows:
            return _WrittenFile("", 0, "", 0)
        table = pa.Table.from_pylist(rows).cast(arrow_schema)
        # no leading underscore: Spark's parquet reader treats _/.-
        # prefixed basenames as hidden and would skip them on scan
        rel = f"streaming-{_uuid.uuid4().hex}.parquet"
        loc = Location.resolve(self.path).join(rel)
        if loc.scheme == "file":
            os.makedirs(os.path.dirname(loc.path), exist_ok=True)
            pq.write_table(table, loc.path)
            size = os.path.getsize(loc.path)
            stats = Statistics.from_parquet_file(loc.path)
        else:  # object stores: buffer then put
            import io
            buf = io.BytesIO()
            pq.write_table(table, buf)
            data = buf.getvalue()
            loc.write_bytes(data)
            size = len(data)
            stats = Statistics.from_parquet_metadata(
                pq.ParquetFile(io.BytesIO(data)).metadata)
        return _WrittenFile(rel, size, stats.to_json(), table.num_rows)

    def commit(self, messages, batchId: int) -> None:
        from ..log import (DeltaLog, Add, SetTransaction,
                           append_table_entry, commit_entry, timestamp_ms)
        from .storage import Location

        loc = Location.resolve(self.path)
        log_loc = loc.join("_delta_log")
        log = DeltaLog.load(log_loc)
        # idempotence via the Delta protocol's txn watermark: a Spark
        # retry re-runs the same batchId -> no-op regardless of any
        # commits other writers landed in between (stronger than
        # checking only the newest commitInfo)
        app_id = f"xdlake-streaming:{loc.url}"
        seen = log.latest_txn_version(app_id)
        if seen is not None and seen >= batchId:
            return
        adds = [Add(path=m.rel_path, size=m.size,
                    modificationTime=timestamp_ms(), partitionValues={},
                    stats=m.stats_json)
                for m in messages if m is not None and m.num_rows > 0]
        if not adds:
            return
        entry = append_table_entry(
            adds, [], custom_metadata={"streamingBatchId": batchId},
            txn=SetTransaction(appId=app_id, version=batchId,
                               lastUpdated=timestamp_ms()))

        def _stamp_ict_if_enabled() -> None:
            # an ICT-enabled table's clock must stay monotonic through
            # streaming commits too; re-stamped per retry so a winner's
            # newer ICT is still strictly exceeded
            cfg = log.metadata().configuration or {}
            if str(cfg.get("delta.enableInCommitTimestamps", "false")
                   ).lower() != "true":
                return
            prev = log.last_ict()
            ci = entry.commit_info
            ict = max(timestamp_ms(),
                      (prev + 1) if prev is not None else 0)
            ci.extra["inCommitTimestamp"] = ict
            ci.timestamp = ict
            entry.actions.remove(ci)
            entry.actions.insert(0, ci)

        _stamp_ict_if_enabled()
        for attempt in range(5):
            try:
                commit_entry(log_loc, log.version_to_write, entry)
                return
            except FileExistsError:
                if attempt == 4:
                    raise
                log = DeltaLog.load(log_loc)
                _stamp_ict_if_enabled()

    def abort(self, messages, batchId: int) -> None:
        from .storage import Location
        for m in messages:
            if m is not None and m.rel_path:
                f = Location.resolve(self.path).join(m.rel_path)
                if f.exists():
                    f.delete()
