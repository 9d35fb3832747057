"""Iceberg metadata generation (delta-spark UniForm parity): write a
spec-compliant Iceberg v2 snapshot — ``metadata/vN.metadata.json`` +
manifest list + manifest (Avro OCF, log/avro.py) + HadoopCatalog
``version-hint.text`` — describing the table's CURRENT live file set,
so an Iceberg reader (Spark/Trino/DuckDB-iceberg/pyiceberg) can scan
the same parquet files without Delta support. The reference has no
Iceberg surface; delta-spark's UniForm does the same conversion
engine-side (IcebergConversionTransaction), incrementally; a full
snapshot rewrite per call is an equally valid Iceberg history and
keeps the generator stateless.

Scale: manifest-scale driver I/O only — one Avro record per live data
file, no Spark job, no data reads (record counts ride the Delta stats
already in the log).

Layout written under ``<table>/metadata/``:

- ``v{N}.metadata.json``  — Iceberg TableMetadata (format-version 2)
- ``snap-{sid}-1-{uuid}.avro`` — manifest list (one manifest)
- ``{uuid}-m0.avro``      — manifest of every live data file
- ``version-hint.text``   — HadoopCatalog current-version pointer
"""

from __future__ import annotations

import json
import posixpath
import uuid as _uuid
from typing import Any

from pyspark.sql import types as T

from .actions import timestamp_ms
from .avro import write_avro_file

__all__ = ["generate_iceberg_metadata", "iceberg_schema"]


# -- Spark -> Iceberg schema with fresh field ids ---------------------------

def _iceberg_type(dt: T.DataType, alloc) -> Any:
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
        return "int"
    if isinstance(dt, T.LongType):
        return "long"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp"
    if isinstance(dt, T.TimestampType):
        return "timestamptz"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.StructType):
        return {"type": "struct",
                "fields": _struct_fields(dt, alloc)}
    if isinstance(dt, T.ArrayType):
        eid = alloc()
        return {"type": "list", "element-id": eid,
                "element": _iceberg_type(dt.elementType, alloc),
                "element-required": not dt.containsNull}
    if isinstance(dt, T.MapType):
        kid, vid = alloc(), alloc()
        return {"type": "map", "key-id": kid,
                "key": _iceberg_type(dt.keyType, alloc),
                "value-id": vid,
                "value": _iceberg_type(dt.valueType, alloc),
                "value-required": not dt.valueContainsNull}
    raise ValueError(f"no Iceberg mapping for Spark type {dt}")


def _struct_fields(st: T.StructType, alloc) -> list:
    """Iceberg's fresh-id assignment order: ids for a struct's direct
    fields first, then recurse (TypeUtil.assignFreshIds)."""
    ids = [alloc() for _ in st.fields]
    out = []
    for fid, f in zip(ids, st.fields):
        out.append({"id": fid, "name": f.name,
                    "required": not f.nullable,
                    "type": _iceberg_type(f.dataType, alloc)})
    return out


def iceberg_schema(schema: T.StructType) -> "tuple[dict, int]":
    """(Iceberg schema JSON with fresh field ids, last assigned id)."""
    counter = {"n": 0}

    def alloc() -> int:
        counter["n"] += 1
        return counter["n"]

    fields = _struct_fields(schema, alloc)
    return ({"type": "struct", "schema-id": 0, "fields": fields},
            counter["n"])


# -- partition handling ------------------------------------------------------

#: Iceberg primitive -> (avro type json, python caster from the Delta
#: log's string partition value). Dates are stored as int days from
#: epoch per the Iceberg spec's partition-data representation.
def _partition_avro_and_cast(ice_type: str):
    import datetime
    if ice_type == "int":
        return "int", int
    if ice_type == "long":
        return "long", int
    if ice_type == "string":
        return "string", str
    if ice_type == "boolean":
        return "boolean", lambda v: str(v).lower() == "true"
    if ice_type == "date":
        return ({"type": "int", "logicalType": "date"},
                lambda v: (datetime.date.fromisoformat(v)
                           - datetime.date(1970, 1, 1)).days)
    raise ValueError(
        f"unsupported Iceberg partition type {ice_type!r} — identity "
        "partitions on int/long/string/boolean/date columns only")


# -- the generator -----------------------------------------------------------

def generate_iceberg_metadata(table) -> str:
    """Write the Iceberg snapshot for ``table``'s current state;
    returns the metadata.json path relative to the table root.
    Refuses deletion vectors (an Iceberg v2 reader without the
    matching delete files would resurrect deleted rows) — run
    ``reorg_purge()`` first, the same rule as symlink manifests."""
    if table.schema is None:
        raise ValueError(f"No delta table at {table.location.url}")
    adds = table.adds
    for a in adds.values():
        if (a.extra or {}).get("deletionVector"):
            raise ValueError(
                "Iceberg snapshot cannot represent deletion vectors — "
                "run reorg_purge() first (delta-spark UniForm refuses "
                "DV tables too)")
    schema_json, last_col_id = iceberg_schema(table.schema)
    by_name = {f["name"]: f for f in schema_json["fields"]}
    pcols = table.partition_columns
    for c in pcols:
        if c not in by_name:
            raise ValueError(f"partition column {c!r} not in schema")

    # partition spec (identity transforms, spec field ids 1000+)
    spec_fields = [{"name": c, "transform": "identity",
                    "source-id": by_name[c]["id"],
                    "field-id": 1000 + i}
                   for i, c in enumerate(pcols)]
    part_avro_fields = []
    casters = []
    for i, c in enumerate(pcols):
        ice_t = by_name[c]["type"]
        if not isinstance(ice_t, str):
            raise ValueError(f"partition column {c!r} is not primitive")
        avro_t, cast = _partition_avro_and_cast(ice_t)
        part_avro_fields.append(
            {"name": c, "type": ["null", avro_t], "default": None,
             "field-id": 1000 + i})
        casters.append(cast)
    partition_schema = {"type": "record", "name": "r102",
                        "fields": part_avro_fields}

    data_file_schema = {
        "type": "record", "name": "r2", "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {"name": "partition", "type": partition_schema,
             "field-id": 102},
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long",
             "field-id": 104},
        ]}
    manifest_entry_schema = {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"],
             "default": None, "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"],
             "default": None, "field-id": 3},
            {"name": "file_sequence_number", "type": ["null", "long"],
             "default": None, "field-id": 4},
            {"name": "data_file", "type": data_file_schema,
             "field-id": 2},
        ]}

    version = table.version
    # deterministic ids: replaying the same snapshot generation must
    # produce the same pointers (put-if-absent friendly); Date-free
    snapshot_id = int.from_bytes(
        _uuid.uuid5(_uuid.NAMESPACE_URL,
                    f"{table.log.metadata().id}/{version}").bytes[:8],
        "big") >> 1
    gen_uuid = _uuid.uuid5(_uuid.NAMESPACE_URL,
                           f"{table.log.metadata().id}/{version}/m")

    meta_dir = table.location.join("metadata")
    meta_dir.mkdir()

    # -- manifest: one entry per live add --------------------------------
    entries = []
    total_rows = 0
    for rel in sorted(adds):
        a = adds[rel]
        sd = a.stats_dict or {}
        n = sd.get("numRecords")
        if n is None:
            raise ValueError(
                f"live file {a.path!r} has no numRecords stats — run "
                "recompute_stats() before generating Iceberg metadata "
                "(Iceberg requires record_count per data file)")
        total_rows += int(n)
        part = {}
        for c, cast in zip(pcols, casters):
            raw = (a.partitionValues or {}).get(c)
            part[c] = None if raw is None or raw == "" else cast(raw)
        entries.append({
            "status": 1,  # ADDED in this snapshot
            "snapshot_id": snapshot_id,
            "sequence_number": 1,
            "file_sequence_number": 1,
            "data_file": {
                "content": 0,
                "file_path": table.location.absloc(a.path).url,
                "file_format": "PARQUET",
                "partition": part,
                "record_count": int(n),
                "file_size_in_bytes": int(a.size or 0),
            }})
    manifest_common_meta = {
        "schema": json.dumps(schema_json, separators=(",", ":")),
        "partition-spec": json.dumps(spec_fields,
                                     separators=(",", ":")),
        "partition-spec-id": "0",
        "format-version": "2",
    }
    manifest_name = f"{gen_uuid}-m0.avro"
    manifest_bytes = write_avro_file(
        manifest_entry_schema, entries,
        metadata={**manifest_common_meta, "content": "data"})
    meta_dir.join(manifest_name).write_bytes(manifest_bytes)

    # -- manifest list ----------------------------------------------------
    manifest_file_schema = {
        "type": "record", "name": "manifest_file", "fields": [
            {"name": "manifest_path", "type": "string",
             "field-id": 500},
            {"name": "manifest_length", "type": "long",
             "field-id": 501},
            {"name": "partition_spec_id", "type": "int",
             "field-id": 502},
            {"name": "content", "type": "int", "field-id": 517},
            {"name": "sequence_number", "type": "long",
             "field-id": 515},
            {"name": "min_sequence_number", "type": "long",
             "field-id": 516},
            {"name": "added_snapshot_id", "type": "long",
             "field-id": 503},
            {"name": "added_files_count", "type": "int",
             "field-id": 504},
            {"name": "existing_files_count", "type": "int",
             "field-id": 505},
            {"name": "deleted_files_count", "type": "int",
             "field-id": 506},
            {"name": "added_rows_count", "type": "long",
             "field-id": 512},
            {"name": "existing_rows_count", "type": "long",
             "field-id": 513},
            {"name": "deleted_rows_count", "type": "long",
             "field-id": 514},
        ]}
    list_name = f"snap-{snapshot_id}-1-{gen_uuid}.avro"
    list_bytes = write_avro_file(
        manifest_file_schema,
        [{"manifest_path": meta_dir.join(manifest_name).url,
          "manifest_length": len(manifest_bytes),
          "partition_spec_id": 0,
          "content": 0,
          "sequence_number": 1,
          "min_sequence_number": 1,
          "added_snapshot_id": snapshot_id,
          "added_files_count": len(entries),
          "existing_files_count": 0,
          "deleted_files_count": 0,
          "added_rows_count": total_rows,
          "existing_rows_count": 0,
          "deleted_rows_count": 0}],
        metadata={"format-version": "2"})
    meta_dir.join(list_name).write_bytes(list_bytes)

    # -- table metadata ----------------------------------------------------
    now = timestamp_ms()
    metadata = {
        "format-version": 2,
        "table-uuid": str(_uuid.uuid5(
            _uuid.NAMESPACE_URL, table.log.metadata().id)),
        "location": table.location.url,
        "last-sequence-number": 1,
        "last-updated-ms": now,
        "last-column-id": last_col_id,
        "current-schema-id": 0,
        "schemas": [schema_json],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "last-partition-id": (999 + len(spec_fields)
                              if spec_fields else 999),
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {"write.format.default": "parquet"},
        "current-snapshot-id": snapshot_id,
        "snapshots": [{
            "snapshot-id": snapshot_id,
            "timestamp-ms": now,
            "sequence-number": 1,
            "summary": {"operation": "append",
                        "added-data-files": str(len(entries)),
                        "added-records": str(total_rows),
                        "total-records": str(total_rows),
                        "total-data-files": str(len(entries))},
            "manifest-list": meta_dir.join(list_name).url,
            "schema-id": 0,
        }],
        "snapshot-log": [{"snapshot-id": snapshot_id,
                          "timestamp-ms": now}],
        "metadata-log": [],
    }
    hint = version + 1  # HadoopCatalog versions start at 1
    md_name = f"v{hint}.metadata.json"
    meta_dir.join(md_name).write_bytes(
        json.dumps(metadata, indent=1).encode("utf-8"))
    meta_dir.join("version-hint.text").write_bytes(
        str(hint).encode("utf-8"))
    return posixpath.join("metadata", md_name)
