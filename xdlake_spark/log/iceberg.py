"""Iceberg metadata generation (delta-spark UniForm parity): write a
spec-compliant Iceberg v2 snapshot — ``metadata/vN.metadata.json`` +
manifest list + manifest (Avro OCF, log/avro.py) + HadoopCatalog
``version-hint.text`` — describing the table's CURRENT live file set,
so an Iceberg reader (Spark/Trino/DuckDB-iceberg/pyiceberg) can scan
the same parquet files without Delta support. The reference has no
Iceberg surface; delta-spark's UniForm does the same conversion
engine-side (IcebergConversionTransaction), incrementally; successive
generations CHAIN (parent-snapshot-id, advancing sequence numbers,
metadata-log), so the Iceberg history mirrors the cadence of
generate() calls.

Scale: manifest-scale driver I/O only — one Avro record per live data
file, no Spark job, no data reads (record counts ride the Delta stats
already in the log).

Layout written under ``<table>/metadata/``:

- ``v{N}.metadata.json``  — Iceberg TableMetadata (format-version 2)
- ``snap-{sid}-{seq}-{uuid}.avro`` — manifest list
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

__all__ = ["generate_iceberg_metadata", "iceberg_schema",
           "read_iceberg_snapshot", "spark_type_from_iceberg"]


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


# -- Iceberg -> Spark (the read path) ----------------------------------------

_PRIM_TO_SPARK = {
    "boolean": T.BooleanType, "int": T.IntegerType,
    "long": T.LongType, "float": T.FloatType, "double": T.DoubleType,
    "date": T.DateType, "timestamp": T.TimestampNTZType,
    "timestamptz": T.TimestampType, "string": T.StringType,
    "binary": T.BinaryType, "uuid": T.StringType,
}


def spark_type_from_iceberg(t: Any) -> T.DataType:
    """Inverse of :func:`_iceberg_type` over the supported family."""
    if isinstance(t, str):
        if t in _PRIM_TO_SPARK:
            return _PRIM_TO_SPARK[t]()
        if t.startswith("decimal("):
            p, s = t[len("decimal("):-1].split(",")
            return T.DecimalType(int(p), int(s))
        raise ValueError(f"no Spark mapping for Iceberg type {t!r}")
    kind = t["type"]
    if kind == "struct":
        return T.StructType([
            T.StructField(f["name"],
                          spark_type_from_iceberg(f["type"]),
                          not f.get("required", False))
            for f in t["fields"]])
    if kind == "list":
        return T.ArrayType(spark_type_from_iceberg(t["element"]),
                           not t.get("element-required", False))
    if kind == "map":
        return T.MapType(spark_type_from_iceberg(t["key"]),
                         spark_type_from_iceberg(t["value"]),
                         not t.get("value-required", False))
    raise ValueError(f"no Spark mapping for Iceberg type {t!r}")


def _partition_to_delta_string(v: Any, ice_type: str) -> "str | None":
    """Manifest partition value -> the Delta log's string convention."""
    import datetime
    if v is None:
        return None
    if ice_type == "date":
        return (datetime.date(1970, 1, 1)
                + datetime.timedelta(days=int(v))).isoformat()
    if ice_type == "boolean":
        return "true" if v else "false"
    return str(v)


def read_iceberg_snapshot(metadata_location) -> dict:
    """Parse an Iceberg table's CURRENT snapshot into plain data:
    ``{"schema": StructType, "partition_columns": [...], "files":
    [{path, record_count, file_size, partition: {col: str}}]}``.

    ``metadata_location`` is a Location of either the table root
    (resolved via ``metadata/version-hint.text``, HadoopCatalog
    convention) or a specific ``*.metadata.json``. Position-delete
    files are returned under ``position_deletes`` and equality-delete
    files under ``equality_deletes`` (r12) — the caller converts both
    to Delta deletion vectors. Non-parquet files refuse loudly.

    Partition transforms (r12): ``identity`` fields map to Delta
    partition columns as before. The common non-identity transforms —
    ``bucket[N]``, ``truncate[W]``, ``year``, ``month``, ``day``,
    ``hour``, ``void`` — are ACCEPTED but cannot map to Delta
    partition columns (Delta partitions by column VALUE; a bucket id
    or truncated prefix is not one), so they drop out of the
    declaration: a pure-bucket spec imports unpartitioned-with-stats,
    a mixed spec keeps its identity columns (a subset declaration is
    sound — it just prunes less). Since Iceberg writers always store
    every column in the data files themselves, scans stay correct
    either way (``dropped_transforms`` lists what was dropped).
    Unknown transforms still refuse loudly.
    """
    from .avro import read_avro_file
    loc = metadata_location
    if not loc.url.endswith(".metadata.json"):
        meta_dir = loc.join("metadata")
        hint = int(meta_dir.join("version-hint.text")
                   .read_bytes().decode().strip())
        loc = meta_dir.join(f"v{hint}.metadata.json")
    md = json.loads(loc.read_bytes())
    sid = md.get("current-snapshot-id")
    snap = next((s for s in md.get("snapshots", [])
                 if s["snapshot-id"] == sid), None)
    if snap is None:
        raise ValueError(f"no current snapshot in {loc.url}")
    schemas = {s.get("schema-id", 0): s for s in md["schemas"]} \
        if "schemas" in md else {0: md["schema"]}
    schema_json = schemas.get(snap.get("schema-id",
                                       md.get("current-schema-id", 0)))
    spark_schema = spark_type_from_iceberg(schema_json)
    by_id = {f["id"]: f for f in schema_json["fields"]}
    spec = next(s for s in md["partition-specs"]
                if s["spec-id"] == md.get("default-spec-id", 0))
    import re as _re
    known_nonidentity = _re.compile(
        r"^(?:bucket\[\d+\]|truncate\[\d+\]|year|month|day|hour|void)$")
    pcols, ptypes = [], []
    dropped_transforms = []
    for f in spec["fields"]:
        tr = f["transform"]
        if tr == "identity":
            src = by_id[f["source-id"]]
            pcols.append(src["name"])
            ptypes.append(src["type"])
        elif known_nonidentity.match(tr):
            dropped_transforms.append((f["name"], tr))
        else:
            raise ValueError(
                f"unsupported partition transform {tr!r}")
    # non-identity fields drop out (their values are layout, not
    # column values); identity fields REMAIN Delta partition columns —
    # a subset declaration is sound (each file genuinely holds one
    # value per identity column), it just prunes less than the full
    # Iceberg spec could. A pure-bucket/truncate spec imports
    # unpartitioned.

    from ..sources.storage import Location as _Loc
    list_loc = _Loc.resolve(snap["manifest-list"])
    _, manifests, _ = read_avro_file(list_loc.read_bytes())
    files = []
    position_deletes = []
    equality_deletes = []
    for m in manifests:
        mcontent = m.get("content", 0)
        if mcontent not in (0, 1):
            raise ValueError(
                f"unknown Iceberg manifest content {mcontent!r}")
        _, entries, _ = read_avro_file(
            _Loc.resolve(m["manifest_path"]).read_bytes())
        for e in entries:
            if e["status"] == 2:    # DELETED in this snapshot
                continue
            d = e["data_file"]
            dcontent = d.get("content", 0)
            if d["file_format"].upper() != "PARQUET":
                raise ValueError(
                    f"unsupported file format "
                    f"{d['file_format']!r} (parquet only)")
            # sequence-number inheritance (spec): a null entry seq
            # inherits the manifest's
            eseq = e.get("sequence_number")
            if eseq is None:
                eseq = m.get("sequence_number", 0)
            if dcontent == 2:
                # v2 EQUALITY delete file (r12): parquet whose rows
                # name VALUES to delete, matched on the equality_ids
                # columns — convertible to DVs via one Spark job
                # (import_iceberg._iceberg_equality_delete_map)
                ids = list(d.get("equality_ids") or [])
                if not ids or any(i not in by_id for i in ids):
                    raise ValueError(
                        "equality delete file "
                        f"{d['file_path']!r} has unresolvable "
                        f"equality_ids {ids!r}")
                equality_deletes.append({
                    "path": d["file_path"],
                    "record_count": int(d["record_count"]),
                    "seq": int(eseq or 0),
                    "columns": [by_id[i]["name"] for i in ids]})
                continue
            if mcontent == 1 or dcontent == 1:
                # v2 POSITION delete file: parquet of
                # (file_path, pos) — convertible to deletion vectors
                position_deletes.append({
                    "path": d["file_path"],
                    "record_count": int(d["record_count"]),
                    "seq": int(eseq or 0)})
                continue
            part = {c: _partition_to_delta_string(
                        (d.get("partition") or {}).get(c), t)
                    for c, t in zip(pcols, ptypes)}
            files.append({"path": d["file_path"],
                          "record_count": int(d["record_count"]),
                          "file_size": int(d["file_size_in_bytes"]),
                          "partition": part,
                          "seq": int(eseq or 0)})
    return {"schema": spark_schema, "partition_columns": pcols,
            "files": files, "position_deletes": position_deletes,
            "equality_deletes": equality_deletes,
            "dropped_transforms": dropped_transforms}


def _load_snapshot_entries(meta_dir, md: dict, snapshot_id) -> dict:
    """Live file entries of one snapshot in an already-generated
    metadata dict: file_path -> {snapshot_id, seq, fseq, data_file}.
    Used to chain generations incrementally — carried files keep their
    ORIGINAL sequence numbers and adding snapshot, so Iceberg
    incremental/changelog consumers don't re-read the whole table at
    every generation. Manifests are resolved by basename inside
    ``meta_dir`` (this generator always writes them there)."""
    from .avro import read_avro_file
    snap = next((s for s in md.get("snapshots", [])
                 if s["snapshot-id"] == snapshot_id), None)
    if snap is None:
        return {}
    out: dict = {}
    list_name = posixpath.basename(snap["manifest-list"])
    _, manifests, _ = read_avro_file(
        meta_dir.join(list_name).read_bytes())
    for m in manifests:
        mname = posixpath.basename(m["manifest_path"])
        _, entries, _ = read_avro_file(
            meta_dir.join(mname).read_bytes())
        for e in entries:
            if e["status"] == 2:       # DELETED: not live
                continue
            eseq = e.get("sequence_number")
            if eseq is None:            # spec: inherit manifest's
                eseq = m.get("sequence_number", 0)
            fseq = e.get("file_sequence_number")
            if fseq is None:
                fseq = eseq
            out[e["data_file"]["file_path"]] = {
                "snapshot_id": e.get("snapshot_id"),
                "seq": int(eseq or 0), "fseq": int(fseq or 0),
                "data_file": e["data_file"]}
    return out


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

    # snapshot chaining (Iceberg history): a prior generation's
    # metadata carries forward — its snapshots stay listed, the new
    # snapshot records parent-snapshot-id, sequence numbers advance,
    # and the prior metadata.json lands in metadata-log. Regenerating
    # at the SAME Delta version is idempotent (same snapshot id). A
    # schema change between generations resets the chain (old
    # snapshots' schema-id would lie about their data).
    prior = None
    try:
        prior_hint = int(meta_dir.join("version-hint.text")
                         .read_bytes().decode().strip())
        prior = json.loads(
            meta_dir.join(f"v{prior_hint}.metadata.json").read_bytes())
    except Exception:
        prior = None
    compatible = bool(
        prior
        and prior.get("schemas") == [schema_json]
        and prior.get("partition-specs")
        == [{"spec-id": 0, "fields": spec_fields}])
    regen = compatible \
        and prior.get("current-snapshot-id") == snapshot_id
    prior_chain = compatible and not regen
    if regen:
        # same Delta version regenerated (UniForm retry, manual call):
        # the snapshot already heads the chain — rewrite the identical
        # state; NEVER reset the accumulated history
        seq = int(prior["last-sequence-number"])
        cur_snap = next(s for s in prior["snapshots"]
                        if s["snapshot-id"] == snapshot_id)
        parent_id = cur_snap.get("parent-snapshot-id")
        carried_snaps = [s for s in prior["snapshots"]
                         if s["snapshot-id"] != snapshot_id]
        carried_log = [e for e in prior.get("snapshot-log", [])
                       if e["snapshot-id"] != snapshot_id]
        carried_mdlog = prior.get("metadata-log", [])
    elif prior_chain:
        seq = int(prior["last-sequence-number"]) + 1
        parent_id = prior["current-snapshot-id"]
        carried_snaps = prior["snapshots"]
        carried_log = prior.get("snapshot-log", [])
        carried_mdlog = (prior.get("metadata-log", [])
                         + [{"metadata-file": meta_dir.join(
                             f"v{prior_hint}.metadata.json").url,
                             "timestamp-ms":
                             prior["last-updated-ms"]}])
    else:
        seq = 1
        parent_id = None
        carried_snaps = []
        carried_log = []
        carried_mdlog = []

    # parent snapshot's live files (chained generation, or the parent
    # of the snapshot being regenerated — recomputing regen against
    # the same parent reproduces identical entry statuses, keeping
    # regeneration idempotent): carried files are written status=0
    # EXISTING with their ORIGINAL sequence numbers and adding
    # snapshot, new files status=1 ADDED at the new sequence number,
    # and files the parent held that are no longer live get status=2
    # DELETED tombstones — so Iceberg incremental/changelog consumers
    # see the actual delta, not a full re-add of the table every
    # generation. Unreadable parent manifests fall back to all-ADDED
    # (correct scan results, degraded incremental fidelity).
    parent_files: dict = {}
    if (prior_chain or regen) and parent_id is not None:
        try:
            parent_files = _load_snapshot_entries(meta_dir, prior,
                                                  parent_id)
        except Exception:
            parent_files = {}

    # -- manifest: one entry per live add, + tombstones -------------------
    entries = []
    total_rows = added_rows = existing_rows = deleted_rows = 0
    n_added = n_existing = n_deleted = 0
    live_paths = set()
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
        fp = table.location.absloc(a.path).url
        live_paths.add(fp)
        pe = parent_files.get(fp)
        if pe is not None:
            status, e_sid = 0, pe["snapshot_id"]
            e_seq, e_fseq = pe["seq"], pe["fseq"]
            n_existing += 1
            existing_rows += int(n)
        else:
            status, e_sid = 1, snapshot_id
            e_seq = e_fseq = seq
            n_added += 1
            added_rows += int(n)
        entries.append({
            "status": status,
            "snapshot_id": e_sid,
            "sequence_number": e_seq,
            "file_sequence_number": e_fseq,
            "data_file": {
                "content": 0,
                "file_path": fp,
                "file_format": "PARQUET",
                "partition": part,
                "record_count": int(n),
                "file_size_in_bytes": int(a.size or 0),
            }})
    for fp in sorted(parent_files):
        if fp in live_paths:
            continue
        pe = parent_files[fp]
        n_deleted += 1
        deleted_rows += int(pe["data_file"].get("record_count") or 0)
        entries.append({
            "status": 2,                    # DELETED by this snapshot
            "snapshot_id": snapshot_id,
            "sequence_number": seq,         # seq of the delete
            "file_sequence_number": pe["fseq"],  # seq when added
            "data_file": pe["data_file"]})
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
    list_name = f"snap-{snapshot_id}-{seq}-{gen_uuid}.avro"
    min_seq = min((e["sequence_number"] for e in entries), default=seq)
    list_bytes = write_avro_file(
        manifest_file_schema,
        [{"manifest_path": meta_dir.join(manifest_name).url,
          "manifest_length": len(manifest_bytes),
          "partition_spec_id": 0,
          "content": 0,
          "sequence_number": seq,
          "min_sequence_number": min_seq,
          "added_snapshot_id": snapshot_id,
          "added_files_count": n_added,
          "existing_files_count": n_existing,
          "deleted_files_count": n_deleted,
          "added_rows_count": added_rows,
          "existing_rows_count": existing_rows,
          "deleted_rows_count": deleted_rows}],
        metadata={"format-version": "2"})
    meta_dir.join(list_name).write_bytes(list_bytes)

    # -- table metadata ----------------------------------------------------
    now = timestamp_ms()
    metadata = {
        "format-version": 2,
        "table-uuid": str(_uuid.uuid5(
            _uuid.NAMESPACE_URL, table.log.metadata().id)),
        "location": table.location.url,
        "last-sequence-number": seq,
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
        "snapshots": carried_snaps + [{
            "snapshot-id": snapshot_id,
            **({"parent-snapshot-id": parent_id}
               if parent_id is not None else {}),
            "timestamp-ms": now,
            "sequence-number": seq,
            # operation reflects the actual delta: pure additions are
            # an append; anything that dropped a parent file is an
            # overwrite (so incremental consumers don't treat carried
            # files as fresh appends)
            "summary": {"operation": ("append" if n_deleted == 0
                                      else "overwrite"),
                        "added-data-files": str(n_added),
                        "added-records": str(added_rows),
                        "removed-data-files": str(n_deleted),
                        "deleted-records": str(deleted_rows),
                        "total-records": str(total_rows),
                        "total-data-files": str(n_added + n_existing)},
            "manifest-list": meta_dir.join(list_name).url,
            "schema-id": 0,
        }],
        "snapshot-log": carried_log + [{"snapshot-id": snapshot_id,
                                        "timestamp-ms": now}],
        "metadata-log": carried_mdlog,
    }
    hint = version + 1  # HadoopCatalog versions start at 1
    md_name = f"v{hint}.metadata.json"
    meta_dir.join(md_name).write_bytes(
        json.dumps(metadata, indent=1).encode("utf-8"))
    meta_dir.join("version-hint.text").write_bytes(
        str(hint).encode("utf-8"))
    return posixpath.join("metadata", md_name)
