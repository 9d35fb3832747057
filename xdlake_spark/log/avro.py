"""Apache Avro binary encoding + Object Container Files, from the
Avro 1.11 specification — writer AND reader, pure Python.

Iceberg's manifest and manifest-list files are Avro OCF; the sandbox
has no avro library, so this implements the required subset from the
published spec (the repo's from-spec codec pattern — see
operators/codecs.py): zigzag-varint ints/longs, IEEE little-endian
floats, length-prefixed bytes/strings, records, [null, T] unions,
block-encoded arrays/maps, fixed — plus the container framing (magic,
metadata map carrying the schema JSON, 16-byte sync marker, one or
more record blocks). Codec: ``null`` and ``deflate``.

The reader exists for two reasons: round-trip validation of every
file this engine writes (tests/test_avro.py pins the writer against
hand-assembled golden bytes that never pass through the writer), and
foreign-manifest ingestion. No external schema registry — the OCF is
self-describing.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any

__all__ = ["write_avro_file", "read_avro_file",
           "encode_value", "decode_value"]

MAGIC = b"Obj\x01"


# -- primitive binary encoding (spec: Binary Encoding) ---------------------

def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(out: io.BytesIO, n: int) -> None:
    z = _zigzag(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise EOFError("truncated avro varint")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc)
        shift += 7


def _write_bytes(out: io.BytesIO, data: bytes) -> None:
    _write_long(out, len(data))
    out.write(data)


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated avro bytes")
    return data


# -- schema-driven value encoding ------------------------------------------

def encode_value(out: io.BytesIO, schema: Any, value: Any) -> None:
    """Encode ``value`` per ``schema`` (parsed JSON: str primitive name
    or dict/list complex type)."""
    if isinstance(schema, str):
        t = schema
        if t == "null":
            if value is not None:
                raise ValueError(f"null schema, value {value!r}")
            return
        if t == "boolean":
            out.write(b"\x01" if value else b"\x00")
            return
        if t in ("int", "long"):
            _write_long(out, int(value))
            return
        if t == "float":
            out.write(struct.pack("<f", float(value)))
            return
        if t == "double":
            out.write(struct.pack("<d", float(value)))
            return
        if t == "bytes":
            _write_bytes(out, bytes(value))
            return
        if t == "string":
            _write_bytes(out, str(value).encode("utf-8"))
            return
        raise ValueError(f"unsupported avro primitive {t!r}")
    if isinstance(schema, list):                      # union
        idx = _union_branch(schema, value)
        _write_long(out, idx)
        encode_value(out, schema[idx], value)
        return
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            if f["name"] not in value and "default" not in f:
                raise ValueError(
                    f"record field {f['name']!r} missing and has no "
                    "default")
            encode_value(out, f["type"],
                         value.get(f["name"], f.get("default")))
        return
    if t == "array":
        items = list(value or [])
        if items:
            _write_long(out, len(items))
            for it in items:
                encode_value(out, schema["items"], it)
        _write_long(out, 0)
        return
    if t == "map":
        entries = dict(value or {})
        if entries:
            _write_long(out, len(entries))
            for k, v in entries.items():
                _write_bytes(out, str(k).encode("utf-8"))
                encode_value(out, schema["values"], v)
        _write_long(out, 0)
        return
    if t == "fixed":
        data = bytes(value)
        if len(data) != schema["size"]:
            raise ValueError("fixed size mismatch")
        out.write(data)
        return
    if t == "enum":
        _write_long(out, schema["symbols"].index(value))
        return
    # logical types ride their underlying primitive
    if t in ("int", "long", "float", "double", "bytes", "string",
             "boolean", "null"):
        encode_value(out, t, value)
        return
    raise ValueError(f"unsupported avro type {t!r}")


def _union_branch(schemas: list, value: Any) -> int:
    """First branch that accepts the value — Iceberg unions are always
    [null, T] / [T, null], so null-vs-not decides."""
    for i, s in enumerate(schemas):
        if (s == "null") == (value is None):
            return i
    raise ValueError(f"no union branch for {value!r} in {schemas}")


def decode_value(buf: io.BytesIO, schema: Any) -> Any:
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return buf.read(1) == b"\x01"
        if t in ("int", "long"):
            return _read_long(buf)
        if t == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if t == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if t == "bytes":
            return _read_bytes(buf)
        if t == "string":
            return _read_bytes(buf).decode("utf-8")
        raise ValueError(f"unsupported avro primitive {t!r}")
    if isinstance(schema, list):
        idx = _read_long(buf)
        return decode_value(buf, schema[idx])
    t = schema["type"]
    if t == "record":
        return {f["name"]: decode_value(buf, f["type"])
                for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:           # block with byte-size prefix
                n = -n
                _read_long(buf)
            for _ in range(n):
                out.append(decode_value(buf, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = decode_value(buf, schema["values"])
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "enum":
        return schema["symbols"][_read_long(buf)]
    if t in ("int", "long", "float", "double", "bytes", "string",
             "boolean", "null"):
        return decode_value(buf, t)
    raise ValueError(f"unsupported avro type {t!r}")


# -- Object Container File framing ------------------------------------------

def write_avro_file(schema: dict, records: list, codec: str = "null",
                    metadata: "dict[str, str] | None" = None) -> bytes:
    """Serialize ``records`` into one Avro OCF with the schema embedded
    (plus any extra ``metadata`` strings — Iceberg stores its own
    schema/partition-spec JSON there). Deterministic except for the
    sync marker, which is derived from the content hash so identical
    inputs produce identical bytes (replayable commits)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    body = io.BytesIO()
    for rec in records:
        encode_value(body, schema, rec)
    payload = body.getvalue()
    if codec == "deflate":
        # spec: raw deflate, no zlib header/checksum
        payload = zlib.compress(payload)[2:-4] if payload else payload
    import hashlib
    meta = {"avro.schema": json.dumps(schema, separators=(",", ":")),
            "avro.codec": codec}
    for k, v in (metadata or {}).items():
        meta[k] = v
    sync = hashlib.md5(
        payload + meta["avro.schema"].encode()).digest()
    out = io.BytesIO()
    out.write(MAGIC)
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode("utf-8"))
        _write_bytes(out, v.encode("utf-8") if isinstance(v, str)
                     else bytes(v))
    _write_long(out, 0)
    out.write(sync)
    if records:
        _write_long(out, len(records))
        _write_long(out, len(payload))
        out.write(payload)
        out.write(sync)
    return out.getvalue()


def read_avro_file(data: bytes) -> "tuple[dict, list, dict]":
    """Parse one OCF: returns (schema, records, file_metadata)."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an avro object container file")
    meta: dict = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_long(buf)
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf.read(16)
    records: list = []
    while True:
        try:
            count = _read_long(buf)
        except EOFError:
            break
        size = _read_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        bb = io.BytesIO(block)
        for _ in range(count):
            records.append(decode_value(bb, schema))
        if buf.read(16) != sync:
            raise ValueError("avro block sync marker mismatch")
    return schema, records, {k: v.decode("utf-8", "replace")
                             for k, v in meta.items()}
