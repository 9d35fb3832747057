"""Deletion-vector decode: Delta's row-level soft deletes.

Modern delta-spark / delta-rs mark rows within a live parquet file as
deleted via a *deletion vector* — a serialized 64-bit roaring bitmap of
row indexes — referenced from the add action's ``deletionVector``
descriptor. Everything here is implemented from the public Delta
protocol spec (PROTOCOL.md "Deletion Vectors" + the RoaringFormatSpec):

- descriptor ``storageType``: ``'u'`` = relative file whose name derives
  from a Z85-encoded UUID (``<prefix?><20-char z85>`` →
  ``<table>/<prefix>/deletion_vector_<uuid>.bin``), ``'i'`` = the data
  itself Z85-inlined in the descriptor, ``'p'`` = absolute path.
- DV file layout: 1-byte format version (=1), then per-DV at
  ``offset``: ``<size: 4B big-endian><data: size bytes><CRC-32 of
  data: 4B big-endian>``.
- ``data``: ``<magic 1681511377: 4B little-endian>`` + the "portable"
  RoaringBitmapArray serialization — ``<number of 32-bit bitmaps: 8B
  LE>`` then each bitmap (implicit key = position) in the standard
  32-bit roaring portable format (cookie 12346/12347, array / bitmap /
  run containers).

The serializer exists for fixture-building and round-trip tests (the
sandbox has neither delta-spark nor pyroaring to produce foreign
fixtures); byte-level cases in tests/test_dv.py are hand-checked
against the published format spec.

Reference posture: xbrianh/xdlake refuses DV-bearing adds outright
(README "unsupported"); this engine reads them.
"""

from __future__ import annotations

import struct
import uuid as _uuid
import zlib

import numpy as np

Z85_ALPHABET = ("0123456789abcdefghijklmnopqrstuvwxyz"
                "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#")
_Z85_INV = {c: i for i, c in enumerate(Z85_ALPHABET)}

MAGIC = 1681511377
SERIAL_COOKIE = 12347              # has run containers
SERIAL_COOKIE_NO_RUN = 12346
NO_OFFSET_THRESHOLD = 4


def z85_decode(s: str) -> bytes:
    """ZeroMQ Z85: 5 chars -> 4 bytes, big-endian base 85."""
    if len(s) % 5:
        raise ValueError(f"Z85 length {len(s)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(s), 5):
        acc = 0
        for c in s[i:i + 5]:
            try:
                acc = acc * 85 + _Z85_INV[c]
            except KeyError:
                raise ValueError(f"invalid Z85 character {c!r}")
        out += acc.to_bytes(4, "big")
    return bytes(out)


def z85_encode(b: bytes) -> str:
    if len(b) % 4:
        raise ValueError(f"Z85 input length {len(b)} not a multiple of 4")
    out = []
    for i in range(0, len(b), 4):
        acc = int.from_bytes(b[i:i + 4], "big")
        chunk = []
        for _ in range(5):
            acc, r = divmod(acc, 85)
            chunk.append(Z85_ALPHABET[r])
        out.extend(reversed(chunk))
    return "".join(out)


def dv_relative_path(path_or_inline: str) -> str:
    """'u' storage: ``<random prefix?><20-char z85 uuid>`` ->
    ``<prefix>/deletion_vector_<uuid>.bin`` (prefix may be empty)."""
    if len(path_or_inline) < 20:
        raise ValueError(
            f"'u' deletion vector id too short: {path_or_inline!r}")
    prefix, enc = path_or_inline[:-20], path_or_inline[-20:]
    u = _uuid.UUID(bytes=z85_decode(enc))
    name = f"deletion_vector_{u}.bin"
    return f"{prefix}/{name}" if prefix else name


def _parse_roaring32(buf: memoryview, pos: int) -> tuple[np.ndarray, int]:
    """One standard 32-bit roaring bitmap (portable format) starting at
    ``pos``; returns (sorted uint32 values, next position)."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    if (cookie & 0xFFFF) == SERIAL_COOKIE:
        n_cont = (cookie >> 16) + 1
        pos += 4
        n_flag_bytes = (n_cont + 7) // 8
        run_flags = np.unpackbits(
            np.frombuffer(buf, np.uint8, n_flag_bytes, pos),
            bitorder="little")[:n_cont].astype(bool)
        pos += n_flag_bytes
        has_offsets = n_cont >= NO_OFFSET_THRESHOLD
    elif cookie == SERIAL_COOKIE_NO_RUN:
        (n_cont,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        run_flags = np.zeros(n_cont, dtype=bool)
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie}")

    keys = np.empty(n_cont, dtype=np.uint32)
    cards = np.empty(n_cont, dtype=np.int64)
    for i in range(n_cont):
        k, cm1 = struct.unpack_from("<HH", buf, pos)
        keys[i], cards[i] = k, cm1 + 1
        pos += 4
    if has_offsets:
        pos += 4 * n_cont  # byte offsets; we parse sequentially

    parts: list[np.ndarray] = []
    for i in range(n_cont):
        base = np.uint32(keys[i]) << np.uint32(16)
        if run_flags[i]:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = np.frombuffer(buf, "<u2", n_runs * 2, pos) \
                .reshape(n_runs, 2)
            pos += 4 * n_runs
            vals = np.concatenate([
                np.arange(int(s), int(s) + int(l) + 1, dtype=np.uint32)
                for s, l in runs]) if n_runs else \
                np.empty(0, np.uint32)
        elif cards[i] <= 4096:
            vals = np.frombuffer(buf, "<u2", int(cards[i]), pos) \
                .astype(np.uint32)
            pos += 2 * int(cards[i])
        else:
            bits = np.unpackbits(
                np.frombuffer(buf, np.uint8, 8192, pos),
                bitorder="little")
            vals = np.nonzero(bits)[0].astype(np.uint32)
            pos += 8192
        parts.append(base | vals)
    values = np.concatenate(parts) if parts else np.empty(0, np.uint32)
    return values, pos


def deserialize_dv_data(data: bytes) -> np.ndarray:
    """``<magic 4B LE><portable RoaringBitmapArray>`` -> sorted int64
    row indexes."""
    if len(data) < 12:
        raise ValueError("deletion vector data truncated")
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != MAGIC:
        raise ValueError(f"bad deletion vector magic {magic}")
    (n_bitmaps,) = struct.unpack_from("<q", data, 4)
    buf = memoryview(data)
    pos = 12
    parts: list[np.ndarray] = []
    for hi in range(n_bitmaps):
        vals32, pos = _parse_roaring32(buf, pos)
        parts.append(vals32.astype(np.int64) + (hi << 32))
    out = np.concatenate(parts) if parts else np.empty(0, np.int64)
    out.sort()
    return out


def read_dv_bytes(location, descriptor: dict) -> bytes:
    """Resolve a deletionVector descriptor against the table root
    ``location`` (sources.storage.Location) and return the serialized
    DV data bytes (magic + bitmap)."""
    st = descriptor.get("storageType")
    poi = descriptor.get("pathOrInlineDv", "")
    size = int(descriptor.get("sizeInBytes", 0))
    if st == "i":
        data = z85_decode(poi)[:size] if size else z85_decode(poi)
        return data
    if st == "u":
        loc = location.join(dv_relative_path(poi))
    elif st == "p":
        from ..sources.storage import Location
        loc = Location.resolve(poi)
    else:
        raise ValueError(f"unknown deletion vector storageType {st!r}")
    raw = loc.read_bytes()
    off = int(descriptor.get("offset", 1))
    (stored_size,) = struct.unpack_from(">i", raw, off)
    data = raw[off + 4:off + 4 + stored_size]
    if len(data) != stored_size:
        raise ValueError("deletion vector file truncated")
    (crc,) = struct.unpack_from(">I", raw, off + 4 + stored_size)
    if crc != (zlib.crc32(data) & 0xFFFFFFFF):
        raise ValueError("deletion vector checksum mismatch")
    return data


def deleted_row_indexes(location, descriptor: dict) -> np.ndarray:
    """Descriptor -> sorted int64 array of deleted row indexes, length
    checked against the descriptor's ``cardinality``."""
    vals = deserialize_dv_data(read_dv_bytes(location, descriptor))
    card = descriptor.get("cardinality")
    if card is not None and int(card) != len(vals):
        raise ValueError(
            f"deletion vector cardinality {card} != decoded {len(vals)}")
    return vals


# -- serialization (fixtures / round-trip tests / future DV writes) --------

def _serialize_roaring32(values: np.ndarray,
                         use_runs: bool = False) -> bytes:
    """Standard portable 32-bit roaring serialization of sorted uint32
    values. ``use_runs`` emits run containers (cookie 12347) for every
    container — exercising the reader's run path."""
    values = np.asarray(values, dtype=np.uint32)
    keys = np.unique(values >> np.uint32(16)).astype(np.uint32)
    groups = {int(k): (values[(values >> np.uint32(16)) == k]
                       & np.uint32(0xFFFF)).astype(np.uint16)
              for k in keys}
    n_cont = len(keys)
    out = bytearray()
    if use_runs:
        out += struct.pack("<I", ((n_cont - 1) << 16) | SERIAL_COOKIE)
        flags = np.zeros((n_cont + 7) // 8, dtype=np.uint8)
        for i in range(n_cont):
            flags[i // 8] |= 1 << (i % 8)
        out += flags.tobytes()
        has_offsets = n_cont >= NO_OFFSET_THRESHOLD
    else:
        out += struct.pack("<II", SERIAL_COOKIE_NO_RUN, n_cont)
        has_offsets = True
    for k in keys:
        out += struct.pack("<HH", int(k), len(groups[int(k)]) - 1)
    offset_at = len(out)
    if has_offsets:
        out += b"\x00" * (4 * n_cont)  # patched below
    offsets = []
    for i, k in enumerate(keys):
        offsets.append(len(out))
        lows = groups[int(k)]
        if use_runs:
            # split sorted values into maximal runs
            runs = []
            start = prev = int(lows[0])
            for v in lows[1:]:
                v = int(v)
                if v == prev + 1:
                    prev = v
                    continue
                runs.append((start, prev - start))
                start = prev = v
            runs.append((start, prev - start))
            out += struct.pack("<H", len(runs))
            for s, l in runs:
                out += struct.pack("<HH", s, l)
        elif len(lows) <= 4096:
            out += lows.astype("<u2").tobytes()
        else:
            bits = np.zeros(1 << 16, dtype=np.uint8)
            bits[lows] = 1
            out += np.packbits(bits, bitorder="little").tobytes()
    if has_offsets:
        for i, o in enumerate(offsets):
            struct.pack_into("<I", out, offset_at + 4 * i, o)
    return bytes(out)


def serialize_dv_data(row_indexes, use_runs: bool = False) -> bytes:
    """Sorted row indexes -> ``<magic><portable RoaringBitmapArray>``."""
    vals = np.asarray(sorted(set(int(v) for v in row_indexes)),
                      dtype=np.int64)
    n_bitmaps = int(vals[-1] >> 32) + 1 if len(vals) else 0
    out = bytearray(struct.pack("<iq", MAGIC, n_bitmaps))
    for hi in range(n_bitmaps):
        sel = vals[(vals >> 32) == hi] & 0xFFFFFFFF
        out += _serialize_roaring32(sel.astype(np.uint32),
                                    use_runs=use_runs)
    return bytes(out)


def write_dv_file(location, row_indexes,
                  use_runs: bool = False) -> dict:
    """Write a spec-layout DV file under the table root and return the
    add-action descriptor referencing it ('u' storage)."""
    return write_dv_files_packed(location, [row_indexes],
                                 use_runs=use_runs)[0]


def write_dv_files_packed(location, index_sets,
                          use_runs: bool = False) -> "list[dict]":
    """Pack MANY deletion vectors into ONE spec-layout ``.bin`` (the
    delta-spark convention): a single 1-byte-version file whose entries
    sit at increasing offsets, each ``<4B BE size><data><4B BE crc>``.
    Returns one descriptor per input index set, all sharing the same
    ``pathOrInlineDv`` with distinct offsets.  At scale this turns a
    delete touching thousands of files into ONE object-store PUT
    instead of thousands."""
    u = _uuid.uuid4()
    rel = f"deletion_vector_{u}.bin"
    body = bytearray(b"\x01")
    descs: list[dict] = []
    for row_indexes in index_sets:
        data = serialize_dv_data(row_indexes, use_runs=use_runs)
        descs.append({"storageType": "u",
                      "pathOrInlineDv": z85_encode(u.bytes),
                      "offset": len(body),
                      "sizeInBytes": len(data),
                      "cardinality": len(set(int(v)
                                             for v in row_indexes))})
        body += struct.pack(">i", len(data)) + data + \
            struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    location.join(rel).write_bytes(bytes(body))
    return descs
