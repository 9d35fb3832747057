"""From-spec Avro codec (log/avro.py): golden bytes hand-assembled
from the Avro 1.11 spec (never passing through the writer), full
round-trips including Hypothesis-generated records, and the container
framing (metadata map, sync markers, deflate codec)."""

import io
import json
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from xdlake_spark.log.avro import (decode_value, encode_value,
                                   read_avro_file, write_avro_file)


def zz(n):
    """Reference zigzag-varint encoder, written independently of the
    module (digit-at-a-time from the spec's worked examples)."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class TestBinaryEncodingGolden:
    """Spec worked examples: the value encodings in the Avro 1.11
    'Binary Encoding' section, asserted byte-for-byte."""

    CASES = [
        ("long", 0, b"\x00"),
        ("long", -1, b"\x01"),
        ("long", 1, b"\x02"),
        ("long", -2, b"\x03"),
        ("long", 2, b"\x04"),
        ("long", -64, b"\x7f"),
        ("long", 64, b"\x80\x01"),
        ("string", "foo", b"\x06foo"),
        ("boolean", True, b"\x01"),
        ("boolean", False, b"\x00"),
        ("bytes", b"\x01\x02", b"\x04\x01\x02"),
        ("double", 1.0, struct.pack("<d", 1.0)),
        ("float", 2.5, struct.pack("<f", 2.5)),
    ]

    def test_encode_matches_spec_bytes(self):
        for schema, value, want in self.CASES:
            out = io.BytesIO()
            encode_value(out, schema, value)
            assert out.getvalue() == want, (schema, value)

    def test_decode_matches_spec_bytes(self):
        for schema, value, raw in self.CASES:
            got = decode_value(io.BytesIO(raw), schema)
            assert got == value, (schema, raw)

    def test_union_and_array_golden(self):
        # spec: union [null,string] holding "a" = index 1 then string
        out = io.BytesIO()
        encode_value(out, ["null", "string"], "a")
        assert out.getvalue() == b"\x02\x02a"
        out = io.BytesIO()
        encode_value(out, ["null", "string"], None)
        assert out.getvalue() == b"\x00"
        # spec worked example: array<long> [3, 27] = 04 06 36 00
        out = io.BytesIO()
        encode_value(out, {"type": "array", "items": "long"}, [3, 27])
        assert out.getvalue() == b"\x04\x06\x36\x00"


class TestContainerGolden:
    def test_hand_assembled_file_decodes(self):
        """An OCF assembled byte-by-byte from the spec's file-format
        section — the reader must parse it; nothing here came from
        the writer."""
        schema = {"type": "record", "name": "g", "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"}]}
        sjson = json.dumps(schema).encode()
        sync = bytes(range(16))
        body = zz(10) + zz(3) + b"foo" + zz(-4) + zz(2) + b"hi"
        raw = (b"Obj\x01"
               + zz(2)                                   # 2 meta keys
               + zz(11) + b"avro.schema" + zz(len(sjson)) + sjson
               + zz(10) + b"avro.codec" + zz(4) + b"null"
               + zz(0)                                    # end meta map
               + sync
               + zz(2) + zz(len(body)) + body + sync)     # one block
        got_schema, records, meta = read_avro_file(raw)
        assert got_schema == schema
        assert records == [{"a": 10, "b": "foo"}, {"a": -4, "b": "hi"}]
        assert meta["avro.codec"] == "null"

    def test_negative_block_count_with_size(self):
        """Array blocks may carry a negative count + byte size (spec:
        fast skipping) — readers must handle it; assembled by hand."""
        items = zz(7) + zz(8)
        raw = zz(-2) + zz(len(items)) + items + zz(0)
        got = decode_value(io.BytesIO(raw),
                           {"type": "array", "items": "long"})
        assert got == [7, 8]

    def test_roundtrip_with_deflate(self):
        schema = {"type": "record", "name": "r", "fields": [
            {"name": "x", "type": "string"}]}
        recs = [{"x": "abc" * 50}] * 20
        data = write_avro_file(schema, recs, codec="deflate")
        _, got, meta = read_avro_file(data)
        assert got == recs and meta["avro.codec"] == "deflate"
        assert len(data) < len(write_avro_file(schema, recs))

    def test_sync_marker_corruption_detected(self):
        schema = {"type": "record", "name": "r", "fields": [
            {"name": "x", "type": "long"}]}
        data = bytearray(write_avro_file(schema, [{"x": 1}]))
        data[-1] ^= 0xFF
        with pytest.raises(ValueError, match="sync"):
            read_avro_file(bytes(data))

    def test_deterministic_bytes(self):
        schema = {"type": "record", "name": "r", "fields": [
            {"name": "x", "type": "long"}]}
        a = write_avro_file(schema, [{"x": 5}], metadata={"k": "v"})
        b = write_avro_file(schema, [{"x": 5}], metadata={"k": "v"})
        assert a == b


REC_SCHEMA = {"type": "record", "name": "h", "fields": [
    {"name": "i", "type": "long"},
    {"name": "s", "type": ["null", "string"], "default": None},
    {"name": "f", "type": "double"},
    {"name": "b", "type": "boolean"},
    {"name": "arr", "type": {"type": "array", "items": "int"}},
    {"name": "m", "type": {"type": "map", "values": "long"}},
    {"name": "sub", "type": {"type": "record", "name": "hs",
                             "fields": [{"name": "y",
                                         "type": "string"}]}},
]}

rec_st = st.fixed_dictionaries({
    "i": st.integers(min_value=-(2 ** 62), max_value=2 ** 62),
    "s": st.one_of(st.none(), st.text(max_size=40)),
    "f": st.floats(allow_nan=False, allow_infinity=False),
    "b": st.booleans(),
    "arr": st.lists(st.integers(min_value=-(2 ** 31),
                                max_value=2 ** 31 - 1), max_size=8),
    "m": st.dictionaries(st.text(min_size=1, max_size=8),
                         st.integers(min_value=-(2 ** 62),
                                     max_value=2 ** 62), max_size=5),
    "sub": st.fixed_dictionaries({"y": st.text(max_size=20)}),
})


class TestPropertyRoundTrip:
    @settings(max_examples=60, deadline=None)
    @given(st.lists(rec_st, max_size=12))
    def test_ocf_roundtrip(self, recs):
        data = write_avro_file(REC_SCHEMA, recs)
        schema, got, _ = read_avro_file(data)
        assert schema == REC_SCHEMA
        assert got == recs
