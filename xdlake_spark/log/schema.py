"""Schema handling: Delta ``schemaString`` ⇄ Spark ``StructType`` ⇄ Arrow.

The Delta schema wire format IS Spark's ``StructType.jsonValue()`` format, so
the engine's native schema representation is ``StructType`` — no intermediate
dataclass is needed (the reference needs one because it is Arrow-native:
/root/reference/xdlake/delta_log/schema.py:55-109).

Covers the reference's full type map (schema.py:17-53) including unsigned-int
narrowing on write and the float->double read-side widening quirk, and extends
it with nested types (array/map/struct/decimal) which Spark supports natively
— the reference rejects these (schema.py:6-15) but parity only requires flat.

Pure driver-side; importing ``pyspark.sql.types`` does not start a JVM.
"""

from __future__ import annotations

import json
from typing import Iterable

import pyarrow as pa
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Delta schemaString <-> StructType
# ---------------------------------------------------------------------------


def schema_to_string(schema: T.StructType) -> str:
    """Serialize a StructType into a Delta ``schemaString``."""
    return json.dumps(schema.jsonValue(), separators=(",", ":"))


def schema_from_string(schema_string: str) -> T.StructType:
    """Parse a Delta ``schemaString`` into a StructType."""
    return T.StructType.fromJson(json.loads(schema_string))


# ---------------------------------------------------------------------------
# Arrow -> Spark  (write-side map; reference schema.py:17-38)
# ---------------------------------------------------------------------------

_ARROW_TO_SPARK: dict[pa.DataType, T.DataType] = {
    pa.bool_(): T.BooleanType(),
    pa.int8(): T.ByteType(),
    pa.uint8(): T.ByteType(),        # unsigned narrowed into signed,
    pa.int16(): T.ShortType(),       # matching the reference's write-side
    pa.uint16(): T.ShortType(),      # behavior (schema.py:23-26)
    pa.int32(): T.IntegerType(),
    pa.uint32(): T.IntegerType(),
    pa.int64(): T.LongType(),
    pa.uint64(): T.LongType(),
    pa.float32(): T.FloatType(),
    pa.float64(): T.DoubleType(),
    pa.date32(): T.DateType(),
    pa.date64(): T.DateType(),
    pa.string(): T.StringType(),
    pa.large_string(): T.StringType(),
    pa.binary(): T.BinaryType(),
    pa.large_binary(): T.BinaryType(),
}


def arrow_type_to_spark(dt: pa.DataType) -> T.DataType:
    if dt in _ARROW_TO_SPARK:
        return _ARROW_TO_SPARK[dt]
    if pa.types.is_timestamp(dt):
        # tz-aware -> timestamp (UTC-adjusted); naive -> timestamp_ntz
        # (reference schema.py:7-11)
        return T.TimestampType() if dt.tz else T.TimestampNTZType()
    if pa.types.is_decimal(dt):
        return T.DecimalType(dt.precision, dt.scale)
    if pa.types.is_list(dt) or pa.types.is_large_list(dt):
        return T.ArrayType(arrow_type_to_spark(dt.value_type),
                           containsNull=dt.value_field.nullable)
    if pa.types.is_map(dt):
        return T.MapType(arrow_type_to_spark(dt.key_type),
                         arrow_type_to_spark(dt.item_type),
                         valueContainsNull=dt.item_field.nullable)
    if pa.types.is_struct(dt):
        return T.StructType([
            T.StructField(f.name, arrow_type_to_spark(f.type), f.nullable)
            for f in dt
        ])
    if pa.types.is_dictionary(dt):
        return arrow_type_to_spark(dt.value_type)
    raise TypeError(f"Cannot handle arrow type {dt}")


def arrow_schema_to_spark(schema: pa.Schema) -> T.StructType:
    return T.StructType([
        T.StructField(f.name, arrow_type_to_spark(f.type), f.nullable)
        for f in schema
    ])


def spark_type_to_arrow(dt: T.DataType) -> pa.DataType:
    """Read-side map (reference schema.py:40-53). Used for tests/interop."""
    mapping: dict[type, pa.DataType] = {
        T.BooleanType: pa.bool_(),
        T.ByteType: pa.int8(),
        T.ShortType: pa.int16(),
        T.IntegerType: pa.int32(),
        T.LongType: pa.int64(),
        T.FloatType: pa.float32(),
        T.DoubleType: pa.float64(),
        T.DateType: pa.date32(),
        T.StringType: pa.string(),
        T.BinaryType: pa.binary(),
        T.TimestampType: pa.timestamp("us", tz="UTC"),
        T.TimestampNTZType: pa.timestamp("us"),
    }
    if type(dt) in mapping:
        return mapping[type(dt)]
    if isinstance(dt, T.DecimalType):
        return pa.decimal128(dt.precision, dt.scale)
    if isinstance(dt, T.ArrayType):
        return pa.list_(spark_type_to_arrow(dt.elementType))
    if isinstance(dt, T.MapType):
        return pa.map_(spark_type_to_arrow(dt.keyType),
                       spark_type_to_arrow(dt.valueType))
    if isinstance(dt, T.StructType):
        return pa.struct([(f.name, spark_type_to_arrow(f.dataType))
                          for f in dt.fields])
    raise TypeError(f"Cannot handle spark type {dt}")


# ---------------------------------------------------------------------------
# Merge / intersect (reference schema.py:92-109, dataset_utils.py:26-44)
# ---------------------------------------------------------------------------

# numeric widening lattice for merge conflicts
_WIDEN_ORDER = {
    T.ByteType(): 0, T.ShortType(): 1, T.IntegerType(): 2, T.LongType(): 3,
}
_FLOAT_ORDER = {T.FloatType(): 0, T.DoubleType(): 1}


def _unify_types(a: T.DataType, b: T.DataType, name: str) -> T.DataType:
    if a == b:
        return a
    if a in _WIDEN_ORDER and b in _WIDEN_ORDER:
        return a if _WIDEN_ORDER[a] >= _WIDEN_ORDER[b] else b
    if a in _FLOAT_ORDER and b in _FLOAT_ORDER:
        return a if _FLOAT_ORDER[a] >= _FLOAT_ORDER[b] else b
    if a in _WIDEN_ORDER and b in _FLOAT_ORDER:
        return b
    if b in _WIDEN_ORDER and a in _FLOAT_ORDER:
        return a
    raise ValueError(f"Cannot unify types for field {name!r}: {a} vs {b}")


def merge_schemas(schemas: Iterable[T.StructType]) -> T.StructType:
    """Union of fields by name, first-seen order, numeric widening on
    conflict — ``pa.unify_schemas`` semantics (reference schema.py:92-104)."""
    out: list[T.StructField] = []
    index: dict[str, int] = {}
    for schema in schemas:
        for f in schema.fields:
            if f.name not in index:
                index[f.name] = len(out)
                out.append(T.StructField(f.name, f.dataType, True, f.metadata))
            else:
                cur = out[index[f.name]]
                unified = _unify_types(cur.dataType, f.dataType, f.name)
                out[index[f.name]] = T.StructField(f.name, unified, True,
                                                   cur.metadata)
    return T.StructType(out)


def intersect_schemas(schemas: list[T.StructType]) -> T.StructType:
    """Fields present (same name+type) in every schema, first-seen order
    (reference dataset_utils.py:26-44)."""
    if not schemas:
        return T.StructType([])
    common: list[T.StructField] = []
    rest = schemas[1:]
    for f in schemas[0].fields:
        if all(any(g.name == f.name and g.dataType == f.dataType
                   for g in s.fields) for s in rest):
            common.append(f)
    return T.StructType(common)


def schemas_equal(a: T.StructType, b: T.StructType) -> bool:
    """Order-insensitive field equality (reference schema.py:106-109)."""
    key = lambda f: f.name  # noqa: E731
    fa = sorted(a.fields, key=key)
    fb = sorted(b.fields, key=key)
    return [(f.name, f.dataType) for f in fa] == \
           [(f.name, f.dataType) for f in fb]


# ---------------------------------------------------------------------------
# Partition-value string casting (Delta stores partition values as strings)
# ---------------------------------------------------------------------------


def partition_value_to_python(value: str | None, dt: T.DataType):
    """Re-type a Delta partitionValues string against the table schema.

    Mirrors reading partition values back through the scanner (reference
    __init__.py:362-368); used when attaching partition columns to a scan.
    """
    import datetime
    import decimal

    if value is None or value == "" or value == "__HIVE_DEFAULT_PARTITION__":
        return None
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return int(value)
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return float(value)
    if isinstance(dt, T.DecimalType):
        return decimal.Decimal(value)
    if isinstance(dt, T.BooleanType):
        return value.lower() == "true"
    if isinstance(dt, T.DateType):
        return datetime.date.fromisoformat(value)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return datetime.datetime.fromisoformat(value)
    return value
