"""Input normalization: anything -> one Spark DataFrame.

Parity target: /root/reference/xdlake/dataset_utils.py:98-142
(``union_dataset``). Accepted kinds: Spark DataFrame, pandas DataFrame,
pyarrow Table / RecordBatch, path string / Location (parquet), or any
iterable/generator mix of those. Multi-source schema modes:

- ``common`` — intersection of input schemas (fields present in every input,
  reference dataset_utils.py:26-44);
- ``merge`` — union of fields by name with numeric widening
  (``pa.unify_schemas`` semantics, reference dataset_utils.py:63-64).

Spark-first: in-memory inputs go through Arrow-accelerated
``createDataFrame``; file inputs stay as lazy parquet scans so Catalyst can
push filters/pruning into them — nothing is materialized on the driver.
"""

from __future__ import annotations

from functools import reduce
from typing import Any, Iterable

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..log.schema import intersect_schemas, merge_schemas
from .storage import Location


def _to_dataframes(spark: SparkSession, data: Any) -> list[DataFrame]:
    if isinstance(data, DataFrame):
        return [data]
    if isinstance(data, Location):
        return [spark.read.parquet(data.url)]
    if isinstance(data, str):
        return [spark.read.parquet(Location.resolve(data).url)]
    if isinstance(data, pa.Table):
        return [spark.createDataFrame(data.to_pandas())]
    if isinstance(data, pa.RecordBatch):
        return [spark.createDataFrame(pa.Table.from_batches([data]).to_pandas())]
    if hasattr(data, "__dataframe__") or type(data).__module__.startswith("pandas"):
        # duck-typed pandas (reference dataset_utils.py:95-96)
        return [spark.createDataFrame(data)]
    if isinstance(data, Iterable):
        out: list[DataFrame] = []
        for item in data:
            out.extend(_to_dataframes(spark, item))
        return out
    raise TypeError(f"Cannot normalize input of type {type(data)}")


def union_dataframe(spark: SparkSession, data: Any,
                    schema_mode: str = "common") -> DataFrame:
    """Normalize heterogeneous inputs into one DataFrame."""
    dfs = _to_dataframes(spark, data)
    if not dfs:
        raise ValueError("No input data")
    if len(dfs) == 1:
        return dfs[0]
    if schema_mode == "merge":
        target = merge_schemas([df.schema for df in dfs])
        aligned = [
            df.select([
                F.col(f.name).cast(f.dataType) if f.name in df.columns
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in target.fields
            ])
            for df in dfs
        ]
        return reduce(DataFrame.unionByName, aligned)
    common = intersect_schemas([df.schema for df in dfs])
    if not common.fields:
        raise ValueError("Input schemas share no common fields")
    cols = [f.name for f in common.fields]
    return reduce(DataFrame.union, [df.select(cols) for df in dfs])
