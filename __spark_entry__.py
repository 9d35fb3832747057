"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` is the flagship smoke query; ``queries()`` /
``oracle_sql()`` expose the full operator surface from SURVEY §2 plus the
LLM-pipeline extensions, implemented in ``xdlake_spark.queries``. The
driver runs each query at sf=0.01 against the DuckDB oracle (row-count +
schema + order-insensitive value-hash).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from xdlake_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: ingest lineitem (sf0.001) into a partitioned delta table
    through the transaction-log layer, scan it back with manifest pruning,
    and run the TPC-H Q1 aggregation on the result."""
    import tempfile

    from pyspark.sql import functions as F

    from xdlake_spark import DeltaTable
    from xdlake_spark.sources.readers import read_parquet_any

    li = read_parquet_any(spark, "/root/testdata/sf0.001/lineitem.parquet")
    loc = tempfile.mkdtemp(prefix="xdlake_entry_")
    table = DeltaTable(spark, loc).write(li, partition_by=["l_returnflag"])
    df = table.to_df(where="l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'")
    return (df.groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
                 F.count(F.lit(1)).alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
