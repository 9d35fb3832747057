"""Extension operators (dedup, similarity, text, multimodal).

These extend the reference's surface (xbrianh/xdlake has no relational or
pipeline operators — see SURVEY §2.4); mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition up to the session's default parallelism when the input
    arrives with fewer splits.

    Small parquet inputs land as a single split, which serializes every
    expensive projection downstream. At cluster scale the repartition is
    a no-op (file inputs already carry >= defaultParallelism splits).
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
