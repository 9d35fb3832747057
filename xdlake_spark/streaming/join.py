"""Stream-stream interval join (watermark-bounded state).

The streaming twin of ``operators/temporal.py range_join``: match each
left event with the right events of the same key whose timestamp falls
in ``(left_ts + lower, left_ts + upper]``. Under Structured Streaming
both sides carry watermarks and the join condition bounds event-time
distance, so the state store provably expires rows older than
``watermark + upper`` — the standard click->conversion attribution
shape that runs forever on an unbounded stream without unbounded state.

Batch DataFrames pass through the same code (withWatermark is a no-op
on batch inputs), so stream-vs-batch equivalence is directly testable:
tests/test_streaming.py TestStreamStreamJoin runs both and compares row
sets against the batch range_join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(left: DataFrame, right: DataFrame,
                         key: str = "user_id", on: str = "ts",
                         lower: str = "0 seconds",
                         upper: str = "15 minutes",
                         watermark: str = "30 minutes",
                         how: str = "inner") -> DataFrame:
    """Join right events within ``(l.on + lower, l.on + upper]`` of each
    left event, per key.

    Right-side columns come back ``r_``-prefixed (the key stays
    unprefixed). ``watermark`` is applied to BOTH event-time columns —
    it must be >= the allowed lateness of either stream; state for a
    left row is dropped once the right watermark passes
    ``l.on + upper``. ``how`` may be ``inner`` or ``leftOuter`` (outer
    results emit only after the watermark closes the match window, per
    Structured Streaming semantics).
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"unsupported join type {how!r}")

    def _tz(df: DataFrame) -> DataFrame:
        # watermarks demand tz-aware TIMESTAMP; testdata-style ntz
        # columns cast losslessly under the session UTC zone
        if dict(df.dtypes).get(on) == "timestamp_ntz":
            df = df.withColumn(on, F.col(on).cast("timestamp"))
        return df

    l = _tz(left).withWatermark(on, watermark)
    r = _tz(right).withWatermark(on, watermark)
    r = r.select(F.col(key),
                 *[F.col(c).alias(f"r_{c}") for c in right.columns
                   if c != key])
    cond = ((l[key] == r[key])
            & (r[f"r_{on}"] > l[on] + F.expr(f"INTERVAL {lower}"))
            & (r[f"r_{on}"] <= l[on] + F.expr(f"INTERVAL {upper}")))
    joined = l.join(r, cond, how)
    # drop the duplicate right-side key column
    return joined.drop(r[key])
