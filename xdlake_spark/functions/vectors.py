"""Vector column functions over ``array<float/double>`` embeddings.

JVM-side higher-order functions (``zip_with`` + ``aggregate``) — no Python
in the hot path, so similarity scans stay inside whole-stage codegen and
scale linearly across executors. DuckDB's ``list_dot_product`` /
``list_cosine_similarity`` compute the same quantities, which makes every
operator built on these oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    """L2 norm."""
    return F.sqrt(F.aggregate(
        a, F.lit(0.0),
        lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 where either side has zero norm."""
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb)) \
        .otherwise(F.lit(0.0))


def euclidean(a: Column, b: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0), lambda acc, v: acc + v))


def lit_vector(values) -> Column:
    """A literal query vector as an array<double> column."""
    return F.array([F.lit(float(v)) for v in values])


def hyperplane_bit(a: Column, plane) -> Column:
    """Sign bit of <a, plane> for one random hyperplane (LSH)."""
    return (dot(a, lit_vector(plane)) >= 0).cast("int")


def hyperplane_signature(a: Column, planes) -> Column:
    """Bit-string signature over a set of hyperplanes, as a compact string
    (also the LSH bucket key)."""
    return F.concat(*[hyperplane_bit(a, p).cast("string") for p in planes])
