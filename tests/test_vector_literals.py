"""Pin the r12 one-call array-literal builders and the fused
hyperplane signature: both must be BIT-IDENTICAL to the per-element
``F.lit`` / per-plane expression forms they replaced (they exist only
to cut py4j round trips at plan-build time, never to change a value).
"""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from xdlake_spark.functions.vectors import (dot, hyperplane_bit,
                                            hyperplane_signature,
                                            lit_double_cube,
                                            lit_double_rows, lit_doubles,
                                            lit_longs, lit_vector)


def _bits(x):
    return struct.pack("<d", float(x))


# values that stress decimal round-tripping: shortest-repr edge cases,
# denormals, huge magnitudes, negative zero, integral floats
EDGE_VALUES = [0.0, -0.0, 1.0, -1.0, 0.1, 2.0 / 3.0, 1e-300, 5e-324,
               -1.7976931348623157e308, 123456789.123456789, 2.5e-17,
               1e16 + 2.0, -3.141592653589793]


class TestLiteralBuilders:
    def test_doubles_bit_identical_to_lit(self, spark):
        rng = np.random.default_rng(11)
        vals = EDGE_VALUES + list(rng.standard_normal(200))
        row = spark.range(1).select(
            F.lit([float(v) for v in vals]).alias("a"),
            lit_doubles(vals).alias("b")).collect()[0]
        assert [_bits(x) for x in row["a"]] == [_bits(x) for x in row["b"]]

    def test_rows_and_cube_bit_identical(self, spark):
        rng = np.random.default_rng(12)
        m = rng.standard_normal((7, 5))
        cube = rng.standard_normal((3, 4, 2))
        row = spark.range(1).select(
            F.lit([[float(v) for v in r] for r in m]).alias("a"),
            lit_double_rows(m).alias("b"),
            F.lit([[[float(v) for v in r] for r in p]
                   for p in cube]).alias("c"),
            lit_double_cube(cube).alias("d")).collect()[0]
        assert [[_bits(v) for v in r] for r in row["a"]] \
            == [[_bits(v) for v in r] for r in row["b"]]
        assert row["c"] == row["d"]

    def test_longs_identical(self, spark):
        vals = [0, 1, -1, 2**31, -(2**31), 2**62, -(2**62), 42]
        row = spark.range(1).select(
            F.lit(vals).alias("a"), lit_longs(vals).alias("b")).collect()[0]
        assert list(row["a"]) == list(row["b"])
        assert spark.range(1).select(
            lit_longs(vals).alias("b")).schema["b"] \
            .dataType.simpleString() == "array<bigint>"

    def test_nonfinite_falls_back(self, spark):
        # NaN/inf have no plain SQL literal — builder must still work
        vals = [1.0, float("nan"), float("inf"), -float("inf")]
        row = spark.range(1).select(lit_doubles(vals).alias("b"),
                                    lit_vector(vals).alias("c")).collect()[0]
        got = list(row["b"])
        assert got[0] == 1.0 and got[1] != got[1]
        assert got[2] == float("inf") and got[3] == -float("inf")
        assert list(row["c"])[2] == float("inf")

    def test_empty_falls_back(self, spark):
        assert spark.range(1).select(
            lit_doubles([]).alias("b")).collect()[0]["b"] == []


class TestFusedHyperplaneSignature:
    def _unfused(self, a, planes):
        # the pre-r12 form: one zip_with+aggregate tree per plane
        return F.concat(*[hyperplane_bit(a, p).cast("string")
                          for p in planes])

    @pytest.mark.parametrize("n_planes,dim", [(4, 8), (9, 16)])
    def test_matches_unfused_on_random_vectors(self, spark, n_planes, dim):
        rng = np.random.default_rng(13)
        planes = rng.standard_normal((n_planes, dim))
        data = [(list(map(float, rng.standard_normal(dim))),)
                for _ in range(64)]
        # near-zero dots stress the >= 0 boundary under float order
        data.append(([0.0] * dim,))
        df = spark.createDataFrame(data, f"v: array<double>")
        bad = df.select(
            self._unfused(F.col("v"), planes).alias("o"),
            hyperplane_signature(F.col("v"), planes).alias("n")) \
            .filter("o IS DISTINCT FROM n").count()
        assert bad == 0

    def test_null_and_short_vectors_null_signature(self, spark):
        # includes an OVERSIZED vector (r12 advice): the per-plane
        # zip_with form null-padded the PLANE side there, so its
        # signature was NULL — the fused form must not silently
        # truncate to the first d dims instead
        planes = np.random.default_rng(14).standard_normal((3, 6))
        df = spark.createDataFrame(
            [([0.5] * 6,), ([0.5] * 2,), ([None, 0.5, 0.5, 0.5, 0.5, 0.5],),
             ([0.5] * 9,)],
            "v: array<double>")
        rows = df.select(
            self._unfused(F.col("v"), planes).alias("o"),
            hyperplane_signature(F.col("v"), planes).alias("n")).collect()
        for r in rows:
            assert r["o"] == r["n"]
        assert rows[1]["n"] is None and rows[2]["n"] is None
        assert rows[3]["n"] is None

    def test_ragged_planes_rejected(self, spark):
        with pytest.raises(AssertionError):
            hyperplane_signature(F.col("v"), [[1.0, 2.0], [3.0]])

    def test_dot_parity_with_literal_vector(self, spark):
        # the fused fold must keep dot()'s summation order: compare the
        # recovered sign against an explicit dot on a boundary-ish case
        rng = np.random.default_rng(15)
        v = list(map(float, rng.standard_normal(16)))
        plane = rng.standard_normal(16)
        row = spark.createDataFrame([(v,)], "v: array<double>").select(
            (dot(F.col("v"), lit_vector(plane)) >= 0).cast("int")
            .cast("string").alias("bit"),
            hyperplane_signature(F.col("v"), plane.reshape(1, -1))
            .alias("sig")).collect()[0]
        assert row["sig"] == row["bit"]
