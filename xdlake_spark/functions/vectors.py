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
    """Cosine similarity; 0.0 where either side has zero norm.

    Single pass over the vectors: one ``zip_with`` + ``aggregate`` with a
    (xy, xx, yy) struct accumulator. The naive ``dot/(norm*norm)`` form
    embeds five independent array traversals in the expression tree
    (Catalyst does not CSE inside higher-order functions). The final
    ``sqrt(xx)*sqrt(yy)`` keeps results bit-identical to the naive form.
    """
    z = F.zip_with(a, b, lambda x, y: F.struct(
        (x.cast("double") * y.cast("double")).alias("xy"),
        (x.cast("double") * x.cast("double")).alias("xx"),
        (y.cast("double") * y.cast("double")).alias("yy")))
    return F.aggregate(
        z,
        F.struct(F.lit(0.0).alias("xy"), F.lit(0.0).alias("xx"),
                 F.lit(0.0).alias("yy")),
        lambda s, v: F.struct((s.xy + v.xy).alias("xy"),
                              (s.xx + v.xx).alias("xx"),
                              (s.yy + v.yy).alias("yy")),
        # finish runs on the bound accumulator variable, so the fold is
        # evaluated exactly once even though it is referenced five times
        lambda s: F.when((s.xx > 0) & (s.yy > 0),
                         s.xy / (F.sqrt(s.xx) * F.sqrt(s.yy)))
        .otherwise(F.lit(0.0)))


def euclidean(a: Column, b: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0), lambda acc, v: acc + v))


def _doubles_sql(values) -> "str | None":
    """``array(...)`` SQL text for a list of finite doubles, or None
    when a value is non-finite (NaN/inf have no plain SQL literal).
    ``repr(float)`` is the shortest round-tripping decimal, and the
    parser's nearest-double read of it restores the exact bits (the
    ``D`` suffix parses each element directly as DOUBLE, never through
    DECIMAL)."""
    parts = []
    for v in values:
        v = float(v)
        if v != v or v in (float("inf"), float("-inf")):
            return None
        parts.append(repr(v) + "D")
    return "array(" + ",".join(parts) + ")"


def lit_doubles(values) -> Column:
    """array<double> literal built as ONE parsed SQL expression.

    ``F.lit(list)`` routes one py4j call PER ELEMENT (~1.5 ms each):
    a 64x64 matrix literal cost ~16 s of pure driver time before any
    job ran (r12 profiling). A single ``F.expr`` ships the whole array
    as text in one round trip, and Catalyst constant-folds it into the
    same ``Literal`` (verified: optimized plans are identical and the
    values bit-exact). Non-finite/empty inputs fall back to ``F.lit``.
    """
    sql = _doubles_sql(values) if len(values) else None
    if sql is None:
        return F.lit([float(v) for v in values])
    return F.expr(sql)


def lit_longs(values) -> Column:
    """array<bigint> literal via one parsed expression — see
    :func:`lit_doubles` for why (one py4j round trip, constant-folded
    to the same ``Literal``)."""
    vs = [int(v) for v in values]
    if not vs:
        return F.lit(vs)
    return F.expr("array(" + ",".join(str(v) + "L" for v in vs) + ")")


def lit_double_rows(rows) -> Column:
    """array<array<double>> literal via one parsed expression — see
    :func:`lit_doubles`."""
    inner = [_doubles_sql(r) for r in rows]
    if len(rows) == 0 or any(s is None for s in inner) \
            or any(len(r) == 0 for r in rows):
        return F.lit([[float(v) for v in r] for r in rows])
    return F.expr("array(" + ",".join(inner) + ")")


def lit_double_cube(cube) -> Column:
    """array<array<array<double>>> literal via one parsed expression —
    see :func:`lit_doubles`."""
    planes = []
    for m in cube:
        inner = [_doubles_sql(r) for r in m]
        if not len(m) or any(s is None for s in inner) \
                or any(len(r) == 0 for r in m):
            return F.lit([[[float(v) for v in r] for r in m]
                          for m in cube])
        planes.append("array(" + ",".join(inner) + ")")
    if not planes:
        return F.lit([])
    return F.expr("array(" + ",".join(planes) + ")")


def lit_vector(values) -> Column:
    """A literal query vector as an array<double> column.

    A true Catalyst ``Literal`` — a constant object referenced by
    codegen — where ``F.array(*lits)`` builds a per-row ``CreateArray``
    that re-materializes the vector for every row AND every expression
    instance (Catalyst does not CSE inside higher-order functions, so
    a 64-dim query vector embedded in 128 codebook terms was rebuilt
    128 times per row). Built via :func:`lit_doubles`, one py4j round
    trip instead of one per element."""
    return lit_doubles(values)


def hyperplane_bit(a: Column, plane) -> Column:
    """Sign bit of <a, plane> for one random hyperplane (LSH)."""
    return (dot(a, lit_vector(plane)) >= 0).cast("int")


def _hyperplane_signature_fused(a: Column, planes) -> Column:
    """One-expression form of :func:`hyperplane_signature`: the plane
    matrix ships as a single flat literal and a nested
    ``transform``/``aggregate`` computes every sign bit, instead of
    one ``zip_with``+``aggregate`` tree per plane. Building n
    separate lambda expressions through py4j cost seconds of DRIVER
    time per query for multi-table LSH (r12: 6 tables x 8 planes =
    48 HOF trees ~ 3-10 s of plan construction); this builds two.
    The inner fold visits dimensions in the same ascending order with
    the same double arithmetic as ``dot``, so every bit — and the
    concatenated signature string — is identical, INCLUDING the
    dim-mismatch edges (r12 advice): an input shorter than d nulls
    out via ``F.get`` past its end, and an input LONGER than d is
    nulled explicitly below (the per-plane ``zip_with`` form
    null-padded the plane side, so its dot — and signature — was NULL
    there too; the fused ``F.get`` reads would silently truncate)."""
    n, d = len(planes), len(planes[0])
    assert all(len(r) == d for r in planes), \
        "hyperplane rows must share one dimension"
    flat = lit_doubles([float(x) for r in planes for x in r])
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda i: (F.aggregate(
            F.sequence(F.lit(0), F.lit(d - 1)),
            F.lit(0.0),
            lambda acc, j: acc + F.get(a, j).cast("double")
            * F.get(flat, i * d + j)) >= 0).cast("int").cast("string"))
    # fold with concat (NOT concat_ws): a null bit — short/null vector
    # — nulls the whole signature, exactly as the unfused concat did
    sig = F.aggregate(bits, F.lit(""), lambda acc, b: F.concat(acc, b))
    return F.when(F.size(a) <= F.lit(d), sig)


def hyperplane_signature(a: Column, planes) -> Column:
    """Bit-string signature over a set of hyperplanes, as a compact string
    (also the LSH bucket key). Built as one fused expression — see
    :func:`_hyperplane_signature_fused` for why."""
    return _hyperplane_signature_fused(a, planes)
