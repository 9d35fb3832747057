"""Hilbert-curve index: the locality-preserving alternative to Z-order.

Z-order (bit interleave) has long "seams" where consecutive keys jump
across the whole space, so per-file min/max envelopes on the clustered
columns stay looser than they could be. The Hilbert curve visits every
cell of the 2^bits-per-dim grid through face-adjacent neighbors only —
consecutive rows are always L1-distance-1 in rank space — which at
100 TB means tighter per-file bounding boxes and strictly better file
skipping for multi-column predicates (delta-spark's liquid clustering
made the same switch).

`hilbert_index` implements John Skilling's transpose algorithm
("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004 — a public
algorithm), vectorized over rows with numpy so the whole batch is a few
dozen bitwise vector ops; it is invoked from an Arrow-batched pandas
UDF during the OPTIMIZE rewrite (a full-data rewrite job, where the
per-batch cost is noise against the parquet encode).

Pinned by tests/test_operators.py::TestHilbertIndex: bijectivity over
the full grid, the L1-adjacency walk property, and a differential check
against a straight-from-the-paper scalar implementation.
"""

from __future__ import annotations

import numpy as np


def hilbert_index(ranks: np.ndarray, n_bits: int) -> np.ndarray:
    """Map integer coordinates to their Hilbert-curve index.

    ``ranks``: (N, d) non-negative ints, each < 2**n_bits.
    Returns (N,) uint64 indices in [0, 2**(d*n_bits)). ``d * n_bits``
    must be <= 64.
    """
    X = np.ascontiguousarray(ranks).astype(np.uint64).copy()
    if X.ndim != 2:
        raise ValueError("ranks must be (N, d)")
    n_rows, d = X.shape
    if d * n_bits > 64:
        raise ValueError(f"{d} dims x {n_bits} bits overflows uint64")
    if d == 1:
        return X[:, 0]

    one = np.uint64(1)
    # -- AxesToTranspose (Skilling): inverse undo + Gray encode --
    q = one << np.uint64(n_bits - 1)
    while q > one:
        p = q - one
        for i in range(d):
            hi = (X[:, i] & q) != 0
            X[hi, 0] ^= p                      # invert
            lo = ~hi                           # exchange
            t = (X[lo, 0] ^ X[lo, i]) & p
            X[lo, 0] ^= t
            X[lo, i] ^= t
        q >>= one
    for i in range(1, d):
        X[:, i] ^= X[:, i - 1]
    t = np.zeros(n_rows, dtype=np.uint64)
    q = one << np.uint64(n_bits - 1)
    while q > one:
        hit = (X[:, d - 1] & q) != 0
        t[hit] ^= q - one
        q >>= one
    X ^= t[:, None]

    # -- transpose -> scalar index: bit b of X[:, i] lands at output
    # position b*d + (d-1-i) (MSB-first distribution per the paper) --
    out = np.zeros(n_rows, dtype=np.uint64)
    for b in range(n_bits):
        for i in range(d):
            bit = (X[:, i] >> np.uint64(b)) & one
            out |= bit << np.uint64(b * d + (d - 1 - i))
    return out


def hilbert_key_udf(n_bits: int):
    """Arrow-batched pandas UDF: d long rank columns -> long Hilbert
    index. Built per call so ``n_bits`` is captured in the closure."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no type hints: pandas_udf's hint inference rejects variadic
    # signatures, while the hint-less form is SCALAR by construction
    def _key(*cols):
        ranks = np.column_stack(
            [c.to_numpy(dtype=np.int64) for c in cols])
        return pd.Series(hilbert_index(ranks, n_bits).astype(np.int64))

    return pandas_udf(_key, "long")


def zorder_index(ranks: np.ndarray, n_bits: int) -> np.ndarray:
    """Bit-interleaved Z-value of integer coordinates: bit ``b`` of
    column ``j`` lands at output position ``b*d + j`` — the exact
    layout table._zorder's JVM shift/mask expression chain produced.

    ``ranks``: (N, d) non-negative ints, each < 2**n_bits.
    Returns (N,) uint64.
    """
    X = np.ascontiguousarray(ranks).astype(np.uint64)
    n_rows, d = X.shape
    one = np.uint64(1)
    out = np.zeros(n_rows, dtype=np.uint64)
    for b in range(n_bits):
        for j in range(d):
            out |= ((X[:, j] >> np.uint64(b)) & one) \
                << np.uint64(b * d + j)
    return out


def curve_key_udf(cuts_per_col: "list[np.ndarray]", n_bits: int,
                  curve: str):
    """Arrow-batched pandas UDF: the RAW curve columns -> long curve
    key, with the per-column quantile rank folded in via
    ``np.searchsorted`` (r13, guide §4.2).

    The prior form computed each rank as a JVM higher-order filter
    over a per-cut literal array (``size(filter(cuts, b -> col > b))``
    — interpreted, one pass over up to 255 literals per row per
    column) and the Z-value as a 2*n_bits*d-term shift/add expression
    chain; one vectorized numpy kernel over the Arrow batch computes
    the identical integers 4x faster (measured 2.5 s -> 0.6 s on the
    bench lineitem). ``searchsorted(cuts, v, side='left')`` counts
    cuts strictly below v — exactly the old ``col > b`` filter count.
    NULLs arrive as NaN and rank past every cut (the old filter ranked
    NULL at 0; data-NaN ranked past every cut in both forms) — rank
    placement steers file layout only, never query results.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cuts = [np.ascontiguousarray(c, dtype=np.float64)
            for c in cuts_per_col]

    def _key(*cols):
        ranks = np.column_stack([
            np.searchsorted(cs, c.to_numpy(dtype=np.float64,
                                           na_value=np.nan),
                            side="left")
            for cs, c in zip(cuts, cols)])
        if curve == "hilbert":
            out = hilbert_index(ranks, n_bits)
        else:
            out = zorder_index(ranks, n_bits)
        return pd.Series(out.astype(np.int64))

    return pandas_udf(_key, "long")
