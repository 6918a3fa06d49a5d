"""Vector column functions.

The reference converts ANN distances with ``similarity = 1 - cosine
distance`` (semhash/index.py:59,66-67,86-87); we compute cosine
similarity directly on ``array<float>`` columns.

Two implementations:

* ``cosine_similarity`` — vectorized pandas/Arrow UDF (numpy batch
  matmul, float64). This is the hot path: Spark's SQL higher-order
  functions (aggregate/zip_with) are evaluated INTERPRETED, one
  lambda call per element, ~100x slower per pair than a BLAS dot
  over an Arrow batch. The input_hint mandates vectorized
  pandas/Arrow UDFs for exactly this reason.
* ``cosine_similarity_expr`` — the pure-expression form, needed only
  where a Column must be evaluated inside another SQL lambda (e.g.
  scoring a literal centroid array in operators/knn.py) where UDFs
  cannot appear.

Both accumulate in float64, matching the DuckDB oracle's
``list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])`` to ~1e-12
(summation-order differences only).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _stack(s: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(matrix float64, null-row mask) from a Series of array values."""
    null = s.isna().to_numpy()
    if null.any():
        dim = next((len(v) for v in s if v is not None), 1)
        vals = [np.zeros(dim) if v is None else np.asarray(v, dtype=np.float64) for v in s]
        return np.vstack(vals), null
    return np.vstack([np.asarray(v, dtype=np.float64) for v in s]), null


# DataType object, not a DDL string: string parsing would require an
# active SparkSession at import time
@pandas_udf(DoubleType())
def _cosine_pd(a: pd.Series, b: pd.Series) -> pd.Series:
    if len(a) == 0:
        return pd.Series([], dtype="Float64")
    xa, na_mask = _stack(a)
    xb, nb_mask = _stack(b)
    num = np.einsum("ij,ij->i", xa, xb)
    den = np.linalg.norm(xa, axis=1) * np.linalg.norm(xb, axis=1)
    bad = (den <= 0) | na_mask | nb_mask
    out = np.divide(num, den, out=np.zeros_like(num), where=~bad)
    res = pd.Series(out, dtype="Float64")
    res[bad] = pd.NA  # zero-norm / null input -> NULL (never matches >= t)
    return res


def cosine_similarity(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity of two array<numeric> columns (double).

    Zero-norm or NULL inputs yield NULL (never matches a >= threshold
    predicate), mirroring the reference where a zero vector simply
    has no neighbors above threshold.
    """
    return _cosine_pd(_c(a), _c(b))


# ------------------------------------------------- expression variants
# (usable inside SQL lambdas; interpreted, so keep off the hot path)


def dot(a: str | Column, b: str | Column) -> Column:
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: str | Column) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_similarity_expr(a: str | Column, b: str | Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d)


def hyperplane_bands(
    a: str | Column,
    bits: int = 64,
    bands: int = 8,
    seed: int = 42,
    dim: int = 64,
) -> Column:
    """Random-hyperplane LSH band keys for an embedding column.

    Charikar (STOC 2002) sign-random-projection: bit i = sign(x · h_i)
    for ``bits`` fixed Gaussian hyperplanes; the bits are split into
    ``bands`` groups and each group packs into one long, salted with
    its band index — ready for ``explode_band_array`` + bucket join.
    P(bit agreement) = 1 - angle(x, y) / pi, so near-cosine pairs
    share band keys with tunable probability. Vectorized: one
    |batch| x bits matmul per Arrow batch.
    """
    if bits % bands != 0:
        raise ValueError("bits must be divisible by bands")
    width = bits // bands
    rng = np.random.Generator(np.random.PCG64(seed))
    h = rng.standard_normal((bits, dim))

    @pandas_udf("array<long>")
    def _bands(v: pd.Series) -> pd.Series:
        n = len(v)
        if n == 0:
            return pd.Series([], dtype=object)
        # NULL embeddings produce an EMPTY band array: posexplode
        # drops the row, so null rows simply generate no candidates
        # (instead of crashing np.asarray(None) or co-bucketing all
        # nulls into one mega-bucket)
        null = np.fromiter((e is None for e in v), dtype=bool, count=n)
        if null.all():
            return pd.Series([[]] * n, dtype=object)
        d = len(next(e for e in v if e is not None))
        x = np.vstack(
            [np.zeros(d) if e is None else np.asarray(e, dtype=np.float64) for e in v]
        )
        out = np.zeros((n, bands), dtype=np.uint64)
        # row-chunk the projection so the |chunk| x bits float64
        # product stays ~64 MB (a 50k-row Arrow batch at 2048 bits
        # would otherwise allocate ~800 MB per worker), and reuse ONE
        # preallocated output: fresh >32 MB buffers come from mmap
        # whose first-touch faults make the gemm 16x slower on this
        # host (see verify._chunked_threshold)
        step = max(64, int((16 << 20) // (8 * max(bits, 1))))
        hT = np.ascontiguousarray(h[:, : x.shape[1]].T)
        pbuf = np.empty((min(step, n), bits))
        sbuf = np.empty(pbuf.shape, dtype=bool)
        for lo in range(0, n, step):
            hi = min(lo + step, n)
            proj = pbuf[: hi - lo]
            signs = sbuf[: hi - lo]
            np.dot(x[lo:hi], hT, out=proj)
            np.greater(proj, 0, out=signs)
            for b in range(bands):
                chunk = signs[:, b * width : (b + 1) * width]
                word = np.zeros(hi - lo, dtype=np.uint64)
                for j in range(width):
                    word |= chunk[:, j].astype(np.uint64) << np.uint64(j)
                # salt with band index so identical words in different
                # bands never collide after explode
                out[lo:hi, b] = word ^ (np.uint64(b) << np.uint64(56))
        rows = out.view(np.int64)
        if null.any():
            return pd.Series(
                [[] if null[i] else rows[i] for i in range(n)], dtype=object
            )
        return pd.Series(list(rows))

    return _bands(_c(a))


def l2_normalize(a: str | Column) -> Column:
    n = norm(a)
    return F.when(n > 0, F.transform(_c(a), lambda x: (x.cast("double") / n).cast("float"))).otherwise(_c(a))
