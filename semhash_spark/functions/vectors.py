"""Vector column expressions (JVM-side, whole-stage codegen).

The reference converts ANN distances with ``similarity = 1 - cosine
distance`` (semhash/index.py:59,66-67,86-87); we compute cosine
similarity directly on ``array<float>`` columns with SQL
higher-order functions — no UDF, no Arrow transfer — in float64 so
the DuckDB oracle (which also accumulates in float64 after a
``::DOUBLE[]`` cast) matches to ~1e-12.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


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


def cosine_similarity(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity of two array<numeric> columns (double).

    Zero-norm inputs yield NULL (never matches a >= threshold
    predicate), mirroring the reference where a zero vector simply
    has no neighbors above threshold.
    """
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d)


def l2_normalize(a: str | Column) -> Column:
    n = norm(a)
    return F.when(n > 0, F.transform(_c(a), lambda x: (x.cast("double") / n).cast("float"))).otherwise(_c(a))
