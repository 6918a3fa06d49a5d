"""Deterministic record identity & exact-duplicate keys.

Reference semantics being reproduced:

* exact-duplicate key = projection of the record onto the declared
  columns with missing values defaulting to "" (``to_frozendict``,
  reference semhash/utils.py:31-33), rendered as the tab-join of the
  cleaned column values (``dict_to_string``,
  reference semhash/records.py:6-17).
* record order (list position, first-occurrence-wins in
  semhash/utils.py:87-124) becomes an explicit ``record_id`` long:
  Spark DataFrames are unordered, so every order-dependent decision
  is keyed on ``record_id`` instead.

Scale note: ``row_number`` over a global order is a single-partition
sort — fine at test scale, wrong at 10^12 rows. ``with_record_id``
therefore prefers an existing unique long column, or derives a
63-bit key from xxhash64 over a caller-supplied natural key
(collision-checked, shuffle-free); exemplar selection everywhere
uses ``min(record_id)`` which needs no global sort, only a hash
shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SHA_COL = "content_sha"


def rendered_record(columns) -> Column:
    """Tab-join of cleaned column values (reference records.py:6-17)."""
    cleaned = [
        F.regexp_replace(F.coalesce(F.col(c).cast("string"), F.lit("")), "\t", " ")
        for c in columns
    ]
    return F.concat_ws("\t", *cleaned)


def exact_key(columns) -> Column:
    """sha256 of the rendered record — the frozendict key analogue."""
    return F.sha2(rendered_record(columns), 256)


def content_sha(col: str = "content") -> Column:
    """Per-row invariant carried end-to-end (BASELINE input_hint)."""
    return F.sha2(F.coalesce(F.col(col), F.lit("")), 256)


def with_record_id(
    df: DataFrame,
    order_cols: list[str] | None = None,
    id_col: str = "record_id",
    existing: str | None = None,
    natural_key: list[str] | None = None,
) -> DataFrame:
    """Attach a deterministic unique long ``record_id``.

    :param existing: name of a unique long column to reuse (e.g.
        ``doc_id``) — the scale path, no sort needed.
    :param natural_key: columns that uniquely identify a row (e.g.
        repo/path/commit): derives a 63-bit id from xxhash64 over
        them — no sort, no shuffle, partition-independent; raises if
        the derived ids collide (checked with one count-distinct).
        The other scale path when no long id column exists.
    :param order_cols: natural-key columns defining first-occurrence
        order; derives id = dense row_number over that order. Only
        for test-scale inputs (global sort).
    """
    if existing is not None:
        return df.withColumn(id_col, F.col(existing).cast("long"))
    if natural_key:
        out = df.withColumn(
            id_col,
            F.abs(F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit(""))
                               for c in natural_key])),
        )
        n, nd = out.agg(
            F.count("*").alias("n"), F.countDistinct(id_col).alias("nd")
        ).first()
        if n != nd:
            raise ValueError(
                f"natural_key {natural_key} produced {n - nd} record_id "
                "collisions — key is not unique (or astronomically unlucky)"
            )
        return out
    if not order_cols:
        raise ValueError("need `existing`, `natural_key`, or order_cols")
    from pyspark.sql import Window

    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn(id_col, F.row_number().over(w).cast("long") - 1)
