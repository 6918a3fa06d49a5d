"""Exact-duplicate stage.

Reference semantics (semhash/utils.py:87-124):

* self mode: scan records in order; the FIRST record with a given
  exact key is kept, later ones are duplicates of the group.
* cross mode: the seen-set is built ONLY from the fitted/reference
  records; query records whose key appears there are duplicates;
  query-internal exact duplicates are NOT collapsed
  (``in_one_set=False``, utils.py:112,120-122).

Spark realization: one hash shuffle on ``exact_key``; exemplar =
``min(record_id)`` per key via a window (no global sort). Cross mode
is a left-semi / left-anti join pair — broadcastable when the query
side is small (the reference benchmark shape: 4k test vs 1.8M train).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from semhash_spark.operators.ids import exact_key

EXACT_KEY = "exact_key"


def with_exact_key(df: DataFrame, columns) -> DataFrame:
    return df.withColumn(EXACT_KEY, exact_key(columns))


def self_exact_dedup(df: DataFrame, columns, id_col: str = "record_id") -> DataFrame:
    """Annotate each row with its exact-group exemplar.

    Output adds: ``exact_key``, ``exemplar_id`` (min record_id of the
    group), ``is_exact_dup`` (true for non-exemplar group members).
    Selected rows = ``record_id == exemplar_id``.
    """
    keyed = with_exact_key(df, columns)
    w = Window.partitionBy(EXACT_KEY)
    keyed = keyed.withColumn("exemplar_id", F.min(id_col).over(w))
    return keyed.withColumn("is_exact_dup", F.col(id_col) != F.col("exemplar_id"))


def cross_exact_split(
    query_df: DataFrame, index_df: DataFrame, columns, id_col: str = "record_id"
) -> tuple[DataFrame, DataFrame]:
    """Split query rows into (kept, exact_dups_vs_index).

    ``exact_dups`` rows carry ``exemplar_id`` = the index group's
    exemplar (min id). Query-internal duplicates are intentionally
    NOT collapsed (reference utils.py:112).
    """
    q = with_exact_key(query_df, columns)
    idx_keys = (
        with_exact_key(index_df, columns)
        .groupBy(EXACT_KEY)
        .agg(F.min(id_col).alias("exemplar_id"))
    )
    dups = q.join(idx_keys, EXACT_KEY, "inner")
    kept = q.join(idx_keys.select(EXACT_KEY), EXACT_KEY, "left_anti")
    return kept, dups
