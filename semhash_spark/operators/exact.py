"""Exact-duplicate stage.

Reference semantics (semhash/utils.py:87-124):

* self mode: scan records in order; the FIRST record with a given
  exact key is kept, later ones are duplicates of the group.
* cross mode: the seen-set is built ONLY from the fitted/reference
  records; query records whose key appears there are duplicates;
  query-internal exact duplicates are NOT collapsed
  (``in_one_set=False``, utils.py:112,120-122).

Spark realization: the group-min computation runs on the (id, key)
PROJECTION only — the wide row (content!) never enters the exact-key
shuffle. The resulting duplicate annotation (one row per DUPLICATE,
usually a small fraction of the input) joins back on the id, which
Catalyst broadcasts when it fits; a window over the full rows would
instead shuffle the entire corpus once. Cross mode is a left-semi /
left-anti join pair — broadcastable when the query side is small
(the reference benchmark shape: 4k test vs 1.8M train).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semhash_spark.operators.ids import exact_key

EXACT_KEY = "exact_key"


def with_exact_key(df: DataFrame, columns) -> DataFrame:
    # df passed through so complex-typed columns key via canonical
    # JSON (reference datamodels.py:139-146)
    return df.withColumn(EXACT_KEY, exact_key(columns, df))


def self_exact_dedup(
    df: DataFrame, columns, id_col: str = "record_id", with_key: bool = True
) -> DataFrame:
    """Annotate each row with its exact-group exemplar.

    Output adds: ``exact_key`` (only when ``with_key``),
    ``exemplar_id`` (min record_id of the group), ``is_exact_dup``
    (true for non-exemplar group members). Selected rows =
    ``record_id == exemplar_id``. Pass ``with_key=False`` when the
    caller never reads the key column (``self_deduplicate`` drops it
    from every output): the sha is then computed only inside the
    projection pass, not a second time on the wide branch — half the
    stage's hash compute.
    """
    from pyspark.sql import Window

    keys = with_exact_key(df, columns).select(F.col(id_col), F.col(EXACT_KEY))
    # group-min via a window over the (id, key) projection: ONE pass
    # computes every row's exemplar, so the duplicate annotation falls
    # out as a filter — the round-5 groupBy + join-back form scanned
    # (and re-hashed) the projection twice and shuffled it twice for
    # the same relation. Unordered frame: WindowExec buffers one key
    # group at a time and spills, so a giant exact group degrades to
    # disk, never OOM (same single-task routing the join form had).
    dup_ann = (
        keys.withColumn(
            "_ex_min", F.min(id_col).over(Window.partitionBy(EXACT_KEY))
        )
        .where(F.col(id_col) != F.col("_ex_min"))
        .select(F.col(id_col), F.col("_ex_min"))
    )
    keyed = with_exact_key(df, columns) if with_key else df
    out = keyed.join(dup_ann, id_col, "left")
    return out.withColumn(
        "exemplar_id", F.coalesce(F.col("_ex_min"), F.col(id_col))
    ).withColumn("is_exact_dup", F.col("_ex_min").isNotNull()).drop("_ex_min")


def index_key_table(index_df: DataFrame, columns, id_col: str = "record_id") -> DataFrame:
    """(exact_key, exemplar_id=min id) per distinct index key — the
    fitted seen-set. Precompute + persist this once per fitted index
    (api.SparkSemHash memoizes it) so repeated ``deduplicate`` calls
    skip re-hashing the whole index side."""
    return (
        with_exact_key(index_df, columns)
        .groupBy(EXACT_KEY)
        .agg(F.min(id_col).alias("exemplar_id"))
    )


def cross_exact_split(
    query_df: DataFrame,
    index_df: DataFrame,
    columns,
    id_col: str = "record_id",
    index_keys: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split query rows into (kept, exact_dups_vs_index).

    ``exact_dups`` rows carry ``exemplar_id`` = the index group's
    exemplar (min id). Query-internal duplicates are intentionally
    NOT collapsed (reference utils.py:112). Pass ``index_keys`` (from
    ``index_key_table``, typically cached) to skip recomputing the
    index-side key aggregation per call.
    """
    q = with_exact_key(query_df, columns)
    idx_keys = (
        index_keys
        if index_keys is not None
        else index_key_table(index_df, columns, id_col)
    )
    # match on the (id, key) projection so the wide query rows never
    # shuffle on exact_key; the hit list (one row per exact dup) then
    # joins back by id, broadcast when small
    hits = (
        q.select(F.col(id_col), F.col(EXACT_KEY))
        .join(idx_keys, EXACT_KEY)
        .select(F.col(id_col), F.col("exemplar_id"))
    )
    dups = q.join(hits, id_col, "inner")
    kept = q.join(hits.select(id_col), id_col, "left_anti")
    return kept, dups
