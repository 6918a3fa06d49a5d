"""Bucketed-table storage for shuffle-free id joins.

The dedup pipeline joins on ``record_id`` repeatedly — exact-dup
annotation join-back, feature rehydration, cluster-label join-back,
incremental (cross) dedup of a new batch against stored ``selected``
output. When the stored corpus is BUCKETED on the id, Spark's
bucketed SortMergeJoin reads both sides pre-partitioned and skips
the Exchange entirely (and the per-bucket sort when
``sortBy(record_id)`` is used) — at 100 TB that is the difference
between re-shuffling the corpus per pipeline run and never shuffling
it at all. The same design maps 1:1 onto Iceberg's
``bucket(N, record_id)`` partition transform in production
(BASELINE north rule: "every stage checkpoints to Iceberg"); Spark's
file-format bucketing is the sandbox analogue.

Usage::

    write_bucketed(corpus, "corpus_bucketed", buckets=64)
    corpus = read_bucketed(spark, "corpus_bucketed")
    # id-equi-joins against other tables bucketed the same way now
    # plan with NO Exchange on either side (asserted in
    # tests/test_bucketed.py)

Bucketed writes go through the session catalog (``saveAsTable``) —
Spark only honors bucket metadata for catalog tables, not bare
parquet paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = 64,
    key: str = "record_id",
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Save ``df`` as a catalog table bucketed (and optionally
    sorted) by ``key``. ``buckets`` should be sized so one bucket of
    the LARGEST co-located table fits an executor core's working set
    (~hundreds of MB); all tables that join on ``key`` must use the
    SAME bucket count for Exchange elision."""
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed catalog table (bucket metadata intact)."""
    return spark.table(table)
