"""Incremental exact-dedup over Structured Streaming.

The reference is batch-only (no streaming abstractions anywhere in
/root/reference/semhash/); this is the natural Spark extension: new
records arrive on a stream and exact duplicates (same rendered
record key) are dropped within a watermark window via
``dropDuplicatesWithinWatermark`` — the streaming analogue of the
exact stage. Semantic (LSH) dedup remains a batch job over the
deduplicated sink (micro-batch joins against the fitted index would
go through ``foreachBatch`` + the cross-``deduplicate`` operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semhash_spark.operators.ids import exact_key


def exact_dedup_stream(
    stream_df: DataFrame,
    columns,
    event_time_col: str = "event_time",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop exact duplicates arriving within the watermark window."""
    keyed = stream_df.withColumn("exact_key", exact_key(columns))
    return keyed.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        ["exact_key"]
    )


def windowed_dup_counts(
    stream_df: DataFrame,
    columns,
    event_time_col: str = "event_time",
    watermark: str = "10 minutes",
    window: str = "5 minutes",
) -> DataFrame:
    """Per-window duplicate-group counts (monitoring surface)."""
    keyed = stream_df.withColumn("exact_key", exact_key(columns))
    return (
        keyed.withWatermark(event_time_col, watermark)
        .groupBy(F.window(event_time_col, window), "exact_key")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
    )
