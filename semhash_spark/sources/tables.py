"""Readers for the driver-provided testdata tables."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents table with the pipeline's record_id attached
    (doc_id is already a unique deterministic long)."""
    df = read_table(spark, sf_dir, "documents")
    return df.withColumn("record_id", df["doc_id"].cast("long"))


def embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = read_table(spark, sf_dir, "embeddings")
    return df.withColumn("record_id", df["vec_id"].cast("long"))
