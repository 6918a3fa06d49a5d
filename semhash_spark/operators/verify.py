"""Exact verification of candidate pairs.

The reference never needs this (its ANN returns exact cosine
distances, semhash/index.py:59); in the LSH plan, candidates are
probabilistic and every surviving pair is re-scored exactly:

* Jaccard over shingle-hash sets: JVM-side
  ``array_intersect`` / ``array_union`` sizes — integer-exact, no
  float drift between engines.
* Cosine over embedding arrays: float64 JVM expression
  (functions/vectors.py).

Plan shape: two hash joins to rehydrate the feature arrays onto the
id pairs (feature tables carry ONLY id + feature, content pruned),
then a codegen'd filter. At cluster scale the feature table is the
big side; pairs are typically ~1% of rows and get broadcast by AQE
when small enough.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semhash_spark.functions.vectors import cosine_similarity


def _attach(pairs: DataFrame, feats: DataFrame, id_col: str, feat_col: str) -> DataFrame:
    fa = feats.select(F.col(id_col).alias("a"), F.col(feat_col).alias("_fa"))
    fb = feats.select(F.col(id_col).alias("b"), F.col(feat_col).alias("_fb"))
    return pairs.join(fa, "a").join(fb, "b")


def verify_jaccard(
    pairs: DataFrame,
    feats: DataFrame,
    feat_col: str = "shingles",
    id_col: str = "record_id",
    threshold: float | None = None,
    left: str = "a",
    right: str = "b",
) -> DataFrame:
    """Score pairs with exact Jaccard similarity of shingle sets."""
    fa = feats.select(F.col(id_col).alias(left), F.col(feat_col).alias("_fa"))
    fb = feats.select(F.col(id_col).alias(right), F.col(feat_col).alias("_fb"))
    j = pairs.join(fa, left).join(fb, right)
    inter = F.size(F.array_intersect("_fa", "_fb"))
    union = F.size(F.array_union("_fa", "_fb"))
    scored = j.withColumn(
        "score", F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    ).drop("_fa", "_fb")
    if threshold is not None:
        scored = scored.where(F.col("score") >= threshold)
    return scored


def verify_cosine(
    pairs: DataFrame,
    feats: DataFrame,
    feat_col: str = "embedding",
    id_col: str = "record_id",
    threshold: float | None = None,
    left: str = "a",
    right: str = "b",
) -> DataFrame:
    """Score pairs with exact cosine similarity of embeddings."""
    fa = feats.select(F.col(id_col).alias(left), F.col(feat_col).alias("_fa"))
    fb = feats.select(F.col(id_col).alias(right), F.col(feat_col).alias("_fb"))
    j = pairs.join(fa, left).join(fb, right)
    scored = j.withColumn("score", cosine_similarity("_fa", "_fb")).drop("_fa", "_fb")
    if threshold is not None:
        scored = scored.where(F.col("score") >= threshold)
    return scored
