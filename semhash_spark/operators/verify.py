"""Exact verification of candidate pairs.

The reference never needs this (its ANN returns exact cosine
distances, semhash/index.py:59); in the LSH plan, candidates are
probabilistic and every surviving pair is re-scored exactly:

* Jaccard / containment over shingle-hash sets: JVM-side
  ``array_intersect`` / ``array_union`` sizes — integer-exact, no
  float drift between engines. Measured note: a vectorized pandas
  kernel was also tried; shipping two ~100-element long arrays per
  pair through Arrow costs more than the interpreted JVM set ops
  (~8s vs ~6s per 320k pairs at local[32], where Python workers
  contend with executor threads), so the JVM form wins here —
  unlike the cosine case below where the arrays are small and the
  numpy matmul dominates.
* Cosine over embedding arrays: vectorized pandas UDF
  (functions/vectors.py) — float64 batch matmul, ~25x faster than
  interpreted higher-order expressions.

Plan shape: two hash joins rehydrate the feature arrays onto the id
pairs (feature tables carry ONLY id + feature, content pruned); the
feature side is broadcast when small enough, else a shuffled hash
join with AQE skew splitting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from semhash_spark.functions.vectors import cosine_similarity


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def jaccard_similarity(a: str | Column, b: str | Column) -> Column:
    """Exact Jaccard of two array<long> set columns (elements distinct
    within each array, as produced by shingle_hashes)."""
    inter = F.size(F.array_intersect(_c(a), _c(b)))
    union = F.size(F.array_union(_c(a), _c(b)))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def containment_score(a: str | Column, b: str | Column) -> Column:
    """|A ∩ B| / min(|A|, |B|) of two array<long> set columns."""
    inter = F.size(F.array_intersect(_c(a), _c(b))).cast("double")
    small = F.least(F.size(_c(a)), F.size(_c(b))).cast("double")
    return F.when(small > 0, inter / small).otherwise(F.lit(0.0))


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
    scored = j.withColumn("score", jaccard_similarity("_fa", "_fb")).drop("_fa", "_fb")
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
