"""Containment (substring) stage — catches contained-duplicate
fragments invisible to MinHash/Jaccard at low overall similarity.

A fragment X pasted inside a much larger file Y has Jaccard(X,Y)
~ |X|/|Y| (small) but containment |S(X) ∩ S(Y)| / |S(X)| ~ 1.

Public technique: winnowing fingerprints (Schleimer, Wilkerson,
Aiken — "Winnowing: Local Algorithms for Document Fingerprinting",
SIGMOD 2003), simplified to mod-p anchor sampling ("0 mod p"
fingerprinting from the same paper): a shingle hash is an ANCHOR iff
``h % anchor_mod == 0``. Both X and Y select the same anchors for
shared regions, so anchor equality is a join key.

Plan:
  shingle hashes (already computed) --filter anchors--> explode
  (anchor_hash, record_id) --self-join on anchor (skew-capped like
  LSH buckets)--> candidate (a,b) --verify containment ratio
  |S(a) ∩ S(b)| / |S(a)| with array_intersect (JVM)--> optional
  exact substring confirmation via locate() on the content pair.

The final substring check joins content back ONLY for surviving
candidates (tiny relation), never shuffling content at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semhash_spark.operators.lsh import candidate_pairs_self


def anchor_table(
    feats: DataFrame,
    shingle_col: str = "shingles",
    anchor_mod: int = 8,
    id_col: str = "record_id",
) -> DataFrame:
    """(record_id, band_idx=0, band_hash=anchor) rows for each anchor
    shingle hash. Reuses the LSH bucket machinery for skew caps."""
    anchors = F.filter(
        F.col(shingle_col), lambda h: h % anchor_mod == F.lit(0)
    )
    return feats.select(
        F.col(id_col),
        F.lit(0).alias("band_idx"),
        F.explode(anchors).alias("band_hash"),
    )


def containment_edges(
    feats: DataFrame,
    cfg,
    id_col: str = "record_id",
    confirm_substring: bool = False,
    content_df: DataFrame | None = None,
    content_col: str = "content",
) -> DataFrame:
    """Directed containment edges (a, b, score): the SMALLER side's
    shingle set is >= containment_threshold contained in the other.

    Output is symmetric-ready for the CC edge union: (a, b, score)
    with a < b (ids), score = containment ratio of the smaller set.
    """
    at = anchor_table(feats, "shingles", cfg.anchor_mod, id_col)
    cands = candidate_pairs_self(at, cfg.bucket_cap, id_col)

    from semhash_spark.operators.verify import containment_score

    fa = feats.select(F.col(id_col).alias("a"), F.col("shingles").alias("_fa"))
    fb = feats.select(F.col(id_col).alias("b"), F.col("shingles").alias("_fb"))
    j = cands.join(fa, "a").join(fb, "b")
    scored = (
        j.withColumn("score", containment_score("_fa", "_fb"))
        .where(F.col("score") >= cfg.containment_threshold)
        .select("a", "b", "score")
    )

    if confirm_substring and content_df is not None:
        c = content_df.select(F.col(id_col), F.col(content_col))
        ca = c.select(F.col(id_col).alias("a"), F.col(content_col).alias("_ca"))
        cb = c.select(F.col(id_col).alias("b"), F.col(content_col).alias("_cb"))
        scored = (
            scored.join(ca, "a")
            .join(cb, "b")
            .where(
                (F.instr(F.col("_ca"), F.col("_cb")) > 0)
                | (F.instr(F.col("_cb"), F.col("_ca")) > 0)
            )
            .select("a", "b", "score")
        )
    return scored
