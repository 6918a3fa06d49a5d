"""Skew stress: a planted mega-bucket (every record shares one huge
boilerplate block) must not blow up the candidate-pair relation.

north_rule: "Skew from mega-repos and common-boilerplate bands is
handled with salted band keys and AQE skew-join splitting" — here the
bucket cap turns O(m²) all-pairs inside an oversized bucket into O(m)
star edges, so total candidates stay linear in the input while true
near-duplicate pairs (which also share content-specific bands) are
still found.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from semhash_spark.config import DedupConfig
from semhash_spark.operators.dedup import add_features, _candidates_self, self_deduplicate
from semhash_spark.operators.exact import self_exact_dedup

WORDS = [f"tok{i}" for i in range(400)]


def _mega_bucket_corpus(spark, n=4000, seed=13):
    """Every doc = the SAME 80-token boilerplate + 20 unique tokens;
    additionally docs 2k/2k+1 are true near-dups (1 token apart)."""
    rng = np.random.default_rng(seed)
    boiler = " ".join(rng.choice(WORDS, size=80))
    rows = []
    for i in range(0, n, 2):
        uniq = list(rng.choice(WORDS, size=20))
        rows.append((i, boiler + " " + " ".join(uniq)))
        near = uniq.copy()
        near[7] = str(rng.choice(WORDS))
        rows.append((i + 1, boiler + " " + " ".join(near)))
    return spark.createDataFrame(rows, "record_id long, text string").repartition(8)


def test_mega_bucket_candidates_stay_linear(spark):
    n = 4000
    df = _mega_bucket_corpus(spark, n)
    cfg = DedupConfig(columns=("text",), threshold=0.8, shingle_k=3,
                      num_perm=64, bands=16, bucket_cap=100)
    keyed = self_exact_dedup(df, cfg.columns, "record_id")
    feats = add_features(keyed.where(~F.col("is_exact_dup")), cfg, "minhash").select(
        "record_id", "shingles", "sig"
    ).persist()
    n_cands = _candidates_self(feats, cfg, "minhash", "record_id").count()
    # without the cap the shared boilerplate makes ~n^2/2 = 8M pairs;
    # capped it must stay within a small multiple of n * cap
    assert n_cands < n * cfg.bucket_cap, n_cands


def test_mega_bucket_still_finds_true_pairs(spark):
    n = 2000
    df = _mega_bucket_corpus(spark, n)
    cfg = DedupConfig(columns=("text",), threshold=0.8, shingle_k=3,
                      num_perm=64, bands=16, bucket_cap=100)
    res = self_deduplicate(df, cfg, mode="minhash")
    fil = {r.record_id: r.exemplar_id for r in
           res.filtered.select("record_id", "exemplar_id").collect()}
    # the planted (2k, 2k+1) pairs share 80 boilerplate + 19/20 unique
    # tokens -> Jaccard well above 0.8 -> must cluster together
    found = sum(1 for i in range(0, n, 2) if fil.get(i + 1) == i or fil.get(i) == i + 1)
    assert found >= 0.99 * (n // 2), found
