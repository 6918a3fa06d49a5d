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


def _cross_mega_corpus(spark, n=2000, seed=29):
    """Query side = even ids, index side = odd ids; EVERY doc on both
    sides shares one 80-token boilerplate block (one mega band bucket
    spanning both sides); additionally query 2k matches index 2k+1
    (19/20 unique tokens shared -> true near-dup)."""
    rng = np.random.default_rng(seed)
    boiler = " ".join(rng.choice(WORDS, size=80))
    q_rows, i_rows = [], []
    for i in range(0, n, 2):
        uniq = list(rng.choice(WORDS, size=20))
        q_rows.append((i, boiler + " " + " ".join(uniq)))
        near = uniq.copy()
        near[7] = str(rng.choice(WORDS))
        i_rows.append((i + 1, boiler + " " + " ".join(near)))
    mk = lambda rows: spark.createDataFrame(
        rows, "record_id long, text string"
    ).repartition(8)
    return mk(q_rows), mk(i_rows)


def test_cross_mega_bucket_candidates_bounded(spark):
    """VERDICT r2 #2: a boilerplate band present on BOTH sides must
    not emit |Q_bucket| x |I_bucket| pairs — the index side of each
    oversized bucket is hash-thinned to ~bucket_cap members."""
    from semhash_spark.operators.lsh import band_table, candidate_pairs_cross

    n = 2000
    q_df, i_df = _cross_mega_corpus(spark, n)
    cfg = DedupConfig(columns=("text",), threshold=0.8, shingle_k=3,
                      num_perm=64, bands=16, bucket_cap=100)
    qf = add_features(q_df, cfg, "minhash")
    xf = add_features(i_df, cfg, "minhash")
    qb = band_table(qf, "sig", cfg.bands, "record_id", cfg.rows_per_band)
    ib = band_table(xf, "sig", cfg.bands, "record_id", cfg.rows_per_band)
    capped = candidate_pairs_cross(qb, ib, "record_id",
                                   bucket_cap=cfg.bucket_cap).count()
    uncapped = candidate_pairs_cross(qb, ib, "record_id").count()
    # design bound: every bucket contributes <= |Q_bucket| * ~cap, so
    # the distinct relation is linear in |Q| (never |Q| x |I|); the
    # 1.5 slack covers binomial sampling variance
    assert capped <= (n // 2) * cfg.bucket_cap * cfg.bands * 1.5, capped
    # measured skew reduction on the planted boilerplate (mega bucket
    # ~4x cap per band here; the factor grows with bucket size)
    assert capped < uncapped / 3, (capped, uncapped)


def test_cross_mega_bucket_recall_preserved(spark):
    """Capped cross dedup still filters the planted query-side dups:
    true matches also share content-driven bands outside the
    boilerplate mega bucket."""
    from semhash_spark.operators.dedup import deduplicate

    n = 1000
    q_df, i_df = _cross_mega_corpus(spark, n)
    cfg = DedupConfig(columns=("text",), threshold=0.8, shingle_k=3,
                      num_perm=64, bands=16, bucket_cap=100)
    res = deduplicate(q_df, i_df, cfg, mode="minhash")
    fil = {r.record_id: r.exemplar_id for r in
           res.filtered.select("record_id", "exemplar_id").collect()}
    found = sum(1 for i in range(0, n, 2) if fil.get(i) == i + 1)
    assert found >= 0.99 * (n // 2), (found, n // 2)
