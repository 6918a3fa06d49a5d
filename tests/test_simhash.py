"""SimHash-mode dedup end to end.

SimHash is the near-exact detector: tiny edits flip few fingerprint
bits, so banding the 64 bits finds candidates within a small hamming
radius (pigeonhole: hamming <= bands-1 guarantees a shared band).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from semhash_spark.config import DedupConfig
from semhash_spark.functions.hashing import hamming64, shingle_hashes, simhash64
from semhash_spark.operators.dedup import self_deduplicate

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
         "iota", "kappa", "lam", "mu", "nu", "xi", "omi", "pi", "rho", "sigma"]


def _corpus(spark, n_base=60, seed=5):
    rng = np.random.default_rng(seed)
    rows = []
    rid = 0
    for _ in range(n_base):
        toks = list(rng.choice(WORDS, size=200))
        rows.append((rid, " ".join(toks))); rid += 1
        near = toks.copy()
        near[int(rng.integers(0, 200))] = str(rng.choice(WORDS))  # one token edit
        rows.append((rid, " ".join(near))); rid += 1
    # repartition: a bare LocalRelation would let Catalyst try to
    # constant-fold the pandas-UDF projection on the driver
    return spark.createDataFrame(rows, "record_id long, text string").repartition(8)


def test_one_edit_pairs_have_small_hamming(spark):
    df = _corpus(spark)
    # persist() the shingles frame: the InMemoryRelation boundary
    # stops CollapseProject from inlining the SQL-lambda shingle
    # expression into the pandas-UDF argument, which Spark 4.1 then
    # fails to extract ("Cannot evaluate expression: _sim(...)")
    sh = df.select("record_id", shingle_hashes("text", 3).alias("sh")).persist()
    sims = sh.select("record_id", simhash64("sh").alias("s64")).collect()
    by_id = {r.record_id: r.s64 for r in sims}
    hams = []
    for base in range(0, len(by_id), 2):
        h = bin((by_id[base] ^ by_id[base + 1]) & (2**64 - 1)).count("1")
        hams.append(h)
    # a 1-of-200-token edit flips only a few of 64 bits
    assert np.median(hams) <= 6, (np.median(hams), max(hams))


def test_simhash_mode_finds_one_edit_near_dups(spark):
    df = _corpus(spark)
    cfg = DedupConfig(columns=("text",), threshold=0.8, shingle_k=3,
                      simhash_bands=8, simhash_max_hamming=7)
    res = self_deduplicate(df, cfg, mode="simhash")
    fil = {r.record_id: r.exemplar_id for r in
           res.filtered.select("record_id", "exemplar_id").collect()}
    # threshold still applies: the simhash candidates are re-verified
    # with exact Jaccard, so only genuinely >= 0.8 pairs survive
    found = sum(1 for base in range(0, 120, 2) if fil.get(base + 1) == base)
    assert found >= 55, found  # ~all 60 planted pairs (J ~ 0.97)
    # no false merges across different base texts
    for dup, ex in fil.items():
        assert dup // 2 == ex // 2, (dup, ex)
