"""Robustness regressions: NULL feature rows and the Spark 4.1
CollapseProject/pandas-UDF extraction hazard (ADVICE round 1)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from semhash_spark.config import DedupConfig
from semhash_spark.functions.hashing import _LONG_MAX, minhash_signature, simhash64
from semhash_spark.functions.vectors import hyperplane_bands
from semhash_spark.operators.dedup import add_features


def test_minhash_simhash_null_rows(spark):
    df = spark.createDataFrame(
        [(1, [1, 2, 3]), (2, None), (3, [])],
        "id long, shingles array<long>",
    ).repartition(2)
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            minhash_signature("shingles", 4).alias("sig"),
            simhash64("shingles").alias("sim"),
        ).collect()
    }
    # null and empty behave identically: sentinel signature, zero print
    assert rows[2]["sig"] == [_LONG_MAX] * 4 == rows[3]["sig"]
    assert rows[2]["sim"] == 0 == rows[3]["sim"]
    assert rows[1]["sig"] != rows[2]["sig"]


def test_hyperplane_null_rows(spark):
    df = spark.createDataFrame(
        [(1, [0.5] * 8), (2, None)], "id long, e array<float>"
    ).repartition(2)
    rows = {
        r["id"]: r["b"]
        for r in df.select(
            "id", hyperplane_bands("e", 8, 2, 42, 8).alias("b")
        ).collect()
    }
    assert rows[2] == []  # null -> no bands -> no candidates
    assert len(rows[1]) == 2


def test_add_features_survives_projection_drop(spark):
    """Selecting only (id, sig) after add_features must not hit the
    CollapseProject lambda-inline INTERNAL_ERROR."""
    cfg = DedupConfig(columns=("content",), shingle_k=3, num_perm=16, bands=4)
    src = spark.createDataFrame(
        [(i, "a b c d e f g h") for i in range(10)],
        "record_id long, content string",
    )
    out = add_features(src, cfg, "minhash").select("record_id", "sig").collect()
    assert len(out) == 10
    assert all(len(r["sig"]) == 16 for r in out)
    out2 = add_features(src, cfg, "simhash").select("record_id", "sim64").collect()
    assert len(out2) == 10


def test_encoder_vectorized_parity():
    """bincount accumulation must match the per-token definition."""
    from semhash_spark.functions.encoder import _token_hash, encode_texts

    texts = ["a b c a", "", "xyz", "a " * 50]
    dim = 16
    ref = np.zeros((len(texts), dim))
    for i, t in enumerate(texts):
        for tok in t.split():
            h = _token_hash(tok)
            ref[i, h % dim] += 1.0 if (h >> 8) & 1 else -1.0
    n = np.linalg.norm(ref, axis=1, keepdims=True)
    ref = np.divide(ref, n, out=np.zeros_like(ref), where=n > 0).astype(np.float32)
    assert np.array_equal(encode_texts(texts, dim), ref)
