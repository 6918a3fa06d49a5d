"""Dup-pair recall vs the reference's greedy semantics at the
reference's DEFAULT config (θ=0.9 cosine, semhash/semhash.py:173) on
the non-synthetic-structure sf0.01 documents table (VERDICT r1 #6).

Oracle: faithful greedy scan in record order (reference
semhash/semhash.py:251-290 self_deduplicate): a record is a duplicate
iff some EARLIER KEPT record has cosine >= θ; exact cosine from the
same encode_texts kernel the pipeline uses.

Recall metric (BASELINE.json north rule): fraction of oracle
duplicates the engine also filters. The fused cosine path emits the
COMPLETE >=θ edge set, so recall must be 1.0 there; the hyperplane
LSH path (the at-scale plan) must clear the 0.99 bar.
"""

from __future__ import annotations

import numpy as np
import pytest

from semhash_spark.config import DedupConfig
from semhash_spark.functions.encoder import encode_texts
from semhash_spark.operators.dedup import self_deduplicate
from semhash_spark.sources.tables import documents

SF001 = "/root/testdata/sf0.01"
THETA = 0.9


@pytest.fixture(scope="module")
def oracle_dups(spark):
    rows = sorted(
        documents(spark, SF001).select("record_id", "text").collect(),
        key=lambda r: r["record_id"],
    )
    ids = [int(r["record_id"]) for r in rows]
    emb = encode_texts([r["text"] for r in rows]).astype(np.float64)
    kept: list[int] = []
    dups: set[int] = set()
    for i in range(len(ids)):
        # encode_texts returns L2-normalized rows -> dot = cosine
        if kept and float((emb[kept] @ emb[i]).max()) >= THETA - 1e-9:
            dups.add(ids[i])
        else:
            kept.append(i)
    return dups


def _engine_filtered(spark, **cfg_kw):
    cfg = DedupConfig(columns=("text",), threshold=THETA, **cfg_kw)
    res = self_deduplicate(documents(spark, SF001), cfg, mode="cosine")
    filtered = {int(r["record_id"]) for r in res.filtered.select("record_id").collect()}
    res.release()
    return filtered


def test_recall_fused_cosine_exact(spark, oracle_dups):
    assert len(oracle_dups) > 0, "oracle found no dups — test is vacuous"
    filtered = _engine_filtered(spark)
    recall = len(oracle_dups & filtered) / len(oracle_dups)
    assert recall == 1.0  # complete edge set -> every oracle dup clusters


def test_recall_hyperplane_lsh_path(spark, oracle_dups):
    # cosine_fused_cap=0 forces the at-scale random-hyperplane plan
    filtered = _engine_filtered(
        spark, cosine_fused_cap=0, hyperplane_bits=64, hyperplane_bands=16
    )
    recall = len(oracle_dups & filtered) / len(oracle_dups)
    assert recall >= 0.99
