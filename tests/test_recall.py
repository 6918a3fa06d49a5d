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


def test_recall_corpus_hyperplane(spark):
    """VERDICT r4 item 1: the cosine-mode flagship at 100k corpus
    files — record-level recall of the hyperplane-LSH (at-scale) plan
    vs the exact-cosine truth, where truth = the fused blob-matmul
    path (it emits the COMPLETE >=θ edge set; proven equal to the
    greedy oracle above and hash-green in CORRECTNESS_r04). The
    production SRP config (2048 bits / 128 width-16 bands, bench.py
    cos_cfg) must clear the north-rule 0.99 bar.

    The corpus is featurized ONCE outside both legs (embedding column
    attached, add_features passes it through), so the test measures
    candidate/verify recall, not two encoder runs.
    """
    import os

    from semhash_spark.functions.encoder import featurize
    from semhash_spark.sources.corpus import generate_corpus, truth_exact_pairs

    n = int(os.environ.get("SPARK_GRAFT_RECALL_N", "100000"))
    cfg = DedupConfig(
        columns=("content",), threshold=0.75, embedding_dim=128,
        embedding_ngram=2, hyperplane_bits=2048, hyperplane_bands=128,
    )
    corpus = featurize(
        generate_corpus(spark, n), cfg.columns, cfg.embedding_dim,
        cfg.embedding_col, cfg.embedding_ngram,
    ).persist()
    try:
        res_exact = self_deduplicate(corpus, cfg, mode="cosine")
        truth = {int(r["record_id"])
                 for r in res_exact.filtered.select("record_id").collect()}
        res_exact.release()

        res_hp = self_deduplicate(
            corpus, cfg.with_(cosine_fused_cap=0), mode="cosine")
        found = {int(r["record_id"])
                 for r in res_hp.filtered.select("record_id").collect()}
        res_hp.release()

        # sanity: the planted exact duplicates (slot-1 rows) are in
        # the truth — guards against a vacuous/broken truth leg
        exact_dups = {d for d, _ in truth_exact_pairs(n)}
        assert exact_dups <= truth
        assert len(truth) > n // 50  # near-dups + boiler actually fire

        recall = len(truth & found) / len(truth)
        print(f"corpus hyperplane recall @ n={n}: {recall:.5f} "
              f"(truth={len(truth)}, found={len(found)})")
        assert recall >= 0.99
    finally:
        corpus.unpersist()


def test_recall_ivf_path(spark, oracle_dups):
    # cosine_fused_cap=0 + cosine_candidates="ivf" forces the coarse
    # IVF cells + per-cell fused gemm plan (the at-scale plan for MID
    # thresholds — see verify.cosine_threshold_edges_ivf). This
    # θ=0.9 UNIGRAM table is IVF's adversarial case (one tight
    # angular blob — SRP's regime per the config docs): boundary
    # pairs straddle cells, so wide probing is needed (measured here:
    # probe 2 → 0.93, 4 → 0.97, 6 → 1.0 of 8 cells). The intended
    # mid-threshold regime is covered by test_recall_corpus_ivf.
    filtered = _engine_filtered(
        spark, cosine_fused_cap=0, cosine_candidates="ivf",
        ivf_cells=8, ivf_probe=6,
    )
    recall = len(oracle_dups & filtered) / len(oracle_dups)
    assert recall >= 0.99


def test_recall_corpus_ivf(spark):
    """The IVF plan's record-level recall vs the exact-cosine truth
    (fused path) on the flagship corpus at the bench config — same
    harness as test_recall_corpus_hyperplane; default N kept small
    enough for CI, env-scalable like the hyperplane test."""
    import os

    from semhash_spark.functions.encoder import featurize
    from semhash_spark.sources.corpus import generate_corpus

    n = int(os.environ.get("SPARK_GRAFT_RECALL_IVF_N", "20000"))
    cfg = DedupConfig(
        columns=("content",), threshold=0.75, embedding_dim=128,
        embedding_ngram=2,
    )
    corpus = featurize(
        generate_corpus(spark, n), cfg.columns, cfg.embedding_dim,
        cfg.embedding_col, cfg.embedding_ngram,
    ).persist()
    try:
        res_exact = self_deduplicate(corpus, cfg, mode="cosine")
        truth = {int(r["record_id"])
                 for r in res_exact.filtered.select("record_id").collect()}
        res_exact.release()

        res_ivf = self_deduplicate(
            corpus,
            cfg.with_(cosine_fused_cap=0, cosine_candidates="ivf"),
            mode="cosine")
        found = {int(r["record_id"])
                 for r in res_ivf.filtered.select("record_id").collect()}
        res_ivf.release()

        assert len(truth) > n // 50
        recall = len(truth & found) / len(truth)
        print(f"corpus ivf recall @ n={n}: {recall:.5f} "
              f"(truth={len(truth)}, found={len(found)})")
        assert recall >= 0.99
    finally:
        corpus.unpersist()
