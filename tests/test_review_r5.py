"""Round-5 review items.

* ``cosine_max_k`` — the reference's ANN result cap (max_k=100,
  semhash/index.py:59) applied in the fused cosine kernels: bounds
  the quadratic edge emission of mega-clusters while leaving
  min-id cluster assignments unchanged for complete sub-clusters.
* ``driver_cc_cap`` config knob — forcing the distributed star-CC
  path through the public self_deduplicate surface.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from semhash_spark.config import DedupConfig
from semhash_spark.operators.dedup import self_deduplicate


def _clique_corpus(spark, n_clique=150, n_noise=50):
    """n_clique rows sharing one header (a >=θ cosine clique much
    wider than max_k) + n_noise independent rows."""
    rows = []
    header = "alpha beta gamma delta epsilon zeta eta theta " * 8
    rng = np.random.default_rng(3)
    words = ["w%d" % i for i in range(1000)]
    for i in range(n_clique):
        tail = " ".join(rng.choice(words, size=6))
        rows.append((i, header + tail))
    for i in range(n_clique, n_clique + n_noise):
        rows.append((i, " ".join(rng.choice(words, size=80))))
    return spark.createDataFrame(rows, "record_id long, content string")


CFG = DedupConfig(columns=("content",), threshold=0.8, embedding_dim=64,
                  embedding_ngram=1)


def test_cosine_max_k_same_clusters_on_clique(spark):
    """A 150-member clique capped at max_k=8: every member still
    lands in the min-id cluster (capped a<b emission keeps complete
    clusters connected), selected/filtered identical to uncapped."""
    df = _clique_corpus(spark)

    res_uncapped = self_deduplicate(df, CFG.with_(cosine_max_k=None),
                                    mode="cosine")
    sel_u = sorted(r.record_id for r in res_uncapped.selected.collect())
    n_pairs_u = res_uncapped.pairs.count()
    res_uncapped.release()

    res_capped = self_deduplicate(df, CFG.with_(cosine_max_k=8), mode="cosine")
    sel_c = sorted(r.record_id for r in res_capped.selected.collect())
    n_pairs_c = res_capped.pairs.count()
    fil = {r.record_id: r.exemplar_id for r in res_capped.filtered.collect()}
    res_capped.release()

    assert sel_c == sel_u
    # the whole clique collapsed onto its min id
    assert all(fil[i] == 0 for i in range(1, 150))
    # and the cap actually bit: uncapped emits O(m^2) pairs, capped
    # O(m*k) (the pairs relation records each edge from both
    # endpoints, hence the 2x)
    assert n_pairs_u > 10_000
    assert n_pairs_c <= 2 * 150 * 8 + 100


def test_cosine_max_k_bounds_cross_pairs(spark):
    """Cross dedup against a clique index: existential results are
    cap-invariant; the pairs detail is bounded by max_k per query."""
    from semhash_spark.operators.dedup import deduplicate

    idx = _clique_corpus(spark)
    q = spark.createDataFrame(
        [(1000, "alpha beta gamma delta epsilon zeta eta theta " * 8 + "zz")],
        "record_id long, content string",
    )
    res = deduplicate(q, idx, CFG.with_(cosine_max_k=5), mode="cosine")
    try:
        assert res.selected.count() == 0  # the query hits the clique
        assert res.filtered.count() == 1
        assert res.pairs.count() <= 5
    finally:
        res.release()


def test_driver_cc_cap_zero_forces_star_path(spark):
    """cfg.driver_cc_cap=0 must route clustering through the
    alternating-star rounds and produce identical results."""
    df = _clique_corpus(spark, n_clique=40, n_noise=20)
    r_drv = self_deduplicate(df, CFG, mode="cosine")
    r_star = self_deduplicate(df, CFG.with_(driver_cc_cap=0), mode="cosine")
    try:
        assert (sorted(r.record_id for r in r_drv.selected.collect())
                == sorted(r.record_id for r in r_star.selected.collect()))
        d = {r.record_id: r.exemplar_id for r in r_drv.filtered.collect()}
        s = {r.record_id: r.exemplar_id for r in r_star.filtered.collect()}
        assert d == s
    finally:
        r_drv.release()
        r_star.release()


def test_chunked_threshold_kernel_edges():
    """Unit coverage of the round-5 f32-scan/f64-rescore kernel:
    zero-norm exclusion at thr<=0 (normalized zero rows score exactly
    0.0, which a non-positive threshold would wrongly admit), exact
    f64 emission, and the sparse per-row max_k cap."""
    import numpy as np

    from semhash_spark.operators.verify import (
        _cap_rows_sparse,
        _chunked_threshold,
    )

    from semhash_spark.operators.verify import _build_blocks

    rng = np.random.default_rng(7)
    matn = rng.standard_normal((50, 16))
    matn[3] = 0.0  # zero-norm row
    nrm = np.linalg.norm(matn, axis=1, keepdims=True)
    matn = np.divide(matn, nrm, out=matn, where=nrm > 0)
    nz = nrm.ravel() > 0
    ids = np.arange(50, dtype=np.int64)
    m32 = _build_blocks(matn)

    # thr <= 0: every non-zero-norm ordered pair passes; none touch
    # the zero-norm row on either side
    got = [
        (int(a), int(b))
        for r, c, s in _chunked_threshold(
            ids, matn, ~nz, ids, matn, m32, nz, -1.0, None, self_mode=True)
        for a, b in zip(ids[r], ids[c])
    ]
    want = [(a, b) for a in range(50) for b in range(50)
            if a < b and a != 3 and b != 3]
    assert sorted(got) == want

    # emitted scores are the exact float64 dot of the normalized rows
    for r, c, s in _chunked_threshold(
            ids, matn, ~nz, ids, matn, m32, nz, 0.2, None, self_mode=True):
        expect = np.einsum("ij,ij->i", matn[r], matn[c])
        assert np.array_equal(s, expect)
        assert (s >= 0.2).all()

    # sparse cap: row 0 has 5 hits, cap 2 keeps the 2 best by
    # (score desc, id asc)
    r = np.array([0, 0, 0, 0, 0, 1])
    c = np.array([1, 2, 3, 4, 5, 6])
    s = np.array([0.9, 0.95, 0.9, 0.8, 0.99, 0.5])
    ids_i = np.arange(10, dtype=np.int64)
    rr, cc, ss = _cap_rows_sparse(r, c, s, ids_i, 2)
    # keep-mask filter preserves triplet order; the KEPT SET is the
    # top-2 by (score desc, id asc) plus the under-cap row
    assert sorted(zip(rr.tolist(), cc.tolist())) == [(0, 2), (0, 5), (1, 6)]


def test_ivf_salting_is_output_invariant(spark):
    """The round-5 OOM fix: the IVF scan bounds applyInPandas group
    size by salting the probe stream and replicating each cell's
    capped home pack to every salt. A tiny group_cap (many salts per
    cell) must produce the exact same edge set — ids AND bit-identical
    scores — as an effectively-unsalted run (group_cap >= all rows).
    The corpus is deliberately skewed: one tight angular blob drops
    most rows into a single cell, the unsalted failure shape."""
    from semhash_spark.operators.verify import cosine_threshold_edges_ivf

    rng = np.random.default_rng(11)
    u = rng.standard_normal(16)
    u /= np.linalg.norm(u)
    rows = []
    for i in range(300):  # the mega-cell blob
        v = u + 0.05 * rng.standard_normal(16)
        rows.append((i, [float(x) for x in v]))
    for i in range(300, 400):  # scatter
        v = rng.standard_normal(16)
        rows.append((i, [float(x) for x in v]))
    feats = spark.createDataFrame(
        rows, "record_id long, embedding array<double>")

    kw = dict(n_cells=4, n_probe=2, cell_cap=80, seed=7, n_rows=400)
    salted = cosine_threshold_edges_ivf(
        feats, 0.9, group_cap=25, **kw).collect()
    plain = cosine_threshold_edges_ivf(
        feats, 0.9, group_cap=10**9, **kw).collect()

    as_set = lambda res: {(r.a, r.b, r.score) for r in res}  # noqa: E731
    assert len(salted) > 100  # the blob actually pairs
    assert as_set(salted) == as_set(plain)


def test_rescore_slicing_is_output_invariant(monkeypatch):
    """The bounded-slice f64 rescore (the 1M-IVF OOM fix: a
    mega-clique chunk surfaces step*n_idx survivors at once and the
    one-shot fancy-index rescore held two (hits x dim) f64 copies
    ~8 GB/worker) must emit bit-identical (r, c, s) triplets to the
    one-shot path at any slice size."""
    import numpy as np

    import semhash_spark.operators.verify as V

    rng = np.random.default_rng(11)
    matn = rng.standard_normal((80, 16))
    nrm = np.linalg.norm(matn, axis=1, keepdims=True)
    matn = np.divide(matn, nrm, out=matn, where=nrm > 0)
    nz = nrm.ravel() > 0
    ids = np.arange(80, dtype=np.int64)
    m32 = V._build_blocks(matn)

    def run():
        out = [
            (r.copy(), c.copy(), s.copy())
            for r, c, s in V._chunked_threshold(
                ids, matn, ~nz, ids, matn, m32, nz, -1.0, 7,
                self_mode=True)
        ]
        r = np.concatenate([o[0] for o in out])
        c = np.concatenate([o[1] for o in out])
        s = np.concatenate([o[2] for o in out])
        return r, c, s

    r0, c0, s0 = run()  # default _RESCORE_HITS: one-shot path
    assert len(r0) > 500  # the all-pairs thr=-1 clique, capped at 7/row
    for slice_hits in (1, 37, 100):
        monkeypatch.setattr(V, "_RESCORE_HITS", slice_hits)
        r1, c1, s1 = run()
        assert np.array_equal(r0, r1)
        assert np.array_equal(c0, c1)
        assert np.array_equal(s0, s1)
