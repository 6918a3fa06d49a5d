"""Seeded randomized property tests for the numeric kernels.

Batched: each test ships ALL random cases through Spark in one job
(per-example Spark roundtrips would dominate), asserting against
plain-python ground truth per case.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from semhash_spark.functions.vectors import cosine_similarity
from semhash_spark.operators.verify import containment_score, jaccard_similarity


def _random_set(rng, max_len=60):
    n = int(rng.integers(0, max_len))
    vals = rng.integers(-2**62, 2**62, size=n * 2)
    return list(dict.fromkeys(vals.tolist()))[:n]


def test_jaccard_containment_match_python_sets(spark):
    rng = np.random.default_rng(17)
    cases = []
    for i in range(200):
        a = _random_set(rng)
        # bias towards overlap: half the cases share a prefix
        b = a[: int(rng.integers(0, len(a) + 1))] + _random_set(rng) if a else _random_set(rng)
        b = list(dict.fromkeys(b))
        cases.append((i, a, b))
    df = spark.createDataFrame(cases, "i long, a array<long>, b array<long>")
    out = {r.i: (r.j, r.c) for r in df.select(
        "i", jaccard_similarity("a", "b").alias("j"),
        containment_score("a", "b").alias("c")).collect()}
    for i, a, b in cases:
        sa, sb = set(a), set(b)
        inter = len(sa & sb)
        ej = inter / len(sa | sb) if sa | sb else 0.0
        ec = inter / min(len(sa), len(sb)) if sa and sb else 0.0
        assert out[i][0] == ej, (i, out[i][0], ej)
        assert out[i][1] == ec, (i, out[i][1], ec)


def test_cosine_matches_numpy(spark):
    rng = np.random.default_rng(23)
    d = 48  # fixed dim: embedding columns are fixed-width by contract
    cases = []
    for i in range(150):
        a = rng.standard_normal(d)
        b = rng.standard_normal(d) if rng.random() < 0.8 else np.zeros(d)
        cases.append((i, [float(x) for x in a], [float(x) for x in b]))
    df = spark.createDataFrame(cases, "i long, a array<double>, b array<double>")
    out = {r.i: r.s for r in df.select(
        "i", cosine_similarity("a", "b").alias("s")).collect()}
    for i, a, b in cases:
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na * nb == 0:
            assert out[i] is None, (i, out[i])
        else:
            exp = float(np.dot(a, b) / (na * nb))
            assert abs(out[i] - exp) < 1e-12, (i, out[i], exp)


def test_minhash_permutation_invariance_and_similarity(spark):
    from semhash_spark.functions.hashing import minhash_signature

    rng = np.random.default_rng(31)
    base = rng.integers(-2**62, 2**62, 300).tolist()
    shuffled = list(base)
    rng.shuffle(shuffled)
    half = base[:150] + rng.integers(-2**62, 2**62, 150).tolist()
    df = spark.createDataFrame(
        [(0, base), (1, shuffled), (2, half)], "i long, sh array<long>"
    )
    out = {r.i: r.sig for r in df.select(
        "i", minhash_signature("sh", 128).alias("sig")).collect()}
    assert out[0] == out[1]  # set semantics: order-invariant
    agree = sum(x == y for x, y in zip(out[0], out[2])) / 128
    # true jaccard = 150/450 = 1/3; 128 perms -> sd ~ 0.042
    assert 0.15 <= agree <= 0.52, agree


def test_optimal_bands_s_curve():
    """S-curve tuner: valid divisors, monotone response to threshold,
    and sane recall at the chosen operating point."""
    from semhash_spark.operators.lsh import candidate_probability, optimal_bands

    b8, r8 = optimal_bands(0.8, 128)
    b5, r5 = optimal_bands(0.5, 128)
    assert b8 * r8 == 128 and b5 * r5 == 128
    # higher threshold -> steeper curve wanted -> more rows per band
    assert r8 >= r5
    # well above threshold the tuned banding catches almost everything
    assert candidate_probability(0.95, b8, r8) > 0.95
    # recall-weighted tuning moves the curve left (more bands, higher
    # capture above t) — the fn_weight knob the 0.99-recall bar needs
    bf, rf = optimal_bands(0.8, 128, fp_weight=0.1, fn_weight=0.9)
    assert bf >= b8
    assert candidate_probability(0.9, bf, rf) > candidate_probability(0.9, b8, r8)
    assert candidate_probability(0.9, bf, rf) > 0.99
    import pytest

    with pytest.raises(ValueError):
        optimal_bands(1.0, 128)


def test_with_tuned_bands_roundtrip():
    from semhash_spark.config import DedupConfig

    cfg = DedupConfig(columns=("text",), threshold=0.8, num_perm=128).with_tuned_bands()
    assert cfg.num_perm % cfg.bands == 0
    assert 1 <= cfg.bands <= 128


def test_dpp_conditional_variance_matches_determinant_ratio():
    # the incremental-Cholesky d2 in dpp_select is the Schur
    # complement: picking item c after set S must satisfy
    # d2[c] = det(K[S+c, S+c]) / det(K[S, S]) for the cosine kernel.
    # Validate the increments against explicit determinants on
    # random inputs (full-diversity run so picks are d2-driven).
    from semhash_spark.operators.rank import dpp_select

    rng = np.random.default_rng(42)
    for trial in range(5):
        emb = rng.normal(size=(12, 6))
        rel = rng.uniform(size=12)
        sel, scores = dpp_select(emb, rel, 6, diversity=1.0)
        normed = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        K = normed @ normed.T
        # scores[i] (i >= 1) is the selected item's blended objective =
        # d2 at diversity 1; check against the det ratio
        for i in range(1, len(sel)):
            S = sel[:i]
            c = sel[i]
            det_S = np.linalg.det(K[np.ix_(S, S)])
            det_Sc = np.linalg.det(K[np.ix_(S + [c], S + [c])])
            expected = det_Sc / det_S
            assert abs(scores[i] - expected) < 1e-8, (trial, i, scores[i], expected)


def test_ssd_residual_matches_gram_schmidt_projection():
    # ssd_select's diversity term must equal the norm of the candidate
    # after projecting out the span of the selected window
    from semhash_spark.operators.rank import ssd_select

    rng = np.random.default_rng(7)
    emb = rng.normal(size=(10, 5))
    rel = rng.uniform(size=10)
    sel, scores = ssd_select(emb, rel, 5, diversity=1.0)
    normed = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    for i in range(1, len(sel)):
        span = normed[sel[:i]]
        v = normed[sel[i]]
        # least-squares residual of v onto span's row space
        coef, *_ = np.linalg.lstsq(span.T, v, rcond=None)
        resid = v - span.T @ coef
        assert abs(scores[i] - np.linalg.norm(resid)) < 1e-8, (i, scores[i])
