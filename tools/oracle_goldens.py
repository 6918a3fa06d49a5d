"""INDEPENDENT golden generator for the three non-SQL-expressible
driver-gate oracles (containment_lcs, representatives,
representatives_dpp).

Deliberately imports NOTHING from ``semhash_spark`` (VERDICT r2 #1:
pin source must differ from system under test). Everything here is a
second implementation of the public semantics:

* candidate containment pairs — ALL-PAIRS |Sa ∩ Sb| / min(|Sa|,|Sb|)
  over distinct word-3-gram tuples (no hashing, no anchor sampling;
  the pipeline's 0-mod-p anchor join must RECOVER this exact set or
  the golden mismatches — that is the point).
* longest common substring — classic O(n·m) dynamic program
  (numpy row recurrence), not the pipeline's rolling-hash /
  suffix-automaton search.
* representative selection — ranking from a brute-force cosine
  matrix; MMR as a scalar loop (reference semantics
  /root/reference/semhash/semhash.py:521-551: blended relevance vs
  max-similarity-to-selected, first pick = max relevance); DPP greedy
  MAP via explicit Schur complement (K_cc - K_cS K_SS^{-1} K_Sc with
  np.linalg.solve per step), not incremental Cholesky.

Run: ``python tools/oracle_goldens.py`` and paste the printed tables
over _LCS_GOLDEN / _REP_GOLDEN / _REP_DPP_GOLDEN in
__spark_entry__.py (tools/gen_goldens.py wraps this and diffs against
the currently pinned values).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.01"

CONTAINMENT_THRESHOLD = 0.9  # q_containment_lcs cfg
LCS_MIN_FRAC = 0.5
RANK_K = 100
SELECTION_SIZE = 10
DIVERSITY = 0.5


# ------------------------------------------------------------- LCS golden


def word_shingle_set(text: str, k: int = 3) -> frozenset:
    toks = [t for t in text.split() if t]
    if len(toks) < k:
        return frozenset([tuple(toks)])
    return frozenset(tuple(toks[i : i + k]) for i in range(len(toks) - k + 1))


def lcs_len_dp(a: str, b: str) -> int:
    """Longest common SUBSTRING length — O(n·m) DP, numpy row
    recurrence: curr[j] = prev[j-1] + 1 where a[i] == b[j], else 0."""
    if not a or not b:
        return 0
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    prev = np.zeros(len(bb), dtype=np.int64)
    best = 0
    for ch in a:
        code = ord(ch)
        match = bb == code
        curr = np.zeros(len(bb), dtype=np.int64)
        curr[match] = 1
        curr[1:][match[1:]] += prev[:-1][match[1:]]
        m = int(curr.max())
        if m > best:
            best = m
        prev = curr
    return best


def lcs_golden(docs) -> list[tuple[int, int, float]]:
    ids = docs["doc_id"]
    texts = docs["text"]
    sets = [word_shingle_set(t) for t in texts]
    out = []
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            si, sj = sets[i], sets[j]
            denom = min(len(si), len(sj))
            if denom == 0:
                continue
            score = len(si & sj) / denom
            if score < CONTAINMENT_THRESHOLD:
                continue
            small, big = (
                (texts[i], texts[j])
                if len(texts[i]) <= len(texts[j])
                else (texts[j], texts[i])
            )
            frac = lcs_len_dp(big, small) / len(small) if small else 0.0
            if frac >= LCS_MIN_FRAC:
                a, b = sorted((ids[i], ids[j]))
                out.append((int(a), int(b), round(frac, 6)))
    return sorted(out)


# ---------------------------------------------------- representative goldens


def cosine_matrix(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    normed = np.divide(mat, norms, out=np.zeros_like(mat), where=norms > 0)
    return normed @ normed.T


def rank_avg_topk(ids: np.ndarray, mat: np.ndarray, k: int) -> list[tuple[int, float]]:
    """(id, mean of top-k cosine sims excluding self), ordered
    (avg desc, id asc) — brute force."""
    sims = cosine_matrix(mat)
    out = []
    for i in range(len(ids)):
        row = np.delete(sims[i], i)
        other = np.delete(ids, i)
        # (score desc, id asc) deterministic top-k
        order = np.lexsort((other, -row))[:k]
        out.append((int(ids[i]), float(np.mean(row[order]))))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out


def candidate_limit(total: int, selection_size: int) -> int:
    """Reference semhash/utils.py:36-61 arithmetic."""
    limit = int(total * 0.1)
    limit = max(limit, selection_size)
    limit = max(limit, 100)
    limit = min(limit, 1000, total)
    return limit


def mmr_trace(sims: np.ndarray, relevance: np.ndarray, k: int, d: float) -> list[int]:
    """Scalar-loop MMR: score(c) = (1-d)*rel[c] - d*max_sim(c, S);
    first pick = highest relevance; ties -> lowest candidate index."""
    n = len(relevance)
    k = min(k, n)
    first, first_rel = 0, -math.inf
    for c in range(n):
        if relevance[c] > first_rel:
            first, first_rel = c, relevance[c]
    selected = [first]
    while len(selected) < k:
        best, best_score = None, -math.inf
        for c in range(n):
            if c in selected:
                continue
            max_sim = max(float(sims[c, s]) for s in selected)
            score = (1.0 - d) * float(relevance[c]) - d * max_sim
            if score > best_score:
                best, best_score = c, score
        selected.append(best)
    return selected


def msd_trace(sims: np.ndarray, relevance: np.ndarray, k: int, d: float) -> list[int]:
    """Scalar-loop Max-Sum-Dispersion:
    score(c) = (1-d)*rel[c] + d*mean_{s in S}(1 - sim(c, s))."""
    n = len(relevance)
    k = min(k, n)
    first = max(range(n), key=lambda c: (relevance[c], -c))
    selected = [first]
    while len(selected) < k:
        best, best_score = None, -math.inf
        for c in range(n):
            if c in selected:
                continue
            mean_dist = sum(1.0 - float(sims[c, s]) for s in selected) / len(selected)
            score = (1.0 - d) * float(relevance[c]) + d * mean_dist
            if score > best_score:
                best, best_score = c, score
        selected.append(best)
    return selected


def cover_trace(sims: np.ndarray, relevance: np.ndarray, k: int, d: float) -> list[int]:
    """Scalar-loop facility-location COVER:
    cover(x) = max_{s in S} sim(x, s);
    gain(c) = mean_x max(0, sim(x, c) - cover(x));
    score(c) = (1-d)*rel[c] + d*gain(c)."""
    n = len(relevance)
    k = min(k, n)
    first = max(range(n), key=lambda c: (relevance[c], -c))
    selected = [first]
    cover = [float(sims[x, first]) for x in range(n)]
    while len(selected) < k:
        best, best_score = None, -math.inf
        for c in range(n):
            if c in selected:
                continue
            gain = sum(max(0.0, float(sims[x, c]) - cover[x]) for x in range(n)) / n
            score = (1.0 - d) * float(relevance[c]) + d * gain
            if score > best_score:
                best, best_score = c, score
        selected.append(best)
        for x in range(n):
            cover[x] = max(cover[x], float(sims[x, best]))
    return selected


def ssd_trace(
    normed: np.ndarray, relevance: np.ndarray, k: int, d: float
) -> list[int]:
    """Sliding-Spectrum-Decomposition (full window): the diversity
    term of c is the residual norm after projecting onto the span of
    the selected (normalized) vectors — computed here via an
    orthonormal basis from np.linalg.qr of the selected matrix, NOT
    iterative Gram-Schmidt, for implementation independence."""
    n = len(relevance)
    k = min(k, n)
    first = max(range(n), key=lambda c: (relevance[c], -c))
    selected = [first]
    while len(selected) < k:
        S = normed[selected]
        # orthonormal basis of the span (rank-revealing via QR)
        Q, R = np.linalg.qr(S.T)
        keep = np.abs(np.diag(R)) > 1e-9
        Q = Q[:, keep]
        resid = normed - (normed @ Q) @ Q.T
        rnorm = np.linalg.norm(resid, axis=1)
        best, best_score = None, -math.inf
        for c in range(n):
            if c in selected:
                continue
            score = (1.0 - d) * float(relevance[c]) + d * float(rnorm[c])
            if score > best_score:
                best, best_score = c, score
        selected.append(best)
    return selected


def dpp_trace(sims: np.ndarray, relevance: np.ndarray, k: int, d: float) -> list[int]:
    """Greedy MAP DPP via explicit Schur complement: the marginal
    variance of candidate c given selected S is
    K_cc - K_cS K_SS^{-1} K_Sc, solved fresh each step (O(k^3) —
    independent of any incremental-Cholesky formulation).
    Objective (1-d)*rel + d*variance; first pick = highest relevance."""
    n = len(relevance)
    k = min(k, n)
    first, first_rel = 0, -math.inf
    for c in range(n):
        if relevance[c] > first_rel:
            first, first_rel = c, relevance[c]
    selected = [first]
    while len(selected) < k:
        S = np.array(selected)
        K_SS = sims[np.ix_(S, S)]
        best, best_score = None, -math.inf
        for c in range(n):
            if c in selected:
                continue
            k_cS = sims[S, c]
            var = float(sims[c, c] - k_cS @ np.linalg.solve(K_SS, k_cS))
            var = max(var, 0.0)
            score = (1.0 - d) * float(relevance[c]) + d * var
            if score > best_score:
                best, best_score = c, score
        selected.append(best)
    return selected


def rep_goldens(emb) -> dict[str, list[tuple[int, int]]]:
    ids = np.asarray(emb["vec_id"], dtype=np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    ranking = rank_avg_topk(ids, mat, RANK_K)
    lim = candidate_limit(len(ranking), SELECTION_SIZE)
    cand = ranking[:lim]
    cand_ids = np.array([c[0] for c in cand], dtype=np.int64)
    relevance = np.array([c[1] for c in cand])
    pos_of = {int(v): i for i, v in enumerate(ids)}
    cmat = mat[[pos_of[int(v)] for v in cand_ids]]
    sims = cosine_matrix(cmat)
    norms = np.linalg.norm(cmat, axis=1, keepdims=True)
    normed = np.divide(cmat, norms, out=np.zeros_like(cmat), where=norms > 0)
    traces = {
        "mmr": mmr_trace(sims, relevance, SELECTION_SIZE, DIVERSITY),
        "dpp": dpp_trace(sims, relevance, SELECTION_SIZE, DIVERSITY),
        "msd": msd_trace(sims, relevance, SELECTION_SIZE, DIVERSITY),
        "cover": cover_trace(sims, relevance, SELECTION_SIZE, DIVERSITY),
        "ssd": ssd_trace(normed, relevance, SELECTION_SIZE, DIVERSITY),
    }
    return {
        name: [(int(cand_ids[c]), i + 1) for i, c in enumerate(sel)]
        for name, sel in traces.items()
    }


def compute(sf_dir: str = SF_DIR):
    docs_t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = {
        "doc_id": docs_t.column("doc_id").to_pylist(),
        "text": docs_t.column("text").to_pylist(),
    }
    emb_t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    emb = {
        "vec_id": emb_t.column("vec_id").to_pylist(),
        "embedding": emb_t.column("embedding").to_pylist(),
    }
    lcs = lcs_golden(docs)
    reps = rep_goldens(emb)
    return lcs, reps


def main() -> None:
    lcs, reps = compute()
    print("_LCS_GOLDEN = [")
    for a, b, f in lcs:
        print(f"    ({a}, {b}, {f}),")
    print("]")
    for name, rows in reps.items():
        print(f"_REP_{name.upper()}_GOLDEN = [")
        for v, p in rows:
            print(f"    ({v}, {p}),")
        print("]")


if __name__ == "__main__":
    main()
