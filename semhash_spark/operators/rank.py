"""Ranking / outlier filtering / representative selection.

Reference: ``_rank_by_average_similarity`` (semhash/semhash.py:461-488),
``_self_rank_by_average_similarity`` (:490-519), ``filter_outliers``
(:381-459), ``find_representative`` + ``_diversify`` (:327-379,521-551).

Semantics reproduced:

* score(record) = mean cosine similarity of its top-k (k=100)
  neighbors in the index (self mode excludes the record itself,
  replacing the reference's positional offset trick,
  semhash/index.py:84-88, with an explicit id filter).
* outliers = bottom ``ceil(n * pct)`` of the descending ranking
  (:400,410-413) — ceil boundary reproduced exactly.
* representatives = top ``candidate_limit`` of the ranking, then
  greedy MMR on the driver over <= 1000 rows (collecting a bounded
  candidate pool is the idiomatic plan, SURVEY §2.6 R5).

Top-k plan (``topk_scores``), chosen by index size:

* ``broadcast`` (default when the index fits executor memory): the
  index (id, embedding) matrix is collected once, broadcast to the
  executors, and each query partition computes exact cosine top-k
  with one BLAS matmul + argpartition inside ``mapInPandas`` — no
  pair shuffle, no window, output is |Q| x k rows only. This is the
  plan a 1000-executor cluster wants whenever the index matrix is
  bounded (100k x 64 floats = 50 MB broadcast vs a |Q| x |X| pair
  shuffle).
* ``crossjoin``: pair scores + per-query window — the fallback when
  neither side fits, and the shape IVF pruning (operators/knn.py)
  starts from.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from semhash_spark.functions.vectors import cosine_similarity

# index sides up to this many rows take the broadcast-matmul path
BROADCAST_TOPK_CAP = 500_000


def _topk_crossjoin(
    query_feats: DataFrame,
    index_feats: DataFrame,
    k: int,
    exclude_self: bool,
    id_col: str,
    emb_col: str,
) -> DataFrame:
    q = query_feats.select(F.col(id_col).alias("query_id"), F.col(emb_col).alias("_qe"))
    i = index_feats.select(F.col(id_col).alias("index_id"), F.col(emb_col).alias("_ie"))
    pairs = q.crossJoin(i)
    if exclude_self:
        pairs = pairs.where(F.col("query_id") != F.col("index_id"))
    scored = pairs.withColumn("score", cosine_similarity("_qe", "_ie")).drop("_qe", "_ie")
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("index_id").asc())
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)


def _topk_broadcast(
    query_feats: DataFrame,
    index_feats: DataFrame,
    k: int,
    exclude_self: bool,
    id_col: str,
    emb_col: str,
) -> DataFrame:
    spark = query_feats.sparkSession
    idx_pdf = index_feats.select(id_col, emb_col).toPandas()
    idx_ids = idx_pdf[id_col].to_numpy(dtype=np.int64)
    m = np.vstack([np.asarray(v, dtype=np.float64) for v in idx_pdf[emb_col]])
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    m_normed = np.divide(m, norms, out=np.zeros_like(m), where=norms > 0)
    zero_norm = norms.ravel() <= 0
    bc = spark.sparkContext.broadcast((idx_ids, m_normed, zero_norm))

    def compute(batches):
        ids_i, mat, zn = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q_ids = pdf[id_col].to_numpy(dtype=np.int64)
            q = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf[emb_col]])
            qn = np.linalg.norm(q, axis=1, keepdims=True)
            qz = qn.ravel() <= 0
            qm = np.divide(q, qn, out=np.zeros_like(q), where=qn > 0)
            scores = qm @ mat.T  # |batch| x |index|
            # zero-norm on either side -> NULL semantically: exclude
            scores[:, zn] = -np.inf
            scores[qz, :] = -np.inf
            if exclude_self:
                self_mask = q_ids[:, None] == ids_i[None, :]
                scores[self_mask] = -np.inf
            kk = min(k, scores.shape[1])
            out_q, out_i, out_s, out_r = [], [], [], []
            for r in range(scores.shape[0]):
                row = scores[r]
                if kk < scores.shape[1]:
                    part = np.argpartition(-row, kk - 1)[:kk]
                else:
                    part = np.arange(scores.shape[1])
                order = part[np.lexsort((ids_i[part], -row[part]))]
                valid = row[order] > -np.inf
                order = order[valid]
                n = len(order)
                out_q.append(np.full(n, q_ids[r], dtype=np.int64))
                out_i.append(ids_i[order])
                out_s.append(row[order])
                out_r.append(np.arange(1, n + 1, dtype=np.int64))
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "index_id": np.concatenate(out_i),
                        "score": np.concatenate(out_s),
                        "rk": np.concatenate(out_r),
                    }
                )

    return query_feats.select(id_col, emb_col).mapInPandas(
        compute, "query_id long, index_id long, score double, rk long"
    )


def topk_scores(
    query_feats: DataFrame,
    index_feats: DataFrame,
    k: int = 100,
    exclude_self: bool = False,
    id_col: str = "record_id",
    emb_col: str = "embedding",
    strategy: str = "auto",
) -> DataFrame:
    """(query_id, index_id, score, rk) for each query's top-k neighbors.

    Deterministic tie-break: (score desc, index_id asc). Zero-norm
    vectors never rank (mirrors NULL-cosine semantics).
    """
    if strategy == "auto":
        strategy = (
            "broadcast" if index_feats.count() <= BROADCAST_TOPK_CAP else "crossjoin"
        )
    fn = {"broadcast": _topk_broadcast, "crossjoin": _topk_crossjoin}[strategy]
    return fn(query_feats, index_feats, k, exclude_self, id_col, emb_col)


def rank_by_avg_similarity(
    query_feats: DataFrame,
    index_feats: DataFrame,
    k: int = 100,
    exclude_self: bool = False,
    id_col: str = "record_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(query_id, avg_score) ordered descending (ties: id asc).

    Mirrors reference :476-480 (mean over top-k sims, stable sort).
    """
    tk = topk_scores(query_feats, index_feats, k, exclude_self, id_col, emb_col)
    return (
        tk.groupBy("query_id")
        .agg(F.avg("score").alias("avg_score"))
        .orderBy(F.col("avg_score").desc(), F.col("query_id").asc())
    )


def filter_outliers(
    ranking: DataFrame, outlier_percentage: float
) -> tuple[DataFrame, DataFrame]:
    """Split ranking into (inliers, outliers).

    outlier_count = ceil(n * pct) (reference :400); the bottom slice
    of the descending ranking. Returns DataFrames with
    (query_id, avg_score).
    """
    if outlier_percentage < 0.0 or outlier_percentage > 1.0:
        raise ValueError("outlier_percentage must be between 0 and 1")
    n = ranking.count()
    cnt = math.ceil(n * outlier_percentage)
    if cnt == 0:
        return ranking, ranking.limit(0)
    w = Window.orderBy(F.col("avg_score").asc(), F.col("query_id").desc())
    tagged = ranking.withColumn("_rk", F.row_number().over(w))
    outliers = tagged.where(F.col("_rk") <= cnt).drop("_rk")
    inliers = tagged.where(F.col("_rk") > cnt).drop("_rk")
    return inliers, outliers


def compute_candidate_limit(
    total: int,
    selection_size: int,
    fraction: float = 0.1,
    min_candidates: int = 100,
    max_candidates: int = 1000,
) -> int:
    """Verbatim arithmetic of reference semhash/utils.py:36-61."""
    limit = int(total * fraction)
    limit = max(limit, selection_size)
    limit = max(limit, min_candidates)
    limit = min(limit, max_candidates, total)
    return limit


def mmr_select(
    embeddings: np.ndarray,
    relevance: np.ndarray,
    k: int,
    diversity: float,
) -> tuple[list[int], list[float]]:
    """Greedy Maximal Marginal Relevance over a candidate pool.

    score(c) = (1 - diversity) * relevance[c]
               - diversity * max_sim(c, selected)
    First pick = highest relevance. Reproduces the behavior the
    reference pins for pyversity MMR at diversity 0 (pure relevance
    order) and 1 (greedy max-dissimilarity from the top candidate)
    — reference tests/test_semhash.py:197-224.
    """
    n = len(relevance)
    k = min(k, n)
    if k == 0:
        return [], []
    norms = np.linalg.norm(embeddings, axis=1, keepdims=True)
    normed = np.divide(embeddings, norms, where=norms > 0)
    sims = normed @ normed.T

    selected: list[int] = []
    scores: list[float] = []
    remaining = set(range(n))
    first = int(np.argmax(relevance))
    selected.append(first)
    scores.append(float(relevance[first]))
    remaining.discard(first)
    while len(selected) < k and remaining:
        rem = sorted(remaining)
        max_sim = sims[np.ix_(rem, selected)].max(axis=1)
        mmr = (1.0 - diversity) * relevance[rem] - diversity * max_sim
        best_pos = int(np.argmax(mmr))
        best = rem[best_pos]
        selected.append(best)
        scores.append(float(mmr[best_pos]))
        remaining.discard(best)
    return selected, scores


def find_representative(
    ranking: DataFrame,
    feats: DataFrame,
    selection_size: int = 10,
    candidate_limit: int | str = "auto",
    diversity: float = 0.5,
    id_col: str = "record_id",
    emb_col: str = "embedding",
) -> tuple[list[int], list[float], list[int]]:
    """Top-candidate MMR selection; returns (selected_ids, scores,
    filtered_ids). Collects <= max(candidate_limit, 1000) rows — the
    bounded-driver-side step (SURVEY §2.6 R5)."""
    total = ranking.count()
    if candidate_limit == "auto":
        candidate_limit = compute_candidate_limit(total, selection_size)
    cand_rows = ranking.limit(int(candidate_limit)).collect()
    cand_ids = [int(r["query_id"]) for r in cand_rows]
    relevance = np.array([float(r["avg_score"]) for r in cand_rows])
    if not cand_ids:
        return [], [], []

    emb_rows = (
        feats.where(F.col(id_col).isin(cand_ids))
        .select(id_col, emb_col)
        .collect()
    )
    emb_map = {int(r[id_col]): np.asarray(r[emb_col], dtype=np.float64) for r in emb_rows}
    embs = np.stack([emb_map[i] for i in cand_ids])

    sel_pos, sel_scores = mmr_select(embs, relevance, selection_size, diversity)
    sel_ids = [cand_ids[p] for p in sel_pos]
    filtered_ids = [cid for p, cid in enumerate(cand_ids) if p not in set(sel_pos)]
    return sel_ids, sel_scores, filtered_ids
