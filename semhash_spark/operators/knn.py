"""Similarity search over embedding columns.

* ``brute_topk`` — exact cosine top-k via cross join + per-query
  window. O(|Q|·|X|): the correctness baseline and the right plan
  when one side is small enough to broadcast.
* ``ivf_topk`` — the scale path: IVF (inverted-file) pruning.
  Centroids are trained driver-side with deterministic k-means over
  a bounded sample (<= ``train_cap`` rows collected), broadcast as a
  literal array; each index vector is assigned to its nearest
  centroid (JVM expression), queries probe the ``n_probe`` nearest
  centroid cells only — turning the quadratic cross join into an
  equi-join on cell id with ~n_probe/n_cells of the work.
  Recall is tested against brute force in tests/test_knn.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from semhash_spark.functions.vectors import cosine_similarity, cosine_similarity_expr


def brute_topk(
    query: DataFrame,
    index: DataFrame,
    k: int,
    exclude_self: bool = False,
    id_col: str = "record_id",
    emb_col: str = "embedding",
) -> DataFrame:
    from semhash_spark.operators.rank import topk_scores

    return topk_scores(query, index, k, exclude_self, id_col, emb_col)


# ------------------------------------------------------------------ IVF


def train_centroids(
    index: DataFrame,
    n_cells: int,
    emb_col: str = "embedding",
    iters: int = 10,
    train_cap: int = 10000,
    seed: int = 42,
    id_col: str = "record_id",
) -> np.ndarray:
    """Deterministic k-means on a bounded sample (driver-side numpy).

    Sampling is deterministic ACROSS partitionings (VERDICT r3 #2):
    the sample is the ``train_cap`` smallest ids — a distributed
    per-partition top-cap (sortWithinPartitions + mapInPandas head
    would also work, but orderBy + limit compiles to Spark's
    TakeOrderedAndProject, a per-partition heap + driver merge, no
    global sort shuffle) — so pruned-probe IVF (n_probe < n_cells)
    returns identical results at local[1] and on a 1000-executor
    cluster. An unordered ``limit`` would sample whatever partitions
    answered first.
    """
    rows = index.select(id_col, emb_col).orderBy(id_col).limit(train_cap).collect()
    x = np.asarray([r[emb_col] for r in rows], dtype=np.float64)
    return kmeans_core(x, n_cells, iters, seed)


def kmeans_core(x: np.ndarray, n_cells: int, iters: int = 10,
                seed: int = 42) -> np.ndarray:
    """The deterministic numpy k-means shared by the Spark trainer
    and the oracle generator (__spark_entry__._ivf_sql inlines the
    SAME centroids into DuckDB SQL, the same way the hyperplane
    oracle inlines the same Gaussian planes)."""
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    x = np.divide(x, norms, where=norms > 0)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cents.T
        assign = np.argmax(sims, axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def ivf_probe_cells(emb_col: str, cents: np.ndarray, n_probe: int):
    """array<long> of the ``n_probe`` nearest centroid cells for an
    embedding column, HOME (nearest) cell first — vectorized pandas
    UDF for at-scale cell assignment (the interpreted
    ``_nearest_cells_expr`` is fine for the 16-cell knn default but
    hopeless per-row at hundreds/thousands of dedup cells).

    Deterministic across partitionings: per-row order is
    (score desc, cell id asc). NULL and zero-norm embeddings get an
    EMPTY array (posexplode drops them — they never pair, matching
    hyperplane_bands / NULL-cosine semantics). The row norm never
    changes a row's own cell ORDER, so no query-side normalization.
    """
    from pyspark.sql.functions import pandas_udf

    cT = np.ascontiguousarray(cents.T, dtype=np.float64)

    @pandas_udf("array<long>")
    def _cells(v: pd.Series) -> pd.Series:
        n = len(v)
        if n == 0:
            return pd.Series([], dtype=object)
        skip = np.fromiter((e is None for e in v), dtype=bool, count=n)
        if skip.all():
            return pd.Series([[]] * n, dtype=object)
        d = len(next(e for e in v if e is not None))
        x = np.vstack(
            [np.zeros(d) if e is None else np.asarray(e, dtype=np.float64)
             for e in v]
        )
        skip |= (np.abs(x).max(axis=1) == 0)  # zero-norm rows
        n_cells_ = cT.shape[1]
        p = min(n_probe, n_cells_)
        # chunk rows + reuse one score buffer (fresh big gemm outputs
        # pay the first-touch fault storm — see verify loaders)
        step = max(16, int((16 << 20) // (8 * n_cells_)))
        buf = np.empty((min(step, len(x)), n_cells_))
        cells = np.empty((len(x), p), dtype=np.int64)
        for lo in range(0, len(x), step):
            hi = min(lo + step, len(x))
            s = buf[: hi - lo]
            np.dot(x[lo:hi], cT[:d], out=s)
            if p < n_cells_:
                part = np.argpartition(-s, p - 1, axis=1)[:, :p]
            else:
                part = np.broadcast_to(
                    np.arange(n_cells_), (hi - lo, n_cells_)
                ).copy()
            ps = np.take_along_axis(s, part, axis=1)
            order = np.lexsort((part, -ps), axis=1)
            cells[lo:hi] = np.take_along_axis(part, order, axis=1)
        return pd.Series(
            [[] if skip[i] else cells[i].tolist() for i in range(n)],
            dtype=object,
        )

    return _cells(F.col(emb_col))


def _nearest_cells_expr(emb_col: str, cents: np.ndarray, n: int):
    """Array of the n nearest centroid ids for a vector column.

    Centroids ship as a literal array<array<float>> (broadcast with
    the plan); scoring is a JVM higher-order expression.
    """
    cent_lit = F.array(
        *[F.array(*[F.lit(float(v)) for v in c]) for c in cents]
    )
    # cosine_similarity_expr: pandas UDFs cannot appear inside SQL
    # lambdas; centroid count is small so interpreted eval is fine here
    scored = F.transform(
        cent_lit,
        lambda c, i: F.struct(
            cosine_similarity_expr(F.col(emb_col), c).alias("s"), i.alias("cell")
        ),
    )
    return F.slice(F.reverse(F.array_sort(scored)), 1, n)


def ivf_topk(
    query: DataFrame,
    index: DataFrame,
    k: int,
    n_cells: int = 16,
    n_probe: int = 4,
    exclude_self: bool = False,
    id_col: str = "record_id",
    emb_col: str = "embedding",
    cents: np.ndarray | None = None,
) -> DataFrame:
    if cents is None:
        cents = train_centroids(index, n_cells, emb_col, id_col=id_col)

    idx = index.select(
        F.col(id_col).alias("index_id"),
        F.col(emb_col).alias("_ie"),
        F.element_at(_nearest_cells_expr(emb_col, cents, 1), 1)["cell"].alias("cell"),
    )
    q = query.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("_qe"),
        F.explode(
            F.transform(
                _nearest_cells_expr(emb_col, cents, n_probe), lambda s: s["cell"]
            )
        ).alias("cell"),
    )
    pairs = q.join(idx, "cell")
    if exclude_self:
        pairs = pairs.where(F.col("query_id") != F.col("index_id"))
    scored = (
        pairs.withColumn("score", cosine_similarity("_qe", "_ie"))
        .select("query_id", "index_id", "score")
        # NULL/zero-norm never ranks — same semantics as the
        # broadcast/crossjoin top-k strategies (rank.topk_scores)
        .where(F.col("score").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("index_id").asc()
    )
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)
