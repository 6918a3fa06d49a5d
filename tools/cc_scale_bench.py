#!/usr/bin/env python
"""Distributed connected-components at >DRIVER_CC_CAP edges.

VERDICT r4 item 3's bench half: everything the suite measures
resolves in the <=5M-edge driver fast path, so this synthesizes an
edge set ABOVE the cap directly with spark.range arithmetic (no
parquet, no collect) and measures the alternating large-star/
small-star rounds end-to-end — rounds to converge, per-round wall,
per-round edge counts, dedup+checkpoint cost.

Graph shape mirrors the dedup edge relation's hard cases:
  * N/64 chain segments of length 64 (local near-dup clusters)
  * the first ``mega`` segment heads welded into ONE path of
    diameter ~64*mega (the adversarial depth case for min-label
    propagation — forces the O(log diameter) round count)
Correctness of star-vs-driver equality is pinned separately by
tests/test_components.py::test_cc_star_equals_driver_above_cap;
this tool asserts the cheap structural invariants (label <= id,
every edge endpoint labeled, mega-path collapses to one label).

Usage: python tools/cc_scale_bench.py [n_nodes] [--mega K] [--cpus C]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from semhash_spark.operators.components import connected_components  # noqa: E402
from semhash_spark.session import get_spark  # noqa: E402

SEG = 64


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("n_nodes", nargs="?", type=int, default=8_000_000)
    ap.add_argument("--mega", type=int, default=10_000,
                    help="chain-head welds -> one ~64*K-diameter path")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()
    n = args.n_nodes

    spark = get_spark("cc_scale", cores=args.cpus,
                      shuffle_partitions=max(8, args.cpus))

    # intra-segment chain edges: (i, i+1) unless i closes a segment
    chain = (
        spark.range(n - 1)
        .where((F.col("id") % SEG) != SEG - 1)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    # weld the first `mega` segment heads into one long path
    weld = (
        spark.range(args.mega)
        .select((F.col("id") * SEG).alias("src"),
                ((F.col("id") + 1) * SEG).alias("dst"))
        .where(F.col("dst") < n)
    )
    edges = chain.unionByName(weld)

    stats: dict = {}
    t0 = time.perf_counter()
    labels = connected_components(edges, driver_cap=0, stats=stats).persist()
    n_labeled = labels.count()
    total = round(time.perf_counter() - t0, 2)

    bad = labels.where(F.col("cluster_id") > F.col("record_id")).count()
    mega_nodes = (args.mega + 1) * SEG - (SEG - 1) if args.mega else 0
    mega_labels = (
        labels.where(F.col("record_id") <= args.mega * SEG)
        .select("cluster_id").distinct().count()
    )
    labels.unpersist()

    out = {
        "n_nodes": n,
        "n_edges": stats.get("n_edges_distinct"),
        "mega_welds": args.mega,
        "cpus": args.cpus,
        "path": stats.get("path"),
        "total_sec": total,
        "dedup_checkpoint_sec": stats.get("dedup_checkpoint_sec"),
        "rounds": len(stats.get("rounds_sec", [])),
        "rounds_sec": stats.get("rounds_sec"),
        "rounds_edges": stats.get("rounds_edges"),
        "n_labeled": n_labeled,
        "labels_above_id": bad,
        "mega_component_labels": mega_labels,
        "mega_component_nodes_approx": mega_nodes,
    }
    assert out["path"] == "star", out
    assert bad == 0, "min-label invariant violated"
    assert mega_labels == 1, "welded mega-path must collapse to one label"
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
