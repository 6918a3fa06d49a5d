"""Connected components vs a python union-find on random graphs."""

import numpy as np
import pytest

from semhash_spark.operators.components import connected_components


def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for a, b in edges:
        for v in (a, b):
            out[v] = find(v)
    # path-compress to true min root
    changed = True
    while changed:
        changed = False
        for v, r in list(out.items()):
            rr = find(r)
            if rr != r:
                out[v] = rr
                changed = True
    return out


@pytest.mark.parametrize("path", ["driver", "distributed"])
@pytest.mark.parametrize("case", ["chain", "random", "star", "empty"])
def test_cc_matches_union_find(spark, case, path):
    rng = np.random.default_rng(7)
    if case == "chain":
        edges = [(i, i + 1) for i in range(0, 30)]
    elif case == "star":
        edges = [(0, i) for i in range(1, 40)]
    elif case == "empty":
        edges = []
    else:
        edges = [
            (int(min(p)), int(max(p)))
            for p in rng.integers(0, 200, size=(300, 2))
            if p[0] != p[1]
        ]
    if edges:
        df = spark.createDataFrame(edges, "src long, dst long")
    else:
        df = spark.createDataFrame([], "src long, dst long")
    cap = 5_000_000 if path == "driver" else 0  # cap=0 forces star rounds
    got = {
        int(r["record_id"]): int(r["cluster_id"])
        for r in connected_components(df, driver_cap=cap).collect()
    }
    want = _uf_components(201, edges)
    assert got == want
