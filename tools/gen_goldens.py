"""Regenerate the pinned golden tables in __spark_entry__.py.

``containment_lcs`` and ``representatives`` are deterministic but not
SQL-expressible (suffix-automaton LCS; driver-side MMR), so their
sf0.01 outputs are pinned as literal DuckDB VALUES tables for the
driver's value-hash gate. Run this after changing the testdata or
either algorithm and paste the output over _LCS_GOLDEN / _REP_GOLDEN.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    from semhash_spark.session import get_spark

    spark = get_spark("goldens", cores=8, shuffle_partitions=8)
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.01"
    lcs = sorted(
        (r.a, r.b, r.lcs_frac) for r in entrymod.q_containment_lcs(spark, sf).collect()
    )
    print("_LCS_GOLDEN = [")
    for a, b, f in lcs:
        print(f"    ({a}, {b}, {f}),")
    print("]")
    reps = sorted(
        ((r.vec_id, r.pos) for r in entrymod.q_representatives(spark, sf).collect()),
        key=lambda t: t[1],
    )
    print("_REP_GOLDEN = [")
    for v, p in reps:
        print(f"    ({v}, {p}),")
    print("]")
    reps_dpp = sorted(
        ((r.vec_id, r.pos) for r in entrymod.q_representatives_dpp(spark, sf).collect()),
        key=lambda t: t[1],
    )
    print("_REP_DPP_GOLDEN = [")
    for v, p in reps_dpp:
        print(f"    ({v}, {p}),")
    print("]")
    spark.stop()


if __name__ == "__main__":
    main()
