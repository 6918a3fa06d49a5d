"""Regenerate the pinned golden tables in __spark_entry__.py.

``containment_lcs`` / ``representatives`` / ``representatives_dpp``
are deterministic but not SQL-expressible (LCS; driver-side MMR/DPP),
so their sf0.01 outputs are pinned as literal DuckDB VALUES tables
for the driver's value-hash gate.

The goldens come from ``tools/oracle_goldens.py`` — an INDEPENDENT
numpy/pure-python implementation that imports nothing from
``semhash_spark`` (all-pairs containment, O(n·m) DP LCS, brute-force
ranking, scalar-loop MMR, Schur-complement DPP). Pin source differs
from the system under test, so a hash-green driver row is genuine
cross-verification, not a determinism check (VERDICT r2 #1).

Run after changing the testdata: prints the new tables and diffs
them against the currently pinned values.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    from tools.oracle_goldens import compute

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

    import __spark_entry__ as entrymod

    for name, fresh, pinned in (
        ("_LCS_GOLDEN", lcs, sorted(entrymod._LCS_GOLDEN)),
        ("_REP_GOLDEN (mmr)", reps["mmr"], entrymod._REP_GOLDEN),
        ("_REP_DPP_GOLDEN", reps["dpp"], entrymod._REP_DPP_GOLDEN),
        ("_REP_MSD_GOLDEN", reps["msd"], entrymod._REP_MSD_GOLDEN),
        ("_REP_COVER_GOLDEN", reps["cover"], entrymod._REP_COVER_GOLDEN),
        ("_REP_SSD_GOLDEN", reps["ssd"], entrymod._REP_SSD_GOLDEN),
    ):
        status = "MATCHES pinned" if list(fresh) == [tuple(t) for t in pinned] else "DIFFERS from pinned — update __spark_entry__.py"
        print(f"# {name}: {status}", file=sys.stderr)


if __name__ == "__main__":
    main()
