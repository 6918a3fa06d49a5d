#!/usr/bin/env python
"""Round-5 quiet-window harvester: a gated queue of the round's
evidence runs (canonical bench, 1M minhash + 1M IVF-cosine flagship,
3M probe, skew stress, star-CC rehearsal, N->4N scaling windows),
each fired only when BOTH canaries read clean.

Round-5 gate addition: the MEMBW canary. This host has a third
degradation regime invisible to loadavg AND the ALU canary (96%
idle, ALU 1.29 s, yet single-threaded memcpy at 6-15 MB/s — round-5
measurements in bench_r5 logs); page-fault-heavy stages die in it
while register/cache compute runs full speed. Any artifact captured
there is garbage, so the gate now requires copy(100 MB) <= MEMBW_MAX
(healthy ~0.01-0.05 s) in addition to the ALU canary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEADLINE = time.time() + float(os.environ.get("HARVEST_HOURS", "4.5")) * 3600
GATE = float(os.environ.get("HARVEST_GATE", "1.2"))
CANARY_MAX = float(os.environ.get("HARVEST_CANARY_MAX", "1.6"))
MEMBW_MAX = float(os.environ.get("HARVEST_MEMBW_MAX", "0.5"))


def log(msg: str) -> None:
    print(f"[harvest {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _burn(_):
    x = 0
    for i in range(10**7):
        x += i * i
    return x


def canary_seconds(procs: int = 8) -> float:
    import multiprocessing as mp

    t0 = time.perf_counter()
    with mp.Pool(procs) as p:
        r = p.map_async(_burn, range(procs))
        try:
            r.get(timeout=30.0)
        except mp.TimeoutError:
            p.terminate()
    return time.perf_counter() - t0


def membw_seconds() -> float:
    import numpy as np

    a = np.empty(100_000_000, dtype=np.uint8)
    a.fill(1)
    t0 = time.perf_counter()
    a.copy()
    return time.perf_counter() - t0


def wait_quiet(gate: float, settle: int = 2) -> bool:
    """True when `settle` consecutive load samples are below gate AND
    both canaries confirm the window is real."""
    ok = 0
    while time.time() < DEADLINE:
        load = os.getloadavg()[0]
        if load < gate:
            ok += 1
            if ok >= settle:
                c = canary_seconds()
                m = membw_seconds()
                if c <= CANARY_MAX and m <= MEMBW_MAX:
                    return True
                log(f"canary {c:.2f}s / membw {m:.2f}s at load {load:.1f} "
                    f"— degraded window, keep waiting")
                ok = 0
        else:
            ok = 0
        time.sleep(45)
    return False


def run_bench(tag: str) -> None:
    out = os.path.join(REPO, f"bench_r5_{tag}.json")
    logf = os.path.join(REPO, f"bench_r5_{tag}.log")
    load0 = os.getloadavg()[0]
    log(f"bench {tag} starting at load {load0:.1f}")
    env = dict(os.environ)
    # the outer gate already confirmed the window; keep the inner
    # gate as a backstop but don't let it re-wait long
    env.setdefault("SPARK_GRAFT_GATE_ATTEMPTS", "2")
    env.setdefault("SPARK_GRAFT_GATE_DEADLINE_SEC", "1800")
    with open(out, "w") as fo, open(logf, "w") as fe:
        subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       stdout=fo, stderr=fe, cwd=REPO, timeout=3600, env=env)
    try:
        j = json.loads(open(out).read().strip().splitlines()[-1])
        log(f"bench {tag}: suite {j['value']}s flagship "
            f"{j['queries']['corpus_selfdedup']}s ({j['files_per_sec']} "
            f"files/s) cosine {j['queries'].get('corpus_cosine_selfdedup')}s "
            f"in_band={not j.get('no_clean_window', False)}")
    except Exception as e:  # noqa: BLE001
        log(f"bench {tag} parse failed: {e}")


def run_flagship(tag: str, argv: list[str]) -> None:
    outj = os.path.join(REPO, f"flagship_r5_{tag}.json")
    logf = os.path.join(REPO, f"flagship_r5_{tag}.log")
    log(f"flagship {tag} {' '.join(argv)} starting at load "
        f"{os.getloadavg()[0]:.1f}")
    with open(logf, "w") as fe:
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools/flagship_1m.py"),
             *argv],
            stdout=subprocess.PIPE, stderr=fe, cwd=REPO, text=True,
            timeout=7200,
        )
    for line in r.stdout.splitlines():
        if line.startswith("{"):
            open(outj, "w").write(line + "\n")
            j = json.loads(line)
            log(f"flagship {tag}: {j.get('best_sec', j.get('sec'))}s = "
                f"{j.get('files_per_sec')} files/s "
                f"(canaries {j.get('canary_before_sec')}/"
                f"{j.get('canary_after_sec')} membw "
                f"{j.get('membw_before_sec')}/{j.get('membw_after_sec')})")
            return
    log(f"flagship {tag}: no JSON line (rc={r.returncode})")


def run_scaling(tag: str, pair: list[str]) -> None:
    logf = os.path.join(REPO, f"scaling_300k_r5_{tag}.log")
    outj = os.path.join(REPO, f"scaling_300k_r5_{tag}.json")
    log(f"scaling {tag} starting at load {os.getloadavg()[0]:.1f}")
    repeats = os.environ.get("HARVEST_SCALING_REPEATS", "2")
    with open(logf, "w") as fe:
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools/scaling_bench.py"),
             "300000", "--repeats", repeats, "--load-gate", str(GATE),
             "--gate-timeout", "2400", "--pair", pair[0], pair[1]],
            stdout=subprocess.PIPE, stderr=fe, cwd=REPO, text=True,
            timeout=10800,
        )
    for line in r.stdout.splitlines():
        if line.startswith("{"):
            open(outj, "w").write(line + "\n")
            j = json.loads(line)
            log(f"scaling {tag}: eff {j.get('efficiency')} rel "
                f"{j.get('relative_efficiency')}")
            return
    log(f"scaling {tag}: no JSON line")


# the round-5 evidence queue, most valuable first
PLAN: list[tuple[str, str, list[str]]] = [
    ("bench", "g1", []),
    ("flagship", "1m_minhash", ["1000000", "--mode", "minhash"]),
    ("flagship", "1m_ivf", ["1000000", "--mode", "cosine",
                            "--cosine-strategy", "ivf"]),
    # the reference's exact headline record count (1.8M wikitext in
    # 83.53 s, ref benchmarks/README.md:37) on our ~2.1x-larger rows
    ("flagship", "1800k_minhash", ["1800000", "--mode", "minhash"]),
    ("scaling", "a", ["1", "4"]),
    ("flagship", "100k_ivf", ["100000", "--mode", "cosine",
                              "--cosine-strategy", "ivf"]),
    ("flagship", "100k_fused", ["100000", "--mode", "cosine",
                                "--cosine-strategy", "fused"]),
    ("bench", "g2", []),
    ("flagship", "3m_minhash", ["3000000", "--mode", "minhash"]),
    ("flagship", "1m_skew", ["1000000", "--mode", "minhash", "--skew"]),
    ("flagship", "300k_starcc", ["300000", "--mode", "minhash",
                                 "--star-cc"]),
    ("scaling", "b", ["1", "4"]),
    ("bench", "g3", []),
    ("scaling", "c", ["1", "4"]),
]


def main() -> None:
    only = os.environ.get("HARVEST_ONLY")
    plan = PLAN
    if only:
        names = set(only.split(","))
        plan = [p for p in PLAN if p[1] in names]
    for kind, tag, argv in plan:
        if time.time() >= DEADLINE:
            log("deadline reached")
            break
        log(f"waiting for a clean window for {kind} {tag}")
        if not wait_quiet(GATE):
            log("gate timed out at deadline")
            break
        if kind == "bench":
            run_bench(tag)
        elif kind == "flagship":
            run_flagship(tag, argv)
        else:
            run_scaling(tag, argv)
        time.sleep(90)
    log("harvest done")


if __name__ == "__main__":
    main()
