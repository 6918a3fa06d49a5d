#!/usr/bin/env python
"""Background host-window watcher (round 5).

Every 30 s, samples /proc/stat over 3 s and appends one JSON line to
``window_watch.log``: user/system/steal shares + 1-min load. The
round-4/5 degraded regimes show up as high system+steal share
(lock-holder preemption under hypervisor steal: 80%+ system, <1%
user, while the short ALU canary still reads healthy) — this log is
how heavy bench runs get scheduled into genuinely clean windows.
"""

from __future__ import annotations

import json
import os
import time


def snap():
    f = open("/proc/stat").readline().split()
    return list(map(int, f[1:]))


def main() -> None:
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "window_watch.log")
    while True:
        a = snap()
        time.sleep(3)
        b = snap()
        d = [y - x for x, y in zip(a, b)]
        tot = sum(d) or 1
        rec = {
            "t": time.strftime("%H:%M:%S"),
            "user_pct": round((d[0] + d[1]) / tot * 100, 1),
            "system_pct": round(d[2] / tot * 100, 1),
            "idle_pct": round(d[3] / tot * 100, 1),
            "steal_pct": round(d[7] / tot * 100, 1) if len(d) > 7 else None,
            "load1": round(os.getloadavg()[0], 1),
        }
        rec["membw_mbps"] = membw_mbps()
        with open(out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        time.sleep(27)


def membw_mbps() -> float:
    """Single-threaded copy bandwidth of a 16 MB buffer, MB/s.

    Round 5 found a degradation regime invisible to BOTH loadavg and
    the ALU canary: 96% idle, canary 1.29 s, yet memcpy collapsed to
    6-15 MB/s (healthy: thousands). 16 MB keeps the watcher itself
    cheap (~2 ms healthy, ~1-3 s degraded)."""
    try:
        import numpy as np
    except Exception:
        return -1.0
    a = np.empty(16_000_000, dtype=np.uint8)
    a.fill(1)
    t0 = time.perf_counter()
    a.copy()
    dt = time.perf_counter() - t0
    return round(16.0 / dt, 1) if dt > 0 else -1.0


if __name__ == "__main__":
    main()
