"""Host-weather probe for scheduling the scaling benchmark.

The sandbox VM has time-varying hypervisor steal that only shows up
UNDER LOAD (an idle /proc/stat steal probe reads ~0 while a loaded one
loses ~10% of cycles), so the only reliable way to know whether the
host is quiet enough for a clean two-cluster-size measurement is to
briefly reproduce the benchmark's exact load shape: ballast on the
unused cores plus the two pinned calibration burns run simultaneously
(scripts/scaling_bench.py:_calibrate_pair).  Prints one JSON line:

    {"small_mops": .., "big_mops": .., "ratio": .., "steal_jiffies": ..}

Reference quiet-day values on this host (round 4's committed run):
small ~33 Mops, big ~109 Mops.  Values under ~24/85 mean heavy tenant
contention — a full run in that weather reads job-synchronization
stalls as scaling inefficiency.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_bench import (  # noqa: E402
    _ballast_cpus,
    _calibrate_cmd,
    _start_ballast,
    _steal_jiffies,
)


def probe(n_small: int = 2, n_big: int = 8) -> dict:
    import subprocess

    ballast = []
    bc = _ballast_cpus(n_small, n_big)
    if bc:
        ballast = _start_ballast(bc)
    s0 = _steal_jiffies()
    try:
        p_s = subprocess.Popen(
            _calibrate_cmd(n_small), stdout=subprocess.PIPE, text=True
        )
        p_b = subprocess.Popen(
            _calibrate_cmd(n_big), stdout=subprocess.PIPE, text=True
        )
        out_s, _ = p_s.communicate()
        out_b, _ = p_b.communicate()
    finally:
        for p in ballast:
            p.kill()
    small = float(out_s.strip().splitlines()[-1])
    big = float(out_b.strip().splitlines()[-1])
    return {
        "small_mops": round(small, 1),
        "big_mops": round(big, 1),
        "ratio": round(big / small, 2) if small else None,
        "steal_jiffies": _steal_jiffies() - s0,
    }


if __name__ == "__main__":
    print(json.dumps(probe()))
