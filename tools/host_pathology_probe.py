"""Reproducible isolation experiment for the host's cold-page-supply
pathology (BASELINE.md, round 3).

Four measurements, one JSON line:

1. cold_first_touch_mbps — np.ones(256 MB) in a FRESH subprocess
   (never-touched pages; the hypervisor's fresh-page supply rate).
2. warm_retouch_gbps — in-place passes over the SAME pages right after
   faulting them (steady-state bandwidth; healthy regardless of 1).
3. cross_process_after_warm_mbps — a fresh subprocess allocates 256 MB
   IMMEDIATELY after another process warmed-and-freed 512 MB in bulk
   (shows freed-but-recently-touched pages refault fast).
4. reclaim_after_sleep_mbps — same, but 15 s after the warm (shows the
   host reclaiming the freed pool; on this VM the warm effect is gone).

On a healthy host all four are GB/s-scale.  In this VM's pathological
windows, 1 and 4 collapse to MB/s while 2 stays at ~15-20 GB/s and 3 is
intermediate — proof that measured wall-clock regressions and compressed
scaling ratios in those windows are host page-supply artifacts, not
pipeline behavior.  Usage:

    python tools/host_pathology_probe.py
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

ALLOC_CODE = (
    "import numpy as np, time; t0=time.time();"
    "a=np.ones(32_000_000, dtype=np.float64);"
    "print(time.time()-t0)"
)

WARM_CODE = (
    "import numpy as np;"
    "held=[np.ones(32_000_000, dtype=np.float64) for _ in range(2)];"
    "held.clear()"  # bulk free at exit: pool stays host-backed briefly
)


def _fresh_alloc_mbps(timeout_s: float = 120.0) -> float:
    try:
        p = subprocess.run(
            [sys.executable, "-c", ALLOC_CODE],
            capture_output=True, text=True, timeout=timeout_s,
        )
        dt = float(p.stdout.strip())
    except (subprocess.TimeoutExpired, ValueError):
        dt = timeout_s
    return round(256.0 / max(dt, 1e-9), 1)


def _warm_retouch_gbps() -> float:
    import numpy as np

    a = np.ones(32_000_000, dtype=np.float64)
    t0 = time.time()
    passes = 8
    for _ in range(passes):
        a *= 1.000001
    return round(passes * 2 * a.nbytes / (time.time() - t0) / 1e9, 1)


def main() -> None:
    out = {"cold_first_touch_mbps": _fresh_alloc_mbps()}
    out["warm_retouch_gbps"] = _warm_retouch_gbps()
    subprocess.run([sys.executable, "-c", WARM_CODE], timeout=600)
    out["cross_process_after_warm_mbps"] = _fresh_alloc_mbps()
    subprocess.run([sys.executable, "-c", WARM_CODE], timeout=600)
    time.sleep(15)
    out["reclaim_after_sleep_mbps"] = _fresh_alloc_mbps()
    out["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
