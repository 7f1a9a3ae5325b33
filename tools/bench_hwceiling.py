"""Hardware scaling ceiling of this sandbox VM — the control experiment
behind BENCH/BASELINE.md's efficiency attribution (round 3).

Runs N INDEPENDENT pinned processes (no Spark, no JVM, no shared state) of
two kernels and reports how aggregate throughput scales 2 -> 8 cores:

- ``cpu``: sha256 over a warm 4 KB buffer — cache-resident, pure ALU.
- ``mem``: allocate + stream a 512 MB float64 array — DRAM-bandwidth-bound,
  the access pattern of a columnar scan/shuffle.

If the *hardware* cannot scale the mem kernel, no Spark-side engineering
can make a scan/shuffle-heavy pipeline hit that efficiency either; the
pipeline's ceiling is a work-mix-weighted blend of the two kernels.
On a real cluster, N -> 4N adds nodes WITH their own memory controllers,
so aggregate bandwidth scales with executor count and this single-box
ceiling does not apply.

Run on an idle machine:  python tools/bench_hwceiling.py
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
import tempfile
import textwrap

KERNEL = textwrap.dedent(
    """
    import hashlib, sys, time
    mode = sys.argv[1]
    if mode == "cpu":
        h = b"x" * 4096
        for _ in range(5000):          # warm
            h = hashlib.sha256(h).digest() + b"x" * 4064
        t0 = time.time()
        for _ in range(120000):
            h = hashlib.sha256(h).digest() + b"x" * 4064
        print(time.time() - t0)
    else:
        import numpy as np
        a = np.arange(64_000_000, dtype=np.float64)
        s = float((a * 1.0000001).sum())   # warm: fault + zero pages once
        t0 = time.time()
        for _ in range(10):
            s += float((a * 1.0000001).sum())
        print(time.time() - t0)
    """
)


def run_level(kernel_path: str, mode: str, n: int) -> float:
    """Mean per-process wall over n pinned processes (one per core)."""
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, kernel_path, mode],
            stdout=subprocess.PIPE,
            text=True,
        )
        for i in range(n)
    ]
    walls = [float(p.communicate()[0].strip()) for p in procs]
    return sum(walls) / n


def main() -> None:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(KERNEL)
        kernel_path = f.name
    out: dict = {}
    for mode in ("cpu", "mem"):
        effs = []
        per_level: dict[int, list[float]] = {2: [], 8: []}
        for _ in range(3):  # alternating pairs, same protocol as bench_scaling
            w2 = run_level(kernel_path, mode, 2)
            w8 = run_level(kernel_path, mode, 8)
            per_level[2].append(w2)
            per_level[8].append(w8)
            thr2, thr8 = 2.0 / w2, 8.0 / w8
            effs.append(thr8 / thr2 / 4.0)
        out[mode] = {
            "wall_per_proc_2core": round(statistics.median(per_level[2]), 2),
            "wall_per_proc_8core": round(statistics.median(per_level[8]), 2),
            "scaling_efficiency_2to8": round(statistics.median(effs), 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
