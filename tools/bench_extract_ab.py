"""Fold-vs-windows extract formulation A/B at campaign scale.

PLANS.md round 4 leaves the island-parity window replay
(extract_mentions_sql_windows) as the promotion candidate "pending a clean
fresh-JVM campaign": it wins the ISOLATED extract slice decisively
(12.95→7.85 s @8 pinned, 36.67→23.64 s @2 at ×64) but measured a wash in
one fused same-config check. This tool settles it with the full campaign
protocol — fresh JVM per leg, taskset-pinned 2-vs-8 cores, 1× warmup,
min-of-N reps — ALTERNATING arms (fold pair, windows pair, ...) so both
arms sample the same co-tenant noise window.

Does NOT touch BENCH/BASELINE.md; prints per-pair rows and a per-arm
summary. Run: python tools/bench_extract_ab.py [replicate] [pairs_per_arm]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_scaling import run_level  # noqa: E402


def run_pair(replicate: int, sf_dir: str, arm: str) -> dict:
    prev = os.environ.pop("SPARK_GRAFT_EXTRACT", None)
    if arm == "windows":
        os.environ["SPARK_GRAFT_EXTRACT"] = "windows"
    try:
        pair = {}
        for cpus in (2, 8):
            t0 = time.time()
            r = run_level(cpus, replicate, sf_dir)
            r["wall"] = round(time.time() - t0, 1)
            pair[cpus] = r
            print(
                f"  [{arm}] local[{cpus}]: {r['queries']['pipeline_e2e']}s "
                f"pipeline, {r['docs_per_sec']} docs/s",
                flush=True,
            )
        pair["eff"] = round(pair[8]["docs_per_sec"] / pair[2]["docs_per_sec"] / 4.0, 3)
        return pair
    finally:
        os.environ.pop("SPARK_GRAFT_EXTRACT", None)
        if prev is not None:
            os.environ["SPARK_GRAFT_EXTRACT"] = prev


def main() -> None:
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    pairs_per_arm = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    arms: dict[str, list[dict]] = {"fold": [], "windows": []}
    for i in range(pairs_per_arm):
        for arm in ("fold", "windows"):
            print(f"pair {i + 1} arm={arm}", flush=True)
            p = run_pair(replicate, sf_dir, arm)
            arms[arm].append(p)
            print(f"pair {i + 1} arm={arm} eff={p['eff']}", flush=True)

    for arm, rows in arms.items():
        effs = [p["eff"] for p in rows]
        d2 = [p[2]["docs_per_sec"] for p in rows]
        d8 = [p[8]["docs_per_sec"] for p in rows]
        print(
            f"{arm}: eff median {statistics.median(effs):.3f} {effs}; "
            f"docs/s @2 {d2} @8 {d8}"
        )


if __name__ == "__main__":
    main()
