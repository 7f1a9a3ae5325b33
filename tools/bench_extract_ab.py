"""Extract formulation A/B at campaign scale.

Round 4 settled fold-vs-windows (windows wins ×256, fold wins ×64/8-core —
BENCH/BASELINE.md); round 5's k-token gazetteer (3-5-token phrases) retired
the windows path from the pipeline entirely (it is the k<=2 closed form and
raises above), so the live comparison is now FOLD (every candidate through
the collect_list regroup) vs SPARSE (greedy fold over multi-token
candidates only; dense unigrams via coverage anti-join — the shipped
default). Full campaign protocol — fresh JVM per leg, taskset-pinned
2-vs-8 cores, 1× warmup, min-of-N reps — ALTERNATING arms (fold pair,
sparse pair, ...) so both arms sample the same co-tenant noise window.

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
    os.environ["SPARK_GRAFT_EXTRACT"] = arm
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
    arms: dict[str, list[dict]] = {"fold": [], "sparse": []}
    for i in range(pairs_per_arm):
        for arm in ("fold", "sparse"):
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
