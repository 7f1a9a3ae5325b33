"""Two-cluster-size scaling evidence (north_rule; BASELINE.md).

No real cluster exists in the sandbox, so N vs 4N executors is evidenced by
the SAME job (the KG pipeline over a replicated corpus) at taskset-pinned
2 vs 8 physical cores, fresh JVM each, same input. Efficiency =
(docs/s @8) / (docs/s @2) / 4.

Methodology (all three corrections discovered by measurement in round 1):
- 2 vs 8 cores, not 8 vs 32: the VM has 32 hardware threads on 16 physical
  cores; crossing the 16-thread boundary measures SMT, not the engine.
- taskset pinning: an unpinned local[2] JVM still runs GC/shuffle/parquet
  threads on all 32 hw threads, inflating the 2-core figure.
- alternating pairs + median: background drift on this shared VM swings a
  single unpinned comparison ~3×.
- bench.py runs a 1× warmup pipeline before the timed region (codegen
  compilation, python-worker spin-up, broadcast machinery are one-time costs
  a 100 TB job amortizes; round-2 change).

Writes raw campaign results to BENCH/raw/scaling_x{replicate}_{stamp}.json
and prints the summary table — BENCH/BASELINE.md is the CURATED evidence
document and is edited by hand from these raw files (a round-5 run of this
script used to overwrite it, losing the campaign history).
Run: python tools/bench_scaling.py [replicate] [pairs]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

CPU_PIN = {2: "0-1", 8: "0-7"}


def run_level(cpus: int, replicate: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_REPLICATE=str(replicate),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_REPEAT=os.environ.get("SPARK_GRAFT_REPEAT", "2"),
    )
    out = subprocess.run(
        ["taskset", "-c", CPU_PIN[cpus], sys.executable, "bench.py", "--pipeline-only"],
        capture_output=True,
        text=True,
        env=env,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rows = []
    for i in range(pairs):
        pair = {}
        for cpus in (2, 8):
            t0 = time.time()
            r = run_level(cpus, replicate, sf_dir)
            r["wall"] = round(time.time() - t0, 1)
            pair[cpus] = r
            print(
                f"pair {i + 1} local[{cpus}]: {r['queries']['pipeline_e2e']}s "
                f"pipeline, {r['docs_per_sec']} docs/s ({r['n_docs']} docs)"
            )
        eff = pair[8]["docs_per_sec"] / pair[2]["docs_per_sec"] / 4.0
        rows.append((pair, round(eff, 3)))
        print(f"pair {i + 1} efficiency: {eff:.3f}")

    med = statistics.median(e for _, e in rows)
    print(f"median scaling efficiency (2→8 cores, pinned): {med:.3f}")

    table = "\n".join(
        f"| {i + 1} | {p[2]['queries']['pipeline_e2e']} | {p[2]['docs_per_sec']} "
        f"| {p[8]['queries']['pipeline_e2e']} | {p[8]['docs_per_sec']} | {e} |"
        for i, (p, e) in enumerate(rows)
    )
    print("| pair | local[2] wall (s) | docs/s | local[8] wall (s) | docs/s | eff |")
    print(table)
    os.makedirs("BENCH/raw", exist_ok=True)
    stamp = time.strftime("%Y%m%d_%H%M%S")
    path = f"BENCH/raw/scaling_x{replicate}_{stamp}.json"
    with open(path, "w") as f:
        json.dump(
            {
                "replicate": replicate,
                "sf_dir": sf_dir,
                "median_eff": med,
                "pairs": [
                    {"eff": e, **{f"local[{k}]": v for k, v in p.items()}}
                    for p, e in rows
                ],
            },
            f,
            indent=1,
        )
    print(f"wrote {path} — fold into BENCH/BASELINE.md by hand")


if __name__ == "__main__":
    main()
