"""Two-cluster-size scaling evidence (north_rule; BASELINE.md).

No real cluster exists in the sandbox, so N vs 4N cores is evidenced by the
sandbox stand-in: the SAME job (the KG pipeline over a replicated corpus) at
local[2] vs local[8], fresh JVM each, same input. Efficiency =
(docs/s @8) / (docs/s @2) / 4.

Why 2 vs 8 and not 8 vs 32: this VM exposes 32 hardware threads on 16
physical cores (SMT) — measured pure-JVM codegen work caps at ~0.62
efficiency crossing the 16-thread boundary, so 8→32 measures hyperthreading,
not the engine. 2→8 stays within physical cores, which is what N→4N
*executors* on a real cluster corresponds to.

Writes BENCH/BASELINE.md. Run: python tools/bench_scaling.py [replicate]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_level(cpus: int, replicate: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_REPLICATE=str(replicate),
        SPARK_GRAFT_SF_DIR=sf_dir,
    )
    out = subprocess.run(
        [sys.executable, "bench.py", "--pipeline-only"],
        capture_output=True,
        text=True,
        env=env,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    results = {}
    for cpus in (2, 8):
        t0 = time.time()
        r = run_level(cpus, replicate, sf_dir)
        r["wall"] = round(time.time() - t0, 1)
        results[cpus] = r
        print(f"local[{cpus}]: {r['queries']['pipeline_e2e']}s pipeline, "
              f"{r['docs_per_sec']} docs/s ({r['n_docs']} docs)")

    dps_n = results[2]["docs_per_sec"]
    dps_4n = results[8]["docs_per_sec"]
    eff = dps_4n / dps_n / 4.0
    print(f"scaling efficiency (2→8 cores): {eff:.3f}")

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH — measured throughput & scaling (sandbox)

Job: full KG pipeline (extract → link → canonicalize → materialize) over the
interleaved-span corpus derived from `{sf_dir}` replicated ×{replicate}
({results[2]["n_docs"]} docs), fresh JVM per level, identical inputs and
configs apart from `local[N]`.

| parallelism | pipeline wall (s) | docs/sec |
| --- | --- | --- |
| local[2]  (N)  | {results[2]["queries"]["pipeline_e2e"]} | {dps_n} |
| local[8]  (4N) | {results[8]["queries"]["pipeline_e2e"]} | {dps_4n} |

**Throughput scaling efficiency (N→4N) = (docs/s@8 ÷ docs/s@2) ÷ 4 =
{eff:.3f}** (target ≥ 0.8, BASELINE.json).

This is the sandbox stand-in for N vs 4N executor clusters defined in
BASELINE.md (no real cluster available); the job ships unchanged to a real
cluster via `spark-submit --py-files kbgen_spark.zip jobs/run_pipeline.py`.

Raw per-level bench JSON:

```json
{json.dumps({f"local[{k}]": v for k, v in results.items()}, indent=1)}
```
"""
        )
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
