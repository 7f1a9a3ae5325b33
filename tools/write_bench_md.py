"""Write BENCH/BASELINE.md from a pairwise scaling log (tools/bench_scaling
or the raw alternating-pairs protocol).

Input: JSONL of bench.py --pipeline-only outputs, strictly alternating
local[8], local[2] (a pair per consecutive two lines). Pairwise efficiency
(docs/s@8 ÷ docs/s@2) ÷ 4 is computed per pair and the MEDIAN pair is
reported — single-box background-load drift swamps any single measurement
(observed pairwise spread 0.36–1.00 on identical code), and tight temporal
pairing is the only honest way to compare two parallelism levels here.

Usage: python tools/write_bench_md.py /tmp/scale_pairs.jsonl
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_pairs.jsonl"
    rows = [json.loads(l) for l in open(path) if l.strip()]
    pairs = []
    for a, b in zip(rows[::2], rows[1::2]):
        hi, lo = (a, b) if a["cpus"] > b["cpus"] else (b, a)
        assert hi["cpus"] == 8 and lo["cpus"] == 2, (hi["cpus"], lo["cpus"])
        pairs.append(
            {
                "t8": hi["queries"]["pipeline_e2e"],
                "t2": lo["queries"]["pipeline_e2e"],
                "dps8": hi["docs_per_sec"],
                "dps2": lo["docs_per_sec"],
                "eff": hi["docs_per_sec"] / lo["docs_per_sec"] / 4.0,
            }
        )
    effs = sorted(p["eff"] for p in pairs)
    med = statistics.median(effs)
    best8 = max(p["dps8"] for p in pairs)
    best2 = max(p["dps2"] for p in pairs)
    n_docs = rows[0]["n_docs"]
    sf = rows[0]["sf"]

    pair_rows = "\n".join(
        f"| {i + 1} | {p['t2']} | {p['dps2']} | {p['t8']} | {p['dps8']} | {p['eff']:.3f} |"
        for i, p in enumerate(pairs)
    )
    md = f"""# BENCH — measured throughput & scaling (sandbox stand-in)

**Job:** the full KG pipeline (extract → link → canonicalize → materialize)
over the interleaved-span corpus derived from `{sf}` deterministically
replicated to {n_docs:,} docs; fresh JVM per measurement; identical inputs
and configs apart from `local[N]`.

**Cluster stand-in:** no real cluster exists in this sandbox; per
BASELINE.md the N vs 4N *executors* criterion is evidenced by N vs 4N
*cores* on one box — local[2] vs local[8], both within the machine's 16
physical cores (8→32 threads would measure SMT, not the engine: pure-JVM
codegen work caps at ~0.62 efficiency crossing the 16-thread boundary).

**Protocol:** background load on this shared VM drifts enough to swing a
single comparison by ~3× (observed pairwise efficiency spread 0.36–1.00 on
identical code), so the two levels run in tightly alternating pairs and the
**median pairwise efficiency** is reported.

| pair | local[2] wall (s) | docs/s | local[8] wall (s) | docs/s | pairwise eff |
| --- | --- | --- | --- | --- | --- |
{pair_rows}

**Median throughput scaling efficiency (N→4N) = {med:.3f}**
(target ≥ 0.8, BASELINE.json). Pairwise efficiencies: {
        ", ".join(f"{e:.3f}" for e in effs)}.

Best observed throughput: **{best8:,.0f} docs/s** at local[8]
({best2:,.0f} at local[2]). kbgen itself has no published throughput
numbers (BASELINE.md): it is a single-process Python research artifact, so
docs/s here is reported as the engine's own baseline for future rounds.

Reproduce: `python tools/bench_scaling.py` (two levels, writes this file)
or the raw pairs protocol in tools/write_bench_md.py's docstring. The job
ships unchanged to a real cluster via
`spark-submit --py-files kbgen_spark.zip jobs/run_pipeline.py`.

Raw pair measurements:

```json
{json.dumps(pairs, indent=1)}
```
"""
    import os

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(f"median efficiency {med:.3f}; wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
