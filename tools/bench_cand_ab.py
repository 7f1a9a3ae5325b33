"""Candidate-generation A/B for any-k mention extraction (round 5).

Arms (identical output, both feed the same sparse greedy decomposition —
bit-equality is pytest-pinned):

- lit : anchor→fmax map inlined as a plan literal, phrase structs built
        array-side at anchor positions only (shipped fast path for
        gazetteers with ≤ ANCHOR_LITERAL_MAX distinct anchor first-tokens)
- nxt : each token row carries its next k−1 tokens through a broadcast
        anchor join (the large-gazetteer fallback,
        candidate_mentions(anchor_literal_max=0))

A third formulation — flat per-length gram strings at EVERY position, one
explode + one broadcast join — was measured and rejected (min 43.0 s vs
nxt 38.3 s on this protocol @8 pinned ×64).

Same-JVM alternating arms, min-of-N per arm, pinned cores via the caller's
taskset. Run: taskset -c 0-7 python tools/bench_cand_ab.py [replicate] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import kbgen_spark.operators.extract as X
    from kbgen_spark import fixtures as FX
    from kbgen_spark.operators.extract import (
        extract_mentions_sql_sparse,
        max_surface_tokens,
    )
    from kbgen_spark.session import get_spark

    spark = get_spark(app_name="cand_ab", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    flat = FX.load_flat_documents(spark, sf_dir)
    n_docs = flat.count() * replicate
    parts = max(cpus, n_docs // 2500)
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    docs = FX.replicate_documents(FX.interleave_documents(flat), replicate)
    docs = docs.repartition(parts).localCheckpoint(eager=True)
    docs.count()
    gaz = FX.build_gazetteer(flat).localCheckpoint(eager=True)
    k = max_surface_tokens(gaz)
    print(f"docs={n_docs} k={k} parts={parts} cpus={cpus}", flush=True)

    orig = X.candidate_mentions

    def run_full(literal_max: int) -> float:
        # full extract slice: candidates -> sparse greedy decomposition
        X.candidate_mentions = lambda d, g, kk=None: orig(
            d, g, kk, anchor_literal_max=literal_max
        )
        try:
            t0 = time.time()
            extract_mentions_sql_sparse(docs, gaz, k=k).count()
            return round(time.time() - t0, 2)
        finally:
            X.candidate_mentions = orig

    def run_whole_literal() -> float:
        # round-5 whole-gazetteer-literal extract: no join, no shuffle
        t0 = time.time()
        X.extract_mentions_sql_literal(docs, gaz).count()
        return round(time.time() - t0, 2)

    arms = {"lit": X.ANCHOR_LITERAL_MAX, "nxt": 0}
    for m in arms.values():  # warm all plans once
        run_full(m)
    run_whole_literal()
    res: dict[str, list[float]] = {a: [] for a in [*arms, "whole-lit"]}
    for _ in range(reps):
        for arm, m in arms.items():
            res[arm].append(run_full(m))
        res["whole-lit"].append(run_whole_literal())
    for arm, ts in res.items():
        print(f"{arm}: min {min(ts)} all {ts}", flush=True)


if __name__ == "__main__":
    main()
