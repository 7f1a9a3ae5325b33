"""Per-stage scaling attribution (VERDICT round-1 "Next round" item 1).

Times each pipeline stage separately (eager checkpoints between stages) at a
given core count, so the N→4N efficiency gap can be attributed to a specific
stage instead of hand-waved. Run under taskset for honest core pinning:

    taskset -c 0-1 python tools/bench_stages.py 2  64
    taskset -c 0-7 python tools/bench_stages.py 8  64

Prints one JSON line: {"cpus", "n_docs", "stages": {...}, "total", "fixed"}.
``--warm`` runs a 2k-doc warmup pipeline first (codegen compile, python
worker spin-up, broadcast machinery) so the timed region measures
steady-state per-doc work, matching what a long-running 100 TB job sees.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    warm = "--no-warm" not in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from kbgen_spark import fixtures as FX
    from kbgen_spark.operators.extract import extract_mentions
    from kbgen_spark.operators.link import link_and_canonicalize
    from kbgen_spark.operators.materialize import assemble_triples
    from kbgen_spark.pipeline import build_canon_map
    from kbgen_spark.session import get_spark

    t: dict[str, float] = {}
    t0 = time.time()
    spark = get_spark(
        app_name="bench_stages",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    t["session"] = round(time.time() - t0, 2)

    t0 = time.time()
    flat = FX.load_flat_documents(spark, sf_dir)
    docs = FX.replicate_documents(FX.interleave_documents(flat), replicate)
    docs = docs.repartition(max(2 * cpus, 16)).localCheckpoint(eager=True)
    n_docs = docs.count()
    gaz = FX.build_gazetteer(flat).localCheckpoint(eager=True)
    patterns = FX.build_relation_patterns(spark)
    t["setup"] = round(time.time() - t0, 2)

    if warm:
        t0 = time.time()
        wdocs = FX.replicate_documents(FX.interleave_documents(flat), 1)
        wc = build_canon_map(gaz)
        wl = link_and_canonicalize(extract_mentions(wdocs, gaz), gaz, wc, pre_normalized=True)
        assemble_triples(wl, patterns).count()
        t["warmup"] = round(time.time() - t0, 2)

    from kbgen_spark.plans.lineage import materialize_fanout

    def stage(name, df, hint=None):
        t0 = time.time()
        # same auto-mode decision the pipeline makes: run_pipeline passes
        # its metadata-cheap corpus count as the scale hint, so do we —
        # hint-less the auto rule would silently measure the 'disk' path
        # while the shipped pipeline takes 'parquet' at corpus scale.
        # (Corpus-scaled stages only: run_pipeline sets fan_out=False for
        # canon — dictionary-sized, single consumer — so the canon stage
        # here materializes WITHOUT a hint to keep the measured checkpoint
        # mode comparable; round-6 fix of a round-5 review note.)
        out = materialize_fanout(df, scale_hint=hint)
        n = out.count()
        t[name] = round(time.time() - t0, 2)
        return out, n

    ext, n_m = stage("extract", extract_mentions(docs, gaz), hint=n_docs)
    canon, n_c = stage("canon", build_canon_map(gaz))
    lnk, n_l = stage(
        "link",
        link_and_canonicalize(ext, gaz, canon, pre_normalized=True),
        hint=n_docs,
    )
    t0 = time.time()
    n_t = assemble_triples(lnk, patterns).count()
    t["materialize"] = round(time.time() - t0, 2)

    timed = ["extract", "link", "canon", "materialize"]
    out = {
        "cpus": cpus,
        "replicate": replicate,
        "n_docs": n_docs,
        "rows": {"mentions": n_m, "links": n_l, "canon": n_c, "triples": n_t},
        "stages": t,
        "pipeline_total": round(sum(t[k] for k in timed), 2),
        "docs_per_sec": round(n_docs / sum(t[k] for k in timed), 1),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
