"""Isolate WHY the extract/link phase scales below 0.8 on this box.

Times three nested slices of the pipeline's hot path at a given core count
(pinned via the caller's taskset), warm (one untimed run first):

- extract_only : posexplode + mention UDF → count        (python boundary)
- link_nockpt  : extract → link → canon re-key → count   (adds JVM joins)
- link_ckpt    : same but localCheckpoint(eager) → count (adds block store)

Run:  taskset -c 0-1 python tools/bench_isolate.py 2 64
      taskset -c 0-7 python tools/bench_isolate.py 8 64
Compare slice-wise t2/(4*t8) to see which boundary eats the efficiency.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1])
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from kbgen_spark import fixtures as FX
    from kbgen_spark.operators.extract import extract_mentions
    from kbgen_spark.operators.link import link_and_canonicalize
    from kbgen_spark.pipeline import build_canon_map
    from kbgen_spark.session import get_spark

    spark = get_spark(
        app_name="bench_isolate",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    flat = FX.load_flat_documents(spark, sf_dir)
    docs = FX.replicate_documents(FX.interleave_documents(flat), replicate)
    docs = docs.repartition(max(2 * cpus, 16)).localCheckpoint(eager=True)
    n_docs = docs.count()
    gaz = FX.build_gazetteer(flat).localCheckpoint(eager=True)
    canon = build_canon_map(gaz).localCheckpoint(eager=True)

    def extract_only():
        return extract_mentions(docs, gaz)

    def link_nockpt():
        return link_and_canonicalize(extract_mentions(docs, gaz), gaz, canon, pre_normalized=True)

    from kbgen_spark.plans.lineage import materialize_fanout

    out = {"cpus": cpus, "n_docs": n_docs}
    for name, mk, ckpt_mode in [
        ("extract_only", extract_only, None),
        ("link_nockpt", link_nockpt, None),
        ("link_ckpt_local", link_nockpt, "local"),
        ("link_ckpt_parquet", link_nockpt, "parquet"),
        ("link_ckpt_disk", link_nockpt, "disk"),
    ]:
        best = None
        for rep in range(3):  # rep 0 = warmup, then min-of-2
            t0 = time.time()
            df = mk()
            if ckpt_mode is not None:
                df = materialize_fanout(df, mode=ckpt_mode)
            df.count()
            dt = time.time() - t0
            if ckpt_mode == "local" or ckpt_mode == "disk":
                df.unpersist(blocking=True)
            if rep > 0:
                best = dt if best is None else min(best, dt)
        out[name] = round(best, 2)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
