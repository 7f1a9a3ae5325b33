"""Round-6 isolation: where does kg_cooccur_pairs spend its time?

Decomposes the entry into (a) build_gazetteer derivation (incl. its eager
uni.count() plan-build job), (b) the pair self-join + agg given a
checkpointed gazetteer, (c) the full entry as the bench times it. min-of-N
with the same .count() action bench.py uses.

Run: python tools/bench_cooccur_iso.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from kbgen_spark import fixtures as FX
    from kbgen_spark.session import get_spark

    spark = get_spark(
        app_name="cooccur_iso",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")

    out: dict[str, float] = {}

    def timed(name, fn, warm=True):
        if warm:
            fn()
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            dt = round(time.time() - t0, 3)
            best = dt if best is None else min(best, dt)
        out[name] = best

    spark.sparkContext.setJobDescription("iso: build_gazetteer + count(1)")
    timed("gaz_derive_only", lambda: FX.build_gazetteer(d).count())

    gaz_ck = FX.build_gazetteer(d).localCheckpoint(eager=True)

    def pairs_given_gaz():
        ents = (
            d.select(
                "doc_id",
                F.explode(F.array_distinct(F.split("text", " "))).alias("tok"),
            )
            .join(F.broadcast(gaz_ck), F.col("tok") == gaz_ck.surface_form)
            .select("doc_id", "entity_id")
            .distinct()
        )
        a = ents.select("doc_id", F.col("entity_id").alias("e1"))
        b = ents.select("doc_id", F.col("entity_id").alias("e2"))
        (
            a.join(b, "doc_id")
            .filter(F.col("e1") < F.col("e2"))
            .groupBy("e1", "e2")
            .agg(F.count("*").alias("n_docs"))
        ).count()

    spark.sparkContext.setJobDescription("iso: pairs given checkpointed gaz")
    timed("pairs_given_gaz", pairs_given_gaz)

    spark.sparkContext.setJobDescription("iso: full entry (bench shape)")
    timed("full_entry", lambda: entry.kg_cooccur_pairs(spark, sf_dir).count())

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
