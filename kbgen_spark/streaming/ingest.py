"""Structured Streaming surface (SURVEY.md §2.10).

The reference is batch-only [R]; the north_rule is batch — this module is the
engine's streaming extension:

- windowed event aggregation (T1 tumbling/sliding, T2 session) with
  watermarked late-data handling (T3) and streaming dedup (T4);
- incremental KG ingest (T5): a documents stream runs the *same stateless
  extract/link stages* as batch (they are per-doc pure functions) and merges
  triples via ``foreachBatch``.

The window/session transformations are defined once and used by BOTH the
batch oracle queries (__spark_entry__) and the streaming tests — Structured
Streaming's incremental execution of the identical logical plan is exactly
the Spark-first way to keep batch/stream parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """T1 — per (window, event_type) count + value sum. Works on a batch or
    streaming DataFrame unchanged. ``ts`` is normalized to zoned TIMESTAMP
    (lossless under the fixed UTC session TZ) so batch and stream schemas
    agree and watermarks apply."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 6)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_counts(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """T2 — session windows per user (gap-merged)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.min("ts").alias("first_ts"))
        .select(
            "user_id",
            F.col("first_ts").alias("session_start"),
            "n_events",
        )
    )


def streaming_tumbling(
    events_stream: DataFrame, width: str = "1 hour", watermark: str = "1 hour"
) -> DataFrame:
    """T1+T3 — the same tumbling agg with a watermark for late data.

    Event time must be TIMESTAMP (with zone); parquet sources often carry
    TIMESTAMP_NTZ — the cast is lossless under the fixed UTC session TZ."""
    stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return tumbling_counts(stream.withWatermark("ts", watermark), width)


def streaming_dedup(events_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """T4 — stateful dedup keyed on event_id within the watermark horizon."""
    zoned = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return zoned.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def incremental_kg_ingest(
    spark,
    docs_stream: DataFrame,
    gazetteer: DataFrame,
    patterns: DataFrame,
    canon_map: DataFrame,
    out_path: str,
    checkpoint_dir: str,
):
    """T5 — readStream(docs) → extract → link → materialize → append sink.

    The extract/link/materialize stages are stateless per doc, so the batch
    operators run inside ``foreachBatch`` untouched; the triples table grows
    append-only and dedup happens at read time (or via MERGE with Iceberg).
    Returns the StreamingQuery (caller awaits/stops)."""
    from kbgen_spark.operators.extract import extract_mentions
    from kbgen_spark.operators.link import link_mentions
    from kbgen_spark.operators.materialize import apply_canon_map, assemble_triples

    def process(batch_df: DataFrame, batch_id: int) -> None:
        mentions = extract_mentions(batch_df, gazetteer)
        links = link_mentions(mentions, gazetteer)
        triples = assemble_triples(apply_canon_map(links, canon_map), patterns)
        triples.write.mode("append").parquet(out_path)

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
