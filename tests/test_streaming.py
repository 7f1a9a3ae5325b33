"""Structured Streaming parity tests (SURVEY.md §2.10): the same logical
transformations produce identical results in batch and streaming
(availableNow trigger, memory sink), and incremental KG ingest equals the
batch pipeline on the same corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kbgen_spark import fixtures as FX
from kbgen_spark.streaming.ingest import (
    incremental_kg_ingest,
    session_counts,
    streaming_tumbling,
    tumbling_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet").cache()


def test_streaming_tumbling_equals_batch(spark, events, tmp_path):
    src = str(tmp_path / "events_src")
    events.write.parquet(src)
    batch = tumbling_counts(events)

    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        streaming_tumbling(stream)
        .writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from tumbling_test")
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_session_counts_shape(events):
    s = session_counts(events, "5 minutes")
    assert s.columns == ["user_id", "session_start", "n_events"]
    # sessions partition the events: counts sum to total
    assert (
        s.agg(F.sum("n_events").alias("n")).collect()[0]["n"] == events.count()
    )


def test_incremental_ingest_equals_batch(spark, flat_docs, gazetteer, patterns, tmp_path):
    from kbgen_spark.pipeline import build_canon_map, run_pipeline

    docs = FX.interleave_documents(flat_docs.limit(50))
    src = str(tmp_path / "docs_src")
    docs.write.parquet(src)

    canon = build_canon_map(gazetteer)
    out = str(tmp_path / "triples_out")
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = incremental_kg_ingest(
        spark, stream, gazetteer, patterns, canon,
        out_path=out, checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out).distinct()
    batch = run_pipeline(
        spark, SF_DIR, docs=docs, gazetteer=gazetteer, patterns=patterns
    ).triples
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_stateful_closed_sessions(spark, tmp_path):
    """T6 applyInPandasWithState sessionizer: sessions close either in-batch
    (a later event > gap away) or via the event-time timer once the final
    watermark passes session_end + gap; the still-open trailing session must
    NOT be emitted."""
    from datetime import datetime

    from kbgen_spark.streaming.ingest import stateful_closed_sessions

    rows = [
        # user 1, session A (2 events) then session B (2 events) 29 min later
        (1, datetime(2026, 1, 1, 0, 0, 0)),
        (1, datetime(2026, 1, 1, 0, 1, 0)),
        (1, datetime(2026, 1, 1, 0, 30, 0)),
        (1, datetime(2026, 1, 1, 0, 31, 0)),
        # user 2: one event, closes via timer
        (2, datetime(2026, 1, 1, 0, 0, 0)),
        # user 99: pushes the watermark to 01:50 but its own session stays
        # open (timeout 02:05 > watermark) and must not appear
        (99, datetime(2026, 1, 1, 2, 0, 0)),
    ]
    src = str(tmp_path / "sess_src")
    spark.createDataFrame(rows, "user_id bigint, ts timestamp").coalesce(
        1
    ).write.parquet(src)

    stream = spark.readStream.schema("user_id bigint, ts timestamp").parquet(src)
    q = (
        stateful_closed_sessions(stream, gap_seconds=300, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("closed_sessions_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"].minute + 60 * r["session_start"].hour,
         r["n_events"])
        for r in spark.sql("select * from closed_sessions_test").collect()
    }
    assert got == {(1, 0, 2), (1, 30, 2), (2, 0, 1)}, got
