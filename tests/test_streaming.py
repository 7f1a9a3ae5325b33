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


def test_stateful_sessions_cross_batch_out_of_order(spark, tmp_path):
    """Regression (round-5 review): a late-but-valid event (above the
    watermark, earlier than the carried open session's end) must MERGE into
    the open session — extending its start backwards when earlier — never
    move the session end backwards or split it. Two files + maxFilesPerTrigger=1
    force the out-of-order arrival to cross a micro-batch boundary."""
    import os
    from datetime import datetime

    from kbgen_spark.streaming.ingest import stateful_closed_sessions

    src = str(tmp_path / "sess_ooo_src")
    os.makedirs(src)
    # batch 1: user 1 open session [01:00, 01:02]; user 5 control (timer close)
    batch1 = [
        (1, datetime(2026, 1, 1, 1, 0, 0)),
        (1, datetime(2026, 1, 1, 1, 2, 0)),
        (5, datetime(2026, 1, 1, 1, 0, 0)),
    ]
    # batch 2: user 1 gets a backwards-extending event (00:58), a late event
    # inside the open session (01:01), and a closer (01:08, > gap after the
    # true end 01:02). user 99 pushes the final watermark to 02:50 so the
    # trailing sessions of users 1 and 5 close via timer; its own stays open.
    batch2 = [
        (1, datetime(2026, 1, 1, 0, 58, 0)),
        (1, datetime(2026, 1, 1, 1, 1, 0)),
        (1, datetime(2026, 1, 1, 1, 8, 0)),
        (99, datetime(2026, 1, 1, 3, 0, 0)),
    ]
    for i, rows in enumerate([batch1, batch2]):
        p = f"{src}/b{i}.parquet"
        spark.createDataFrame(rows, "user_id bigint, ts timestamp").coalesce(
            1
        ).write.mode("overwrite").parquet(p)
        # file-source ordering is by modification time (oldest first):
        # pin strictly increasing mtimes so batch replay order is stable
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (1_000_000 + i, 1_000_000 + i))

    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*.parquet")
    )
    q = (
        stateful_closed_sessions(stream, gap_seconds=300, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("closed_sessions_ooo_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (
            r["user_id"],
            r["session_start"].hour * 60 + r["session_start"].minute,
            r["session_end"].hour * 60 + r["session_end"].minute,
            r["n_events"],
        )
        for r in spark.sql("select * from closed_sessions_ooo_test").collect()
    }
    # user 1: [00:58, 01:02] n=4 (58..62), then [01:08] n=1 closed by timer;
    # user 5: [01:00] n=1 by timer; user 99 still open — absent.
    # The pre-fix cursor emitted (1, 60, 61, 4): end moved BACKWARDS to 01:01.
    assert got == {(1, 58, 62, 4), (1, 68, 68, 1), (5, 60, 60, 1)}, got
