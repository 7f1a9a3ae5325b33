"""Stage EXTRACT — batched mention detection (SURVEY.md §2.9 V1, §3.2).

The reference has no extraction stage (kbgen consumes RDF directly); the
north_star mandates "vectorized pandas/Arrow UDFs perform batched mention
detection ... per span sequence" (BASELINE.json:6).  Design:

- ``posexplode(spans)`` + ``filter(kind='text')`` — JVM-side; nested-schema
  pruning means media bytes are never read here.
- mention detection is an **Iterator[pd.Series] pandas UDF**: the gazetteer
  trie (a dict keyed by first token) is built once per Python worker per
  batch-iterator, amortized across all Arrow batches — no per-row Python at
  the Spark row level, and the per-batch loop is numpy/py-dict work over an
  Arrow-materialized batch.
- semantics (mirrored by tests/golden oracle): greedy longest-match scan over
  whitespace tokens; phrases up to MAX_PHRASE_TOKENS tokens; on a match the
  scan advances past the matched tokens.

Output: ``mentions(doc_id, span_idx, offset, tok_start, mention)``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

MAX_PHRASE_TOKENS = 2

MENTION_ARRAY_T = "array<struct<mention:string,tok_start:int>>"


def detect_mentions_py(text: str, surface_forms: set[str], by_first: dict) -> list:
    """Pure-python reference semantics for one span text (shared with the
    golden oracle in tests/golden_gen.py — keep in sync)."""
    toks = text.split(" ") if text else []
    out = []
    i = 0
    n = len(toks)
    while i < n:
        matched = 0
        cands = by_first.get(toks[i])
        if cands:
            for plen in range(min(MAX_PHRASE_TOKENS, n - i), 0, -1):
                cand = " ".join(toks[i : i + plen])
                if cand in surface_forms:
                    out.append((cand, i))
                    matched = plen
                    break
        i += matched if matched else 1
    return out


def make_mention_udf(surface_forms: list[str]):
    """Build the Iterator pandas UDF closed over the (small, broadcast-by-
    pickle) gazetteer surface-form set."""
    sf_set = set(surface_forms)
    by_first = {}
    for s in sf_set:
        by_first.setdefault(s.split(" ")[0], []).append(s)

    @pandas_udf(MENTION_ARRAY_T)
    def mention_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # trie/dict built once per worker (closure), reused across batches.
        for batch in it:
            yield batch.map(
                lambda t: detect_mentions_py(t, sf_set, by_first)
            )

    return mention_udf


def explode_text_spans(docs: DataFrame) -> DataFrame:
    """(doc_id, spans) → one row per text span.

    Nested-schema pruning does NOT fire through a plain
    ``posexplode(spans)`` (verified on Spark 4.1: the scan read media_ref),
    so the needed fields are extracted as parallel arrays FIRST
    (``GetArrayStructFields`` prunes) and re-zipped — the parquet scan reads
    only ``{kind, text, offset}``. At 100 TB with fat media refs this is the
    difference between scanning text bytes and scanning the whole table.
    """
    return (
        docs.select(
            "doc_id",
            F.posexplode(
                F.arrays_zip(
                    F.col("spans.kind").alias("kind"),
                    F.col("spans.text").alias("text"),
                    F.col("spans.offset").alias("offset"),
                )
            ).alias("span_idx", "span"),
        )
        .filter(F.col("span.kind") == "text")
        .select(
            "doc_id",
            "span_idx",
            F.col("span.offset").alias("offset"),
            F.col("span.text").alias("span_text"),
        )
    )


def extract_mentions(docs: DataFrame, gazetteer: DataFrame) -> DataFrame:
    """docs × gazetteer → mentions. The gazetteer is collected to the driver
    (it is a dictionary table, ≪ corpus by construction) and shipped in the
    UDF closure — the same boundary a broadcast would use."""
    surface_forms = [r[0] for r in gazetteer.select("surface_form").distinct().collect()]
    udf = make_mention_udf(surface_forms)
    ts = explode_text_spans(docs)
    return (
        ts.withColumn("m", udf(F.col("span_text")))
        .select(
            "doc_id",
            "span_idx",
            "offset",
            F.explode("m").alias("mention_s"),
        )
        .select(
            "doc_id",
            "span_idx",
            "offset",
            F.col("mention_s.mention").alias("mention"),
            F.col("mention_s.tok_start").alias("tok_start"),
        )
    )
