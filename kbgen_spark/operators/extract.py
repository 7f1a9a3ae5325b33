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


# Driver-side cap on gazetteer size: the surface-form list is collect()ed
# and broadcast, so it must stay dictionary-sized (the corpus never is).
GAZETTEER_MAX_SURFACES = 5_000_000


def make_mention_udf(surface_forms):
    """Build the Iterator pandas UDF over the gazetteer surface-form set.

    ``surface_forms`` is either a ``sc.broadcast`` handle (preferred: one
    torrent transfer per executor, not one pickle per task) or a plain list
    (tests). The lookup dicts are built once per task from the broadcast
    value and reused across all Arrow batches of that task."""
    is_bc = hasattr(surface_forms, "value")

    @pandas_udf(MENTION_ARRAY_T)
    def mention_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # dicts built once per task, from the executor-local broadcast block.
        forms = surface_forms.value if is_bc else surface_forms
        sf_set = set(forms)
        by_first = {}
        for s in sf_set:
            by_first.setdefault(s.split(" ")[0], []).append(s)
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
    (it is a dictionary table, ≪ corpus by construction — enforced by the
    GAZETTEER_MAX_SURFACES cap) and ``sc.broadcast`` to executors: one
    transfer per executor instead of one closure pickle per task."""
    surface_forms = [r[0] for r in gazetteer.select("surface_form").distinct().collect()]
    if len(surface_forms) > GAZETTEER_MAX_SURFACES:
        raise ValueError(
            f"gazetteer has {len(surface_forms)} surface forms — exceeds the "
            f"driver-collect cap of {GAZETTEER_MAX_SURFACES}; a gazetteer this "
            "large must be joined distributively, not broadcast"
        )
    bc = docs.sparkSession.sparkContext.broadcast(surface_forms)
    udf = make_mention_udf(bc)
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
