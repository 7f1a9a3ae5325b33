"""Stage LINK — dictionary-gazetteer entity linking (SURVEY.md §2.3 J4, §2.9 V2).

Scoring is a pure Catalyst expression (prefer expr over UDF — SURVEY §2.9 V2):

    score = prior * (1 / (1 + levenshtein(norm_mention, surface_form)))

With exact dictionary matches levenshtein = 0 → score = prior; the fuzzy term
exists so near-miss surfaces (added by canonicalization) still rank.  Top-1
candidate per mention via ``row_number`` (W2/O3).

The gazetteer join is **broadcast** — the dictionary is small relative to the
corpus by construction; at 100 TB corpus scale the mention side never
shuffles for this join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kbgen_spark.functions.text import norm_surface


def link_mentions(mentions: DataFrame, gazetteer: DataFrame) -> DataFrame:
    """mentions × gazetteer → links(doc_id, span_idx, offset, tok_start,
    mention, entity_id, entity_type, score). Unmatched mentions are dropped
    (inner join) — the unlinked feed goes to canonicalization instead.

    Scale shape (round 3): the candidate set and top-1 decision are a pure
    function of the normalized mention, and the join equality pins
    nmention == surface_form, which makes ``levenshtein(nmention,
    surface_form) == 0`` identically — so the score reduces to exactly
    ``prior`` and the whole scoring + ranking problem is a function of the
    GAZETTEER alone. The per-surface top-1 verdict table (dictionary-sized,
    rank by prior desc / entity_id asc) is computed once and broadcast; the
    corpus-sized mention stream then does normalize + ONE broadcast hash
    probe per row — no per-occurrence levenshtein, no corpus-sized window,
    no second pass over the extract UDF. (The fuzzy 1/(1+levenshtein) term
    becomes live again only if this join ever loosens to a non-equality
    match — reintroduce per-candidate scoring in that case.)"""
    w = Window.partitionBy("surface_form").orderBy(
        F.desc("prior"), F.asc("entity_id")
    )
    verdict = (
        gazetteer.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "surface_form",
            "entity_id",
            "entity_type",
            (F.col("prior") * F.lit(1.0)).alias("score"),
        )
    )
    return (
        mentions.withColumn("nmention", norm_surface("mention"))
        .join(
            F.broadcast(verdict),
            F.col("nmention") == F.col("surface_form"),
            "inner",
        )
        .select(
            "doc_id",
            "span_idx",
            "offset",
            "tok_start",
            "mention",
            "surface_form",
            "entity_id",
            "entity_type",
            "score",
        )
    )
