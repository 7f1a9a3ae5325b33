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
    (inner join) — the unlinked feed goes to canonicalization instead."""
    cand = mentions.withColumn("nmention", norm_surface("mention")).join(
        F.broadcast(gazetteer),
        F.col("nmention") == F.col("surface_form"),
        "inner",
    )
    scored = cand.withColumn(
        "score",
        F.col("prior")
        * (F.lit(1.0) / (F.lit(1.0) + F.levenshtein("nmention", "surface_form"))),
    )
    # Top-1 per mention. When the gazetteer is uniquely keyed by surface_form
    # (one candidate per mention — the common dictionary case), the rank
    # window would shuffle the whole mention stream for nothing: skip it.
    # The check costs ONE aggregate job over the tiny dictionary table.
    cnt = gazetteer.agg(
        F.count("*").alias("n_all"),
        F.count_distinct("surface_form").alias("n_sf"),
    ).collect()[0]
    n_all, n_sf = cnt["n_all"], cnt["n_sf"]
    if n_all == n_sf:
        ranked = scored.withColumn("rn", F.lit(1))
    else:
        w = Window.partitionBy("doc_id", "span_idx", "tok_start").orderBy(
            F.desc("score"), F.asc("entity_id")
        )
        ranked = scored.withColumn("rn", F.row_number().over(w))
    return (
        ranked
        .filter(F.col("rn") == 1)
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
