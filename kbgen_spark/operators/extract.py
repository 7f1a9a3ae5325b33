"""Stage EXTRACT — batched mention detection (SURVEY.md §2.9 V1, §3.2).

The reference has no extraction stage (kbgen consumes RDF directly); the
north_star mandates vectorized (never per-row) Python where Python is needed
at all (BASELINE.json:6,15).  Two paths, bit-identical on exact matching:

- **default (round 4): pure Catalyst** — broadcast-join token uni/bigrams
  against the gazetteer, then a greedy-cursor ``F.aggregate`` fold per span
  (extract_mentions_sql). Exact dictionary matching needs no Python at all;
  this removed the last Python UDF from the pipeline's hot path (the
  0.71–0.78 pinned extract-slice scaling ceiling of rounds 2–3). An
  island-parity WINDOW formulation of the same automaton
  (extract_mentions_sql_windows, `SPARK_GRAFT_EXTRACT=windows`) is pinned
  bit-equal and measured faster on the isolated slice — see its docstring
  for the promotion criteria.
- **fuzzy seam: Iterator[pd.Series] pandas UDF** — the gazetteer trie (a
  dict keyed by first token) is built once per Python worker per
  batch-iterator, amortized across all Arrow batches. Kept behind
  ``use_udf=True`` for matching semantics Catalyst can't express (edit-
  distance tries, context models).
- semantics (mirrored by tests/golden oracle + the kg_mentions_greedy_sql
  DuckDB oracle): greedy longest-match scan over whitespace tokens; phrases
  up to MAX_PHRASE_TOKENS tokens; on a match the scan advances past the
  matched tokens.

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


MENTIONS_ACC_T = "array<struct<mention:string,tok_start:int>>"


def _split_gazetteer(gazetteer: DataFrame):
    surfaces = gazetteer.select("surface_form").distinct()
    g1 = surfaces.filter(~F.col("surface_form").contains(" ")).withColumnRenamed(
        "surface_form", "_sf1"
    )
    g2 = surfaces.filter(
        F.size(F.split("surface_form", " ")) == 2
    ).withColumnRenamed("surface_form", "_sf2")
    return g1, g2


def _token_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, span_idx, offset, pos, tc{_t, _nxt}) — one row per token with
    its successor, the probe input for both candidate joins."""
    ts = explode_text_spans(docs).withColumn("_t", F.split("span_text", " "))
    return ts.withColumn(
        "_nxt",
        F.concat(
            F.slice(F.col("_t"), 2, F.greatest(F.size("_t") - 1, F.lit(0))),
            F.array(F.lit(None).cast("string")),
        ),
    ).select(
        "doc_id",
        "span_idx",
        "offset",
        F.posexplode(F.arrays_zip("_t", "_nxt")).alias("pos", "tc"),
    )


def extract_mentions_sql_windows(docs: DataFrame, gazetteer: DataFrame) -> DataFrame:
    """Island-parity WINDOW formulation of the greedy scan — bit-identical to
    the fold default and the pandas-UDF scan (three-way pin in tests), zero
    Python in the plan and NO per-span array materialization. Selectable via
    ``SPARK_GRAFT_EXTRACT=windows`` (see extract_mentions).

    Replays the greedy longest-match automaton in CLOSED FORM with window
    functions over the bigram candidates (the same island-parity formulation
    the DuckDB oracle kg_mentions_greedy_sql uses):

    - only a FIRED bigram consumes a position beyond itself (a unigram
      advances the cursor by exactly one), so a bigram candidate at pos p is
      blocked iff the bigram at p-1 fired; within a maximal run of
      consecutive bigram-candidate positions ("island") selection is
      therefore odd-parity, and an island's first position always fires
      (p-1 has no bigram candidate, and nothing else consumes ahead);
    - a unigram fires iff its position has NO bigram candidate (a fired one
      wins by longest-match; a blocked one means the position is consumed)
      and the previous position's bigram wasn't selected.
    Islands = pos − row_number() over (span, pos); selection = odd
    row_number within the island; unigrams = two equi-keyed anti-joins
    (hash/SMJ, never a nested loop).

    Measured profile (2026-08-17, ×64 sf0.1 corpus): the ISOLATED extract
    slice is decisively faster than the fold at both pinned core counts
    (same-JVM alternating A/B: 12.95→7.85 s @8, 36.67→23.64 s @2; per-stage
    bench: 16.7→13.2 s @8, 50.3→42.75 s @2 — the per-span candidate arrays
    are the fold's allocation tax), but the FUSED fresh-JVM pipeline at the
    campaign config (128 shuffle partitions) measured a wash same-JVM
    (min 45.6 vs 46.9 s @8) and could not be measured clean fresh-JVM
    (continuous co-tenant steal all afternoon). The fold therefore stays
    the default — its clean-morning campaign table (BENCH/BASELINE.md,
    median 0.849) describes exactly the shipped path — and this formulation
    is the candidate to promote once a clean fresh-JVM campaign shows the
    slice win surviving fusion.
    """
    from pyspark.sql import Window

    g1, g2 = _split_gazetteer(gazetteer)
    tok = _token_stream(docs)
    m2 = (
        tok.filter(F.col("tc._nxt").isNotNull())
        .withColumn("_bg", F.concat(F.col("tc._t"), F.lit(" "), F.col("tc._nxt")))
        .join(F.broadcast(g2), F.col("_bg") == F.col("_sf2"))
        .select(
            "doc_id", "span_idx", "offset", "pos", F.col("_bg").alias("mention")
        )
    )
    w_span = Window.partitionBy("doc_id", "span_idx", "offset").orderBy("pos")
    isl = m2.withColumn("grp", F.col("pos") - F.row_number().over(w_span))
    w_grp = Window.partitionBy("doc_id", "span_idx", "offset", "grp").orderBy("pos")
    m2sel = (
        isl.withColumn("rn", F.row_number().over(w_grp))
        .filter(F.col("rn") % 2 == 1)
        .select("doc_id", "span_idx", "offset", "pos", "mention")
    )
    m1 = (
        tok.join(F.broadcast(g1), tok["tc._t"] == F.col("_sf1"))
        .select(
            "doc_id", "span_idx", "offset", "pos", F.col("tc._t").alias("mention")
        )
        .join(
            m2.select("doc_id", "span_idx", "offset", "pos"),
            ["doc_id", "span_idx", "offset", "pos"],
            "left_anti",
        )
        .join(
            m2sel.select(
                "doc_id", "span_idx", "offset", (F.col("pos") + 1).alias("pos")
            ),
            ["doc_id", "span_idx", "offset", "pos"],
            "left_anti",
        )
    )
    return m2sel.unionByName(m1).select(
        "doc_id", "span_idx", "offset", "mention", F.col("pos").alias("tok_start")
    )


def extract_mentions_sql(docs: DataFrame, gazetteer: DataFrame) -> DataFrame:
    """Pure-Catalyst exact mention detection (DEFAULT) — bit-identical
    semantics to the pandas-UDF scan and the window formulation (three-way
    pin in tests), zero Python in the plan.

    Exact gazetteer matching doesn't need a trie: with MAX_PHRASE_TOKENS=2,
    every possible match is a token unigram or an adjacent bigram, so

    1. explode (pos, tok, next_tok) per text span — narrow, JVM;
    2. broadcast-join tokens against 1-token surfaces and (tok ∥ ' ' ∥ next)
       against 2-token surfaces → the CANDIDATE set (matched positions only —
       ≪ corpus, the only thing that ever shuffles);
    3. regroup candidates per span (sorted (pos, len desc)) and replay the
       greedy longest-match scan as an ``F.aggregate`` cursor fold — the
       LITERAL reference automaton (detect_mentions_py), run inside codegen.

    Scale: the gazetteer never touches the driver (no collect, no 5M cap —
    two broadcast hash joins), the corpus-sized token stream stays in its
    scan partitions, and the single shuffle carries only candidate rows.
    The island-parity window replay (extract_mentions_sql_windows) is the
    measured-faster formulation for the isolated slice and is selectable via
    ``SPARK_GRAFT_EXTRACT=windows``; the fold remains default because the
    recorded fresh-JVM scaling campaign (BENCH/BASELINE.md) ran this exact
    plan and the fused-pipeline difference measured a wash. The UDF path
    (extract_mentions(use_udf=True)) remains as the seam for FUZZY matching,
    where per-candidate Python scoring is genuinely needed.
    """
    surfaces = gazetteer.select("surface_form").distinct()
    g1 = surfaces.filter(~F.col("surface_form").contains(" ")).withColumnRenamed(
        "surface_form", "_sf1"
    )
    g2 = surfaces.filter(
        F.size(F.split("surface_form", " ")) == 2
    ).withColumnRenamed("surface_form", "_sf2")

    ts = explode_text_spans(docs).withColumn("_t", F.split("span_text", " "))
    tok = ts.withColumn(
        "_nxt",
        F.concat(
            F.slice(F.col("_t"), 2, F.greatest(F.size("_t") - 1, F.lit(0))),
            F.array(F.lit(None).cast("string")),
        ),
    ).select(
        "doc_id",
        "span_idx",
        "offset",
        F.posexplode(F.arrays_zip("_t", "_nxt")).alias("pos", "tc"),
    )

    uni = tok.join(F.broadcast(g1), tok["tc._t"] == F.col("_sf1")).select(
        "doc_id",
        "span_idx",
        "offset",
        "pos",
        F.lit(-1).alias("nl"),  # negated length: sort_array puts longer first
        F.col("tc._t").alias("mention"),
    )
    big = (
        tok.filter(F.col("tc._nxt").isNotNull())
        .withColumn("_bg", F.concat(F.col("tc._t"), F.lit(" "), F.col("tc._nxt")))
        .join(F.broadcast(g2), F.col("_bg") == F.col("_sf2"))
        .select(
            "doc_id",
            "span_idx",
            "offset",
            "pos",
            F.lit(-2).alias("nl"),
            F.col("_bg").alias("mention"),
        )
    )

    grouped = (
        uni.unionByName(big)
        .groupBy("doc_id", "span_idx", "offset")
        .agg(
            F.sort_array(F.collect_list(F.struct("pos", "nl", "mention"))).alias("c")
        )
    )
    # Greedy cursor fold: candidates arrive (pos asc, len desc); one is
    # emitted iff pos >= cursor, moving the cursor to pos + len — identical
    # to the reference scan (a consumed position skips BOTH its bigram and
    # unigram candidate; an emitted unigram consumes nothing beyond itself).
    sel = F.aggregate(
        F.col("c"),
        F.expr(f"named_struct('cur', 0, 'acc', cast(array() as {MENTIONS_ACC_T}))"),
        lambda st, c: F.when(
            c["pos"] >= st["cur"],
            F.struct(
                (c["pos"] - c["nl"]).alias("cur"),
                F.concat(
                    st["acc"],
                    F.array(
                        F.struct(
                            c["mention"].alias("mention"),
                            c["pos"].alias("tok_start"),
                        )
                    ),
                ).alias("acc"),
            ),
        ).otherwise(st),
        lambda st: st["acc"],
    )
    return (
        grouped.select("doc_id", "span_idx", "offset", F.explode(sel).alias("m"))
        .select(
            "doc_id",
            "span_idx",
            "offset",
            F.col("m.mention").alias("mention"),
            F.col("m.tok_start").alias("tok_start"),
        )
    )


def extract_mentions(
    docs: DataFrame, gazetteer: DataFrame, use_udf: bool = False
) -> DataFrame:
    """docs × gazetteer → mentions(doc_id, span_idx, offset, mention,
    tok_start).

    Default path is the pure-Catalyst broadcast-join + greedy cursor fold
    (extract_mentions_sql) — no Python worker in the plan;
    ``SPARK_GRAFT_EXTRACT=windows`` selects the island-parity window
    formulation (extract_mentions_sql_windows) for fresh-JVM A/B campaigns.
    ``use_udf=True`` selects the Iterator-pandas-UDF trie scan: the
    gazetteer is collected to the driver (dictionary table ≪ corpus,
    enforced by GAZETTEER_MAX_SURFACES) and ``sc.broadcast`` to executors.
    All paths are bit-identical on exact matching (pinned by tests); the
    UDF seam exists for fuzzy extensions."""
    if not use_udf:
        import os

        if os.environ.get("SPARK_GRAFT_EXTRACT") == "windows":
            return extract_mentions_sql_windows(docs, gazetteer)
        return extract_mentions_sql(docs, gazetteer)
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
