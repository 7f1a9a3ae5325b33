"""Text-analysis operators for training-data curation — language ID, quality
scoring, token counting, document fingerprinting. All built-in-function
expressions except the rolling hash (Arrow-batched pandas UDF).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from kbgen_spark.functions.text import tokens

# Tiny closed stopword lists per language — the n-gram/stopword-ratio
# heuristic standard for fast language ID (à la langid's feature classes).
# Deterministic and dependency-free; mirrored in the DuckDB oracle.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "de"],
    "zh": ["的", "是", "在", "了", "和"],
}


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang, marker_hits) — argmax of marker-token hits.

    Tie convention: ties resolve to the LEXICOGRAPHICALLY GREATEST language
    code (array_max over struct(hits, lang) compares lang as the second
    field); only zero-hit docs fall back to 'und'. The DuckDB oracle mirrors
    this exact convention — keep both in sync when extending LANG_MARKERS.
    Pure SQL: one pass, no shuffle."""
    toks = tokens(text_col)
    hit_cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        hit_cols.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*hit_cols))
    return docs.select(
        "doc_id",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias(
            "pred_lang"
        ),
        best["hits"].cast("bigint").alias("marker_hits"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + a composite score in [0,1]:

    - len_chars, n_tokens, mean token length
    - stopword_ratio (English markers as the reference class)
    - alpha_ratio: fraction of alphabetic chars
    - repetition: 1 − distinct/total tokens
    """
    toks = tokens(text_col)
    n_tok = F.size(toks)
    stop = F.array(*[F.lit(m) for l in sorted(LANG_MARKERS) for m in LANG_MARKERS[l]])
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast(
        "double"
    ) / n_tok
    alpha_ratio = (
        F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z]", "")).cast("double")
        / F.length(text_col)
    )
    rep = F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / n_tok
    mean_tok_len = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda a, t: a + F.length(t)
    ).cast("double") / n_tok
    score = (
        F.lit(0.25) * F.least(n_tok.cast("double") / 100.0, F.lit(1.0))
        + F.lit(0.25) * alpha_ratio
        + F.lit(0.25) * (F.lit(1.0) - rep)
        + F.lit(0.25) * F.least(stop_ratio * 5.0, F.lit(1.0))
    )
    return docs.select(
        "doc_id",
        F.length(text_col).cast("bigint").alias("len_chars"),
        n_tok.cast("bigint").alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_tok_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(rep, 6).alias("repetition"),
        F.round(score, 6).alias("quality"),
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (4 chars/token rule of
    thumb over non-space chars) per doc."""
    toks = tokens(text_col)
    non_space = F.length(F.regexp_replace(F.col(text_col), r"\s", ""))
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("ws_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("distinct_tokens"),
        F.ceil(non_space.cast("double") / 4.0).cast("bigint").alias("subword_est"),
    )


POLY_BASE = np.uint64(1000003)
POLY_MOD_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def rolling_fingerprint_udf():
    """64-bit polynomial rolling hash over UTF-8 bytes (Rabin–Karp style),
    vectorized over Arrow batches. Used for shift-resistant doc
    fingerprinting; per-batch numpy, no per-row Python at the Spark level."""

    @pandas_udf("bigint")
    def fp(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in it:
            out = np.zeros(len(batch), dtype=np.uint64)
            with np.errstate(over="ignore"):
                for i, s in enumerate(batch):
                    b = np.frombuffer((s or "").encode("utf-8"), dtype=np.uint8).astype(
                        np.uint64
                    )
                    acc = np.uint64(1469598103934665603)  # FNV offset basis
                    # Horner evaluation, vectorized via cumulative powers
                    n = len(b)
                    if n:
                        powers = np.empty(n, dtype=np.uint64)
                        powers[0] = np.uint64(1)
                        if n > 1:
                            np.multiply.accumulate(
                                np.full(n - 1, POLY_BASE, dtype=np.uint64),
                                out=powers[1:],
                            )
                        acc = (acc + np.sum(b * powers[::-1])) & POLY_MOD_MASK
                    out[i] = acc
            yield pd.Series(out.astype(np.int64))

    return fp


def doc_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, md5_fp, rolling_fp) — md5 for exact identity (oracle-checkable)
    plus the rolling polynomial hash."""
    fp = rolling_fingerprint_udf()
    return docs.select(
        "doc_id",
        F.md5(F.col(text_col)).alias("md5_fp"),
        fp(F.col(text_col)).alias("rolling_fp"),
    )


# --- PII scrubbing (training-data hygiene) -----------------------------------
#
# Leftmost-non-overlapping regex semantics are identical in Java regex
# (Spark) and RE2 (DuckDB) for these patterns (no backrefs/lookaround),
# which is what makes the operator exactly oracle-mirrorable.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("url", r"https?://[^\s]+"),
    ("phone", r"\+?\d{3}[- .]\d{3}[- .]\d{4}"),
)


def scrub_pii(
    docs: DataFrame,
    text_col: str = "text",
    patterns: tuple[tuple[str, str], ...] = PII_PATTERNS,
) -> DataFrame:
    """Training-data PII hygiene: per-category match counts + the scrubbed
    text with each match replaced by its ``[CATEGORY]`` token.

    One narrow projection, zero shuffles, all expressions inside whole-stage
    codegen (``regexp_count`` / ``regexp_replace`` are JVM built-ins) — at
    100 TB this runs at parquet-scan speed with the text column pruned to
    exactly what the scan needs. Counts are computed on the ORIGINAL text;
    replacement applies patterns in declaration order (email before url
    before phone), so category tokens never feed later patterns."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat in patterns
    ]
    scrubbed = F.col(text_col)
    for name, pat in patterns:
        scrubbed = F.regexp_replace(scrubbed, pat, f"[{name.upper()}]")
    return docs.select("doc_id", *counts, scrubbed.alias("scrubbed"))
