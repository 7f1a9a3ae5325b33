"""Stage CANON — MinHash-LSH blocking for surface-form canonicalization
(SURVEY.md §2.9 V3, §2.3 J5; BASELINE.json:6).

Everything here is JVM-side SQL — char-shingling via ``transform``, MinHash
via ``min(xxhash64(shingle, seed_i))`` aggregates, band bucketing via
``xxhash64`` over signature slices.  No Python crosses the boundary, the
whole thing is whole-stage-codegen + two hash aggregations, and it scales
linearly in distinct surface forms.

Pipeline:
  surface forms → char n-gram shingles → k-wide MinHash signature
  → b bands × r rows → bucket join (J5) → candidate pairs
  → exact Jaccard verification on shingle sets → edges(jaccard ≥ τ)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kbgen_spark.functions.text import char_ngrams

DEFAULT_K = 32  # signature width
# 16 bands × 2 rows: collision prob ≥ 1−(1−j²)^16 → ≥ 99% for j ≥ 0.5.
# False positives are cheap (exact-Jaccard verify filters them); false
# negatives break canonicalization recall — bias toward recall.
DEFAULT_BANDS = 16


def minhash_signatures(
    sf: DataFrame,
    col: str = "surface_form",
    k: int = DEFAULT_K,
    ngram: int = 2,
    shingle_hash=None,
) -> DataFrame:
    """(col) → (col, sig array<bigint>). One explode + one groupBy with k
    ``min`` aggregates — a single shuffle on the surface form.

    ``shingle_hash``: callable (shingle Column, i) -> Column giving the i-th
    hash family member; defaults to ``xxhash64(shingle, i)`` (fastest —
    JVM-side). The md5-60-bit family (fixtures_openvocab
    ``mirrorable_shingle_hash``) is injectable so a DuckDB oracle can replay
    the exact signature → band → candidate chain (same seam as
    dedup.minhash_signatures_from_sets)."""
    if shingle_hash is None:
        shingle_hash = lambda c, i: F.xxhash64(c, F.lit(i))  # noqa: E731
    sh = sf.select(col, F.explode(char_ngrams(col, ngram)).alias("shingle"))
    aggs = [
        F.min(shingle_hash(F.col("shingle"), i)).alias(f"h{i}") for i in range(k)
    ]
    sig = sh.groupBy(col).agg(*aggs)
    return sig.select(col, F.array(*[f"h{i}" for i in range(k)]).alias("sig"))


def lsh_candidate_pairs(
    sig: DataFrame,
    col: str = "surface_form",
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Band-bucket self-join: explode (band, bucket-hash of the sig slice),
    equi-join on (band, bucket), keep ordered pairs a < b. The equi-join keys
    make this a plain shuffled hash join — no O(n²) blowup; bucket sizes are
    bounded by signature collisions only."""
    r = k // bands
    banded = sig.select(
        col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.array_join(
                        F.transform(
                            F.slice(F.col("sig"), b * r + 1, r),
                            lambda x: x.cast("string"),
                        ),
                        ",",
                    )
                ),
            )
        ).alias("band", "bucket"),
    )
    a = banded.select(F.col(col).alias("a"), "band", "bucket")
    b = banded.select(F.col(col).alias("b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def verify_pairs_jaccard(
    pairs: DataFrame, ngram: int = 2, threshold: float = 0.5
) -> DataFrame:
    """Exact char-shingle Jaccard on candidate pairs (array_intersect /
    array_union over the two small shingle arrays — per-row array math, still
    codegen)."""
    sa = F.array_distinct(char_ngrams("a", ngram))
    sb = F.array_distinct(char_ngrams("b", ngram))
    jac = F.size(F.array_intersect(sa, sb)).cast("double") / F.size(
        F.array_union(sa, sb)
    )
    return pairs.withColumn("jaccard", jac).filter(F.col("jaccard") >= threshold)


def similar_surface_edges(
    links_or_sf: DataFrame,
    col: str = "surface_form",
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
    ngram: int = 2,
    threshold: float = 0.5,
    shingle_hash=None,
) -> DataFrame:
    """surface forms → verified similarity edges (a, b, jaccard)."""
    sf = links_or_sf.select(col).distinct()
    sig = minhash_signatures(sf, col, k, ngram, shingle_hash)
    cand = lsh_candidate_pairs(sig, col, k, bands)
    return verify_pairs_jaccard(cand, ngram, threshold)
