"""Deduplication operators for large-scale training-data pipelines.

Five strategies over the ``documents`` table, all DataFrame-native:

- exact          : md5-hash groupBy — one shuffle on the hash.
- minhash_lsh    : word-shingle MinHash → banded LSH → candidate pairs →
                   exact-Jaccard verification (same JVM-side machinery as
                   surface-form canonicalization, different shingling).
- simhash        : 64-bit SimHash (Charikar, STOC 2002) from token hashes,
                   computed entirely with SQL array/bit expressions;
                   near-dup = small Hamming distance within band buckets.
- ngram_jaccard  : exact token-set Jaccard via a shared-token candidate join
                   (inverted-index style: only pairs sharing ≥1 token are
                   scored — never O(n²) on disjoint docs).
- embedding_cosine: near-dup by cosine ≥ τ over the embeddings table
                   (delegates to operators/similarity.py primitives).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kbgen_spark.functions.text import tokens, word_shingles
from kbgen_spark.operators.canonicalize import lsh_candidate_pairs


def dedup_exact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: (text_hash, n_docs, doc_ids, keep_id).

    keep_id = min doc_id — the canonical survivor per group."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
            F.min("doc_id").alias("keep_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def doc_minhash_signatures(
    docs: DataFrame, k: int = 32, shingle_n: int = 3, text_col: str = "text"
) -> DataFrame:
    """(doc_id, sig) — word-shingle MinHash, JVM-side min(xxhash64) aggs."""
    sh = docs.select(
        "doc_id", F.explode(word_shingles(tokens(text_col), shingle_n)).alias("shingle")
    )
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}") for i in range(k)
    ]
    return (
        sh.groupBy("doc_id")
        .agg(*aggs)
        .select("doc_id", F.array(*[f"h{i}" for i in range(k)]).alias("sig"))
    )


def dedup_minhash_lsh(
    docs: DataFrame,
    k: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.7,
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate pairs (a, b, jaccard) with exact word-shingle Jaccard
    verification of LSH candidates. The verify join re-reads shingle sets for
    the candidate pairs only."""
    sig = doc_minhash_signatures(docs, k, shingle_n, text_col)
    cand = lsh_candidate_pairs(sig, "doc_id", k, bands)
    sh = docs.select(
        F.col("doc_id"),
        F.array_distinct(word_shingles(tokens(text_col), shingle_n)).alias("sh"),
    )
    a = sh.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cand.join(a, "a")
        .join(b, "b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def simhash(docs: DataFrame, text_col: str = "text", bits: int = 64) -> DataFrame:
    """(doc_id, simhash) — Charikar fingerprint from unweighted token hashes.

    For each bit position, the bit is 1 iff more token-hashes have that bit
    set than not. Pure SQL: explode tokens → per-bit ±1 votes via a SQL
    ``transform`` lambda → element-wise vote sums → sign bits packed with a
    SQL ``aggregate``. One shuffle on doc_id."""
    bitvec = F.expr(
        f"transform(sequence(0, {bits - 1}), i -> "
        "case when (xxhash64(tok) & shiftleft(cast(1 as bigint), i)) != 0 "
        "then cast(1 as bigint) else cast(-1 as bigint) end)"
    )
    tok = docs.select("doc_id", F.explode(tokens(text_col)).alias("tok")).select(
        "doc_id", bitvec.alias("bv")
    )
    summed = tok.groupBy("doc_id").agg(
        F.aggregate(
            F.collect_list("bv"),
            F.expr(f"array_repeat(cast(0 as bigint), {bits})"),
            lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
        ).alias("sums")
    )
    fp = F.expr(
        f"aggregate(zip_with(sums, sequence(0, {bits - 1}), (s, i) -> "
        "case when s > 0 then shiftleft(cast(1 as bigint), i) "
        "else cast(0 as bigint) end), cast(0 as bigint), (acc, x) -> acc ^ x)"
    )
    return summed.select("doc_id", fp.alias("simhash"))


def dedup_simhash(
    docs: DataFrame, max_hamming: int = 3, text_col: str = "text"
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Blocking: split the 64-bit fingerprint into (max_hamming+1) 16-bit bands —
    by pigeonhole, any pair within distance max_hamming agrees on ≥1 band, so
    a band-equality join has perfect recall; Hamming verified via bit_count."""
    fps = simhash(docs, text_col)
    nbands = max_hamming + 1
    width = 64 // nbands
    banded = fps.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {nbands - 1}), i -> "
                f"shiftrightunsigned(simhash, cast(i * {width} as int))"
                f" & cast({(1 << width) - 1} as bigint))"
            )
        ).alias("band", "bucket"),
    )
    a = banded.select(
        F.col("doc_id").alias("a"), F.col("simhash").alias("fa"), "band", "bucket"
    )
    b = banded.select(
        F.col("doc_id").alias("b"), F.col("simhash").alias("fb"), "band", "bucket"
    )
    ham = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def dedup_ngram_jaccard(
    docs: DataFrame, threshold: float = 0.5, text_col: str = "text"
) -> DataFrame:
    """EXACT token-set Jaccard join with prefix filtering (the AllPairs /
    PPJoin scheme — Bayardo et al., WWW 2007; Xiao et al., WWW 2008 — both
    public papers).

    A naive inverted-index join is O(Σ df²) and detonates on stopword-dense
    corpora (every doc shares hot tokens with every other). Prefix filtering
    keeps it exact while indexing only the first |A| − ⌈τ·|A|⌉ + 1 tokens of
    each doc under a global rare-first token order: any pair with
    jaccard ≥ τ must collide on a prefix token, so the candidate join runs
    over rare-token postings only. Candidates then verify with a full
    ``array_intersect``. Plus the length filter: τ·max(|A|,|B|) ≤ min."""
    toks = docs.select(
        F.col("doc_id"), F.explode(F.array_distinct(tokens(text_col))).alias("tok")
    )
    # global token order: rarest first (df asc, tok asc for determinism)
    order = toks.groupBy("tok").agg(F.count("*").alias("df"))
    order = order.select(
        "tok",
        F.row_number()
        .over(Window.orderBy(F.asc("df"), F.asc("tok")))
        .alias("r"),
    )
    ranked = toks.join(F.broadcast(order), "tok")
    sets = ranked.groupBy("doc_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("r", "tok"))), lambda x: x["tok"]
        ).alias("tok_arr")
    )
    sets = sets.select(
        "doc_id", "tok_arr", F.size("tok_arr").alias("sz")
    )
    prefix_len = (
        F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")).cast("int") + 1
    )
    postings = sets.select(
        "doc_id",
        "sz",
        F.explode(F.slice("tok_arr", 1, prefix_len)).alias("tok"),
    )
    cand = (
        postings.alias("x")
        .join(postings.alias("y"), "tok")
        .filter(
            (F.col("x.doc_id") < F.col("y.doc_id"))
            & (
                F.lit(threshold) * F.greatest("x.sz", "y.sz")
                <= F.least("x.sz", "y.sz")
            )
        )
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )
    sa = sets.select(F.col("doc_id").alias("a"), F.col("tok_arr").alias("ta"), F.col("sz").alias("sza"))
    sb = sets.select(F.col("doc_id").alias("b"), F.col("tok_arr").alias("tb"), F.col("sz").alias("szb"))
    inter = F.size(F.array_intersect("ta", "tb"))
    return (
        cand.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            inter.cast("double") / (F.col("sza") + F.col("szb") - inter),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def dedup_embedding_cosine(
    embeddings: DataFrame, threshold: float = 0.95
) -> DataFrame:
    """Near-dup vector pairs by cosine ≥ τ (brute force — see
    operators/similarity.py for the LSH-bucketed scale path)."""
    from kbgen_spark.operators.similarity import cosine_pairs

    return cosine_pairs(embeddings, threshold)
