"""Open-vocabulary dedup fixture (round-2 verdict item 3): realistic
vocabulary, planted near-dup pairs, measurable prefix-filter pruning, and
sub-1.0 LSH recall tracked exactly by the mirrored md5-LSH oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from kbgen_spark.fixtures_openvocab import (
    mirrorable_shingle_hash,
    open_vocab_corpus,
)
from kbgen_spark.operators.dedup import (
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
    ngram_prefix_candidates,
    rare_first_token_sets,
)

SF_DIR = "/root/testdata/sf0.001"


def _corpus(spark):
    return open_vocab_corpus(
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
    )


def test_corpus_is_deterministic_and_open_vocab(spark):
    d = _corpus(spark)
    t1 = {r["doc_id"]: r["text"] for r in d.collect()}
    t2 = {r["doc_id"]: r["text"] for r in _corpus(spark).collect()}
    assert t1 == t2
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("t")).distinct().count()
    )
    # 500 docs x ~45 tokens already draw >8k distinct tokens from the
    # 39k-token tail — two orders of magnitude beyond the driver corpus's
    # 31-token closed vocabulary; the sf0.01 driver run sits near 10k.
    assert vocab > 8000, vocab


def test_planted_pairs_recovered_exactly(spark):
    d = _corpus(spark)
    n = d.count()
    expected = {(a, a + 1) for a in range(0, n, 10)}
    got = {
        (r["a"], r["b"])
        for r in dedup_ngram_jaccard(d, threshold=0.6).collect()
    }
    assert got == expected
    # and the pairs are NEAR-dups, not exact ones (mutation really applied)
    jacs = [
        r["jaccard"] for r in dedup_ngram_jaccard(d, threshold=0.6).collect()
    ]
    assert any(j < 1.0 for j in jacs)


def test_prefix_filter_prunes_measurably(spark):
    """The PPJoin prefix+length+positional filters must prune hard on an
    open-vocabulary corpus (on the closed-vocab driver corpus everything
    collides with everything and pruning is unobservable)."""
    d = _corpus(spark)
    sets = rare_first_token_sets(d)
    n = sets.count()
    all_pairs = n * (n - 1) // 2
    # naive inverted-index candidates: every pair sharing >= 1 token
    toks = sets.select("doc_id", F.explode("tok_arr").alias("tok"))
    naive = (
        toks.alias("x")
        .join(toks.alias("y"), "tok")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
        .count()
    )
    cand = ngram_prefix_candidates(sets, 0.6).count()
    final = dedup_ngram_jaccard(d, threshold=0.6).count()
    # the ~50 hot 'c' tokens connect essentially every doc pair naively;
    # the prefix (rare-first) ordering keeps hot tokens out of the indexed
    # prefix, so candidates collapse to nearly the qualifying set.
    assert naive > all_pairs * 0.9, (naive, all_pairs)
    assert cand < naive / 100, (cand, naive)
    assert cand < 5 * max(final, 1), (cand, final)
    print(
        f"\nopenvocab prune: all_pairs={all_pairs} naive_shared_token={naive} "
        f"prefix_candidates={cand} qualifying={final} "
        f"(candidate:pair ratio {cand / max(final, 1):.2f})"
    )


def test_lsh_recall_below_one_and_tracked(spark):
    """With 4 bands x 4 rows the planted pairs are genuinely missable; the
    mirrored-hash LSH finds a strict, deterministic subset of the exact
    pairs (this is the regime the candidate-verification oracle exists for)."""
    d = _corpus(spark)
    found = dedup_minhash_lsh(
        d, k=16, bands=4, threshold=0.4, shingle_hash=mirrorable_shingle_hash
    )
    exact = dedup_ngram_jaccard(d, threshold=0.6)  # superset marker: planted pairs
    n_found = found.count()
    n_planted = exact.count()
    assert 0 < n_found < n_planted, (n_found, n_planted)
    # determinism: same pair set on a second run
    again = dedup_minhash_lsh(
        d, k=16, bands=4, threshold=0.4, shingle_hash=mirrorable_shingle_hash
    )
    assert {tuple(r) for r in found.select("a", "b").collect()} == {
        tuple(r) for r in again.select("a", "b").collect()
    }
