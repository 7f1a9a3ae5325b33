"""Round-2 coverage: multi-atom horn rules + AMIE parsing, type-hierarchy
rollup, the salted dense index, multi-probe ANN recall, and the non-ASCII
normalization parity fix (VERDICT.md next-round items 5–9; ADVICE items)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# M3 multi-atom rules + AMIE parser
# ---------------------------------------------------------------------------


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_parse_amie_rule_shapes():
    from kbgen_spark.models.rules import parse_amie_rule

    r1 = parse_amie_rule("?a  <wasBornIn>  ?b   => ?a  <livesIn>  ?b", 0.8)
    assert r1.body == (("a", "wasBornIn", "b"),)
    assert r1.head == ("a", "livesIn", "b")
    assert r1.confidence == 0.8

    r2 = parse_amie_rule("?a <p1> ?e  ?e <p2> ?b => ?a <p3> ?b", 0.5)
    assert r2.body == (("a", "p1", "e"), ("e", "p2", "b"))
    assert r2.head == ("a", "p3", "b")

    # swapped-argument body
    r3 = parse_amie_rule("?b <parentOf> ?a => ?a <childOf> ?b", 1.0)
    assert r3.body == (("b", "parentOf", "a"),)
    assert r3.head == ("a", "childOf", "b")


def test_parse_amie_rule_rejects_bad():
    from kbgen_spark.models.rules import parse_amie_rule

    with pytest.raises(ValueError):
        parse_amie_rule("?a <p1> ?b", 1.0)  # no head
    with pytest.raises(ValueError):
        parse_amie_rule("?a <p1> ?b ?b <p2> ?c ?c <p3> ?d => ?a <p4> ?d", 1.0)


def test_two_atom_chain_rule_hand_computed(spark):
    """p1(x,z) ∧ p2(z,y) ⇒ p3(x,y) at confidence 1.0 — exact expected set."""
    from kbgen_spark.models.rules import apply_horn_rules, parse_amie_rule

    t = _triples(
        spark,
        [
            ("a", "p1", "m"),
            ("b", "p1", "m"),
            ("m", "p2", "x"),
            ("m", "p2", "y"),
            ("q", "p2", "z"),
            ("a", "p3", "x"),  # pre-existing head: must not duplicate
        ],
    )
    rule = parse_amie_rule("?s <p1> ?m  ?m <p2> ?o => ?s <p3> ?o", 1.0)
    out = apply_horn_rules(t, [rule], seed=42)
    got = {(r["subj"], r["pred"], r["obj"]) for r in out.collect()}
    expected = {
        ("a", "p1", "m"),
        ("b", "p1", "m"),
        ("m", "p2", "x"),
        ("m", "p2", "y"),
        ("q", "p2", "z"),
        ("a", "p3", "x"),
        ("a", "p3", "y"),
        ("b", "p3", "x"),
        ("b", "p3", "y"),
    }
    assert got == expected
    assert out.count() == len(expected)  # anti-join deduped the existing head


def test_swapped_var_rule(spark):
    from kbgen_spark.models.rules import apply_horn_rules, parse_amie_rule

    t = _triples(spark, [("p", "parentOf", "c")])
    rule = parse_amie_rule("?b <parentOf> ?a => ?a <childOf> ?b", 1.0)
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in apply_horn_rules(t, [rule], seed=42).collect()
    }
    assert got == {("p", "parentOf", "c"), ("c", "childOf", "p")}


def test_zero_confidence_fires_nothing(spark):
    from kbgen_spark.models.rules import apply_horn_rules, parse_amie_rule

    t = _triples(spark, [("a", "p1", "b")])
    rule = parse_amie_rule("?x <p1> ?y => ?x <p2> ?y", 0.0)
    assert apply_horn_rules(t, [rule], seed=42).count() == 1


def test_rule_firing_deterministic(spark):
    from kbgen_spark.models.rules import apply_horn_rules, parse_amie_rule

    t = _triples(spark, [(f"e{i}", "p1", f"f{i}") for i in range(200)])
    rule = parse_amie_rule("?x <p1> ?y => ?x <p2> ?y", 0.5)
    n1 = apply_horn_rules(t, [rule], seed=42).count()
    n2 = apply_horn_rules(t, [rule], seed=42).count()
    assert n1 == n2
    # ~50% of 200 should fire; loose deterministic band
    assert 250 < n1 < 350


def test_parse_amie_tsv(spark, tmp_path):
    from kbgen_spark.models.rules import parse_amie_tsv

    p = tmp_path / "rules.tsv"
    p.write_text(
        "Rule\tHead Coverage\tStd Confidence\tPCA Confidence\n"
        "?a  <p1>  ?b   => ?a  <p2>  ?b\t0.4\t0.6\t0.9\n"
        "?a <p1> ?e  ?e <p2> ?b => ?a <p3> ?b\t0.2\t0.3\t0.7\n"
    )
    rules = parse_amie_tsv(spark, str(p), confidence_col="pca")
    assert len(rules) == 2
    assert rules[0].confidence == 0.9 and len(rules[0].body) == 1
    assert rules[1].confidence == 0.7 and len(rules[1].body) == 2
    std = parse_amie_tsv(spark, str(p), confidence_col="std")
    assert std[0].confidence == 0.6


def test_fast_path_equals_general_path_at_conf1(spark):
    """apply_rules (broadcast fast path) and apply_horn_rules (general
    evaluator) must agree whenever firing is certain (confidence 1.0 — the
    two paths use different firing-hash keys, so only the deterministic
    case is comparable)."""
    from kbgen_spark.models.rules import apply_horn_rules, apply_rules, parse_amie_rule

    t = _triples(
        spark, [(f"s{i}", "p1", f"o{i % 3}") for i in range(30)] + [("a", "px", "b")]
    )
    fast = apply_rules(
        t,
        spark.createDataFrame(
            [("p1", "p2", 1.0)], "body_pred string, head_pred string, confidence double"
        ),
        seed=42,
    )
    gen = apply_horn_rules(t, [parse_amie_rule("?x <p1> ?y => ?x <p2> ?y", 1.0)], seed=42)
    a = {(r["subj"], r["pred"], r["obj"]) for r in fast.collect()}
    b = {(r["subj"], r["pred"], r["obj"]) for r in gen.collect()}
    assert a == b


# ---------------------------------------------------------------------------
# Type-hierarchy rollup
# ---------------------------------------------------------------------------


def test_type_closure_dag(spark):
    from kbgen_spark.models.learn import type_closure

    h = spark.createDataFrame(
        [
            ("athlete", "person"),
            ("person", "agent"),
            ("org", "agent"),
            ("agent", "thing"),
            # diamond: politician under both person and role
            ("politician", "person"),
            ("politician", "role"),
        ],
        "type string, parent string",
    )
    c = {(r["type"], r["ancestor"]) for r in type_closure(h).collect()}
    assert ("athlete", "person") in c
    assert ("athlete", "agent") in c
    assert ("athlete", "thing") in c
    assert ("politician", "thing") in c
    assert ("politician", "role") in c
    assert ("org", "thing") in c
    # no self rows, no inversions
    assert ("person", "person") not in c
    assert ("agent", "person") not in c


def test_multitype_rollup(spark):
    from kbgen_spark.models.learn import multitypes

    types = spark.createDataFrame(
        [("e1", "athlete"), ("e2", "org")], "entity string, type string"
    )
    h = spark.createDataFrame(
        [("athlete", "person"), ("person", "agent"), ("org", "agent")],
        "type string, parent string",
    )
    flat = {r["entity"]: r["mt"] for r in multitypes(types).collect()}
    rolled = {r["entity"]: r["mt"] for r in multitypes(types, h).collect()}
    assert flat == {"e1": "athlete", "e2": "org"}
    assert rolled == {"e1": "agent|athlete|person", "e2": "agent|org"}


# ---------------------------------------------------------------------------
# Salted dense index == naive one-window index (same ordering contract)
# ---------------------------------------------------------------------------


def test_salted_dense_index_matches_naive(spark):
    from kbgen_spark.plans.skew import salted_dense_index

    rows = [("hot", f"e{i:04d}") for i in range(500)] + [
        ("cold", f"c{i}") for i in range(7)
    ]
    df = spark.createDataFrame(rows, "mt string, entity string")
    salted = salted_dense_index(df, ["mt"], ["entity"], idx_name="idx")

    # naive reference must use UNSIGNED hash order (the salted impl buckets
    # by top hash bits, i.e. unsigned order) — flip the sign bit to compare
    sign_flip = F.xxhash64("entity").bitwiseXOR(F.lit(-(2**63)))
    w = Window.partitionBy("mt").orderBy(sign_flip, "entity")
    naive = df.select("mt", "entity", (F.row_number().over(w) - 1).alias("idx"))

    a = {(r["mt"], r["entity"]): r["idx"] for r in salted.collect()}
    b = {(r["mt"], r["entity"]): r["idx"] for r in naive.collect()}
    assert a == b


def test_salted_dense_index_dense_range(spark):
    from kbgen_spark.plans.skew import salted_dense_index

    df = spark.createDataFrame(
        [("g", f"x{i}") for i in range(100)], "mt string, entity string"
    )
    idxs = sorted(
        r["idx"] for r in salted_dense_index(df, ["mt"], ["entity"]).collect()
    )
    assert idxs == list(range(100))


def test_no_unsalted_window_in_emit_plan(spark, tmp_path):
    """The emitter's index plan must not contain a window partitioned only by
    the (Zipfian) group key — explain-asserted like the asof no-BNL test."""
    from kbgen_spark.models.emit import _index_entities

    mts = spark.createDataFrame(
        [("t", f"e{i}") for i in range(50)], "mt string, entity string"
    )
    plan = _index_entities(mts)._jdf.queryExecution().executedPlan().toString()
    # every Window in the plan must partition by both the group AND the
    # salt bucket (_b); a bare partitionBy(mt) would read "partitionBy [mt#"
    for line in plan.splitlines():
        if "Window" in line and "row_number" in line:
            assert "_b" in line, f"unsalted window in emit index plan: {line}"


def test_no_global_window_in_ngram_plan(spark):
    """dedup_ngram_jaccard must not contain ANY window (the round-1 version
    ranked the whole vocabulary through a single-partition row_number) —
    the token order is now a sortable (df, tok) struct, windowless."""
    from kbgen_spark.operators.dedup import dedup_ngram_jaccard

    docs = spark.createDataFrame(
        [(i, f"tok{i} shared a b c") for i in range(20)], "doc_id long, text string"
    )
    plan = (
        dedup_ngram_jaccard(docs, 0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan, "window crept back into the ngram plan"


def test_ngram_positional_filter_still_exact(spark):
    """PPJoin positional filter must not drop qualifying pairs: exact
    hand-computed Jaccard on overlapping docs."""
    from kbgen_spark.operators.dedup import dedup_ngram_jaccard

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b c e"),   # jac(1,2) = 3/5 = 0.6
            (3, "x y z"),     # disjoint
            (4, "a b c d"),   # jac(1,4) = 1.0, jac(2,4) = 0.6
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["a"], r["b"]): round(r["jaccard"], 6)
        for r in dedup_ngram_jaccard(docs, 0.5).collect()
    }
    assert rows == {(1, 2): 0.6, (1, 4): 1.0, (2, 4): 0.6}


# ---------------------------------------------------------------------------
# ANN recall
# ---------------------------------------------------------------------------


def _recall(spark, emb, q, **ivf_kw):
    from kbgen_spark.operators.similarity import cosine_topk, ivf_topk

    exact = {(r["qid"], r["vec_id"]) for r in cosine_topk(emb, q, k=5).collect()}
    approx = {
        (r["qid"], r["vec_id"]) for r in ivf_topk(emb, q, k=5, **ivf_kw).collect()
    }
    return len(exact & approx) / len(exact)


def test_ivf_recall_weak_similarity_regime(spark):
    """recall@5 vs the exact path on the REAL embeddings fixture — which is
    a weak-similarity regime (top-5 neighbor cosine ≈ 0.30–0.36 vs
    background 0.00 ± 0.125, measured): per-bit LSH agreement is only
    ≈ 1 − θ/π ≈ 0.61, so NO bucketed scheme reaches 0.9 recall here without
    scanning most of the corpus — that is an information limit of the data,
    not the operator. What must hold, and is pinned (deterministic xxhash64
    hyperplanes → exact reproducibility):

    - multi-probe strictly beats single-probe (the probing mechanism works);
    - measured floors at the driver-entry config (nbits=6, probes=7 → 0.39)
      and the wider-bucket config (nbits=4, probes=5 → 0.61)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    r_single = _recall(spark, emb, q, nbits=6, probes=1)
    r_multi = _recall(spark, emb, q, nbits=6, probes=7)
    r_wide = _recall(spark, emb, q, nbits=4, probes=5)
    assert r_multi > r_single
    assert r_multi >= 0.35, f"nbits=6/probes=7 recall regressed: {r_multi:.3f}"
    assert r_wide >= 0.55, f"nbits=4/probes=5 recall regressed: {r_wide:.3f}"


def test_ivf_recall_clustered_regime(spark):
    """On CLUSTERED data — the regime IVF exists for (real embedding corpora
    have cluster structure) — the same machinery clears 0.9 recall@5 at the
    driver-entry config. Deterministic synthetic clusters: 8 axis-aligned
    centroids in 64-d, ±0.05 deterministic noise, so within-cluster cosine
    ≈ 0.99 and cross-cluster ≈ 0."""
    import numpy as np

    rng = np.random.RandomState(7)
    rows = []
    for i in range(400):
        c = i % 8
        v = np.zeros(64, dtype=np.float64)
        v[c * 8] = 1.0
        v += rng.uniform(-0.05, 0.05, 64)
        rows.append((i, [float(x) for x in v], c))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    r = _recall(spark, emb, q, nbits=6, probes=7)
    assert r >= 0.9, f"clustered-regime recall@5 = {r:.3f} < 0.9"


# ---------------------------------------------------------------------------
# Non-ASCII normalization parity (ADVICE: norm_surface \w divergence)
# ---------------------------------------------------------------------------


def test_norm_surface_non_ascii_parity(spark):
    import re

    from kbgen_spark.functions.text import norm_surface

    samples = ["Ångström!", "naïve, café", "東京 2024", "plain text.", "ß-über"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [r["n"] for r in df.select(norm_surface("s").alias("n")).collect()]
    expected = [
        re.sub(r"[^A-Za-z0-9_\s]", "", s, flags=re.ASCII).strip().lower()
        for s in samples
    ]
    assert got == expected


# ---------------------------------------------------------------------------
# P3 split
# ---------------------------------------------------------------------------


def test_split_type_assertions(spark):
    from kbgen_spark.operators.materialize import split_type_assertions

    t = _triples(
        spark,
        [("e1", "rdf:type", "person"), ("e1", "knows", "e2"), ("e2", "rdf:type", "org")],
    )
    typed, rels = split_type_assertions(t)
    assert typed.count() == 2 and rels.count() == 1
    assert {r["pred"] for r in typed.collect()} == {"rdf:type"}
    assert {r["pred"] for r in rels.collect()} == {"knows"}


# ---------------------------------------------------------------------------
# Resume fingerprint is content-tied (ADVICE: path-keyed resume bug)
# ---------------------------------------------------------------------------


def test_path_fingerprint_changes_with_content(tmp_path):
    from kbgen_spark.plans.lineage import path_fingerprint

    f = tmp_path / "data.parquet"
    f.write_bytes(b"aaaa")
    fp1 = path_fingerprint(str(f))
    assert path_fingerprint(str(f)) == fp1  # stable
    import os

    os.utime(f, ns=(1, 1))
    fp2 = path_fingerprint(str(f))
    assert fp2 != fp1  # mtime change invalidates
    f.write_bytes(b"bbbbbb")
    assert path_fingerprint(str(f)) not in (fp1, fp2)


def test_commit_invalidates_manifest_first(spark, tmp_path):
    """Re-commit must remove the old manifest before rewriting data, so a
    crash mid-rewrite cannot leave old-manifest + new-data."""
    import os

    from kbgen_spark.plans.lineage import MANIFEST, ParquetSnapshotStore

    store = ParquetSnapshotStore(str(tmp_path))
    df = spark.range(5).select(F.col("id").cast("string").alias("s"))
    store.commit(df, "stg", "abc", "fp1")
    assert store.load_manifest("stg", "abc") is not None

    # monkeypatch the write to fail AFTER manifest removal
    class Boom(Exception):
        pass

    orig_write = type(df.write).parquet
    try:
        import pyspark.sql.readwriter as rw

        def boom(self, *a, **k):
            raise Boom()

        rw.DataFrameWriter.parquet = boom
        with pytest.raises(Boom):
            store.commit(df, "stg", "abc", "fp2")
    finally:
        rw.DataFrameWriter.parquet = orig_write
    # old manifest must be GONE (stage will re-execute on resume) — never a
    # stale manifest over half-written data
    assert store.load_manifest("stg", "abc") is None
    assert not os.path.exists(store.manifest_path("stg", "abc") + ".tmp")
