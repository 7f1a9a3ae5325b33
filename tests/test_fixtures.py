from __future__ import annotations

from pyspark.sql import functions as F

from kbgen_spark import fixtures as FX


def test_span_schema_and_invariants(docs):
    s = docs.select(F.explode("spans").alias("s"), "doc_id")
    bad = s.filter(
        (
            (F.col("s.kind") == "text")
            & (F.col("s.text").isNull() | F.col("s.media_ref").isNotNull())
        )
        | (
            (F.col("s.kind") != "text")
            & (F.col("s.media_ref").isNull() | F.col("s.text").isNotNull())
        )
    ).count()
    assert bad == 0
    non_mono = docs.select(
        F.expr(
            "forall(transform(sequence(1, size(spans)-1),"
            " i -> spans[i].offset > spans[i-1].offset), x -> x)"
        ).alias("ok")
    ).filter("not ok").count()
    assert non_mono == 0
    assert docs.filter(F.size("spans") < 1).count() == 0


def test_interleave_deterministic(flat_docs):
    a = FX.interleave_documents(flat_docs)
    b = FX.interleave_documents(flat_docs)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_media_kinds_present(docs):
    kinds = {
        r["kind"]
        for r in docs.select(F.explode("spans").alias("s"))
        .select(F.col("s.kind").alias("kind"))
        .distinct()
        .collect()
    }
    assert kinds == {"text", "image", "audio"}


def test_replication(docs):
    r = FX.replicate_documents(docs, 3)
    assert r.count() == docs.count() * 3
    assert r.select("doc_id").distinct().count() == docs.count() * 3


def test_gazetteer_properties(gazetteer):
    g = gazetteer.toPandas()
    # surface forms unique, entity ids well-formed, priors in (0, 1]
    assert g["surface_form"].is_unique
    assert g["entity_id"].str.match(r"^E\d{5}$").all()
    assert ((g["prior"] > 0) & (g["prior"] <= 1.0)).all()
    # plural near-duplicates share the entity of their base form
    base = g.set_index("surface_form")["entity_id"].to_dict()
    plurals = [s for s in base if s + "s" in base]
    assert plurals, "fixture must contain near-duplicate surface forms"
    for s in plurals:
        assert base[s] == base[s + "s"]
    # multi-token phrases present at every configured length (round 5:
    # 2..5-token surfaces so extract is exercised past the old bigram cap)
    assert (g["surface_form"].str.contains(" ")).sum() == FX.N_PHRASES
    n_toks = g["surface_form"].str.split(" ").str.len()
    for n, quota in FX.N_NGRAM_PHRASES.items():
        assert (n_toks == n).sum() == quota, f"{n}-token phrase quota"
