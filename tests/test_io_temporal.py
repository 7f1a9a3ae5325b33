"""S1/S5 N-Triples round-trip and J8 as-of join semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from kbgen_spark.io import read_ntriples, write_ntriples
from kbgen_spark.operators.temporal import asof_join


def test_ntriples_roundtrip(spark, tmp_path):
    triples = spark.createDataFrame(
        [("s1", "p1", "o1"), ("s2", "p2", "o2"), ("s1", "p2", "o1")],
        "subj string, pred string, obj string",
    )
    path = str(tmp_path / "kb_nt")
    write_ntriples(triples, path, base_uri="http://kb/")
    back = read_ntriples(spark, path).select(
        F.regexp_replace("subj", "^http://kb/", "").alias("subj"),
        F.regexp_replace("pred", "^http://kb/", "").alias("pred"),
        F.regexp_replace("obj", "^http://kb/", "").alias("obj"),
    )
    assert back.exceptAll(triples).count() == 0
    assert triples.exceptAll(back).count() == 0


def test_ntriples_parses_literals_and_skips_garbage(spark, tmp_path):
    lines = [
        '<http://kb/s> <http://kb/p> <http://kb/o> .',
        '<http://kb/s> <http://kb/name> "Alice \\"A\\"" .',
        '# a comment line',
        '',
        'malformed junk',
    ]
    p = tmp_path / "mixed.nt"
    p.write_text("\n".join(lines))
    out = read_ntriples(spark, str(p)).collect()
    assert len(out) == 2
    lit = [r for r in out if r["is_literal"]][0]
    assert lit["obj"] == 'Alice \\"A\\"'
    uri = [r for r in out if not r["is_literal"]][0]
    assert uri["obj"] == "http://kb/o"


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, "u1", 10), (2, "u1", 20), (3, "u1", 5), (4, "u2", 15)],
        "event_id int, user_id string, ts int",
    )
    right = spark.createDataFrame(
        [("u1", 10, 100.0), ("u1", 15, 150.0), ("u2", 99, 999.0)],
        "user_id string, ts int, val double",
    )
    out = {
        r["event_id"]: r["val_r"]
        for r in asof_join(left, right, on="user_id", ts="ts").collect()
    }
    # event 1 at ts=10: right at ts=10 qualifies (ties included)
    assert out[1] == 100.0
    # event 2 at ts=20: latest prior right is ts=15
    assert out[2] == 150.0
    # event 3 at ts=5: no prior right → NULL
    assert out[3] is None
    # u2 at ts=15: right row at 99 is in the future → NULL
    assert out[4] is None


def test_asof_join_plan_has_no_nested_loop(spark):
    left = spark.createDataFrame([(1, "u", 1)], "event_id int, user_id string, ts int")
    right = spark.createDataFrame([("u", 1, 1.0)], "user_id string, ts int, val double")
    plan = asof_join(left, right, on="user_id", ts="ts")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
