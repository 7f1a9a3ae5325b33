"""M3 — horn-rule application (SURVEY.md §2.3 J6; P §3.3).

kbgen's M3 parses AMIE rules and, during synthesis, fires each rule
``body_pred(x, y) ⇒ head_pred(x, y)`` on generated facts with probability =
rule confidence [R kbgen/rules/*].

Spark re-grounding: one pass per rule batch —
- broadcast-join facts against the (tiny) rule table on ``pred``;
- fire with a deterministic hash-uniform per (subj, obj, rule) — resumable;
- ``left_anti`` against existing facts so fired heads never duplicate
  (kbgen's "fact already exists" check, SURVEY §2.3 J7 / §2.7 U2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kbgen_spark.functions.hashing import det_uniform

RULE_SCHEMA = "body_pred string, head_pred string, confidence double"


def apply_rules(triples: DataFrame, rules: DataFrame, seed: int = 42) -> DataFrame:
    """triples ∪ {(s, head, o) : (s, body, o) ∈ triples, u(s,o,rule) < conf}."""
    fired = (
        triples.join(
            F.broadcast(rules), triples["pred"] == rules["body_pred"], "inner"
        )
        .filter(
            det_uniform("subj", "obj", "body_pred", "head_pred", seed=seed + 13)
            < F.col("confidence")
        )
        .select("subj", F.col("head_pred").alias("pred"), "obj")
    )
    new_heads = fired.join(triples, ["subj", "pred", "obj"], "left_anti").distinct()
    return triples.unionByName(new_heads)
