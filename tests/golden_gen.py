"""Slow, obviously-correct single-process oracle for the KG pipeline
(FIXTURES.md §4): pandas + pure python only, NO Spark.

Independently re-implements the pipeline spec:
  mentions (greedy longest-match scan) → links (gazetteer top-1)
  → canonicalization (exact all-pairs char-bigram Jaccard + union-find)
  → triple assembly (doc / span scopes, gap + order constraints).

Inputs are the materialized fixture parquet files (docs-with-spans,
gazetteer, relation_patterns). The e2e test asserts the Spark pipeline's
triple set equals this oracle's exactly (P = R = 1.0 at fixture scale,
standing in for reference outputs until /root/reference is populated —
SURVEY.md §0/§5.3).
"""

from __future__ import annotations

import re

import pandas as pd

JACCARD_T = 0.5


def mentions_golden(docs: pd.DataFrame) -> pd.DataFrame:
    """docs: (doc_id, spans=list[dict]). Greedy longest-match scan; the max
    phrase length is DERIVED from the surface set (round 5 — surfaces of any
    token count), mirroring kbgen_spark.operators.extract.detect_mentions_py."""
    max_phrase = max(
        (s.count(" ") + 1 for s in mentions_golden.surface_set), default=1
    )
    rows = []
    for _, d in docs.iterrows():
        for span_idx, s in enumerate(d["spans"]):
            if s["kind"] != "text":
                continue
            toks = s["text"].split(" ") if s["text"] else []
            i = 0
            while i < len(toks):
                matched = 0
                for plen in range(min(max_phrase, len(toks) - i), 0, -1):
                    cand = " ".join(toks[i : i + plen])
                    if cand in mentions_golden.surface_set:
                        rows.append(
                            (d["doc_id"], span_idx, s["offset"], cand, i)
                        )
                        matched = plen
                        break
                i += matched if matched else 1
    return pd.DataFrame(
        rows, columns=["doc_id", "span_idx", "offset", "mention", "tok_start"]
    )


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def links_golden(mentions: pd.DataFrame, gaz: pd.DataFrame) -> pd.DataFrame:
    m = mentions.copy()
    # Explicit ASCII class + re.ASCII so \s matches exactly what Java's
    # regex does in kbgen_spark.functions.text.norm_surface (Python \w/\s
    # are Unicode by default, Java's are ASCII — keep in sync).
    m["nmention"] = (
        m["mention"]
        .str.replace(r"[^A-Za-z0-9_\s]", "", regex=True, flags=re.ASCII)
        .str.strip()
        .str.lower()
    )
    cand = m.merge(gaz, left_on="nmention", right_on="surface_form")
    cand["score"] = cand["prior"] * (
        1.0
        / (1.0 + cand.apply(lambda r: _lev(r["nmention"], r["surface_form"]), axis=1))
    )
    cand = cand.sort_values(
        ["doc_id", "span_idx", "tok_start", "score", "entity_id"],
        ascending=[True, True, True, False, True],
    )
    return cand.groupby(["doc_id", "span_idx", "tok_start"], as_index=False).first()


def _bigrams(s: str) -> set:
    return {s[i : i + 2] for i in range(len(s) - 1)} if len(s) >= 2 else {s}


def canon_map_golden(gaz: pd.DataFrame) -> pd.DataFrame:
    """exact all-pairs Jaccard ≥ τ → union-find → min entity per component."""
    surfaces = sorted(gaz["surface_form"].unique())
    parent = {s: s for s in surfaces}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for i, a in enumerate(surfaces):
        for b in surfaces[i + 1 :]:
            sa, sb = _bigrams(a), _bigrams(b)
            if len(sa & sb) / len(sa | sb) >= JACCARD_T:
                union(a, b)

    comp = pd.DataFrame(
        {"surface_form": surfaces, "component": [find(s) for s in surfaces]}
    )
    g = gaz.merge(comp, on="surface_form")
    canon = (
        g.sort_values(["component", "entity_id", "entity_type"])
        .groupby("component", as_index=False)
        .first()[["component", "entity_id", "entity_type"]]
        .rename(columns={"entity_id": "canon_id", "entity_type": "canon_type"})
    )
    m = g.merge(canon, on="component")[["entity_id", "canon_id", "canon_type"]]
    m = (
        m.sort_values(["entity_id", "canon_id", "canon_type"])
        .groupby("entity_id", as_index=False)
        .first()
    )
    return m


def triples_golden(
    links: pd.DataFrame, canon_map: pd.DataFrame, patterns: pd.DataFrame
) -> pd.DataFrame:
    lk = links.merge(canon_map, on="entity_id", how="left")
    lk["entity_c"] = lk["canon_id"].fillna(lk["entity_id"])
    lk["type_c"] = lk["canon_type"].fillna(lk["entity_type"])

    out = set()
    for _, p in patterns.iterrows():
        if p["scope"] == "doc":
            for doc_id, grp in lk.groupby("doc_id"):
                ents = grp[["entity_c", "type_c"]].drop_duplicates()
                subs = ents[ents["type_c"] == p["subj_type"]]["entity_c"]
                objs = ents[ents["type_c"] == p["obj_type"]]["entity_c"]
                for s in subs:
                    for o in objs:
                        if s != o:
                            out.add((s, p["pred"], o))
        else:
            for (doc_id, span_idx), grp in lk.groupby(["doc_id", "span_idx"]):
                rows = grp[["entity_c", "type_c", "tok_start"]].values
                for s_e, s_t, s_k in rows:
                    if s_t != p["subj_type"]:
                        continue
                    for o_e, o_t, o_k in rows:
                        if o_t != p["obj_type"] or s_e == o_e:
                            continue
                        if abs(s_k - o_k) > p["max_gap"]:
                            continue
                        if p["ordered"] and not (s_k < o_k):
                            continue
                        out.add((s_e, p["pred"], o_e))
    return pd.DataFrame(sorted(out), columns=["subj", "pred", "obj"])


def run_golden(
    docs: pd.DataFrame, gaz: pd.DataFrame, patterns: pd.DataFrame
) -> pd.DataFrame:
    mentions_golden.surface_set = set(gaz["surface_form"])
    m = mentions_golden(docs)
    lk = links_golden(m, gaz)
    cm = canon_map_golden(gaz)
    return triples_golden(lk, cm, patterns)
