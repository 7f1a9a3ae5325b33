"""U3 — triple-set precision/recall harness (SURVEY.md §2.7, §5.2;
BASELINE.json:2 "P/R ≥ 0.95 vs reference outputs")."""

from __future__ import annotations

from pyspark.sql import DataFrame


def prf(ours: DataFrame, ref: DataFrame) -> dict:
    """Set-semantics precision/recall/F1 on (subj, pred, obj)."""
    cols = ["subj", "pred", "obj"]
    a = ours.select(cols).distinct()
    b = ref.select(cols).distinct()
    inter = a.intersect(b).count()
    na, nb = a.count(), b.count()
    p = inter / na if na else 1.0
    r = inter / nb if nb else 1.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return {"precision": p, "recall": r, "f1": f1, "ours": na, "ref": nb, "inter": inter}
