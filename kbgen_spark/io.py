"""Sources & sinks (SURVEY.md §2.1).

- S1: N-Triples scan — the reference parses ``.nt`` via rdflib into an
  (s, p, o) iterator [R load_tensor.py]; here it is ``spark.read.text`` +
  one ``regexp_extract`` per column (codegen, parallel over file splits,
  no rdflib dependency).
- S5: N-Triples sink — reference serializes an rdflib Graph
  [R generate_model.py]; here ``concat_ws`` + ``write.text``.
  (The partitioned parquet triple sink lives in operators/materialize.py.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# <subject> <predicate> <object-uri> .   |   <s> <p> "literal" .
_NT_RE = r"^\s*<([^>]*)>\s+<([^>]*)>\s+(?:<([^>]*)>|\"((?:[^\"\\]|\\.)*)\")\s*\.\s*$"


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """.nt text → (subj, pred, obj, is_literal). Malformed lines are dropped
    (same behavior as a tolerant rdflib parse); comments/blank lines too."""
    raw = spark.read.text(path)
    parsed = raw.select(
        F.regexp_extract("value", _NT_RE, 1).alias("subj"),
        F.regexp_extract("value", _NT_RE, 2).alias("pred"),
        F.regexp_extract("value", _NT_RE, 3).alias("obj_uri"),
        F.regexp_extract("value", _NT_RE, 4).alias("obj_lit"),
    ).filter((F.col("subj") != "") & (F.col("pred") != ""))
    return parsed.select(
        "subj",
        "pred",
        F.when(F.col("obj_uri") != "", F.col("obj_uri"))
        .otherwise(F.col("obj_lit"))
        .alias("obj"),
        (F.col("obj_uri") == "").alias("is_literal"),
    )


def write_ntriples(triples: DataFrame, path: str, base_uri: str = "http://kb/") -> None:
    """(subj, pred, obj) → .nt text files (one line per triple)."""
    from kbgen_spark.operators.materialize import triples_to_ntriples

    triples_to_ntriples(triples, base_uri).write.mode("overwrite").text(path)
