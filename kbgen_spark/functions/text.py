"""Text expression helpers — all JVM-side Column expressions (no UDFs).

The reference normalizes surface forms with python string ops
[R kbgen/util_models.py]; here the same semantics are Catalyst expressions so
they stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization. Corpus text is single-space separated
    (verified against /root/testdata documents), so a plain split is exact."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def norm_surface(s: Column | str) -> Column:
    """Surface-form normalization: lower, trim, strip punctuation (F1).

    The character class is an EXPLICIT ASCII set — Java's ``\\w`` is
    ASCII-only by default while Python's is Unicode, so a bare ``[^\\w\\s]``
    here would silently diverge from the pure-python golden oracle on any
    non-ASCII surface form. Both sides (this expr and
    tests/golden_gen.py::norm_surface_py) use the same explicit class; a
    non-ASCII parity test pins it."""
    c = F.col(s) if isinstance(s, str) else s
    return F.lower(F.trim(F.regexp_replace(c, r"[^A-Za-z0-9_\s]", "")))


def char_ngrams(s: Column | str, n: int = 2) -> Column:
    """Character n-gram shingles as an array<string> — pure SQL, no Python.

    transform(sequence(...)) keeps shingling inside codegen; used as MinHash
    input for surface-form canonicalization (SURVEY.md §2.9 V3).
    Returns the whole string as a single shingle when len(s) < n.
    """
    c = F.col(s) if isinstance(s, str) else s
    return F.when(F.length(c) < n, F.array(c)).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.length(c) - n),
            lambda i: c.substr(i + 1, F.lit(n)),
        )
    )


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles over a token array (document-level MinHash dedup).

    For docs shorter than n tokens, the full joined text is the one shingle.
    """
    joined = F.array_join(toks, " ")
    return F.when(F.size(toks) < n, F.array(joined)).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    )
