"""The engine's single tokenizer spec, implemented three ways that must agree.

Spec (FIXTURES.md §4): lowercase → NFC normalize → split on ``[^a-z0-9]+`` →
drop empty and length-1 tokens. No stemming, no stopwords.

This is the analog of the reference's document/query encoder contract
(``colbert_live/models.py:17-29,92-106``): the *same* deterministic transform
must be applied to documents at index-build time and to queries at search
time, or scores are meaningless. The reference enforces this by routing both
through one ``Model``; we enforce it by routing both through this module and
asserting the three implementations agree in tests.

Implementations:

- :func:`tokenize_expr` — pure JVM Catalyst expression (whole-stage codegen,
  zero Python in the hot path). NFC is a no-op for ASCII; this is the default
  path and assumes NFC-normalized input (guaranteed by our corpus generator;
  Common-Crawl WET text is NFC in practice).
- :func:`tokenize_udf` — Arrow-vectorized pandas UDF that applies real NFC
  first; the full-fidelity path for arbitrary unicode. Never row-at-a-time.
- :func:`py_tokenize` — driver-side pure Python, used for query strings
  (tiny) and by the oracle scorer.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

_SPLIT_RE = re.compile(r"[^a-z0-9]+")

# DuckDB fragment computing the identical token list from a column named {col}
# (used by __spark_entry__.oracle_sql; DuckDB lambda syntax).
DUCKDB_TOKENIZE = (
    "list_filter(string_split_regex(lower({col}), '[^a-z0-9]+'),"
    " t -> length(t) >= 2)"
)


def py_tokenize(text: str) -> list[str]:
    """Reference tokenizer (oracle + query-side)."""
    text = unicodedata.normalize("NFC", text.lower())
    return [t for t in _SPLIT_RE.split(text) if len(t) >= 2]


def tokenize_expr(col: Column | str) -> Column:
    """JVM-only tokenizer: array<string> of tokens, codegen'd end to end."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda t: F.length(t) >= 2)


@F.pandas_udf(ArrayType(StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    """Arrow-vectorized tokenizer with true NFC normalization."""
    return texts.map(lambda t: py_tokenize(t) if t is not None else None)
