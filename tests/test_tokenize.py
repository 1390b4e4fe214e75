"""The three tokenizer implementations must agree (FIXTURES.md §4 spec)."""
from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from colbert_live_spark.functions.tokenize import (
    py_tokenize, tokenize_expr, tokenize_udf,
)

CASES = [
    "Hello, World!",
    "a ab abc  a1 1 12",
    "UPPER lower MiXeD",
    "",
    "   ",
    "tab\tnewline\nmix 42x7",
    "trailing-punct!!!",
    "unicode café naïve",  # non-ascii letters are splitters under the spec
]


def test_py_tokenize_spec():
    assert py_tokenize("Hello, World!") == ["hello", "world"]
    assert py_tokenize("a ab 1 12") == ["ab", "12"]
    assert py_tokenize("") == []


def test_jvm_matches_python(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)], "i int, s string")
    got = {r.i: r.toks for r in
           df.select("i", tokenize_expr("s").alias("toks")).collect()}
    for i, s in enumerate(CASES):
        assert got[i] == py_tokenize(s), s


def test_udf_matches_python(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)], "i int, s string")
    got = {r.i: r.toks for r in
           df.select("i", tokenize_udf("s").alias("toks")).collect()}
    for i, s in enumerate(CASES):
        assert got[i] == py_tokenize(s), s


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii"), max_size=80))
def test_property_ascii_jvm_equivalence(s):
    # pure-python mirror of the JVM split (ascii only — NFC is identity)
    import re
    expect = [t for t in re.split(r"[^a-z0-9]+", s.lower()) if len(t) >= 2]
    assert py_tokenize(s) == expect


def test_corpus_tokenization_matches(documents):
    """Engine tokenizer vs oracle tokenizer on the real test corpus."""
    rows = documents.select("doc_id", "text",
                            tokenize_expr("text").alias("toks")).collect()
    for r in rows:
        assert r.toks == py_tokenize(r.text)
