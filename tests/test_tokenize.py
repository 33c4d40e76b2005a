"""Tokenizer/normalizer: golden vectors + Spark-vs-Python identity."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lsearch_spark.tokenize import ascii_lower, ascii_lower_col, py_tokenize, tokens_col

GOLDEN = [
    ("Hello there!", ["hello", "there"]),
    ("", []),
    ("The QUICK-brown_fox 123", ["the", "quick", "brown", "fox", "123"]),
    # ASCII lowercase must NOT touch non-ASCII (reference cli.rs:385)
    ("Café Müller 中文 É", ["café", "müller", "中文", "É"]),  # É untouched by ASCII-lower
    ("a&b a<b x.y,z", ["a", "b", "a", "b", "x", "y", "z"]),
    ("  leading   spaces\t\ntabs  ", ["leading", "spaces", "tabs"]),
    ("don't stop", ["don", "t", "stop"]),
    ("100% of $5.00", ["100", "of", "5", "00"]),
]


def test_ascii_lower_golden():
    assert ascii_lower("ABC xyz É Ü 中") == "abc xyz É Ü 中"
    assert ascii_lower("MiXeD123!") == "mixed123!"


def test_py_tokenize_golden():
    for text, want in GOLDEN:
        assert py_tokenize(text) == want, text


def test_spark_tokenize_matches_python(spark):
    texts = [t for t, _ in GOLDEN] + [None]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}).astype(object))
    rows = df.select(tokens_col("text").alias("toks"), ascii_lower_col("text").alias("low")).collect()
    for (text, _), row in zip(GOLDEN, rows):
        assert row["toks"] == py_tokenize(text), text
        assert row["low"] == ascii_lower(text), text
    assert rows[-1]["toks"] == []  # null text -> []


def test_arrow_tokenize_matches_python_golden():
    from lsearch_spark.tokenize import arrow_tokenize

    texts = [t for t, _ in GOLDEN] + [None, "", "   ", "\x00\x7f", "ÉÜ中"]
    got = arrow_tokenize(texts)
    want = [py_tokenize(t) if isinstance(t, str) else [] for t in texts]
    assert got == want


@given(st.lists(st.text(max_size=60), max_size=40))
@settings(max_examples=300, deadline=None)
def test_arrow_tokenize_matches_python_random(texts):
    from lsearch_spark.tokenize import arrow_tokenize

    assert arrow_tokenize(texts) == [py_tokenize(t) for t in texts]
