"""HTML extraction: byte-identity per url (Spark Arrow UDF vs oracle)."""

from pyspark.sql import functions as F

from lsearch_spark.corpus import make_pages, pages_df
from lsearch_spark.extract import extract_text_py, extract_text_udf


def test_corpus_html_roundtrips_to_text():
    """extract(html) == text for every corpus row (FIXTURES invariant)."""
    pdf = make_pages(120)
    for _, r in pdf.iterrows():
        assert extract_text_py(r["html"]) == r["text"], r["url"]


def test_extract_golden_cases():
    assert extract_text_py(b"<p>Hello <b>world</b></p>") == "Hello world"
    assert extract_text_py(b"<script>var x = '<p>no</p>';</script>yes") == "yes"
    assert extract_text_py(b"<style>p{}</style>a<!-- c -->b") == "a b"
    assert extract_text_py(b"a &amp;&lt;tag&gt; b &amp;amp;") == "a &<tag> b &amp;"
    assert extract_text_py(b"  lots \n of \t space ") == "lots of space"
    assert extract_text_py(b"") == ""
    assert extract_text_py("Caf\xe9 中文".encode()) == "Café 中文"
    assert extract_text_py(b"\xff\xfe broken") == "�� broken"


def test_spark_extraction_byte_identical(spark):
    """The Arrow-batched UDF must equal the oracle byte-for-byte per url."""
    df = pages_df(spark, 120)
    got = {
        r["url"]: r["ext"]
        for r in df.select("url", extract_text_udf(F.col("html")).alias("ext")).collect()
    }
    pdf = make_pages(120)
    for _, r in pdf.iterrows():
        assert got[r["url"]] == extract_text_py(r["html"]) == r["text"], r["url"]
