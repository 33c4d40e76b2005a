"""HTML -> text extraction (the graft's `content-text` loader).

The reference's `content-text` reads raw file bytes as UTF-8
(reference search.rs:99-123); the web-page graft must strip HTML first.
One pure function (`extract_text_series`, vectorized pandas string ops)
is shared verbatim by BOTH the Spark Arrow UDF and the pure-Python
oracle, so extracted text is byte-identical per url by construction;
tests additionally verify Spark's Arrow batching changes nothing.

Rules (deterministic, order matters):
  1. decode UTF-8 (errors='replace' — the reference panics on invalid
     UTF-8, search.rs:115; we replace instead, documented divergence)
  2. drop <script>...</script> and <style>...</style> (case-insens, dotall)
  3. drop <!-- comments -->
  4. every remaining tag <...> -> single space (malformed trailing '<'
     without '>' is left in place — deterministic on both sides)
  5. fixed entity table, &amp; decoded last (single-pass semantics)
  6. collapse all whitespace runs to one space, strip ends
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_SCRIPT = r"(?is)<script\b[^>]*>.*?</script\s*>"
_STYLE = r"(?is)<style\b[^>]*>.*?</style\s*>"
_COMMENT = r"(?s)<!--.*?-->"
_TAG = r"<[^>]*>"
_WS = r"\s+"

# decoded in this exact order; &amp; last so '&amp;lt;' -> '&lt;' (text)
ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def extract_text_series(html: pd.Series) -> pd.Series:
    """bytes|str Series of HTML -> extracted-text str Series (vectorized)."""
    s = html.map(
        lambda b: b.decode("utf-8", errors="replace") if isinstance(b, (bytes, bytearray)) else ("" if b is None else b)
    )
    s = s.str.replace(_SCRIPT, " ", regex=True)
    s = s.str.replace(_STYLE, " ", regex=True)
    s = s.str.replace(_COMMENT, " ", regex=True)
    s = s.str.replace(_TAG, " ", regex=True)
    for ent, rep in ENTITIES:
        s = s.str.replace(ent, rep, regex=False)
    s = s.str.replace(_WS, " ", regex=True).str.strip()
    return s


def extract_text_py(html: bytes | str) -> str:
    """Single-value oracle twin — same code path via a 1-row Series."""
    return extract_text_series(pd.Series([html]))[0]


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return extract_text_series(html)


def extracted_text_col(html_col: str = "html", text_col: str = "text") -> Column:
    """Extraction with fallthrough: use `text` when `html` is null
    (input_hint allows pages rows that carry pre-extracted text only)."""
    return F.when(F.col(html_col).isNotNull(), extract_text_udf(F.col(html_col))).otherwise(F.col(text_col))
