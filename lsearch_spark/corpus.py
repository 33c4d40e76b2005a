"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

pages(doc_id, url, warc_ts, html, text, lang) with seed-fixed content:
Zipf vocabulary (~5k terms), hot stopword-like terms in >80% of docs
(exercises salting), planted query terms with controlled df, mixed case
(exercises ASCII-lowercase), HTML built by escaping `text` and wrapping
it in tags/script/style/comment junk so that
``extract_text(html) == text`` exactly (the byte-identity invariant).

Edge rows always appended: empty text; max-tf doc; all-query-terms doc;
non-ASCII doc (é ü 中 must pass through ASCII-lowercase untouched); two
identical docs (deterministic tie-break score DESC, doc_id ASC).

No wall-clock, no external data: warc_ts = 2024-01-01T00:00:00Z + i*37s.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

HOT_TERMS = ["the", "and", "of"]
PLANTED = [
    "biology", "chemistry", "physics", "quantum", "neural",
    "spark", "index", "query", "tokyo", "glacier",
]
RARE_TERM = "zyzzyva"  # exactly one doc
ABSENT_TERM = "absentterm"  # zero docs

EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
CATEGORIES = ["news", "blog", "docs", "shop", "wiki"]


def _vocab() -> list[str]:
    return HOT_TERMS + PLANTED + [f"w{i:04d}" for i in range(5000 - len(HOT_TERMS) - len(PLANTED))]


def _escape(text: str) -> str:
    return text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _html_of(text: str, i: int, rng: np.random.RandomState) -> bytes:
    words = text.split(" ") if text else []
    # title consumes the first words (extraction sees each word once)
    title = _escape(" ".join(words[:3]))
    chunks: list[str] = []
    pos = 3 if len(words) > 3 else len(words)
    while pos < len(words):
        step = int(rng.randint(5, 40))
        chunks.append(_escape(" ".join(words[pos : pos + step])))
        pos += step
    junk = [
        "<script type='text/javascript'>var x = 1 && 2; document.write('<p>junk</p>');</script>",
        "<style>p { color: red; }\n.hidden { display:none }</style>",
        "<!-- comment\n spanning lines -->",
        "<img src='x.png' alt='pic'>",
        "<br/>",
        "<div class='a b'>",
        "</div>",
    ]
    body = []
    for j, ch in enumerate(chunks):
        body.append(f"<p id='c{j}'>{ch}</p>")
        if rng.rand() < 0.4:
            body.append(junk[int(rng.randint(0, len(junk)))])
    # occasional malformed-but-closed tag noise (stays deterministic)
    if i % 13 == 0:
        body.append("<malformed attr=>")
    html = (
        "<html>\n<head><title>"
        + title
        + "</title>\n<script>if (a < b) { go(); }</script></head>\n<body>\n"
        + "\n  ".join(body)
        + "\n</body></html>"
    )
    return html.encode("utf-8")


def _doc_text(rng: np.random.RandomState, vocab: np.ndarray, n_tokens: int) -> str:
    # Zipf over the vocab: ranks 0..2 are hot stopword-like terms.
    ranks = rng.zipf(1.25, size=n_tokens) - 1
    ranks = np.clip(ranks, 0, len(vocab) - 1)
    toks = vocab[ranks].tolist()
    out = []
    for t in toks:
        r = rng.rand()
        if r < 0.06:
            t = t.capitalize()
        elif r < 0.08:
            t = t.upper()
        if rng.rand() < 0.04:
            t = t + ("," if rng.rand() < 0.6 else ".")
        out.append(t)
        if rng.rand() < 0.01:
            out.append("&" if rng.rand() < 0.5 else "a<b")
    return " ".join(out)


def make_pages(n: int, seed: int = 42) -> pd.DataFrame:
    """n regular rows + 6 fixed edge rows."""
    rng = np.random.RandomState(seed)
    vocab = np.array(_vocab())
    rows = []
    for i in range(n):
        n_tokens = int(np.clip(rng.lognormal(4.2, 0.7), 10, 800))
        text = _doc_text(rng, vocab, n_tokens)
        words = text.split(" ")
        # planted terms with controlled df
        for j, term in enumerate(PLANTED):
            period = 8 * (j + 1)  # biology ~1/8 docs ... glacier ~1/80
            if i % period == j:
                words.insert(int(rng.randint(0, len(words) + 1)), term)
        if i == 7:
            words.insert(0, RARE_TERM)
        text = " ".join(words)
        rows.append(text)

    edge = [
        "",  # empty text
        " ".join(["spark"] * 1000),  # max-tf
        " ".join(PLANTED + HOT_TERMS + [RARE_TERM]),  # every query term
        "Café Müller 中文 résumé biology Über É",  # non-ASCII passthrough
        "tiebreak quantum flux common signal",  # tie pair (identical text)
        "tiebreak quantum flux common signal",
    ]
    texts = rows + edge
    recs = []
    rng2 = np.random.RandomState(seed + 1)
    langs = ["en"] * 8 + ["de", "fr", ""]
    for i, text in enumerate(texts):
        cat = CATEGORIES[i % len(CATEGORIES)]
        url = f"https://site{i % 97}.example/{cat}/page-{i}.html"
        recs.append(
            {
                "doc_id": i,
                "url": url,
                "warc_ts": EPOCH + dt.timedelta(seconds=37 * i),
                "html": _html_of(text, i, rng2),
                "text": text,
                "lang": langs[i % len(langs)],
            }
        )
    return pd.DataFrame(recs)


def pages_df(spark, n: int, seed: int = 42):
    """Spark DataFrame with the authoritative input_hint schema + doc_id."""
    pdf = make_pages(n, seed)
    schema = "doc_id long, url string, warc_ts timestamp, html binary, text string, lang string"
    return spark.createDataFrame(pdf, schema=schema)


# Reference query set (FIXTURES.md §2): 1-4 terms; '-term' = exclusion
# (hasnt semantics); mixed case exercises normalization.
QUERIES: list[dict] = [
    {"query_id": 1, "query": "biology", "k": 10},
    {"query_id": 2, "query": "the", "k": 10},
    {"query_id": 3, "query": "zyzzyva", "k": 10},
    {"query_id": 4, "query": "absentterm", "k": 10},
    {"query_id": 5, "query": "biology chemistry", "k": 10},
    {"query_id": 6, "query": "quantum neural spark", "k": 10},
    {"query_id": 7, "query": "BIOLOGY", "k": 10},
    {"query_id": 8, "query": "Quantum FLUX", "k": 10},
    {"query_id": 9, "query": "index query", "k": 10},
    {"query_id": 10, "query": "tokyo glacier", "k": 10},
    {"query_id": 11, "query": "biology -chemistry", "k": 10},
    {"query_id": 12, "query": "the -biology", "k": 10},
    {"query_id": 13, "query": "spark index query neural", "k": 10},
    {"query_id": 14, "query": "tiebreak", "k": 10},
    {"query_id": 15, "query": "quantum", "k": 10},
    {"query_id": 16, "query": "glacier", "k": 10},
    {"query_id": 17, "query": "w0001 w0002", "k": 10},
    {"query_id": 18, "query": "of and", "k": 10},
    {"query_id": 19, "query": "中文", "k": 10},
    {"query_id": 20, "query": "café", "k": 10},
    {"query_id": 21, "query": "physics -the", "k": 10},
    {"query_id": 22, "query": "w0003", "k": 10},
    {"query_id": 23, "query": "neural biology physics", "k": 10},
    {"query_id": 24, "query": "spark spark", "k": 10},
    {"query_id": 25, "query": "absentterm biology", "k": 10},
]
