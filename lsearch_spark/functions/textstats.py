"""Text-analysis operators for training-data pipelines — all JVM-side
Catalyst expressions (no Python in the hot path).

lang-ID (stopword-overlap heuristic), quality scoring (length/alpha/
punct/stopword ratios), token counting, document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..tokenize import tokens_col
from .util import bind

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "dans", "que", "pour", "vous", "ne"],
    "es": ["el", "los", "y", "es", "una", "en", "por", "con", "para", "del"],
}


def _toks(text: Column | str) -> Column:
    return tokens_col(text)


def token_count(text: Column | str = "text") -> Column:
    return F.size(_toks(text))


def n_chars(text: Column | str = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c)


def alpha_ratio(text: Column | str = "text") -> Column:
    """Letters / total chars (0.0 for empty)."""
    c = F.col(text) if isinstance(text, str) else text
    alpha = F.length(F.regexp_replace(c, "[^A-Za-z]", ""))
    return F.when(F.length(c) > 0, alpha / F.length(c)).otherwise(F.lit(0.0)).cast("double")


def punct_ratio(text: Column | str = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    punct = F.length(F.regexp_replace(c, "[^.,;:!?]", ""))
    return F.when(F.length(c) > 0, punct / F.length(c)).otherwise(F.lit(0.0)).cast("double")


def stopword_ratio(text: Column | str = "text", lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of `lang`. Tokens bound
    once (three unbound references tokenize three times per row)."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    # nested bind: the stopword array referenced from the per-token
    # filter lambda would otherwise be re-built once per token
    return bind(
        _toks(text),
        lambda ts: bind(
            sw,
            lambda s2: F.when(
                F.size(ts) > 0,
                F.size(F.filter(ts, lambda t: F.array_contains(s2, t))) / F.size(ts),
            ).otherwise(F.lit(0.0)),
        ),
    ).cast("double")


def quality_score(text: Column | str = "text") -> Column:
    """Deterministic [0,1] quality heuristic:
    0.25*min(1, tokens/200) + 0.25*alpha_ratio
    + 0.25*min(1, 5*en_stopword_ratio) + 0.25*(1 - min(1, 10*punct_ratio))
    """
    toks_term = F.least(F.lit(1.0), token_count(text) / F.lit(200.0))
    stop_term = F.least(F.lit(1.0), F.lit(5.0) * stopword_ratio(text, "en"))
    punct_term = F.lit(1.0) - F.least(F.lit(1.0), F.lit(10.0) * punct_ratio(text))
    return (
        F.lit(0.25) * toks_term
        + F.lit(0.25) * alpha_ratio(text)
        + F.lit(0.25) * stop_term
        + F.lit(0.25) * punct_term
    ).cast("double")


def lang_id(text: Column | str = "text") -> Column:
    """Stopword-overlap language guess over {en,de,fr,es}; 'und' when no
    stopword of any set occurs. Ties break by fixed order en,de,fr,es.
    The distinct token set is bound once — the score of every language
    references it, so unbound it would tokenize ~9x per row."""

    def _pick(ts: Column) -> Column:
        scores = {
            lang: F.size(F.array_intersect(ts, F.array(*[F.lit(w) for w in words])))
            for lang, words in STOPWORDS.items()
        }
        best = F.greatest(*scores.values())
        out = F.lit("und")
        for lang in reversed(list(STOPWORDS)):  # earlier langs win ties
            out = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(out)
        return out

    return bind(F.array_distinct(_toks(text)), _pick)


def _ngram_list(toks: Column, n: int) -> Column:
    """NON-distinct n-gram strings (dedup.ngram_set's distinct twin):
    repetition metrics need multiplicity. Tokens BOUND once (util.bind)
    — an unbound reference re-tokenizes per gram, O(len^2) per doc."""
    return bind(
        toks,
        lambda ts: F.when(
            F.size(ts) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(ts) - n),
                lambda i: F.concat_ws(" ", F.slice(ts, i + 1, n)),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )


def mean_token_len(text: Column | str = "text") -> Column:
    """Mean token length in chars (0.0 for token-less docs) — the
    Gopher-style 'mean word length' signal (healthy prose ~3-10)."""
    return bind(
        _toks(text),
        lambda ts: F.when(
            F.size(ts) > 0,
            F.aggregate(ts, F.lit(0), lambda a, t: a + F.length(t)) / F.size(ts),
        ).otherwise(F.lit(0.0)),
    ).cast("double")


def dup_ngram_frac(text: Column | str = "text", n: int = 3) -> Column:
    """Fraction of n-grams that are repeats of an earlier-seen gram
    ((total - distinct) / total; 0.0 when no n-grams) — the Gopher-style
    duplicate-n-gram repetition signal. Pure Catalyst array ops; the
    gram list is BOUND once (three unbound references would build it
    three times per row)."""
    return bind(
        _ngram_list(_toks(text), n),
        lambda gs: F.when(
            F.size(gs) > 0,
            (F.size(gs) - F.size(F.array_distinct(gs))) / F.size(gs),
        ).otherwise(F.lit(0.0)),
    ).cast("double")


def top_ngram_frac(text: Column | str = "text", n: int = 2) -> Column:
    """Occurrences of the single most frequent n-gram / total n-grams
    (0.0 when no n-grams) — the Gopher-style top-n-gram dominance
    signal. JVM-side O(t log t): sort the gram list (bound once), fold
    the longest equal run with an aggregate() accumulator — no per-row
    loop in Python, no explode/shuffle."""

    def _fold(gs: Column) -> Column:
        run_best = F.aggregate(
            gs,
            F.struct(
                F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
            ),
            lambda acc, g: F.struct(
                g.alias("prev"),
                F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
                F.greatest(
                    acc["best"],
                    F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
                ).alias("best"),
            ),
            lambda acc: acc["best"],
        )
        return F.when(F.size(gs) > 0, run_best / F.size(gs)).otherwise(F.lit(0.0))

    return bind(F.array_sort(_ngram_list(_toks(text), n)), _fold).cast("double")


# PII patterns, deliberately in the Java-regex ∩ RE2 common subset so
# the DuckDB oracle runs the IDENTICAL strings. Scrub order is fixed
# (url -> email -> ip): a URL can embed an email/ip, so later patterns
# run on already-scrubbed text; counts follow the same sequence.
PII_PATTERNS = (
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
)


def scrub_pii(text: Column | str = "text") -> Column:
    """Text with urls, emails, and IPv4 literals replaced by <URL> /
    <EMAIL> / <IP> placeholders — the standard pre-training scrub,
    pure JVM regexp_replace chain (no Python)."""
    c = F.col(text) if isinstance(text, str) else text
    for _, pat, rep in PII_PATTERNS:
        c = F.regexp_replace(c, pat, rep)
    return c


def pii_counts(text: Column | str = "text") -> dict[str, Column]:
    """{kind: count} of PII hits under the same sequential-scrub
    semantics as scrub_pii (an email inside a URL counts once, as the
    URL). Returns named Columns — select the ones you report."""
    c = F.col(text) if isinstance(text, str) else text
    out: dict[str, Column] = {}
    for kind, pat, rep in PII_PATTERNS:
        out[kind] = F.regexp_count(c, F.lit(pat)).alias(f"n_{kind}")
        c = F.regexp_replace(c, pat, rep)
    return out


def fingerprint(text: Column | str = "text") -> Column:
    """Content fingerprint over NORMALIZED tokens (md5 hex — portable to
    the DuckDB oracle), i.e. whitespace/case/punctuation-insensitive."""
    return F.md5(F.concat_ws(" ", _toks(text)))
