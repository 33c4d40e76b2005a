"""The reference's operator surface as Catalyst expressions.

Loaders (reference search.rs:32-123), filters Is/Not/Has/Hasnt
(search.rs:199-265), scorer More (search.rs:267-283), run conjunction
with score-sum (cli.rs:391-412) and the run cascade (cli.rs:465-500) —
all JVM-side; no Python in any of these paths.

`content-exec` (per-row subprocess, search.rs:125-154) is deliberately
NOT implemented: it is the per-row-process anti-pattern the north_rule
bans (SURVEY.md §2.2).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..tokenize import ascii_lower, ascii_lower_col


# ------------------------------------------------------------------ loaders
def content_path(url_col: str = "url") -> Column:
    """Full identity string (reference ContentPath, search.rs:62-77)."""
    return F.col(url_col)


def content_title(url_col: str = "url") -> Column:
    """Basename — the reference's default loader (search.rs:42-60)."""
    return F.substring_index(F.col(url_col), "/", -1)


def content_ext(url_col: str = "url") -> Column:
    """Extension, '' when none (search.rs:79-97)."""
    return F.regexp_extract(F.col(url_col), r"\.([^./\\?#]+)$", 1)


def content_text(text_col: str = "text") -> Column:
    return F.coalesce(F.col(text_col), F.lit(""))


LOADERS = {
    "content-path": content_path,
    "content-title": content_title,
    "content-ext": content_ext,
    "content-text": content_text,
}


# ------------------------------------------------------- filters & scorers
def _norm(c: Column, insensitive: bool) -> Column:
    return ascii_lower_col(c) if insensitive else c


def is_(content: Column, target: str, insensitive: bool = False) -> Column:
    # ASCII-only lowercase on BOTH sides (reference cli.rs:381-397
    # to_ascii_lowercase): 'É' must NOT fold to 'é', matching oracle.py:54-57
    t = ascii_lower(target) if insensitive else target
    return _norm(content, insensitive) == F.lit(t)


def not_(content: Column, target: str, insensitive: bool = False) -> Column:
    return ~is_(content, target, insensitive)


def has(content: Column, target: str, insensitive: bool = False) -> Column:
    t = ascii_lower(target) if insensitive else target
    return _norm(content, insensitive).contains(F.lit(t))


def hasnt(content: Column, target: str, insensitive: bool = False) -> Column:
    return ~has(content, target, insensitive)


def more_count(content: Column, target: str, insensitive: bool = False) -> Column:
    """1 + non-overlapping occurrences (reference More, search.rs:271-279),
    as pure length arithmetic — whole-stage-codegen friendly."""
    t = ascii_lower(target) if insensitive else target
    if not t:
        return F.lit(1.0)  # empty target: defined as 1.0 (oracle.py:45-47)
    c = _norm(content, insensitive)
    occurrences = (F.length(c) - F.length(F.replace(c, F.lit(t), F.lit("")))) / F.lit(len(t))
    return (F.lit(1.0) + occurrences).cast("double")


FILTERS = {"is": is_, "not": not_, "has": has, "hasnt": hasnt}


# ----------------------------------------------------------- runs & cascade
@dataclass
class ContentRun:
    """One lsearch run: a loader + ordered (op, target) pairs.

    Filter ops (is/not/has/hasnt) both gate the row AND add 1.0 to the
    run score when passing; 'more' adds 1 + occurrence count and never
    filters (score >= 1.0 always) — exactly cli.rs:391-412.
    """

    loader: str = "content-title"
    ops: list[tuple[str, str]] = field(default_factory=list)
    insensitive: bool = False

    def predicate(self, df_cols: dict[str, Column] | None = None) -> Column:
        c = LOADERS[self.loader]()
        pred = F.lit(True)
        for op, target in self.ops:
            if op in FILTERS:
                pred = pred & FILTERS[op](c, target, self.insensitive)
        return pred

    def score(self) -> Column:
        c = LOADERS[self.loader]()
        s = F.lit(0.0)
        for op, target in self.ops:
            if op == "more":
                s = s + more_count(c, target, self.insensitive)
            elif op in FILTERS:
                s = s + F.lit(1.0)  # passing filter contributes 1.0
        if not self.ops:
            s = F.lit(1.0)  # Pass scorer (search.rs:285-296)
        return s


def default_run() -> ContentRun:
    """The reference's implicit default run (Title + Pass) is
    case-INSENSITIVE (cli.rs:150, cli.rs:261), while runs opened by an
    explicit loader flag default to sensitive until `-i` (cli.rs:264,
    cli.rs:286-288) — SURVEY §2.2's quirk, preserved here."""
    return ContentRun(loader="content-title", ops=[], insensitive=True)


def cascade(df: DataFrame, runs: list[ContentRun], score_col: str = "score") -> DataFrame:
    """Chained runs: each filters the previous survivors; only the LAST
    run's score survives (reference drops prior scores, cli.rs:484).
    Catalyst fuses the whole chain into one scan + filter + project."""
    out = df
    for run in runs:
        out = out.filter(run.predicate())
    final = runs[-1] if runs else default_run()
    return out.withColumn(score_col, final.score())


def ranked(df: DataFrame, runs: list[ContentRun], id_col: str = "doc_id") -> DataFrame:
    """cascade + deterministic sort (score DESC, id ASC — SURVEY §2.6)."""
    return cascade(df, runs).orderBy(F.desc("score"), F.asc(id_col))
