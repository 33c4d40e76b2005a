"""Declarative corpus-curation pipeline — the end-to-end shape a
training-data run executes before sampling: exact dedup, language
filter, quality/repetition thresholds, per-source quota. Composes the
operator library (functions.dedup / textstats / webstats) into ONE
DataFrame plan: no driver loop, no intermediate materialization; the
whole filter chain is two shuffles (the dedup group-by and the quota
window) plus map-side Catalyst expressions.

Stage attribution is sequential (a doc dropped by dedup is not also
counted against quality), so `curation_report` reconciles exactly:
n_input = kept + sum(dropped per stage). The report is computed in the
SAME single pass (boolean flag columns -> one aggregation), not one
job per stage.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions import textstats, webstats


@dataclass(frozen=True)
class CurationRules:
    """Thresholds for curate()/curation_report(). None disables a rule.

    lang: keep docs whose `lang_col` equals this value
    min_tokens / max_tokens: token_count bounds (inclusive)
    min_quality: textstats.quality_score lower bound (inclusive)
    max_dup3: textstats.dup_ngram_frac(n=3) upper bound (inclusive)
    max_top2: textstats.top_ngram_frac(n=2) upper bound (inclusive)
    cap_per_source: per-`source_col` quota, kept by lowest doc_id
    """

    lang: str | None = None
    min_tokens: int | None = None
    max_tokens: int | None = None
    min_quality: float | None = None
    max_dup3: float | None = None
    max_top2: float | None = None
    cap_per_source: int | None = None
    text_col: str = "text"
    lang_col: str = "lang"
    source_col: str = "source"


def _flags(docs: DataFrame, rules: CurationRules) -> tuple[DataFrame, list[str]]:
    """docs + boolean pass/fail columns, all map-side except the dedup
    keeper join. _pass_dedup: the group's minimum doc_id keeps (exact
    text duplicate semantics, functions.dedup.drop_exact_dups twin,
    expressed as a min-over-window so it fuses into this plan)."""
    from pyspark.sql import Window

    t = rules.text_col
    w = Window.partitionBy(F.md5(F.col(t)))
    out = docs.withColumn("_pass_dedup", F.col("doc_id") == F.min("doc_id").over(w))
    checks = []
    if rules.lang is not None:
        checks.append(("lang", F.col(rules.lang_col) == F.lit(rules.lang)))
    tokc = textstats.token_count(t)
    if rules.min_tokens is not None or rules.max_tokens is not None:
        lo = F.lit(True) if rules.min_tokens is None else tokc >= rules.min_tokens
        hi = F.lit(True) if rules.max_tokens is None else tokc <= rules.max_tokens
        checks.append(("tokens", lo & hi))
    if rules.min_quality is not None:
        checks.append(("quality", textstats.quality_score(t) >= rules.min_quality))
    rep = F.lit(True)
    if rules.max_dup3 is not None:
        rep = rep & (textstats.dup_ngram_frac(t, 3) <= rules.max_dup3)
    if rules.max_top2 is not None:
        rep = rep & (textstats.top_ngram_frac(t, 2) <= rules.max_top2)
    if rules.max_dup3 is not None or rules.max_top2 is not None:
        checks.append(("repetition", rep))
    for name, cond in checks:
        out = out.withColumn(f"_pass_{name}", cond)
    return out, [n for n, _ in checks]


STAGE_ORDER = ("dedup", "lang", "tokens", "quality", "repetition", "cap")


def curate(docs: DataFrame, rules: CurationRules) -> DataFrame:
    """Kept rows (original columns) after every enabled rule, ended by
    the per-source quota. Deterministic: dedup keeps the lowest doc_id
    of each text group; the quota keeps the lowest doc_ids per source."""
    flagged, names = _flags(docs, rules)
    cond = F.col("_pass_dedup")
    for n in names:
        cond = cond & F.col(f"_pass_{n}")
    kept = flagged.filter(cond).select(*docs.columns)
    if rules.cap_per_source is not None:
        kept = webstats.cap_per_group(kept, rules.source_col, rules.cap_per_source)
    return kept


def curation_report(docs: DataFrame, rules: CurationRules) -> DataFrame:
    """Per-stage drop counts with SEQUENTIAL attribution, one pass:
    DataFrame(stage, dropped) plus an 'input'/'kept' row, where
    input = kept + sum(dropped). The cap stage's count is derived from
    the kept count before/after the quota (the only part needing the
    second shuffle the quota itself needs)."""
    flagged, names = _flags(docs, rules)
    aggs = [F.count("*").alias("input")]
    passed = F.col("_pass_dedup")
    aggs.append(F.sum((~F.col("_pass_dedup")).cast("long")).alias("drop_dedup"))
    for n in names:
        aggs.append(F.sum((passed & ~F.col(f"_pass_{n}")).cast("long")).alias(f"drop_{n}"))
        passed = passed & F.col(f"_pass_{n}")
    aggs.append(F.sum(passed.cast("long")).alias("pre_cap_kept"))
    row = flagged.agg(*aggs).collect()[0].asDict()
    kept = row["pre_cap_kept"]
    if rules.cap_per_source is not None:
        capped = curate(docs, rules).count()
        row["drop_cap"] = kept - capped
        kept = capped
    spark = docs.sparkSession
    out = [("input", row["input"])]
    out += [(f"drop_{s}", row[f"drop_{s}"]) for s in STAGE_ORDER if f"drop_{s}" in row]
    out.append(("kept", kept))
    return spark.createDataFrame(out, "stage string, n long")
