"""Per-host / per-source operators for web-corpus curation — the
"limit documents per domain" and "domain-level quality" shapes a
Common-Crawl training pipeline runs before sampling.

All pure Catalyst: host extraction is a regexp over the url column,
group stats are one hash aggregation, and the per-group cap is one
window — the three standard shapes, each a single shuffle on the group
key. Skew note: a window partitions ALL of a host's rows into one task;
AQE splits oversized shuffle partitions for the aggregation but cannot
split a window partition, so a pathological mega-host bounds the cap's
task time — cap_per_group is therefore sized for the realistic
many-hosts regime (Common Crawl: ~10^8 hosts, heavy but not degenerate
tail), and the docstring's threshold variant is the escape hatch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..tokenize import tokens_col
from .textstats import quality_score


def url_host(url: Column | str = "url") -> Column:
    """Lowercased host of a URL: the authority component minus
    userinfo ('user@') and port (':8080'). Deterministic regexp —
    byte-identical across engines (the DuckDB oracle runs the same
    pattern) — rather than java.net.URI semantics. Scheme-less or
    malformed urls yield ''."""
    c = F.col(url) if isinstance(url, str) else url
    auth = F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    host = F.regexp_replace(F.regexp_replace(auth, r"^[^@]*@", ""), r":\d+$", "")
    return F.lower(host)


QUALITY_SCALE = 1_000_000_000


def group_stats(
    df: DataFrame, key: Column | str, text: str = "text", key_name: str = "host"
) -> DataFrame:
    """Per-group corpus stats: docs, total tokens, mean quality_score.
    ONE hash aggregation (partial map-side combine, AQE-coalesced);
    returns DataFrame(<key_name>, n_docs, n_tokens, avg_quality).

    avg_quality is order-independent: per-doc quality is fixed to 9
    decimals as an integer (round(q * 1e9) -> long) and the integers are
    summed, so the result is bit-identical under any partitioning /
    partial-agg combine order / engine — F.avg over doubles is not
    (float summation order varies with the shuffle), which at 6-dp
    rounding boundaries made the same corpus hash differently between
    runs and engines."""
    k = F.col(key) if isinstance(key, str) else key
    q9 = F.round(quality_score(text) * F.lit(float(QUALITY_SCALE)), 0).cast("long")
    return (
        df.groupBy(k.alias(key_name))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(tokens_col(text))).alias("n_tokens"),
            (F.sum(q9) / (F.count("*") * F.lit(float(QUALITY_SCALE)))).alias(
                "avg_quality"
            ),
        )
    )


SAMPLE_RESOLUTION = 1_000_000


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    key: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample: a row is kept iff
    pmod(xxhash64(<id_col>), RESOLUTION) < round(rate * RESOLUTION) for
    its stratum's rate. Purely map-side (no shuffle, no RNG state): the
    SAME ids are kept at any cluster size, any partitioning, any rerun
    — the property that makes a 10^12-doc sampling job resumable and
    its output reproducible. Strata absent from `rates` are dropped
    (rate 0). Rates are clamped to [0, 1]."""
    h = F.pmod(F.xxhash64(F.col(id_col)), F.lit(SAMPLE_RESOLUTION))
    thresholds = {
        k: int(round(max(0.0, min(1.0, r)) * SAMPLE_RESOLUTION))
        for k, r in rates.items()
    }
    if len(thresholds) <= 64:
        thr = F.create_map(
            *[x for k, t in sorted(thresholds.items()) for x in (F.lit(k), F.lit(t))]
        )
        return df.filter(h < F.coalesce(thr[F.col(key)], F.lit(0)))
    # high-cardinality strata (per-host rates over a web corpus can be
    # millions of keys): a literal map would explode the plan, so ship
    # the thresholds as a broadcast-joined relation instead
    tdf = df.sparkSession.createDataFrame(
        sorted(thresholds.items()), f"{key} string, _thr long"
    )
    return (
        df.join(F.broadcast(tdf), key)  # inner join: absent strata drop (rate 0)
        .filter(h < F.col("_thr"))
        .drop("_thr")
    )


def plan_mixture(
    stats: DataFrame | dict[str, int],
    weights: dict[str, float],
    token_budget: int,
    key_name: str = "source",
) -> dict[str, float]:
    """Per-stratum sampling rates that hit `token_budget` total tokens
    at the target mixture `weights` (normalized): rate_s = min(1,
    budget * w_s / tokens_s). Driver arithmetic over group_stats()
    output (or a {stratum: n_tokens} dict) — the stats relation is one
    row per stratum, tiny at any corpus size. A stratum too small for
    its target weight saturates at rate 1.0 (the standard
    under-represented-domain behavior; re-normalize externally if the
    budget must be exact)."""
    if isinstance(stats, dict):
        tokens = dict(stats)
    else:
        tokens = {r[key_name]: r["n_tokens"] for r in stats.collect()}
    wsum = sum(weights.values())
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    return {
        s: min(1.0, token_budget * (w / wsum) / max(tokens.get(s, 0), 1))
        for s, w in weights.items()
    }


def cap_per_group(
    df: DataFrame,
    key: Column | str,
    cap: int,
    order_by: list[Column] | None = None,
) -> DataFrame:
    """Keep at most `cap` rows per group, deterministically: rows are
    ranked within each group by `order_by` (default doc_id ASC — the
    stable choice; pass e.g. [quality_score('text').desc(), 'doc_id']
    to keep the best) and rows ranked > cap are dropped. ONE window
    (single shuffle on the group key). For corpora with a degenerate
    mega-group, pre-aggregate the cap-th order key per group
    (groupBy + sort_array(collect_list)[cap-1]) and broadcast-join the
    threshold instead — same result, skew-splittable aggregation."""
    k = F.col(key) if isinstance(key, str) else key
    order = order_by if order_by is not None else [F.col("doc_id").asc()]
    w = Window.partitionBy(k).orderBy(*order)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )
