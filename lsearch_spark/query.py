"""BM25 top-k retrieval over the compressed index.

Generalizes the reference's query side (Has filter -> posting-list
membership; More occurrence scorer -> BM25 tf-idf, reference
search.rs:233-283) with the deterministic tie-break (score DESC,
doc_id ASC) required by the north_rule.

Query syntax: whitespace-separated terms, '-term' = exclusion (the
reference's Hasnt, search.rs:250-265, as a LEFT ANTI join).

Two execution paths, equivalence-tested against each other and the
pure-Python oracle:
  - exhaustive: decode every matching block, score, groupBy, top-k.
  - block-max pruned (prune=True): a distributed 3-phase variant of
    block-max WAND. Phase 1 exactly scores a small candidate set (top
    blocks per term by block_max_wand) giving a LOWER bound tau of the
    k-th best true score (partial scores underestimate). Phase 2 prunes
    every block whose best-possible doc score
    idf_t*block_max_wand + sum(UB_t') < tau, then scores the kept
    blocks exactly. A top-k doc's blocks can never be pruned (its true
    score >= tau implies every containing block's bound >= tau), so
    top-k ids AND scores are exact; proof sketch in comments below.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import B, K1
from .build import Warehouse
from .codec import decode_ids_signed, decode_positions_flat, varint_decode
from .oracle import parse_query
from .tokenize import py_tokenize

RESULT_SCHEMA = "doc_id long, score double"
DECODED_SCHEMA = "term string, doc_id long, tf int, doc_len int"

# per-warehouse session cache: config + corpus stats + memoized term->bucket
# (repeated searches skip 2 parquet reads and the bucket-hash job)
_WH_CACHE: dict[str, dict] = {}


def _wh_state(spark: SparkSession, wh: Warehouse) -> dict:
    st = _WH_CACHE.get(wh.root)
    if st is None:
        cfg = wh.read_manifest("config")
        if not cfg:
            raise FileNotFoundError(f"no config manifest under {wh.root}")
        st = {
            "cfg": cfg,
            "stats": wh.corpus_stats(spark),
            "buckets": {},
            "dfs": {},  # per-term document frequency (scale-safe memo:
            # only queried terms, never the full term_stats table)
            "postings_rel": spark.read.parquet(wh.path("postings")),  # keeps
            # the FileIndex warm across queries (re-listing bucket dirs per
            # query is pure metadata overhead)
            "term_stats_rel": spark.read.parquet(wh.path("term_stats")),
        }
        _WH_CACHE[wh.root] = st
    return st


def _term_dfs(spark, st: dict, terms: list[str]) -> dict[str, int]:
    missing = [t for t in terms if t not in st["dfs"]]
    if missing:
        rows = st["term_stats_rel"].filter(F.col("term").isin(missing)).select("term", "df").collect()
        found = {r["term"]: int(r["df"]) for r in rows}
        for t in missing:
            st["dfs"][t] = found.get(t)  # None = not in corpus (memoized too)
    return {t: st["dfs"][t] for t in terms if st["dfs"][t] is not None}


def invalidate_cache(root: str | None = None) -> None:
    if root is None:
        _WH_CACHE.clear()
    else:
        _WH_CACHE.pop(root, None)


def _term_buckets(spark: SparkSession, st: dict, terms: list[str]) -> dict[str, int]:
    """xxhash64 bucket per term, via one tiny JVM job; memoized."""
    missing = [t for t in terms if t not in st["buckets"]]
    if missing:
        n_buckets = int(st["cfg"]["n_buckets"])
        df = spark.createDataFrame([(t,) for t in missing], "term string")
        rows = df.select("term", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int").alias("b")).collect()
        st["buckets"].update({r["term"]: r["b"] for r in rows})
    return {t: st["buckets"][t] for t in terms}


def _postings_for(spark, wh: Warehouse, st: dict, terms: list[str]) -> DataFrame:
    """Partition-pruned block scan for the given terms (bucket dirs are
    Hive partitions -> only the needed shards are read)."""
    buckets = sorted(set(_term_buckets(spark, st, terms).values()))
    return st["postings_rel"].filter(F.col("bucket").isin(buckets) & F.col("term").isin(terms))


def _decode_blocks(blocks: DataFrame) -> DataFrame:
    """Compressed blocks -> (term, doc_id, tf, doc_len), decoded with
    whole-batch numpy passes: varint streams concatenate losslessly, so
    ALL blocks in an Arrow batch decode in one call; per-block delta
    resets are restored with a segmented cumsum (no per-block python)."""
    from .codec import u64_to_i64_order

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            nd = pdf["n_docs"].to_numpy().astype(np.int64)
            gaps = varint_decode(b"".join(bytes(x) for x in pdf["doc_ids"]))
            offs = np.concatenate(([0], np.cumsum(nd)))
            starts = offs[:-1]
            csum = np.cumsum(gaps, dtype=np.uint64)
            base = csum[starts] - gaps[starts]
            ids = u64_to_i64_order(csum - np.repeat(base, nd))
            tfs = varint_decode(b"".join(bytes(x) for x in pdf["tfs"]))
            dls = varint_decode(b"".join(bytes(x) for x in pdf["doc_lens"]))
            yield pd.DataFrame(
                {
                    "term": np.repeat(pdf["term"].to_numpy(), nd),
                    "doc_id": ids.astype(np.int64),
                    "tf": tfs.astype(np.int32),
                    "doc_len": dls.astype(np.int32),
                }
            )

    return blocks.select("term", "n_docs", "doc_ids", "tfs", "doc_lens").mapInPandas(it, DECODED_SCHEMA)


def _idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def _score_decoded(decoded: DataFrame, idf_map: dict[str, float], avgdl: float) -> DataFrame:
    """JVM-side BM25 per (term, doc): idf comes in as a tiny literal map."""
    pairs = []
    for t, v in idf_map.items():
        pairs += [F.lit(t), F.lit(float(v))]
    idf_col = F.create_map(*pairs)[F.col("term")] if pairs else F.lit(0.0)
    denom = F.col("tf") + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * F.col("doc_len") / F.lit(max(avgdl, 1e-9)))
    return decoded.withColumn("tscore", idf_col * F.col("tf") * F.lit(K1 + 1.0) / denom)


def _neg_docs(spark, wh, st, neg: list[str]) -> DataFrame | None:
    if not neg:
        return None
    return _decode_blocks(_postings_for(spark, wh, st, neg)).select("doc_id").distinct()


def _agg_topk(scored: DataFrame, n_terms: int, mode: str, neg_docs: DataFrame | None, k: int) -> DataFrame:
    agg = scored.groupBy("doc_id").agg(
        F.sum("tscore").alias("score"), F.count("*").alias("n_terms_hit")
    )
    if mode == "and":
        agg = agg.filter(F.col("n_terms_hit") == n_terms)
    if neg_docs is not None:
        agg = agg.join(neg_docs, "doc_id", "left_anti")
    # TakeOrderedAndProject: per-partition heap + driver merge, no global sort
    return agg.select("doc_id", "score").orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def search(
    spark: SparkSession,
    warehouse: str | Warehouse,
    query: str,
    k: int = 10,
    mode: str = "or",
    prune: bool = False,
    with_url: bool = False,
    candidate_blocks_per_term: int = 4,
) -> DataFrame:
    """BM25 top-k. Returns DataFrame(doc_id, score[, url]) already ordered
    (score DESC, doc_id ASC) and limited to k."""
    wh = warehouse if isinstance(warehouse, Warehouse) else Warehouse(warehouse)
    st = _wh_state(spark, wh)
    pos, neg, less = parse_query(query)
    empty = spark.createDataFrame([], RESULT_SCHEMA)
    if not pos:
        return empty

    stats = st["stats"]
    n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"])
    _term_buckets(spark, st, pos + neg + less)  # one hash job for all terms
    dfs = _term_dfs(spark, st, pos + less)
    live = [t for t in pos if t in dfs]
    live_less = [t for t in less if t in dfs]
    if not live or (mode == "and" and len(live) < len(pos)):
        return empty
    idf_map = {t: _idf(n_docs, dfs[t]) for t in live}

    blocks = _postings_for(spark, wh, st, live)
    neg_docs = _neg_docs(spark, wh, st, neg)

    if prune and not live_less:
        # less-terms subtract score, so block upper bounds would no longer
        # bound totals from above cheaply -> exhaustive path when present
        topk = _search_pruned(spark, blocks, idf_map, avgdl, live, mode, neg_docs, k, candidate_blocks_per_term)
    else:
        scored = _score_decoded(_decode_blocks(blocks), idf_map, avgdl)
        if live_less:
            less_idf = {t: _idf(n_docs, dfs[t]) for t in live_less}
            less_scored = _score_decoded(
                _decode_blocks(_postings_for(spark, wh, st, live_less)), less_idf, avgdl
            )
            penalties = less_scored.groupBy("doc_id").agg(F.sum("tscore").alias("penalty"))
            agg = scored.groupBy("doc_id").agg(
                F.sum("tscore").alias("score"), F.count("*").alias("n_terms_hit")
            )
            if mode == "and":
                agg = agg.filter(F.col("n_terms_hit") == len(live))
            if neg_docs is not None:
                agg = agg.join(neg_docs, "doc_id", "left_anti")
            agg = agg.join(penalties, "doc_id", "left").withColumn(
                "score", F.col("score") - F.coalesce(F.col("penalty"), F.lit(0.0))
            )
            topk = agg.select("doc_id", "score").orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        else:
            topk = _agg_topk(scored, len(live), mode, neg_docs, k)

    if with_url:
        docs = spark.read.parquet(wh.path("docs")).select("doc_id", "url")
        topk = (
            F.broadcast(topk).join(docs, "doc_id")
            .select("doc_id", "score", "url")
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )
    return topk


DECODED_POS_SCHEMA = "term string, doc_id long, tf int, doc_len int, positions array<int>"


def _decode_blocks_with_positions(blocks: DataFrame) -> DataFrame:
    """Like _decode_blocks but also restores per-doc position lists
    (vectorized segmented cumsum, no per-doc python loop)."""

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for term, ids_b, tfs_b, dls_b, pos_b in zip(
                pdf["term"], pdf["doc_ids"], pdf["tfs"], pdf["doc_lens"], pdf["positions"]
            ):
                ids = decode_ids_signed(bytes(ids_b))
                tfs = varint_decode(bytes(tfs_b))
                dls = varint_decode(bytes(dls_b))
                pvals, poffs = decode_positions_flat(bytes(pos_b), tfs)
                pv32 = pvals.astype(np.int32)
                outs.append(
                    pd.DataFrame(
                        {
                            "term": term,
                            "doc_id": ids.astype(np.int64),
                            "tf": tfs.astype(np.int32),
                            "doc_len": dls.astype(np.int32),
                            "positions": [pv32[poffs[i] : poffs[i + 1]] for i in range(len(ids))],
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return blocks.select("term", "doc_ids", "tfs", "doc_lens", "positions").mapInPandas(it, DECODED_POS_SCHEMA)


def phrase_search(spark: SparkSession, warehouse: str | Warehouse, phrase: str, k: int = 10) -> DataFrame:
    """Exact-phrase BM25 top-k over the positional index.

    Adjacency is checked JVM-side by folding position arrays:
    cand = positions(t0); cand = array_intersect(cand+1, positions(t1));
    ... phrase tf = |cand| (overlapping occurrences counted). Scored as a
    single BM25 'term' whose df = number of phrase-matching docs.
    Returns DataFrame(doc_id, score, phrase_tf) ordered (score DESC,
    doc_id ASC), limited to k.
    """
    wh = warehouse if isinstance(warehouse, Warehouse) else Warehouse(warehouse)
    st = _wh_state(spark, wh)
    terms = py_tokenize(phrase)
    empty = spark.createDataFrame([], "doc_id long, score double, phrase_tf int")
    if not terms:
        return empty
    stats = st["stats"]
    n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"])

    uniq = list(dict.fromkeys(terms))
    decoded = _decode_blocks_with_positions(_postings_for(spark, wh, st, uniq)).cache()
    try:
        joined = None
        for i, t in enumerate(terms):
            side = decoded.filter(F.col("term") == t).select(
                F.col("doc_id"),
                F.col("positions").alias(f"pos_{i}"),
                *( [F.col("doc_len")] if i == 0 else [] ),
            )
            joined = side if joined is None else joined.join(side, "doc_id")
        cand = F.col("pos_0")
        for i in range(1, len(terms)):
            cand = F.array_intersect(F.transform(cand, lambda x: x + 1), F.col(f"pos_{i}"))
        matches = joined.withColumn("phrase_tf", F.size(cand)).filter(F.col("phrase_tf") > 0).select(
            "doc_id", "doc_len", "phrase_tf"
        ).cache()
        try:
            df_count = matches.count()  # phrase df for idf (tiny second job)
            if df_count == 0:
                return empty
            idf = _idf(n_docs, df_count)
            denom = F.col("phrase_tf") + F.lit(K1) * (
                F.lit(1.0 - B) + F.lit(B) * F.col("doc_len") / F.lit(max(avgdl, 1e-9))
            )
            top = (
                matches.withColumn("score", F.lit(idf) * F.col("phrase_tf") * F.lit(K1 + 1.0) / denom)
                .select("doc_id", "score", "phrase_tf")
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(k)
            )
            # materialize before unpersisting the inputs it derives from
            return spark.createDataFrame(top.collect(), "doc_id long, score double, phrase_tf int")
        finally:
            matches.unpersist()
    finally:
        decoded.unpersist()


def _search_pruned(spark, blocks, idf_map, avgdl, live, mode, neg_docs, k, cand_per_term):
    from pyspark.sql import Window

    blocks = blocks.cache()
    try:
        # per-term upper bound UB_t = idf_t * max block_max_wand
        pairs = []
        for t, v in idf_map.items():
            pairs += [F.lit(t), F.lit(float(v))]
        idf_col = F.create_map(*pairs)[F.col("term")]
        meta = blocks.select("term", "salt", "block_id", "block_max_wand").withColumn(
            "ub", idf_col * F.col("block_max_wand")
        )
        ub_rows = meta.groupBy("term").agg(F.max("ub").alias("ub_t")).collect()
        ub = {r["term"]: float(r["ub_t"]) for r in ub_rows}
        sum_ub = sum(ub.values())

        # phase 1: exact partial scores over the best few blocks per term
        w = Window.partitionBy("term").orderBy(F.desc("block_max_wand"), F.asc("salt"), F.asc("block_id"))
        cand_keys = (
            meta.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= cand_per_term)
            .select("term", "salt", "block_id")
        )
        cand_blocks = blocks.join(F.broadcast(cand_keys), ["term", "salt", "block_id"])
        cand_scored = _score_decoded(_decode_blocks(cand_blocks), idf_map, avgdl)
        # partial scores underestimate true scores -> tau is a valid lower
        # bound of the k-th best true score (pointwise dominance preserves
        # order statistics). 'and' mode cannot use phase-1 hit counts (they
        # are partial), so tau=0 there unless all terms hit.
        cand_top = _agg_topk(cand_scored, len(live), mode, neg_docs, k).collect()
        tau = float(cand_top[-1]["score"]) if len(cand_top) == k else float("-inf")

        # phase 2: a block survives iff some doc in it could reach tau:
        #   idf_t*block_max_wand + sum(UB_t' for t' != t) >= tau
        # A true top-k doc d has score(d) >= tau; for every block b
        # containing d, bound(b) >= score(d) >= tau, so none of d's blocks
        # are pruned and d's final score is exact.
        sum_ub_col = F.lit(sum_ub) - F.create_map(*[x for t, v in ub.items() for x in (F.lit(t), F.lit(v))])[F.col("term")]
        kept = blocks.withColumn("bound", idf_col * F.col("block_max_wand") + sum_ub_col).filter(
            F.col("bound") >= F.lit(tau)
        )
        scored = _score_decoded(_decode_blocks(kept), idf_map, avgdl)
        return _agg_topk(scored, len(live), mode, neg_docs, k)
    finally:
        blocks.unpersist()
