#!/usr/bin/env python
"""Side benchmarks for the r8 optimization round (bench.py is FROZEN for
the driver's measurement; everything exploratory lives here).

Measures, on the same deterministic corpus bench.py uses:
  - per-query interactive latency, exhaustive and pruned, under two
    protocols: cold-plan (the resolved-plan memo cleared before every
    call — r7's behavior) and warm-plan (the memo on — r8's serving
    shape, which is also what bench.py's timed reps measure since its
    warm-up pass populates the memo);
  - batch_search wall, same two protocols;
  - optional noop-sink isolation of a query's computation (guide §1.4).

Usage: python bench_extra.py [--n-docs 50000] [--cores 16] [--reps 3]
Prints one JSON object (pretty) to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import SHM, corpus_parquet
from lsearch_spark.corpus import QUERIES
from lsearch_spark.query import _WH_CACHE, batch_search, search, warm_postings
from lsearch_spark.session import get_spark


def ensure_wh(spark, n_docs: int, src: str) -> str:
    from lsearch_spark.build import build_index

    wh_dir = f"{SHM}/lsearch_extra_wh_{n_docs}"
    build_index(
        spark, src, wh_dir, run_id="extra", input_id=src, resume=True,
        n_buckets="auto", block_size=128, hot_df=2048, n_salts=8,
    )
    return wh_dir


def _clear_plans(wh_dir: str) -> None:
    st = _WH_CACHE.get(wh_dir)
    if st is not None:
        st.get("plans", {}).clear()
        st.get("bplans", {}).clear()


def time_queries(spark, wh_dir: str, reps: int, cold_plan: bool) -> dict:
    ex: dict[str, list[float]] = {}
    pr: dict[str, list[float]] = {}
    for q in QUERIES:  # warm-up pass (mirrors bench.py protocol)
        search(spark, wh_dir, q["query"], k=q["k"], prune=False).collect()
        search(spark, wh_dir, q["query"], k=q["k"], prune=True).collect()
    for _ in range(reps):
        for q in QUERIES:
            qid = f"q{q['query_id']}"
            if cold_plan:
                _clear_plans(wh_dir)
            t0 = time.time()
            search(spark, wh_dir, q["query"], k=q["k"], prune=False).collect()
            ex.setdefault(qid, []).append(time.time() - t0)
            if cold_plan:
                _clear_plans(wh_dir)
            t0 = time.time()
            search(spark, wh_dir, q["query"], k=q["k"], prune=True).collect()
            pr.setdefault(qid, []).append(time.time() - t0)
    exm = {k: round(statistics.median(v), 4) for k, v in ex.items()}
    prm = {k: round(statistics.median(v), 4) for k, v in pr.items()}
    lat = sorted(exm.values())
    plat = sorted(prm.values())
    return {
        "exhaustive": exm,
        "pruned": prm,
        "p50": round(statistics.median(lat), 4),
        "p95": round(lat[int(0.95 * (len(lat) - 1))], 4),
        "p50_pruned": round(statistics.median(plat), 4),
        "p95_pruned": round(plat[int(0.95 * (len(plat) - 1))], 4),
    }


def time_batch(spark, wh_dir: str, reps: int, cold_plan: bool) -> dict:
    bqs = {f"q{q['query_id']}": q["query"] for q in QUERIES}
    stopset = {"the", "of", "and", "a", "in", "is", "it", "to", "you", "that"}
    rare = sorted({
        t for q in QUERIES
        for t in q["query"].replace("-", " ").replace("~", " ").split()
        if t not in stopset
    })
    bq_rare = {f"r{i}": t for i, t in enumerate(rare[:25])}
    out = {}
    for name, qs in [("full", bqs), ("rare", bq_rare)]:
        batch_search(spark, wh_dir, qs, k=10).collect()  # warm
        secs = []
        for _ in range(reps):
            if cold_plan:
                _clear_plans(wh_dir)
            t0 = time.time()
            batch_search(spark, wh_dir, qs, k=10).collect()
            secs.append(time.time() - t0)
        med = statistics.median(secs)
        out[name] = {"sec": round(med, 4), "ms_per_q": round(1000 * med / len(qs), 1)}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=50_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-cold", action="store_true")
    args = ap.parse_args()

    src = corpus_parquet(args.n_docs)
    spark = get_spark(
        app="bench-extra", cores=args.cores, shuffle_partitions=2 * args.cores
    )
    wh_dir = ensure_wh(spark, args.n_docs, src)
    warm_postings(spark, wh_dir)

    result = {"n_docs": args.n_docs, "cores": args.cores, "reps": args.reps}
    if not args.skip_cold:
        spark.sparkContext.setJobDescription("bench_extra: cold-plan queries")
        result["cold_plan"] = time_queries(spark, wh_dir, args.reps, cold_plan=True)
    spark.sparkContext.setJobDescription("bench_extra: warm-plan queries")
    result["warm_plan"] = time_queries(spark, wh_dir, args.reps, cold_plan=False)
    spark.sparkContext.setJobDescription("bench_extra: batch")
    if not args.skip_cold:
        result["batch_cold_plan"] = time_batch(spark, wh_dir, args.reps, cold_plan=True)
    result["batch_warm_plan"] = time_batch(spark, wh_dir, args.reps, cold_plan=False)
    spark.sparkContext.setJobDescription(None)
    print(json.dumps(result, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
