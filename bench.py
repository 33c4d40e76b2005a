#!/usr/bin/env python
"""Headline benchmark (driver contract + BASELINE.md protocol).

Measures, on the deterministic synthetic Common-Crawl-style corpus
(size mapped from $SPARK_GRAFT_SF_DIR: sf0.001->500, sf0.01->5k,
sf0.1->50k docs):

  1. index-build throughput (docs/sec) at TWO parallelism levels —
     local[N/4] and local[N] (N = $SPARK_GRAFT_CPUS, default 32) on the
     SAME parquet input -> scaling efficiency = (thru_N / thru_N4) / 4
     (sandbox stand-in for the north_rule's N vs 4N executor clusters).
  2. BM25 top-10 latency per reference query (warm index, warm session):
     exhaustive and block-max-pruned paths; p50/p95.

Prints ONE JSON line; also writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lsearch_spark.corpus import QUERIES, make_pages
from lsearch_spark.query import search
from lsearch_spark.session import get_spark

SF_DOCS = {"sf0.001": 500, "sf0.01": 5_000, "sf0.1": 50_000}


def corpus_parquet(n: int) -> str:
    path = f"/tmp/lsearch_bench_corpus_{n}.parquet"
    marker = path + ".ok"
    if not os.path.exists(marker):
        pdf = make_pages(n)
        # Spark can't read TIMESTAMP(NANOS); force microsecond parquet
        pdf.to_parquet(path, index=False, coerce_timestamps="us", allow_truncated_timestamps=True)
        open(marker, "w").write("ok")
    return path


def build_at(cores: int, src: str, n_docs: int, wh_dir: str) -> tuple[float, float]:
    """Returns (build_seconds, docs_per_sec). Fresh session at `cores`."""
    from lsearch_spark.build import build_index

    spark = get_spark(app=f"bench-build-{cores}", cores=cores, shuffle_partitions=2 * cores)
    try:
        pages = spark.read.parquet(src)
        shutil.rmtree(wh_dir, ignore_errors=True)
        t0 = time.time()
        build_index(
            spark, pages, wh_dir,
            n_buckets=max(8, cores), block_size=128, hot_df=2048, n_salts=max(4, cores // 4),
            run_id=f"bench{cores}", input_id=src, resume=False,
        )
        dt = time.time() - t0
        return dt, n_docs / dt
    finally:
        spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    sf = float(sf_name.replace("sf", "") or 0.1) if sf_name.startswith("sf") else 0.1
    n_docs = SF_DOCS.get(sf_name, 50_000)
    hi = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    lo = max(2, hi // 4)

    src = corpus_parquet(n_docs)
    wh_lo, wh_hi = f"/tmp/lsearch_bench_wh_{n_docs}_lo", f"/tmp/lsearch_bench_wh_{n_docs}_hi"

    sec_lo, thru_lo = build_at(lo, src, n_docs, wh_lo)
    sec_hi, thru_hi = build_at(hi, src, n_docs, wh_hi)
    efficiency = (thru_hi / thru_lo) / (hi / lo)

    # query latencies on the hi-parallelism index, warm session
    spark = get_spark(app="bench-query", cores=hi, shuffle_partitions=2 * hi)
    q_secs: dict[str, float] = {}
    pruned: list[float] = []
    try:
        for q in QUERIES:  # warm-up pass (plans, code-gen, page cache)
            search(spark, wh_hi, q["query"], k=q["k"]).collect()
        for q in QUERIES:
            t0 = time.time()
            search(spark, wh_hi, q["query"], k=q["k"]).collect()
            q_secs[f"q{q['query_id']}"] = round(time.time() - t0, 4)
        for q in QUERIES:
            t0 = time.time()
            search(spark, wh_hi, q["query"], k=q["k"], prune=True).collect()
            pruned.append(time.time() - t0)
    finally:
        spark.stop()

    lat = sorted(q_secs.values())
    p95 = lat[int(0.95 * (len(lat) - 1))]
    p50 = statistics.median(lat)
    pruned_sorted = sorted(pruned)
    p95_pruned = pruned_sorted[int(0.95 * (len(pruned_sorted) - 1))]

    result = {
        "metric": "index_build_sec_at_local32_plus_bm25_query_latency",
        "value": round(sec_hi, 3),
        "unit": "sec",
        "queries": q_secs,
        "sf": sf,
        "n_docs": n_docs,
        "build_sec_lo": round(sec_lo, 3),
        "build_sec_hi": round(sec_hi, 3),
        "cores_lo": lo,
        "cores_hi": hi,
        "docs_per_sec_lo": round(thru_lo, 1),
        "docs_per_sec_hi": round(thru_hi, 1),
        "scaling_efficiency": round(efficiency, 3),
        "query_p50_sec": round(p50, 4),
        "query_p95_sec": round(p95, 4),
        "query_p95_sec_pruned": round(p95_pruned, 4),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH — measured numbers (bench.py)

Corpus: deterministic synthetic Common-Crawl-style pages, {n_docs} docs
(+6 edge rows), seed 42 (lsearch_spark/corpus.py). Index: buckets>=8,
block 128, hot-term salting. Confs: AQE on, Arrow on,
shuffle.partitions = 2x cores.

| metric | value | config |
|---|---|---|
| index build wall | {sec_lo:.1f} s | local[{lo}] |
| index build wall | {sec_hi:.1f} s | local[{hi}] |
| indexing throughput | {thru_lo:.0f} docs/s | local[{lo}] |
| indexing throughput | {thru_hi:.0f} docs/s | local[{hi}] |
| **scaling efficiency ({lo}->{hi} cores)** | **{efficiency:.2f}** | (thru_{hi}/thru_{lo})/{hi // lo} |
| BM25 top-10 p50 | {p50 * 1000:.0f} ms | exhaustive, warm |
| BM25 top-10 p95 | {p95 * 1000:.0f} ms | exhaustive, warm |
| BM25 top-10 p95 | {p95_pruned * 1000:.0f} ms | block-max pruned, warm |

Reference baseline: none published (BASELINE.md) — targets from
BASELINE.json: report absolute docs/sec; scaling efficiency >= 0.8.
"""
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
