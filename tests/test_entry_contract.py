"""Driver-contract smoke: a representative subset of queries() vs their
DuckDB oracles at sf0.001 (the full sweep lives in tools/check_entry.py)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"
SUBSET = [
    "filter_is", "score_more", "cascade_topk", "term_df_top20",
    "dedup_exact_groups", "jaccard_consecutive", "ann_cosine_top10",
    "textstats_quality", "lang_id_counts", "events_type_stats",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["documents", "embeddings", "events"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def canon(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 9)
    return v


def rowset(pdf):
    cols = sorted(pdf.columns)
    return sorted(tuple(canon(r[c]) for c in cols) for _, r in pdf.iterrows()), cols


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, con, name):
    got = entry.queries()[name](spark, SF).toPandas()
    want = con.execute(entry.oracle_sql()[name]).df()
    g, gc = rowset(got)
    w, wc = rowset(want)
    assert gc == wc, f"schema mismatch: {gc} != {wc}"
    assert g == w


def test_all_queries_have_unique_names():
    qs = entry.queries()
    assert len(qs) >= 25
    missing_oracles = set(entry.oracle_sql()) - set(qs)
    assert not missing_oracles, f"oracles without queries: {missing_oracles}"


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0 and {"doc_id", "score"} <= set(df.columns)
