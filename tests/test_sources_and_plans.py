"""Source operators (SURVEY §2.1) + physical-plan quality assertions:
the plans must show predicate pushdown, column pruning, partition
pruning on the bucket dirs, and TakeOrderedAndProject for top-k."""

import pytest
from pyspark.sql import functions as F

from lsearch_spark import sources
from lsearch_spark.corpus import pages_df


@pytest.fixture(scope="module")
def pages_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("src") / "pages")
    df = pages_df(spark, 60)
    # plant a hidden entry
    hidden = df.limit(1).withColumn("url", F.lit("https://x.example/dir/.hidden.html"))
    df.unionByName(hidden).write.parquet(p)
    return p


def test_read_and_hidden_filter(spark, pages_path):
    df = sources.read_pages(spark, pages_path)
    assert df.count() == 67
    assert sources.hidden_filter(df).count() == 66
    assert sources.hidden_filter(df, allow_hidden=True).count() == 67


def test_recursive_scan(spark, tmp_path_factory):
    """The reference's `-r` flag (cli.rs:443-445): files nested in
    subdirectories are only found with recursive lookup."""
    base = tmp_path_factory.mktemp("rec")
    pages_df(spark, 10).write.parquet(str(base / "deep" / "leaf"))
    got = sources.read_pages(spark, str(base), recursive=True)
    assert got.count() == 16  # 10 + 6 edge rows
    with pytest.raises(Exception):
        sources.read_pages(spark, str(base)).count()


def test_multi_union(spark, pages_path):
    df = sources.read_multi(spark, [pages_path, pages_path])
    assert df.count() == 134


def test_long_listing_format(spark, pages_path):
    row = sources.long_listing(sources.read_pages(spark, pages_path)).filter(
        F.col("title") == "page-0.html"
    ).first()
    assert row["modified"] == "Jan 01 00:00"  # EPOCH + 0*37s, '%b %d %H:%M'
    assert row["url"].endswith("page-0.html")


def test_filter_pushdown_reaches_scan(spark, pages_path):
    df = sources.read_pages(spark, pages_path).filter(F.col("lang") == "en").select("url")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)" in plan, plan
    # column pruning: scan must not read html/text for a url projection
    assert "ReadSchema: struct<url:string,lang:string>" in plan, plan


def test_topk_uses_take_ordered(spark, pages_path):
    df = (
        sources.read_pages(spark, pages_path)
        .select("doc_id", F.length("text").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(5)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_query_scan_prunes_bucket_partitions(spark, tmp_path_factory):
    from lsearch_spark.build import build_index
    from lsearch_spark.query import _postings_for, _wh_state
    from lsearch_spark.build import Warehouse

    root = str(tmp_path_factory.mktemp("whp"))
    wh = build_index(spark, pages_df(spark, 80), root, n_buckets=4, block_size=16, input_id="p80")
    st = _wh_state(spark, Warehouse(root))
    blocks = _postings_for(spark, Warehouse(root), st, ["biology"])
    plan = blocks._jdf.queryExecution().executedPlan().toString()
    # partition pruning on the Hive bucket dirs must appear in the scan
    assert "PartitionFilters: [bucket" in plan.replace("#", " ").replace("IN", "").replace(
        "isnotnull(bucket", "bucket"
    ) or "bucket" in plan.split("PartitionFilters")[1][:120], plan
