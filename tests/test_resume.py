"""Resume semantics (SURVEY §5.2.5): interrupted builds restart from the
last completed stage; completed stages are skipped; output is identical."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from lsearch_spark.build import Warehouse, build_index
from lsearch_spark.corpus import pages_df
from lsearch_spark.query import search


def _postings_snapshot(spark, wh):
    rows = spark.read.parquet(wh.path("postings")).select(
        "term", "salt", "block_id", F.md5(F.col("doc_ids")).alias("h")
    ).collect()
    return sorted((r["term"], r["salt"], r["block_id"], r["h"]) for r in rows)


def test_resume_skips_and_reproduces(spark, tmp_path):
    root = str(tmp_path / "wh")
    pages = pages_df(spark, 80)
    kw = dict(n_buckets=2, block_size=16, hot_df=32, n_salts=2, input_id="c80")
    wh = build_index(spark, pages, root, **kw)
    snap1 = _postings_snapshot(spark, wh)

    # simulate a crash after 'flat': wipe the manifests of later stages
    os.remove(wh.manifest_path("term_stats"))
    os.remove(wh.manifest_path("blocks"))
    wh2 = build_index(spark, pages, root, **kw)
    assert _postings_snapshot(spark, wh2) == snap1

    # a changed input_id invalidates every stage (fingerprint mismatch)
    m = wh.read_manifest("extract")
    assert m["input_id"] == "c80" and m["ok"]


def test_metrics_logged_per_stage(spark, tmp_path):
    root = str(tmp_path / "wh")
    wh = build_index(spark, pages_df(spark, 50), root, n_buckets=2, block_size=16, input_id="c50")
    metrics = spark.read.parquet(os.path.join(root, "build_metrics"))
    stages = {r["stage"] for r in metrics.select("stage").distinct().collect()}
    assert stages == {"extract", "flat", "term_stats", "blocks", "block_stats"}
    assert metrics.filter(F.col("n_rows") <= 0).count() == 0
    assert metrics.filter(F.col("input_lineage") != "c50").count() == 0
    # feed attribution + summed python task-CPU (VERDICT r5 #4): the
    # extract/flat manifests must say WHICH feed served them and how much
    # worker CPU the stage consumed, so a bench snapshot self-attributes.
    # A DataFrame input (pages_df) cannot be direct-read -> jvm-socket;
    # flat reads the docs parquet the build itself wrote -> direct.
    # task-CPU: the jvm-socket extract plan is pure Catalyst (tokenize is
    # a JVM expression), so ZERO python task-CPU is its true value; the
    # direct flat feed runs the python kernel and must report CPU.
    assert wh.read_manifest("extract")["feed"] == "jvm-socket"
    assert wh.read_manifest("extract")["task_cpu_s"] == 0.0
    assert wh.read_manifest("flat")["feed"] == "direct"
    assert wh.read_manifest("flat")["task_cpu_s"] > 0


def test_rerun_appends_no_duplicate_stage_metrics(spark, tmp_path):
    """After a kill/rerun cycle, each re-run stage logs again (append), but
    completed stages don't — manifests gate the work (FIXTURES §4)."""
    root = str(tmp_path / "wh")
    kw = dict(n_buckets=2, block_size=16, input_id="c50")
    wh = build_index(spark, pages_df(spark, 50), root, **kw)
    metrics0 = spark.read.parquet(wh.path("build_metrics")).count()
    build_index(spark, pages_df(spark, 50), root, **kw)  # full skip
    assert spark.read.parquet(wh.path("build_metrics")).count() == metrics0

    before = spark.read.parquet(wh.path("build_metrics"))
    extract_before = before.filter(F.col("stage") == "extract").count()
    blocks_before = before.filter(F.col("stage") == "blocks").count()
    os.remove(wh.manifest_path("blocks"))
    build_index(spark, pages_df(spark, 50), root, **kw)  # only blocks re-runs
    after = spark.read.parquet(wh.path("build_metrics"))
    assert after.filter(F.col("stage") == "extract").count() == extract_before
    assert after.filter(F.col("stage") == "blocks").count() > blocks_before


def test_warehouse_on_hadoop_filesystem(spark, tmp_path):
    """VERDICT r1 item 4: manifests/metrics/lineage go through the Hadoop
    FS API — a file: URI root exercises the exact code path an hdfs:// or
    s3a:// warehouse would take (POSIX calls would fail on the scheme)."""
    root = "file:" + str(tmp_path / "wh_uri")
    kw = dict(n_buckets=2, block_size=16, input_id="c50")
    wh = build_index(spark, pages_df(spark, 50), root, **kw)
    assert search(spark, wh, "biology").count() > 0
    metrics0 = spark.read.parquet(wh.path("build_metrics")).count()
    assert metrics0 > 0
    build_index(spark, pages_df(spark, 50), root, **kw)  # resume: full skip
    assert spark.read.parquet(wh.path("build_metrics")).count() == metrics0
    from lsearch_spark.query import read_query_metrics, search_with_stats

    rows, info = search_with_stats(spark, wh, "biology", k=5)
    assert rows and info["blocks_decoded"] > 0
    assert read_query_metrics(spark, wh).count() >= 1


def test_config_change_forces_rebuild(spark, tmp_path):
    """ADVICE r1: rerunning build_index with a different config must not
    serve stages built under the old config (the query-side bucket math
    would silently diverge from the stored layout)."""
    root = str(tmp_path / "wh")
    pages = pages_df(spark, 50)
    build_index(spark, pages, root, n_buckets=2, block_size=16, input_id="c50")
    wh = build_index(spark, pages, root, n_buckets=3, block_size=16, input_id="c50")
    buckets = spark.read.parquet(wh.path("postings")).select("bucket").distinct().count()
    assert buckets == 3  # stale 2-bucket layout would leave <= 2
    assert search(spark, wh, "biology").count() > 0


def test_search_works_after_resume(spark, tmp_path):
    root = str(tmp_path / "wh")
    wh = build_index(spark, pages_df(spark, 80), root, n_buckets=2, block_size=16, input_id="c80")
    os.remove(wh.manifest_path("blocks"))
    wh = build_index(spark, pages_df(spark, 80), root, n_buckets=2, block_size=16, input_id="c80")
    assert search(spark, wh, "biology").count() > 0


def test_vacuum_flat_lifecycle(spark, tmp_path):
    """vacuum_flat drops the ~40%-of-warehouse flat intermediate: queries
    still serve, the table and manifest are gone, and a later
    resume=True build transparently recomputes flat + downstream with
    bit-identical postings."""
    from lsearch_spark.build import vacuum_flat
    from lsearch_spark.query import invalidate_cache

    root = str(tmp_path / "whv")
    pages = pages_df(spark, 80)
    kw = dict(n_buckets=2, block_size=16, hot_df=32, n_salts=2, input_id="c80v")
    wh = build_index(spark, pages, root, **kw)
    snap1 = _postings_snapshot(spark, wh)
    before = [tuple(r) for r in search(spark, root, "biology", k=5).collect()]

    vacuum_flat(wh)
    assert not os.path.exists(wh.path("postings_flat"))
    assert wh.read_manifest("flat") is None
    invalidate_cache(root)
    assert [tuple(r) for r in search(spark, root, "biology", k=5).collect()] == before

    # resume rebuild recomputes flat from docs; postings bit-identical
    build_index(spark, pages, root, resume=True, **kw)
    assert os.path.exists(wh.path("postings_flat"))
    assert _postings_snapshot(spark, wh) == snap1
    invalidate_cache(root)
    assert [tuple(r) for r in search(spark, root, "biology", k=5).collect()] == before


def test_append_after_vacuum(spark, tmp_path):
    """Appends never read the root flat intermediate (segments stage
    their own chunks), so a vacuumed warehouse keeps ingesting and the
    result equals a fresh union build."""
    from lsearch_spark.build import append_index, vacuum_flat
    from lsearch_spark.query import invalidate_cache

    root = str(tmp_path / "whav")
    pages = pages_df(spark, 80)
    kw = dict(n_buckets=2, block_size=16, hot_df=32, n_salts=2)
    wh = build_index(spark, pages.filter(F.col("doc_id") % 2 == 0), root,
                     input_id="c80even", **kw)
    vacuum_flat(wh)
    append_index(spark, pages.filter(F.col("doc_id") % 2 == 1), wh)
    invalidate_cache(root)
    got = [tuple(r) for r in search(spark, root, "biology", k=5).collect()]

    union_root = str(tmp_path / "whau")
    build_index(spark, pages, union_root, input_id="c80all", **kw)
    want = [tuple(r) for r in search(spark, union_root, "biology", k=5).collect()]
    assert [(d, round(s, 9)) for d, s in got] == [(d, round(s, 9)) for d, s in want]
