"""Structured-Streaming ingestion: micro-batch appends must be atomic,
exactly-once under replay, and result-identical to a fresh batch build
over the union corpus."""

from lsearch_spark.build import Warehouse, build_index
from lsearch_spark.corpus import make_pages, pages_df
from lsearch_spark.query import search
from lsearch_spark.streaming import stream_batch_handler, stream_index

PAGES_SCHEMA = "doc_id long, url string, warc_ts timestamp, html binary, text string, lang string"


def _shifted(spark, n, seed, shift):
    pdf = make_pages(n, seed=seed)
    pdf["doc_id"] = pdf["doc_id"] + shift
    pdf["html"] = None
    return spark.createDataFrame(pdf, schema=PAGES_SCHEMA)


def test_stream_index_exactly_once_and_union_identical(spark, tmp_path):
    root = str(tmp_path / "wh")
    base = pages_df(spark, 100)
    kw = dict(n_buckets=2, block_size=32, hot_df=64, n_salts=2)
    build_index(spark, base, root, input_id="s100", **kw)
    wh = Warehouse(root)

    landing = str(tmp_path / "landing")
    b1 = _shifted(spark, 40, 5, 1_000_000)
    b2 = _shifted(spark, 30, 6, 2_000_000)
    b1.coalesce(1).write.mode("append").parquet(landing)
    b2.coalesce(1).write.mode("append").parquet(landing)

    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema(b1.schema).option("maxFilesPerTrigger", 1).parquet(landing)
    q = stream_index(spark, stream, wh, ckpt, from_html=False, trigger={"availableNow": True})
    assert q.awaitTermination(300)

    cfg = wh.read_manifest("config")
    n_app = int(cfg["n_appends"])
    assert n_app >= 1 and "last_stream_batch" in cfg
    assert wh.corpus_stats(spark)["n_docs"] == (100 + 6) + (40 + 6) + (30 + 6)

    # results identical to a fresh batch build over the union corpus
    fresh = str(tmp_path / "fresh")
    build_index(
        spark, base.unionByName(b1).unionByName(b2), fresh, input_id="union", **kw
    )
    for query in ["biology", "the -biology", "quantum neural", "tiebreak"]:
        a = [(r["doc_id"], round(r["score"], 9)) for r in search(spark, wh, query, k=10).collect()]
        b = [(r["doc_id"], round(r["score"], 9)) for r in search(spark, fresh, query, k=10).collect()]
        assert a == b, (query, a, b)

    # EXACTLY-ONCE: a replayed (already-committed) batch id is a no-op...
    handler = stream_batch_handler(spark, wh, from_html=False)
    handler(b1, 0)
    assert int(wh.read_manifest("config")["n_appends"]) == n_app
    # ...and restarting the same stream on the same checkpoint appends nothing
    stream2 = spark.readStream.schema(b1.schema).option("maxFilesPerTrigger", 1).parquet(landing)
    q2 = stream_index(spark, stream2, wh, ckpt, from_html=False, trigger={"availableNow": True})
    assert q2.awaitTermination(300)
    assert int(wh.read_manifest("config")["n_appends"]) == n_app
