"""Structured-Streaming ingestion into the inverted index.

The reference engine is batch-only (SURVEY §2: streaming scoped out of
the parity inventory), but the north-star pipeline — a crawl feeding a
live index — is a stream. This module turns any streaming DataFrame of
pages into a sequence of ATOMIC index appends:

    readStream (files / Kafka / rate) --> foreachBatch --> append_index

Why foreachBatch and not a custom stateful sink: each micro-batch runs
the same multi-stage append job as batch `append_index` (extract ->
local chunks -> additive stat merges -> one manifest flip), so all of
its guarantees carry over verbatim — crash before the flip leaves the
warehouse untouched, readers never see a partial segment, stats stay
exact. Watermarks/windowed aggs are deliberately NOT used here: index
maintenance is append-only bookkeeping, not event-time aggregation.

EXACTLY-ONCE across restarts: Structured Streaming replays the last
uncommitted micro-batch after a failure (checkpointed offsets +
deterministic batch ids). The batch id is therefore committed ATOMICALLY
with the segment (append_index's config-manifest flip carries
``last_stream_batch``); a replayed batch sees id <= last_stream_batch
and becomes a no-op, so a crash between the segment commit and
Spark's own offset commit cannot double-append. The under-documented
crash window in plain foreachBatch sinks is exactly this one.

Scale notes: each micro-batch append is O(segment + vocab), never a
corpus rescan; segment salt ranges keep (term, salt, block_id) unique
forever; avgdl drift across appends is corrected by the query planner
(build.append_index docstring). For high-rate sources size the trigger
so segments stay >= a few thousand docs — posting blocks amortize per
segment, and query-side table resolution unions one dir per segment
(compact with a fresh build_index(resume=False) when segment count
grows into the hundreds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .build import Warehouse, append_index


def stream_batch_handler(spark: SparkSession, warehouse: str | Warehouse, *, from_html: bool = True):
    """The foreachBatch callable: (batch_df, batch_id) -> atomic append.

    Exposed separately so tests (and custom sinks) can drive the
    exactly-once logic without a running stream."""
    wh = warehouse if isinstance(warehouse, Warehouse) else Warehouse(warehouse)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        cfg = wh.read_manifest("config") or {}
        last = cfg.get("last_stream_batch")
        if last is not None and int(batch_id) <= int(last):
            return  # replay of an already-committed micro-batch
        if batch_df.isEmpty():
            return
        append_index(
            spark,
            batch_df,
            wh,
            run_id=f"stream{batch_id}",
            from_html=from_html,
            commit_extra={"last_stream_batch": int(batch_id)},
        )

    return handle


def stream_index(
    spark: SparkSession,
    pages_stream: DataFrame,
    warehouse: str | Warehouse,
    checkpoint: str,
    *,
    from_html: bool = True,
    trigger: dict | None = None,
    query_name: str = "lsearch_stream_index",
):
    """Attach a streaming pages DataFrame to a warehouse.

    pages_stream must carry the pages schema (url, warc_ts, html, text,
    lang[, doc_id]) — e.g. ``spark.readStream.schema(...).parquet(dir)``
    for a landing directory, or a Kafka source after value parsing. The
    warehouse must hold a completed build (append_index's precondition).

    trigger: e.g. {"processingTime": "30 seconds"} or
    {"availableNow": True} (drain what exists, then stop — the batch
    backfill mode). Returns the StreamingQuery; callers own its
    lifecycle (awaitTermination/stop)."""
    writer = (
        pages_stream.writeStream.queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(stream_batch_handler(spark, warehouse, from_html=from_html))
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
