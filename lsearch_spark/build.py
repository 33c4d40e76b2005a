"""Staged inverted-index build: the persistent generalization of what the
reference recomputes per query (More.score re-counts matches on every
invocation, reference search.rs:271-279; content re-read per run,
cli.rs:484-485).

Stages (each a checkpointable DataFrame job with a manifest + metrics):
  extract      pages -> docs_text(doc_id, text)      [Arrow UDF hot path]
  docs         docs_text -> docs(doc_id, url, doc_len, warc_ts, lang)
  flat         docs_text -> postings_flat(term, doc_id, tf, positions,
               doc_len, bucket) partitioned by bucket=pmod(xxhash64(term),P)
  term_stats   flat -> term_stats(term, df, cf) + corpus_stats(n_docs, avgdl)
  blocks       flat -> postings(term, salt, block_id, min/max_doc_id,
               n_docs, doc_ids, tfs, doc_lens, positions, block_max_tf,
               block_max_wand, bucket) — delta-gap+varint compressed,
               partitioned by bucket; hot terms (df >= hot_df) salted by
               pmod(xxhash64(doc_id), n_salts) so no single task owns a
               stopword's full posting list (AQE cannot split a hash-agg
               hot key; this is the one manual physical-layout decision,
               SURVEY.md §4.1)

Scale notes (designed for 10^12 docs / 1000 executors, tested local):
  - the only wide shuffles are groupBy(term, doc_id) and
    groupBy(term, salt); both are hash-partitioned on the term, and the
    hot keys are salted before the second shuffle.
  - block_max_wand stores max over the block of
    tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) — the idf-free BM25 factor —
    so query-time upper bounds are idf(term) * block_max_wand without
    joining df into the build.
  - doc_lens are stored inside each block: query-time scoring needs no
    join against the (huge) docs table.
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from . import B, BLOCK_SIZE, K1
from .codec import encode_ids_signed, encode_positions, varint_encode
from .extract import extracted_text_col
from .tokenize import tokens_col

BLOCK_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("salt", IntegerType()),
        StructField("block_id", IntegerType()),
        StructField("min_doc_id", LongType()),
        StructField("max_doc_id", LongType()),
        StructField("n_docs", IntegerType()),
        StructField("doc_ids", BinaryType()),
        StructField("tfs", BinaryType()),
        StructField("doc_lens", BinaryType()),
        StructField("positions", BinaryType()),
        StructField("block_max_tf", IntegerType()),
        StructField("block_max_wand", DoubleType()),
        StructField("bucket", IntegerType()),
    ]
)


@dataclass
class Warehouse:
    root: str

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    @property
    def manifests(self) -> str:
        return os.path.join(self.root, "_manifests")

    def manifest_path(self, stage: str) -> str:
        return os.path.join(self.manifests, f"{stage}.json")

    def read_manifest(self, stage: str) -> dict | None:
        p = self.manifest_path(stage)
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return None

    def write_manifest(self, stage: str, payload: dict) -> None:
        os.makedirs(self.manifests, exist_ok=True)
        tmp = self.manifest_path(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, self.manifest_path(stage))

    def corpus_stats(self, spark: SparkSession) -> dict:
        row = spark.read.parquet(self.path("corpus_stats")).collect()[0]
        return row.asDict()


def _metrics_rows(spark, wh: Warehouse, run_id, stage, df_out: DataFrame, wall_ms, lineage):
    """Per-partition build metrics (FIXTURES.md §4 build_metrics schema)."""
    per_part = (
        df_out.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count("*").alias("n_rows"))
        .withColumn("run_id", F.lit(run_id))
        .withColumn("stage", F.lit(stage))
        .withColumn("n_bytes", F.lit(None).cast("long"))
        .withColumn("wall_ms", F.lit(int(wall_ms)))
        .withColumn("input_lineage", F.lit(lineage))
        .select("run_id", "stage", "partition_id", "n_rows", "n_bytes", "wall_ms", "input_lineage")
    )
    per_part.write.mode("append").parquet(wh.path("build_metrics"))


def _stage_done(wh: Warehouse, stage: str, input_id: str, resume: bool) -> bool:
    m = wh.read_manifest(stage)
    return bool(resume and m and m.get("input_id") == input_id and m.get("ok"))


def _make_block_builder(block_size: int, avgdl: float):
    """applyInPandas kernel: one (term, salt) group -> compressed blocks.

    numpy-vectorized per block; the per-block python loop is over blocks
    (len/block_size iterations), not rows — the row-level work (sort,
    delta, varint) is all ndarray ops.
    """

    def build_blocks(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        term, salt, bucket = key
        order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
        doc_ids = pdf["doc_id"].to_numpy()[order].astype(np.int64)
        tfs = pdf["tf"].to_numpy()[order].astype(np.int64)
        doc_lens = pdf["doc_len"].to_numpy()[order].astype(np.int64)
        positions = pdf["positions"].to_numpy()[order]
        # idf-free BM25 factor per posting (vectorized)
        denom = tfs + K1 * (1.0 - B + B * doc_lens / max(avgdl, 1e-9))
        wand = tfs * (K1 + 1.0) / denom
        rows = []
        for b0 in range(0, len(doc_ids), block_size):
            b1 = min(b0 + block_size, len(doc_ids))
            ids = doc_ids[b0:b1]
            btf = tfs[b0:b1]
            rows.append(
                {
                    "term": term,
                    "salt": int(salt),
                    "block_id": b0 // block_size,
                    "min_doc_id": int(ids[0]),
                    "max_doc_id": int(ids[-1]),
                    "n_docs": int(b1 - b0),
                    "doc_ids": encode_ids_signed(ids),
                    "tfs": varint_encode(btf.astype(np.uint64)),
                    "doc_lens": varint_encode(doc_lens[b0:b1].astype(np.uint64)),
                    "positions": encode_positions([np.asarray(p, dtype=np.uint64) for p in positions[b0:b1]]),
                    "block_max_tf": int(btf.max()),
                    "block_max_wand": float(wand[b0:b1].max()),
                    "bucket": int(bucket),
                }
            )
        return pd.DataFrame(rows)

    return build_blocks


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    warehouse: str | Warehouse,
    *,
    n_buckets: int = 8,
    block_size: int = BLOCK_SIZE,
    hot_df: int = 4096,
    n_salts: int = 8,
    run_id: str = "run0",
    input_id: str = "default",
    resume: bool = True,
    from_html: bool = True,
) -> Warehouse:
    """Build the full index under `warehouse`. Idempotent per (stage,
    input_id): completed stages are skipped on rerun (resume=True).

    pages must carry (url, warc_ts, html, text, lang) and optionally
    doc_id; without doc_id a stable xxhash64(url) id is assigned
    (deterministic under resume and cluster size — SURVEY.md §2.8).
    """
    wh = warehouse if isinstance(warehouse, Warehouse) else Warehouse(warehouse)
    os.makedirs(wh.root, exist_ok=True)
    wh.write_manifest(
        "config",
        {"n_buckets": n_buckets, "block_size": block_size, "hot_df": hot_df, "n_salts": n_salts, "k1": K1, "b": B},
    )

    def finish(stage, df_out, t0, n_rows=None):
        wall = (time.time() - t0) * 1000
        _metrics_rows(spark, wh, run_id, stage, df_out, wall, input_id)
        wh.write_manifest(stage, {"run_id": run_id, "stage": stage, "input_id": input_id, "ok": True, "wall_ms": wall, "n_rows": n_rows})

    # ---- stage: extract ----------------------------------------------------
    if not _stage_done(wh, "extract", input_id, resume):
        t0 = time.time()
        has_doc_id = "doc_id" in pages.columns
        base = pages.withColumn(
            "doc_id", F.col("doc_id").cast("long") if has_doc_id else F.xxhash64(F.col("url"))
        )
        text = extracted_text_col() if from_html else F.col("text")
        dt = base.select("doc_id", "url", "warc_ts", "lang", text.alias("text"))
        dt.write.mode("overwrite").parquet(wh.path("docs_text"))
        finish("extract", spark.read.parquet(wh.path("docs_text")), t0)

    docs_text = spark.read.parquet(wh.path("docs_text"))

    # ---- stage: docs -------------------------------------------------------
    if not _stage_done(wh, "docs", input_id, resume):
        t0 = time.time()
        docs = docs_text.select(
            "doc_id", "url", "warc_ts", "lang", F.size(tokens_col("text")).alias("doc_len")
        )
        docs.write.mode("overwrite").parquet(wh.path("docs"))
        finish("docs", spark.read.parquet(wh.path("docs")), t0)

    docs = spark.read.parquet(wh.path("docs"))

    # ---- stage: flat postings ----------------------------------------------
    if not _stage_done(wh, "flat", input_id, resume):
        t0 = time.time()
        # carry doc_len through the explode so scoring never needs a join
        # against the (huge) docs table — the alternative big-big join on
        # doc_id is the shuffle that would dominate at 100 TB.
        toks = docs_text.select(
            "doc_id", tokens_col("text").alias("toks")
        ).select(
            "doc_id",
            F.size("toks").alias("doc_len"),
            F.posexplode("toks").alias("pos", "term"),
        )
        flat = (
            toks.groupBy("term", "doc_id")
            .agg(
                F.count("*").cast("int").alias("tf"),
                F.sort_array(F.collect_list("pos")).alias("positions"),
                F.first("doc_len").alias("doc_len"),
            )
            .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
        )
        flat.write.mode("overwrite").partitionBy("bucket").parquet(wh.path("postings_flat"))
        finish("flat", spark.read.parquet(wh.path("postings_flat")), t0)

    flat = spark.read.parquet(wh.path("postings_flat"))

    # ---- stage: term_stats + corpus_stats ----------------------------------
    if not _stage_done(wh, "term_stats", input_id, resume):
        t0 = time.time()
        ts = flat.groupBy("term").agg(
            F.count("*").cast("long").alias("df"),
            F.sum("tf").cast("long").alias("cf"),
        )
        ts.write.mode("overwrite").parquet(wh.path("term_stats"))
        cs = docs.agg(
            F.count("*").alias("n_docs"),
            F.coalesce(F.avg("doc_len"), F.lit(0.0)).alias("avgdl"),
            F.coalesce(F.sum("doc_len"), F.lit(0)).cast("long").alias("total_tokens"),
        )
        cs.write.mode("overwrite").parquet(wh.path("corpus_stats"))
        finish("term_stats", spark.read.parquet(wh.path("term_stats")), t0)

    # ---- stage: compressed blocks ------------------------------------------
    if not _stage_done(wh, "blocks", input_id, resume):
        t0 = time.time()
        stats = wh.corpus_stats(spark)
        avgdl = float(stats["avgdl"])
        hot_terms = (
            spark.read.parquet(wh.path("term_stats"))
            .filter(F.col("df") >= hot_df)
            .select("term", F.lit(True).alias("is_hot"))
        )
        salted = (
            flat.join(F.broadcast(hot_terms), "term", "left")
            .withColumn(
                "salt",
                F.when(F.col("is_hot"), F.pmod(F.xxhash64("doc_id"), F.lit(n_salts)).cast("int")).otherwise(F.lit(0)),
            )
            .drop("is_hot")
        )
        blocks = salted.groupBy("term", "salt", "bucket").applyInPandas(
            _make_block_builder(block_size, avgdl), BLOCK_SCHEMA
        )
        blocks.write.mode("overwrite").partitionBy("bucket").parquet(wh.path("postings"))
        finish("blocks", spark.read.parquet(wh.path("postings")), t0)

    return wh
