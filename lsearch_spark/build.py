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


def _write_metrics(spark, wh: Warehouse, run_id, stage, rows: list[tuple], wall_ms, lineage):
    """build_metrics rows (FIXTURES.md §4). rows = [(partition_id, n_rows,
    n_bytes)]; counts come from Observation on the write itself — no
    re-scan of stage output. Written driver-side with pyarrow (a 1-row
    Spark job costs seconds of scheduler overhead); Spark reads the dir
    like any parquet table."""
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "run_id": pa.array([run_id] * len(rows), pa.string()),
            "stage": pa.array([stage] * len(rows), pa.string()),
            "partition_id": pa.array([int(p) for p, _, _ in rows], pa.int32()),
            "n_rows": pa.array([int(n) for _, n, _ in rows], pa.int64()),
            "n_bytes": pa.array([None if b is None else int(b) for _, _, b in rows], pa.int64()),
            "wall_ms": pa.array([int(wall_ms)] * len(rows), pa.int64()),
            "input_lineage": pa.array([lineage] * len(rows), pa.string()),
        }
    )
    os.makedirs(wh.path("build_metrics"), exist_ok=True)
    pq.write_table(table, os.path.join(wh.path("build_metrics"), f"part-{run_id}-{stage}-{uuid.uuid4().hex}.parquet"))


def _observed(df: DataFrame, stage: str):
    from pyspark.sql import Observation

    obs = Observation(f"obs_{stage}")
    return df.observe(obs, F.count(F.lit(1)).alias("n_rows")), obs


def _stage_done(wh: Warehouse, stage: str, input_id: str, resume: bool) -> bool:
    m = wh.read_manifest(stage)
    return bool(resume and m and m.get("input_id") == input_id and m.get("ok"))


def _make_block_mapper(block_size: int, avgdl: float):
    """mapInPandas kernel over data sorted by (term, salt, doc_id) within
    the partition: emits compressed blocks for every complete (term, salt)
    group in each Arrow batch, carrying the trailing (possibly split)
    group into the next batch. This avoids applyInPandas' per-group
    invocation cost (~100k tiny pandas groups would dominate the stage);
    row-level work is all ndarray ops.
    """

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        term = pdf["term"].to_numpy()
        salt = pdf["salt"].to_numpy()
        bucket = pdf["bucket"].to_numpy()
        doc_ids = pdf["doc_id"].to_numpy().astype(np.int64)
        tfs = pdf["tf"].to_numpy().astype(np.int64)
        doc_lens = pdf["doc_len"].to_numpy().astype(np.int64)
        positions = pdf["positions"].to_numpy()
        denom = tfs + K1 * (1.0 - B + B * doc_lens / max(avgdl, 1e-9))
        wand = tfs * (K1 + 1.0) / denom
        n = len(pdf)
        change = np.flatnonzero((term[1:] != term[:-1]) | (salt[1:] != salt[:-1]))
        starts = np.concatenate(([0], change + 1))
        ends = np.concatenate((starts[1:], [n]))
        out: dict[str, list] = {k: [] for k in (
            "term", "salt", "block_id", "min_doc_id", "max_doc_id", "n_docs",
            "doc_ids", "tfs", "doc_lens", "positions", "block_max_tf", "block_max_wand", "bucket")}
        for s, e in zip(starts, ends):
            for b0 in range(s, e, block_size):
                b1 = min(b0 + block_size, e)
                ids = doc_ids[b0:b1]
                btf = tfs[b0:b1]
                out["term"].append(term[s])
                out["salt"].append(int(salt[s]))
                out["block_id"].append((b0 - s) // block_size)
                out["min_doc_id"].append(int(ids[0]))
                out["max_doc_id"].append(int(ids[-1]))
                out["n_docs"].append(int(b1 - b0))
                out["doc_ids"].append(encode_ids_signed(ids))
                out["tfs"].append(varint_encode(btf.astype(np.uint64)))
                out["doc_lens"].append(varint_encode(doc_lens[b0:b1].astype(np.uint64)))
                out["positions"].append(
                    encode_positions([np.asarray(p, dtype=np.uint64) for p in positions[b0:b1]])
                )
                out["block_max_tf"].append(int(btf.max()))
                out["block_max_wand"].append(float(wand[b0:b1].max()))
                out["bucket"].append(int(bucket[s]))
        return pd.DataFrame(out)

    def mapper(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # hold back the trailing (term, salt) group — it may continue
            # in the next batch (sorted input => groups are contiguous)
            term = pdf["term"].to_numpy()
            salt = pdf["salt"].to_numpy()
            lt, ls = term[-1], salt[-1]
            cut = len(pdf) - 1
            while cut > 0 and term[cut - 1] == lt and salt[cut - 1] == ls:
                cut -= 1
            carry = pdf.iloc[cut:]
            head = pdf.iloc[:cut]
            if len(head):
                yield emit(head)
        if carry is not None and len(carry):
            yield emit(carry)

    return mapper


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

    def finish(stage, t0, rows):
        wall = (time.time() - t0) * 1000
        _write_metrics(spark, wh, run_id, stage, rows, wall, input_id)
        wh.write_manifest(
            stage,
            {"run_id": run_id, "stage": stage, "input_id": input_id, "ok": True, "wall_ms": wall,
             "n_rows": sum(r[1] for r in rows)},
        )

    # ---- stage: extract ----------------------------------------------------
    # one pass writes the whole docs table (identity + doc_len + extracted
    # text); later consumers read it with column pruning, so a separate
    # docs_text checkpoint would only add a stage boundary.
    if not _stage_done(wh, "extract", input_id, resume):
        t0 = time.time()
        has_doc_id = "doc_id" in pages.columns
        base = pages.withColumn(
            "doc_id", F.col("doc_id").cast("long") if has_doc_id else F.xxhash64(F.col("url"))
        )
        # A few giant input files would serialize the extraction UDF; make
        # sure the scan fans out to every core (at cluster scale the input
        # is already thousands of files and this is a no-op).
        target = spark.sparkContext.defaultParallelism * 2
        if base.rdd.getNumPartitions() < target:
            base = base.repartition(target)
        text = extracted_text_col() if from_html else F.col("text")
        dt = base.select("doc_id", "url", "warc_ts", "lang", text.alias("text")).withColumn(
            "doc_len", F.size(tokens_col("text"))
        )
        dt, obs = _observed(dt, "extract")
        dt.write.mode("overwrite").parquet(wh.path("docs"))
        finish("extract", t0, [(-1, obs.get["n_rows"], None)])

    docs = spark.read.parquet(wh.path("docs"))
    docs_text = docs  # column-pruned at every consumer

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
        flat, obs = _observed(flat, "flat")
        # NOT partitionBy(bucket): every consumer (term_stats, blocks) is a
        # full scan, and Hive-partitioning here would fan out into
        # shuffle_partitions x n_buckets tiny files.
        flat.write.mode("overwrite").parquet(wh.path("postings_flat"))
        finish("flat", t0, [(-1, obs.get["n_rows"], None)])

    flat = spark.read.parquet(wh.path("postings_flat"))

    # ---- stage: term_stats + corpus_stats ----------------------------------
    if not _stage_done(wh, "term_stats", input_id, resume):
        t0 = time.time()
        ts = flat.groupBy("term").agg(
            F.count("*").cast("long").alias("df"),
            F.sum("tf").cast("long").alias("cf"),
        )
        ts, obs = _observed(ts, "term_stats")
        ts.write.mode("overwrite").parquet(wh.path("term_stats"))
        cs = docs.agg(
            F.count("*").alias("n_docs"),
            F.coalesce(F.avg("doc_len"), F.lit(0.0)).alias("avgdl"),
            F.coalesce(F.sum("doc_len"), F.lit(0)).cast("long").alias("total_tokens"),
        )
        cs.coalesce(1).write.mode("overwrite").parquet(wh.path("corpus_stats"))
        finish("term_stats", t0, [(-1, obs.get["n_rows"], None)])

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
        # co-locate each (term, salt) group, sort by doc_id, then stream
        # blocks out via mapInPandas (see _make_block_mapper)
        pre = salted.repartition(F.col("term"), F.col("salt")).sortWithinPartitions(
            "term", "salt", "doc_id"
        )
        blocks = pre.mapInPandas(_make_block_mapper(block_size, avgdl), BLOCK_SCHEMA)
        blocks, obs = _observed(blocks, "blocks")
        # one output file per bucket dir (queries partition-prune on the
        # bucket; without this the write fans out into thousands of
        # ~10-row files). At cluster scale raise n_buckets so a bucket
        # stays ~file-sized, or add a second repartition key here.
        blocks = blocks.repartition(n_buckets, "bucket")
        blocks.write.mode("overwrite").partitionBy("bucket").parquet(wh.path("postings"))
        n_blocks = obs.get["n_rows"]
        # per-bucket lineage rows from parquet FOOTERS (driver-side pyarrow
        # metadata walk — no Spark job)
        import glob as _glob

        import pyarrow.parquet as _pq

        per_bucket = []
        for bdir in sorted(_glob.glob(os.path.join(wh.path("postings"), "bucket=*"))):
            bid = int(os.path.basename(bdir).split("=")[1])
            n = sum(_pq.ParquetFile(f).metadata.num_rows for f in _glob.glob(os.path.join(bdir, "*.parquet")))
            nb = sum(os.path.getsize(f) for f in _glob.glob(os.path.join(bdir, "*.parquet")))
            per_bucket.append((bid, n, nb))
        finish("blocks", t0, per_bucket or [(-1, n_blocks, None)])

    from .query import invalidate_cache  # lazy: query imports Warehouse from here

    invalidate_cache(wh.root)
    return wh
