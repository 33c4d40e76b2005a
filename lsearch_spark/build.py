"""Staged inverted-index build: the persistent generalization of what the
reference recomputes per query (More.score re-counts matches on every
invocation, reference search.rs:271-279; content re-read per run,
cli.rs:484-485).

Stages (each a checkpointable DataFrame job with a manifest + metrics):
  extract      pages -> docs(doc_id, url, warc_ts, lang, tokens)
               [Arrow UDF hot path; the corpus is tokenized exactly ONCE,
               here — docs stores the token stream (a forward index), so
               no later stage re-runs translate+split over the text]
  flat         docs -> postings_flat(term, doc_id, tf, positions,
               doc_len, bucket) partitioned by bucket=pmod(xxhash64(term),P);
               doc_len = size(tokens) on the read-back column (cheap)
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
from . import catalog, fsio
from .codec import i64_to_u64_order, varint_encode_segmented
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
        StructField("block_min_wand", DoubleType()),
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
        raw = fsio.read_bytes(self.manifest_path(stage))
        return None if raw is None else json.loads(raw)

    def write_manifest(self, stage: str, payload: dict) -> None:
        fsio.write_bytes(self.manifest_path(stage), json.dumps(payload).encode())

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
    fsio.write_parquet_bytes(
        os.path.join(wh.path("build_metrics"), f"part-{run_id}-{stage}-{uuid.uuid4().hex}.parquet"), table
    )


def _observed(df: DataFrame, stage: str, *extra_aggs):
    from pyspark.sql import Observation

    obs = Observation(f"obs_{stage}")
    return df.observe(obs, F.count(F.lit(1)).alias("n_rows"), *extra_aggs), obs


def _write_corpus_stats(wh: Warehouse, n_docs: int, total_tokens: int) -> None:
    """Single-row stats table, written driver-side (pyarrow through the
    Hadoop FS seam) — schema: n_docs long, avgdl double, total_tokens long."""
    import pyarrow as pa

    fsio.remove(wh.path("corpus_stats"), recursive=True)
    avgdl = (total_tokens / n_docs) if n_docs else 0.0
    table = pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "avgdl": pa.array([avgdl], pa.float64()),
            "total_tokens": pa.array([total_tokens], pa.int64()),
        }
    )
    fsio.write_parquet_bytes(os.path.join(wh.path("corpus_stats"), "part-0.parquet"), table)


def read_docs(spark: SparkSession, wh: Warehouse) -> DataFrame:
    """docs table (doc_id, url, warc_ts, lang, tokens, doc_len) — doc_len
    materialized lazily from the stored token stream (SURVEY §1.2 schema);
    consumers that don't touch tokens/doc_len get them pruned away."""
    d = catalog.read_table(spark, wh.root, "docs")
    return d.withColumn("doc_len", F.size("tokens"))


STAGES = ["extract", "flat", "term_stats", "blocks", "block_stats"]

# bump on any on-disk layout/schema change: folded into the stage
# fingerprint so warehouses built by older code rebuild instead of being
# served with a stale schema
INDEX_FORMAT = 2


def _stage_done(wh: Warehouse, stage: str, fingerprint: str, resume: bool) -> bool:
    m = wh.read_manifest(stage)
    return bool(resume and m and m.get("fingerprint") == fingerprint and m.get("ok"))


def _make_block_mapper(block_size: int, avgdl: float):
    """mapInArrow kernel over data sorted by (term, salt, doc_id) within
    the partition: emits compressed blocks for every complete (term, salt)
    group in each Arrow batch, carrying the trailing (possibly split)
    group into the next batch.

    Arrow-native on purpose: the positions column is a list<int> whose
    values/offsets buffers convert to numpy ZERO-COPY, so the per-doc
    delta-gap encoding is one vectorized pass over every position in the
    batch (a pandas path would materialize millions of python list
    objects). Per-block python work is slicing + one varint encode.
    """
    import pyarrow as pa

    import pyarrow.compute as pc

    def _group_bounds(tbl: pa.Table):
        """change points of (term, salt) without materializing python
        strings — pc.not_equal is a C++ kernel over the whole column."""
        n = tbl.num_rows
        tcol = tbl["term"].combine_chunks()
        salt = tbl["salt"].to_numpy(zero_copy_only=False)
        if n <= 1:
            return np.array([], dtype=np.int64), tcol, salt
        neq_t = pc.not_equal(tcol.slice(1), tcol.slice(0, n - 1)).to_numpy(zero_copy_only=False)
        neq = neq_t | (salt[1:] != salt[:-1])
        return np.flatnonzero(neq), tcol, salt

    def emit(tbl: pa.Table) -> pa.RecordBatch:
        change, tcol, salt = _group_bounds(tbl)
        bucket = tbl["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tfs = tbl["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_lens = tbl["doc_len"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos_arr = tbl["positions"].combine_chunks()
        # offsets index into the (possibly unsliced) child values buffer;
        # .values and .offsets are always mutually consistent, so absolute
        # indexing is correct whether or not the array was sliced
        offsets = np.asarray(pos_arr.offsets, dtype=np.int64)  # len n+1
        pvals = np.asarray(pos_arr.values).astype(np.uint64)

        n = tbl.num_rows
        gstarts = np.concatenate(([0], change + 1))
        gends = np.concatenate((gstarts[1:], [n]))

        # ---- block boundary vectors (no per-group python) ----
        glens = gends - gstarts
        nblk = -(-glens // block_size)
        total = int(nblk.sum())
        gi_rep = np.repeat(np.arange(len(gstarts)), nblk)  # group id per block
        first_blk = np.concatenate(([0], np.cumsum(nblk[:-1]))) if len(nblk) else np.array([], dtype=np.int64)
        bidx = np.arange(total, dtype=np.int64) - np.repeat(first_blk, nblk)
        bstarts = gstarts[gi_rep] + bidx * block_size
        bends = np.minimum(bstarts + block_size, gends[gi_rep])

        # ---- one-pass delta-gap: doc ids reset at BLOCK starts, positions
        # reset at list starts; then ONE segmented varint per column ----
        ids_u = i64_to_u64_order(doc_ids)
        id_gaps = ids_u.copy()
        if n > 1:
            id_gaps[1:] = ids_u[1:] - ids_u[:-1]
        id_gaps[bstarts] = ids_u[bstarts]

        gaps = pvals.copy()
        if len(pvals) > 1:
            gaps[1:] = pvals[1:] - pvals[:-1]
        lidx = offsets[:-1]
        lidx = lidx[lidx < len(pvals)]  # guard: empty lists at the tail
        gaps[lidx] = pvals[lidx]

        ids_b = varint_encode_segmented(id_gaps, bstarts, bends)
        tfs_b = varint_encode_segmented(tfs.astype(np.uint64), bstarts, bends)
        dls_b = varint_encode_segmented(doc_lens.astype(np.uint64), bstarts, bends)
        # positions bounds are ABSOLUTE value indexes into pvals/gaps
        # (offsets and values come from the same ListArray and are always
        # mutually consistent, sliced or not)
        pos_b = (
            varint_encode_segmented(gaps, offsets[bstarts], offsets[bends])
            if len(pvals)
            else [b""] * total
        )

        denom = tfs + K1 * (1.0 - B + B * doc_lens / max(avgdl, 1e-9))
        wand = tfs * (K1 + 1.0) / denom
        bmax_tf = np.maximum.reduceat(tfs, bstarts) if total else np.array([], dtype=np.int64)
        bmax_wand = np.maximum.reduceat(wand, bstarts) if total else np.array([], dtype=np.float64)
        # block_min_wand backs the DRIVER-SIDE top-k lower bound tau: a
        # full block guarantees block_size docs whose score >= idf * min
        # (see query._pruned_block_filter) — no Spark job needed for tau.
        bmin_wand = np.minimum.reduceat(wand, bstarts) if total else np.array([], dtype=np.float64)

        # python strings materialized ONLY at group starts
        start_terms = tcol.take(pa.array(gstarts)).to_pylist()
        terms_per_block = [start_terms[g] for g in gi_rep]

        return pa.record_batch(
            [
                pa.array(terms_per_block, pa.string()),
                pa.array(salt[bstarts].astype(np.int32) if total else [], pa.int32()),
                pa.array(bidx.astype(np.int32), pa.int32()),
                pa.array(doc_ids[bstarts] if total else [], pa.int64()),
                pa.array(doc_ids[bends - 1] if total else [], pa.int64()),
                pa.array((bends - bstarts).astype(np.int32), pa.int32()),
                pa.array(ids_b, pa.binary()),
                pa.array(tfs_b, pa.binary()),
                pa.array(dls_b, pa.binary()),
                pa.array(pos_b, pa.binary()),
                pa.array(bmax_tf.astype(np.int32), pa.int32()),
                pa.array(bmax_wand.astype(np.float64), pa.float64()),
                pa.array(bmin_wand.astype(np.float64), pa.float64()),
                pa.array(bucket[bstarts].astype(np.int32) if total else [], pa.int32()),
            ],
            names=[
                "term", "salt", "block_id", "min_doc_id", "max_doc_id", "n_docs",
                "doc_ids", "tfs", "doc_lens", "positions", "block_max_tf", "block_max_wand",
                "block_min_wand", "bucket",
            ],
        )

    def mapper(batches):
        carry: pa.Table | None = None
        for rb in batches:
            tbl = pa.Table.from_batches([rb])
            if carry is not None and carry.num_rows:
                tbl = pa.concat_tables([carry, tbl]).combine_chunks()
            if not tbl.num_rows:
                continue
            # hold back the trailing (term, salt) group — it may continue
            # in the next batch (sorted input => groups are contiguous)
            change, _, _ = _group_bounds(tbl)
            cut = int(change[-1]) + 1 if len(change) else 0
            carry = tbl.slice(cut)
            if cut:
                yield emit(tbl.slice(0, cut))
        if carry is not None and carry.num_rows:
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
    fsio.mkdirs(wh.root)
    cfg = {"n_buckets": n_buckets, "block_size": block_size, "hot_df": hot_df, "n_salts": n_salts, "k1": K1, "b": B}
    # Resume correctness: stage manifests key on (input_id, config) — a
    # rerun with a different n_buckets/block_size/... must NOT skip stages
    # built under the old config (query-side bucket math would silently
    # diverge from the stored layout). The fingerprint folds the config in,
    # forcing a rebuild on any mismatch.
    fingerprint = f"{input_id}|v{INDEX_FORMAT}|cfg:b{n_buckets}.bs{block_size}.h{hot_df}.s{n_salts}"
    wh.write_manifest("config", cfg)

    def stage_runs(stage: str) -> bool:
        """True if `stage` must (re)run; a rerun invalidates every
        downstream stage's manifest — stale derived tables must never be
        served after an upstream rebuild."""
        if _stage_done(wh, stage, fingerprint, resume):
            return False
        for later in STAGES[STAGES.index(stage) + 1 :]:
            fsio.remove(wh.manifest_path(later))
        return True

    def finish(stage, t0, rows):
        wall = (time.time() - t0) * 1000
        _write_metrics(spark, wh, run_id, stage, rows, wall, input_id)
        wh.write_manifest(
            stage,
            {"run_id": run_id, "stage": stage, "input_id": input_id, "fingerprint": fingerprint,
             "ok": True, "wall_ms": wall, "n_rows": sum(r[1] for r in rows)},
        )

    # ---- stage: extract ----------------------------------------------------
    # one pass writes the whole docs table: identity columns + the token
    # stream (a forward index). Tokenization (translate + regexp split)
    # runs exactly once per document, HERE; every later stage reads the
    # stored tokens. Corpus stats (n_docs, total tokens) fall out of an
    # Observation over the write — no extra job, no re-evaluation of the
    # projection (observe aggregates run over the produced rows).
    if stage_runs("extract"):
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
        dt = base.select("doc_id", "url", "warc_ts", "lang", tokens_col(text).alias("tokens"))
        dt, obs = _observed(dt, "extract", F.sum(F.size("tokens")).alias("total_tokens"))
        catalog.write_table(spark, dt, wh.root, "docs")
        # corpus stats fall out of the same observation — no extra job
        n_docs = int(obs.get["n_rows"])
        total_tokens = int(obs.get["total_tokens"] or 0)
        _write_corpus_stats(wh, n_docs, total_tokens)
        finish("extract", t0, [(-1, n_docs, None)])

    docs_text = catalog.read_table(spark, wh.root, "docs")

    # ---- stage: flat postings ----------------------------------------------
    if stage_runs("flat"):
        t0 = time.time()
        # carry doc_len through the explode so scoring never needs a join
        # against the (huge) docs table — the alternative big-big join on
        # doc_id is the shuffle that would dominate at 100 TB. doc_len is
        # size() of the read-back array: no re-tokenization.
        toks = docs_text.select("doc_id", F.col("tokens").alias("toks")).select(
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
        catalog.write_table(spark, flat, wh.root, "postings_flat")
        finish("flat", t0, [(-1, obs.get["n_rows"], None)])

    flat = catalog.read_table(spark, wh.root, "postings_flat")

    # ---- stage: term_stats + corpus_stats ----------------------------------
    if stage_runs("term_stats"):
        t0 = time.time()
        ts = flat.groupBy("term").agg(
            F.count("*").cast("long").alias("df"),
            F.sum("tf").cast("long").alias("cf"),
        )
        ts, obs = _observed(ts, "term_stats")
        catalog.write_table(spark, ts, wh.root, "term_stats")
        finish("term_stats", t0, [(-1, obs.get["n_rows"], None)])

    # ---- stage: compressed blocks ------------------------------------------
    if stage_runs("blocks"):
        t0 = time.time()
        stats = wh.corpus_stats(spark)
        avgdl = float(stats["avgdl"])
        hot_terms = (
            catalog.read_table(spark, wh.root, "term_stats")
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
        blocks = pre.mapInArrow(_make_block_mapper(block_size, avgdl), BLOCK_SCHEMA)
        blocks, obs = _observed(blocks, "blocks")
        # one output file per bucket dir (queries partition-prune on the
        # bucket; without this the write fans out into thousands of
        # ~10-row files). At cluster scale raise n_buckets so a bucket
        # stays ~file-sized, or add a second repartition key here.
        blocks = blocks.repartition(n_buckets, "bucket")
        catalog.write_table(spark, blocks, wh.root, "postings", partition_by=["bucket"])
        n_blocks = obs.get["n_rows"]
        per_bucket = []
        if catalog.iceberg_catalog(spark) is not None:
            pass  # Iceberg keeps its own per-file lineage in table metadata
        elif not fsio.has_scheme(wh.root):
            # per-bucket lineage rows from parquet FOOTERS (driver-side
            # pyarrow metadata walk — no Spark job)
            import pyarrow.parquet as _pq

            for bdir in fsio.list_glob(os.path.join(wh.path("postings"), "bucket=*")):
                bid = int(os.path.basename(bdir).split("=")[1])
                files = fsio.file_sizes(os.path.join(bdir, "*.parquet"))
                n = sum(_pq.ParquetFile(f).metadata.num_rows for f, _ in files)
                per_bucket.append((bid, n, sum(sz for _, sz in files)))
        else:
            # remote warehouse: one cheap partition-column-only agg
            counts = {
                int(r["bucket"]): int(r["n"])
                for r in spark.read.parquet(wh.path("postings")).groupBy("bucket").agg(F.count("*").alias("n")).collect()
            }
            for bdir in fsio.list_glob(os.path.join(wh.path("postings"), "bucket=*")):
                bid = int(bdir.rsplit("=", 1)[1])
                nb = sum(sz for _, sz in fsio.file_sizes(bdir + "/*.parquet"))
                per_bucket.append((bid, counts.get(bid, 0), nb))
        finish("blocks", t0, per_bucket or [(-1, n_blocks, None)])

    # ---- stage: per-term block summary (query-side pruning metadata) --------
    # One tiny row per term: enough for the query planner to compute WAND
    # upper bounds AND a valid top-k lower bound tau entirely driver-side,
    # with zero extra Spark jobs per query (the round-1 pruned path ran 3).
    #
    # top_wands = the K_TOP largest block_max_wand values of the term.
    # Every block max is ACHIEVED by a real doc in that block, and the
    # achieving docs of distinct blocks are distinct — so the k-th entry
    # is a valid (and tight) lower bound on the k-th best single-term
    # score: for a stopword query the pruned scan keeps ~k blocks instead
    # of the whole salted posting list.
    #
    # Skew note: the top-k-per-term agg is two-phase over the existing
    # salt, so no task ever collects an unsalted stopword's full block
    # list — group sizes are bounded by max(hot_df, df/n_salts)/block_size.
    # The scan reads only small meta columns; parquet column pruning never
    # touches the compressed binary blobs.
    if stage_runs("block_stats"):
        t0 = time.time()
        K_TOP = 32
        pb = catalog.read_table(spark, wh.root, "postings")
        partial = pb.groupBy("term", "salt").agg(
            F.count("*").cast("long").alias("nb"),
            F.sum("n_docs").cast("long").alias("np"),
            F.slice(F.sort_array(F.collect_list("block_max_wand"), asc=False), 1, K_TOP).alias("tw"),
        )
        bs = (
            partial.groupBy("term")
            .agg(
                F.sum("nb").alias("n_blocks"),
                F.sum("np").alias("n_postings"),
                F.slice(F.sort_array(F.flatten(F.collect_list("tw")), asc=False), 1, K_TOP).alias("top_wands"),
            )
            .withColumn("ub_wand", F.col("top_wands")[0])
        )
        bs, obs = _observed(bs, "block_stats")
        catalog.write_table(spark, bs, wh.root, "term_block_stats")
        finish("block_stats", t0, [(-1, obs.get["n_rows"], None)])

    from .query import invalidate_cache  # lazy: query imports Warehouse from here

    invalidate_cache(wh.root)
    return wh
