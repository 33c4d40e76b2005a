"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: zip_with + aggregate dot product, entirely
  JVM-side, then TakeOrderedAndProject — the exact baseline.
- LSH (random-hyperplane signatures): deterministic seeded planes; a
  query probes its own bucket plus all 1-bit-flip neighbors, exact
  cosine rerank inside the probed buckets. At 100 TB the signature is a
  partition/cluster key so a probe touches a handful of partitions
  instead of the full table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lit_vec(vec) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0)).cast("double")


def cosine_topk(
    df: DataFrame, query_vec, k: int = 10, id_col: str = "vec_id", emb_col: str = "embedding"
) -> DataFrame:
    """Exact top-k by cosine to a literal query vector; deterministic
    tie-break (cosine DESC, id ASC)."""
    q = _lit_vec(query_vec)
    return (
        df.select(F.col(id_col), cosine(F.col(emb_col), q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 7) -> np.ndarray:
    return np.random.RandomState(seed).normal(size=(n_planes, dim))


def lsh_signature(emb: Column, planes: np.ndarray) -> Column:
    """Pack sign(dot(emb, plane_i)) bits into an int signature (JVM-side)."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        bit = F.when(dot(emb, _lit_vec(p)) > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseOR(F.shiftleft(bit, i))
    return sig


def _probe_sigs(qsig: int, n_planes: int, radius: int = 1) -> list[int]:
    sigs = {qsig}
    if radius >= 1:
        sigs |= {qsig ^ (1 << i) for i in range(n_planes)}
    if radius >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                sigs.add(qsig ^ (1 << i) ^ (1 << j))
    return sorted(sigs)


def _query_sig(query_vec, planes: np.ndarray) -> int:
    qvec = np.asarray(query_vec, dtype=np.float64)
    qsig = 0
    for i, p in enumerate(planes):
        if float(np.dot(qvec, p)) > 0:
            qsig |= 1 << i
    return qsig


def cosine_topk_lsh(
    df: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_planes: int = 12,
    radius: int = 2,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k with ON-THE-FLY signatures: every query still
    scans the full table (the signature filter cannot prune the scan
    because it is computed per row at query time). Correct, but NOT the
    scale path — use build_ann_index + cosine_topk_lsh_indexed, which
    materializes `_sig` as a partition column so a probe reads only the
    matching partition directories."""
    planes = hyperplanes(len(query_vec), n_planes, seed)
    probes = _probe_sigs(_query_sig(query_vec, planes), n_planes, radius)
    sig = lsh_signature(F.col(emb_col), planes)
    bucketed = df.withColumn("_sig", sig).filter(F.col("_sig").isin(probes))
    return cosine_topk(bucketed, query_vec, k, id_col, emb_col)


def build_ann_index(
    spark,
    df: DataFrame,
    path: str,
    emb_col: str = "embedding",
    n_planes: int = 12,
    seed: int = 7,
    dim: int | None = None,
) -> str:
    """Materialize LSH signatures at INGEST and write the table Hive-
    partitioned by `_sig` (the 100 TB path): signatures are computed once
    per row ever, and a query's multi-probe bucket set becomes partition
    pruning — the scan touches ~(1 + n_planes + C(n_planes,2)) of the
    2^n_planes directories instead of the full table. Size n_planes so
    each partition holds ~rows/2^n_planes vectors (bigger corpora take
    more planes, keeping probed bytes roughly constant)."""
    if dim is None:
        dim = int(df.select(F.size(emb_col).alias("d")).first()["d"])
    planes = hyperplanes(dim, n_planes, seed)
    out = df.withColumn("_sig", lsh_signature(F.col(emb_col), planes))
    # one shuffle co-locates each signature -> one file per partition dir
    out.repartition(F.col("_sig")).write.mode("overwrite").partitionBy("_sig").parquet(path)
    return path


def cosine_topk_lsh_indexed(
    spark,
    index_path: str,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_planes: int = 12,
    radius: int = 2,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k over a build_ann_index table: filter on the
    `_sig` PARTITION column (partition-pruned scan), exact cosine rerank
    inside the probed buckets. Same results as cosine_topk_lsh with the
    same planes/probes — minus the full-table scan."""
    planes = hyperplanes(len(query_vec), n_planes, seed)
    probes = _probe_sigs(_query_sig(query_vec, planes), n_planes, radius)
    df = spark.read.parquet(index_path).filter(F.col("_sig").isin(probes))
    return cosine_topk(df, query_vec, k, id_col, emb_col)


# ------------------------------------------------------------------- IVF
def ivf_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = 7,
    sample: int = 16_384,
    iters: int = 8,
) -> np.ndarray:
    """Deterministic spherical k-means centroids (unit rows, shape
    (n_centroids, dim)) from a BOUNDED pseudo-random sample: rows are
    ranked by xxhash64(id) and the smallest `sample` collected (one
    TakeOrdered job — deterministic for any input order, and at 100 TB
    the driver still holds only `sample` vectors; centroid geometry
    needs thousands of points, not the corpus). Lloyd iterations run in
    numpy on the driver; empty clusters are re-seeded deterministically
    from the sample."""
    rows = (
        df.select(F.col(emb_col).alias("e"), F.xxhash64(F.col(id_col)).alias("h"))
        .orderBy("h")
        .limit(sample)
        .collect()
    )
    X = np.asarray([r["e"] for r in rows], dtype=np.float64)
    return ivf_centroids_np(X, n_centroids, seed, iters)


def ivf_centroids_np(X: np.ndarray, n_centroids: int, seed: int = 7, iters: int = 8) -> np.ndarray:
    """Driver-side Lloyd core on an already-collected sample (row order
    matters for bit-identical centroids — callers order by xxhash64(id)).
    Exposed so Spark-free twins (entry oracles) can replay it exactly."""
    if X.ndim != 2 or len(X) == 0:
        raise ValueError("ivf_centroids: need a non-empty 2-D sample of embeddings")
    nz = np.linalg.norm(X, axis=1)
    X = X[nz > 0] / nz[nz > 0, None]
    if len(X) == 0:
        raise ValueError("ivf_centroids: every sampled embedding is zero-norm")
    rng = np.random.RandomState(seed)
    k = min(n_centroids, len(X))
    C = X[rng.choice(len(X), size=k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(k):
            pts = X[assign == c]
            if len(pts):
                m = pts.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    C[c] = m / n
            else:
                C[c] = X[rng.randint(len(X))]
    return C


def ivf_assign(emb_col: Column, centroids: np.ndarray) -> Column:
    """Nearest-centroid id (cosine argmax) as an Arrow-vectorized pandas
    UDF — one numpy matmul per batch, no per-row Python."""
    from pyspark.sql.functions import pandas_udf

    C = np.ascontiguousarray(centroids, dtype=np.float64)

    @pandas_udf("int")
    def _assign(v: pd.Series) -> pd.Series:
        M = np.asarray([np.asarray(x, dtype=np.float64) for x in v], dtype=np.float64)
        if M.size == 0:
            return pd.Series(np.empty(0, np.int32))
        nrm = np.linalg.norm(M, axis=1)
        nrm[nrm == 0] = 1.0
        return pd.Series(np.argmax((M / nrm[:, None]) @ C.T, axis=1).astype(np.int32))

    return _assign(emb_col)


def build_ivf_index(
    spark,
    df: DataFrame,
    path: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = 7,
    sample: int = 16_384,
    iters: int = 8,
) -> str:
    """IVF index: spherical-k-means centroids (driver-side over a bounded
    sample), then ONE pass assigns every vector to its nearest centroid
    and writes the table Hive-partitioned by `_cid` (the coarse inverted
    file). A query ranks the k centroids on the driver (tiny sidecar)
    and probes only the top-nprobe partition directories — the classic
    IVF-Flat trade: scanned fraction ~ nprobe/n_centroids instead of
    radius-limited LSH buckets. Size n_centroids ~ sqrt(n_rows/target
    partition rows) at scale; centroids live in `<path>/centroids.parquet`,
    data under `<path>/data/_cid=*/`."""
    C = ivf_centroids(df, n_centroids, id_col, emb_col, seed, sample, iters)
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(C)], "cid int, centroid array<double>"
    )
    cdf.coalesce(1).write.mode("overwrite").parquet(path + "/centroids.parquet")
    out = df.withColumn("_cid", ivf_assign(F.col(emb_col), C))
    out.repartition(F.col("_cid")).write.mode("overwrite").partitionBy("_cid").parquet(path + "/data")
    return path


def cosine_topk_ivf(
    spark,
    index_path: str,
    query_vec,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k over a build_ivf_index table: rank centroids by
    cosine to the query ON THE DRIVER (the sidecar is n_centroids rows),
    partition-prune the scan to the top-nprobe `_cid` directories, exact
    cosine rerank inside. nprobe == n_centroids degrades to exact
    brute-force (tested); recall rises monotonically with nprobe."""
    crows = spark.read.parquet(index_path + "/centroids.parquet").collect()
    C = np.asarray([r["centroid"] for r in sorted(crows, key=lambda r: r["cid"])], dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    sims = C @ (q / qn if qn > 0 else q)
    probes = [int(c) for c in np.argsort(-sims)[: max(1, nprobe)]]
    df = spark.read.parquet(index_path + "/data").filter(F.col("_cid").isin(probes))
    return cosine_topk(df, query_vec, k, id_col, emb_col)


def cosine_topk_ivf_batch(
    spark,
    index_path: str,
    queries: dict,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Amortized multi-query IVF: ONE partition-pruned scan serves every
    query (the ANN analog of query.batch_search). The scan reads the
    UNION of all queries' top-nprobe `_cid` partitions once; a tiny
    broadcast (query_id, _cid, qvec) map fans each row out to exactly
    the queries probing its partition; cosine is the same JVM-side
    zip_with/aggregate fold; per-query top-k comes from one window.
    Per query the probed set is identical to cosine_topk_ivf's, so
    results match the single-query path exactly.

    queries: {query_id: vector}. Returns DataFrame(query_id, vec_id,
    cosine) ordered (query_id ASC, cosine DESC, vec_id ASC)."""
    from pyspark.sql import Window

    crows = spark.read.parquet(index_path + "/centroids.parquet").collect()
    C = np.asarray([r["centroid"] for r in sorted(crows, key=lambda r: r["cid"])], dtype=np.float64)
    pairs = []
    for qid, qv in queries.items():
        q = np.asarray(qv, dtype=np.float64)
        qn = np.linalg.norm(q)
        sims = C @ (q / qn if qn > 0 else q)
        for c in np.argsort(-sims)[: max(1, nprobe)]:
            pairs.append((str(qid), int(c), [float(x) for x in qv]))
    if not pairs:
        return spark.createDataFrame([], "query_id string, vec_id long, cosine double")
    pmap = spark.createDataFrame(pairs, "query_id string, _cid int, qvec array<double>")
    df = spark.read.parquet(index_path + "/data").filter(
        F.col("_cid").isin(sorted({c for _, c, _ in pairs}))
    )
    scored = df.join(F.broadcast(pmap), "_cid").select(
        "query_id", F.col(id_col), cosine(F.col(emb_col), F.col("qvec")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", id_col, "cosine")
        .orderBy("query_id", F.desc("cosine"), F.asc(id_col))
    )


def embedding_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 7,
    dim: int | None = None,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold: exact-match
    LSH-bucket self-join candidates, exact cosine verify.

    `max_bucket` caps degenerate signature buckets before the self-join —
    at web scale many documents embed identically (empty/boilerplate pages
    collapse to one signature), and an uncapped bucket makes the self-join
    O(n^2). Members of an over-full bucket are dropped from THIS candidate
    pass; such exact-duplicate clusters belong to exact dedup
    (dedup.exact_groups on a vector hash), which finds them in one groupBy.
    Pass max_bucket=None for the uncapped exact-semantics variant.
    """
    first = df.select(F.size(emb_col).alias("d")).first()
    planes = hyperplanes(dim or int(first["d"]), n_planes, seed)
    sigs = df.select(F.col(id_col).alias("id"), F.col(emb_col).alias("e"), lsh_signature(F.col(emb_col), planes).alias("sig"))
    if max_bucket is not None:
        small = (
            sigs.groupBy("sig")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") <= max_bucket)
            .select("sig")
        )
        sigs = sigs.join(small, ["sig"], "left_semi")
    a, b = sigs.alias("a"), sigs.alias("b")
    return (
        a.join(b, (F.col("a.sig") == F.col("b.sig")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            cosine(F.col("a.e"), F.col("b.e")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
