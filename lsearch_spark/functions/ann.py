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
    """Approximate top-k: filter to multi-probe LSH buckets, exact rerank.
    Recall grows with radius; the scan touches only matching buckets
    (at scale: partition-pruned when the table is written partitioned
    by signature)."""
    planes = hyperplanes(len(query_vec), n_planes, seed)
    qvec = np.asarray(query_vec, dtype=np.float64)
    qsig = 0
    for i, p in enumerate(planes):
        if float(np.dot(qvec, p)) > 0:
            qsig |= 1 << i
    probes = _probe_sigs(qsig, n_planes, radius)
    sig = lsh_signature(F.col(emb_col), planes)
    bucketed = df.withColumn("_sig", sig).filter(F.col("_sig").isin(probes))
    return cosine_topk(bucketed, query_vec, k, id_col, emb_col)


def embedding_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold: exact-match
    LSH-bucket self-join candidates, exact cosine verify."""
    first = df.select(F.size(emb_col).alias("d")).first()
    planes = hyperplanes(dim or int(first["d"]), n_planes, seed)
    sigs = df.select(F.col(id_col).alias("id"), F.col(emb_col).alias("e"), lsh_signature(F.col(emb_col), planes).alias("sig"))
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
