"""Iceberg-or-parquet catalog shim (SURVEY §1.2's promise, made real).

Every engine TABLE (docs, postings_flat, term_stats, postings,
term_block_stats) is written and read through this seam:

- When the session has an Iceberg catalog configured
  (``spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog``
  with the iceberg-spark-runtime jars on the classpath), tables go
  through DataFrameWriterV2 (``df.writeTo(ident).createOrReplace()``)
  and come back via ``spark.read.table`` — snapshots, partition
  transforms and data-file pruning are Iceberg's.
- Otherwise (this sandbox ships no Iceberg jars) the same calls fall
  back to partitioned parquet under the warehouse root with identical
  schemas and identical partition layout, so every downstream plan —
  including the bucket partition pruning the query side relies on — is
  unchanged.

Control-plane files (manifests, corpus_stats, metrics) are deliberately
NOT tables: they go through the Hadoop FS seam in fsio.py.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

_NAMESPACE = "lsearch"
_CAT_RE = re.compile(r"^spark\.sql\.catalog\.([A-Za-z0-9_]+)$")


def iceberg_catalog(spark: SparkSession) -> str | None:
    """Name of a configured Iceberg catalog, or None (parquet fallback)."""
    for k, v in spark.sparkContext.getConf().getAll():
        m = _CAT_RE.match(k)
        if m and "iceberg" in (v or "").lower():
            return m.group(1)
    return None


def _ident(cat: str, wh_root: str, name: str) -> str:
    # one namespace per warehouse root so multiple warehouses coexist.
    # The basename alone is NOT unique (two roots ending in a common dir
    # name like .../wh would clobber each other's tables), so a short
    # hash of the full normalized root is folded into the namespace.
    import hashlib

    norm = os.path.normpath(wh_root)
    suffix = re.sub(r"[^A-Za-z0-9_]", "_", os.path.basename(norm))
    digest = hashlib.sha1(norm.encode()).hexdigest()[:8]
    return f"{cat}.{_NAMESPACE}_{suffix}_{digest}.{name}"


def write_table(
    spark: SparkSession,
    df: DataFrame,
    wh_root: str,
    name: str,
    partition_by: list[str] | None = None,
) -> str:
    """Replace-write a table; returns the identifier/path written."""
    cat = iceberg_catalog(spark)
    if cat is not None:
        ident = _ident(cat, wh_root, name)
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {cat}.{ident.split('.')[1]}")
        w = df.writeTo(ident)
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        w.createOrReplace()
        return ident
    path = os.path.join(wh_root, name)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return path


def append_table(
    spark: SparkSession,
    df: DataFrame,
    wh_root: str,
    name: str,
    partition_by: list[str] | None = None,
) -> str:
    """Append rows to an existing table (Iceberg append snapshot, or
    parquet mode=append in the fallback)."""
    cat = iceberg_catalog(spark)
    if cat is not None:
        ident = _ident(cat, wh_root, name)
        df.writeTo(ident).append()
        return ident
    path = os.path.join(wh_root, name)
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return path


def read_table(spark: SparkSession, wh_root: str, name: str) -> DataFrame:
    cat = iceberg_catalog(spark)
    if cat is not None:
        return spark.read.table(_ident(cat, wh_root, name))
    return spark.read.parquet(os.path.join(wh_root, name))
