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
    sort_by: list[str] | None = None,
    row_group_bytes: int | None = None,
) -> str:
    """Replace-write a table; returns the identifier/path written.

    sort_by + row_group_bytes control parquet ROW-GROUP SKIPPING: sorting
    within files clusters a filter column's values so row-group min/max
    stats become selective, and smaller row groups make the skip
    granularity useful (a default 128MB group is one-per-file here, so
    nothing can skip). The query side's term/block_max_wand pushdown
    relies on this for the posting tables."""
    cat = iceberg_catalog(spark)
    if cat is not None:
        ident = _ident(cat, wh_root, name)
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {cat}.{ident.split('.')[1]}")
        if sort_by:
            df = df.sortWithinPartitions(*sort_by)
        w = df.writeTo(ident)
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        w.createOrReplace()
        return ident
    path = os.path.join(wh_root, name)
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    writer = df.write.mode("overwrite")
    if row_group_bytes:
        writer = writer.option("parquet.block.size", int(row_group_bytes))
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


# Parquet-fallback segment resolution (build.append_index): appended
# segments stage EVERY output under <root>/_segments/seg{n}/<table> and
# commit by flipping n_appends in the config manifest — one atomic
# control-file write. read_table therefore resolves:
#   append-only tables  -> base dir UNION all committed segment dirs
#   replaced tables     -> the NEWEST committed segment's merged copy
# A segment dir without the table (old-layout warehouses, or tables a
# segment didn't touch) is simply skipped, so pre-segment warehouses
# keep reading their in-place tables unchanged.
_APPEND_TABLES = {"docs", "postings_flat", "postings"}
_REPLACED_TABLES = {"term_stats", "term_block_stats", "corpus_stats"}


def _n_appends(wh_root: str) -> int:
    import json

    from . import fsio

    raw = fsio.read_bytes(os.path.join(wh_root, "_manifests", "config.json"))
    if raw is None:
        return 0
    return int(json.loads(raw).get("n_appends", 0) or 0)


def seg_table_path(wh_root: str, n: int, name: str) -> str:
    return os.path.join(wh_root, "_segments", f"seg{n}", name)


def read_table(spark: SparkSession, wh_root: str, name: str) -> DataFrame:
    cat = iceberg_catalog(spark)
    if cat is not None:
        return spark.read.table(_ident(cat, wh_root, name))
    from . import fsio

    base = os.path.join(wh_root, name)
    n = _n_appends(wh_root) if name in (_APPEND_TABLES | _REPLACED_TABLES) else 0
    if not n:
        return spark.read.parquet(base)
    if name in _REPLACED_TABLES:
        for i in range(n, 0, -1):
            p = seg_table_path(wh_root, i, name)
            if fsio.exists(p):
                return spark.read.parquet(p)
        return spark.read.parquet(base)
    # append-only: one read per root (Spark refuses multi-root partition
    # discovery), unioned by name; filters and partition pruning push
    # through the Union into each scan
    paths = [base] if fsio.exists(base) else []
    paths += [
        p for i in range(1, n + 1) if fsio.exists(p := seg_table_path(wh_root, i, name))
    ]
    if not paths:
        return spark.read.parquet(base)  # surface the normal missing-table error
    dfs = [spark.read.parquet(p) for p in paths]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out
