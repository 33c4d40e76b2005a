"""Catalog shim (SURVEY §1.2): Iceberg-or-parquet table IO seam."""

from pyspark.sql import functions as F

from lsearch_spark import catalog


class _FakeConf:
    def __init__(self, items):
        self._items = items

    def getAll(self):
        return self._items


class _FakeSC:
    def __init__(self, items):
        self._conf = _FakeConf(items)

    def getConf(self):
        return self._conf


class _FakeSpark:
    def __init__(self, items):
        self.sparkContext = _FakeSC(items)


def test_iceberg_catalog_detection():
    assert (
        catalog.iceberg_catalog(
            _FakeSpark([("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")])
        )
        == "ice"
    )
    # sub-keys (catalog options) and unrelated confs must not match
    assert catalog.iceberg_catalog(_FakeSpark([("spark.sql.catalog.ice.type", "hadoop")])) is None
    assert catalog.iceberg_catalog(_FakeSpark([("spark.app.name", "x")])) is None
    assert (
        catalog.iceberg_catalog(_FakeSpark([("spark.sql.catalog.h", "org.apache.spark.sql.HiveCatalog")]))
        is None
    )


def test_parquet_fallback_roundtrip(spark, tmp_path):
    """No Iceberg jars in this sandbox -> the shim's active branch is the
    partitioned-parquet fallback; layout must match what the query side's
    partition pruning expects (Hive bucket dirs)."""
    root = str(tmp_path / "wh")
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 4).cast("int").alias("bucket")
    )
    where = catalog.write_table(spark, df, root, "postings", partition_by=["bucket"])
    assert where.endswith("/postings")
    back = catalog.read_table(spark, root, "postings")
    assert back.count() == 100
    plan = (
        back.filter(F.col("bucket") == 2)._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters")[1][:150], plan
