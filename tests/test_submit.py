"""north_rule clause: 'run via spark-submit --py-files on a multi-executor
cluster'. This smoke proves the package ships as a zip and the whole
build+query path runs under a REAL spark-submit with the code imported
from --py-files (cwd and PYTHONPATH point away from the repo)."""

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

_JOB = """
from pyspark.sql import SparkSession

spark = SparkSession.builder.getOrCreate()
from lsearch_spark.corpus import pages_df
from lsearch_spark.build import build_index
from lsearch_spark.query import search

wh = build_index(
    spark, pages_df(spark, 200), WAREHOUSE,
    n_buckets=2, block_size=32, hot_df=64, n_salts=2, input_id="submit",
)
rows = search(spark, wh, "biology -chemistry", k=10).collect()
assert rows and rows[0]["score"] >= rows[-1]["score"]
print(f"SUBMIT_OK rows={len(rows)}")
spark.stop()
"""


def test_spark_submit_py_files(tmp_path):
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(spark_submit):
        pytest.skip("spark-submit not installed")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    z = tmp_path / "lsearch_spark.zip"
    with zipfile.ZipFile(z, "w") as zf:
        pkg = os.path.join(repo, "lsearch_spark")
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, repo))
    job = tmp_path / "job.py"
    job.write_text(f"WAREHOUSE = {str(tmp_path / 'wh')!r}\n" + _JOB)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(z), str(job),
        ],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=420, env=env,
    )
    assert out.returncode == 0, (out.stdout[-1500:], out.stderr[-1500:])
    assert "SUBMIT_OK rows=10" in out.stdout
