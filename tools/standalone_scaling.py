"""Standalone-cluster scaling evidence (north_rule: throughput scaling
between 'N and 4N executor clusters', shipped 'via spark-submit --py-files').

bench.py's local[4]->local[16] pair shares ONE JVM, so it evidences thread
scaling. This runner starts a REAL Spark standalone cluster on this machine
— a Master plus four 4-core Workers launched directly from pyspark's own
jars — and spark-submits the SAME index build twice with fixed 4-core
executors:

    N  cluster: --total-executor-cores  4  -> 1 executor  JVM
    4N cluster: --total-executor-cores 16  -> 4 executor JVMs

Executors are separate JVMs with real Netty block transfer and their own
Python worker pools — the closest a single box gets to two cluster sizes.
Memory bandwidth is still shared (same machine), so bench.py's memcpy
control remains the environment attribution for any sub-linear residual.

The job also collects a BM25 top-10 inside each cluster and the runner
asserts the two clusters return IDENTICAL rows — the determinism-under-
cluster-size claim (doc_id = xxhash64(url), deterministic tie-breaks)
checked on real multi-executor plans, not local mode.

Usage:  python tools/standalone_scaling.py [n_docs] [reps]
Defaults 200_000 docs, 2 reps (best-of). Prints one JSON line.
Importable: run_standalone_scaling() is called by bench.py at sf0.1.
"""

from __future__ import annotations

import json
import os
import shutil
import socket
import subprocess
import sys
import time
import urllib.request
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHM = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"

_JOB = """
import sys, time
from pyspark.sql import SparkSession

corpus, wh_dir, cores = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = SparkSession.builder.getOrCreate()
from lsearch_spark.build import build_index
from lsearch_spark.query import search

spark.range(1_000_000).selectExpr("sum(id)").collect()  # executor warm-up
t0 = time.time()
build_index(
    spark, corpus, wh_dir,
    n_buckets="auto", block_size=128, hot_df=2048, n_salts=4,
    run_id=f"standalone{cores}", input_id=corpus, resume=False, from_html=True,
)
print(f"BUILD_SECONDS={time.time() - t0:.3f}", flush=True)
rows = search(spark, wh_dir, "biology -chemistry", k=10).collect()
print("TOP10=" + repr([(int(r["doc_id"]), round(float(r["score"]), 9)) for r in rows]), flush=True)
spark.stop()
"""


def _pyspark_home() -> str:
    import pyspark

    return os.path.dirname(pyspark.__file__)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _wait_port(port: int, timeout: float = 30.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=1):
                return
        except OSError:
            time.sleep(0.3)
    raise TimeoutError(f"port {port} never opened")


def _package_zip(dest: str) -> str:
    with zipfile.ZipFile(dest, "w") as zf:
        pkg = os.path.join(REPO, "lsearch_spark")
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return dest


class StandaloneCluster:
    """Master + n_workers Workers as child JVMs; context-managed teardown."""

    def __init__(self, n_workers: int = 4, cores_per_worker: int = 4, memory: str = "8g"):
        self.n_workers = n_workers
        self.cores = cores_per_worker
        self.memory = memory
        self.procs: list[subprocess.Popen] = []
        self.master_port = _free_port()
        self.master_ui = _free_port()
        self.url = f"spark://127.0.0.1:{self.master_port}"

    def _spawn(self, klass: str, *args: str) -> subprocess.Popen:
        cp = os.path.join(_pyspark_home(), "jars", "*")
        cmd = ["java", "-cp", cp, "-Xmx1g", klass, *args]
        # SPARK_HOME + SPARK_SCALA_VERSION: the Worker builds each
        # executor's launch command through the launcher library, which
        # in a pip-installed pyspark (no RELEASE marker, no build dirs)
        # throws 'Cannot find any build directories' unless the scala
        # version is pinned explicitly
        return subprocess.Popen(
            cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            env={
                **os.environ,
                "SPARK_LOCAL_IP": "127.0.0.1",
                "SPARK_HOME": _pyspark_home(),
                "SPARK_SCALA_VERSION": "2.13",
            },
        )

    def __enter__(self) -> "StandaloneCluster":
        self.procs.append(
            self._spawn(
                "org.apache.spark.deploy.master.Master",
                "--host", "127.0.0.1", "--port", str(self.master_port),
                "--webui-port", str(self.master_ui),
            )
        )
        _wait_port(self.master_port)
        for i in range(self.n_workers):
            wd = os.path.join(SHM, f"spark-standalone-worker-{i}")
            shutil.rmtree(wd, ignore_errors=True)
            self.procs.append(
                self._spawn(
                    "org.apache.spark.deploy.worker.Worker",
                    "--cores", str(self.cores), "--memory", self.memory,
                    "--webui-port", str(_free_port()), "--work-dir", wd,
                    self.url,
                )
            )
        self._wait_workers()
        return self

    def _wait_workers(self, timeout: float = 60.0) -> None:
        t0 = time.time()
        while time.time() - t0 < timeout:
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{self.master_ui}/json/", timeout=2
                ) as r:
                    st = json.load(r)
                alive = [w for w in st.get("workers", []) if w.get("state") == "ALIVE"]
                if len(alive) >= self.n_workers:
                    return
            except Exception:  # noqa: BLE001 — master UI not up yet
                pass
            time.sleep(0.5)
        raise TimeoutError(f"only saw workers after {timeout}s; wanted {self.n_workers}")

    def __exit__(self, *exc) -> None:
        for p in reversed(self.procs):
            p.terminate()
        for p in self.procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()


def _submit_build(cluster_url: str, zip_path: str, job_path: str, corpus: str,
                  total_cores: int, timeout: int = 420) -> tuple[float, str]:
    """One spark-submit --py-files run; returns (build_seconds, top10_repr)."""
    spark_submit = shutil.which("spark-submit") or os.path.join(
        _pyspark_home(), "bin", "spark-submit"
    )
    wh_dir = os.path.join(SHM, f"lsearch_standalone_wh_{total_cores}")
    shutil.rmtree(wh_dir, ignore_errors=True)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            spark_submit,
            "--master", cluster_url,
            "--total-executor-cores", str(total_cores),
            "--conf", "spark.executor.cores=4",
            "--conf", "spark.executor.memory=6g",
            "--conf", f"spark.sql.shuffle.partitions={2 * total_cores}",
            "--conf", "spark.sql.adaptive.enabled=true",
            "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
            "--conf", "spark.ui.enabled=false",
            "--conf", f"spark.local.dir={SHM}/spark-standalone-local",
            "--py-files", zip_path,
            job_path, corpus, wh_dir, str(total_cores),
        ],
        capture_output=True, text=True, timeout=timeout, env=env,
        cwd=os.path.dirname(job_path),
    )
    if out.returncode != 0:
        raise RuntimeError(
            f"spark-submit rc={out.returncode}\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
        )
    sec, top = None, None
    for line in out.stdout.splitlines():
        if line.startswith("BUILD_SECONDS="):
            sec = float(line.split("=", 1)[1])
        elif line.startswith("TOP10="):
            top = line.split("=", 1)[1]
    if sec is None or top is None:
        raise RuntimeError(f"job produced no markers:\n{out.stdout[-2000:]}")
    return sec, top


def run_standalone_scaling(
    n_docs: int = 200_000,
    reps: int = 2,
    deadline_s: float = 480.0,
    max_attempts: int = 2,
    probe_tol: float = 0.05,
) -> dict:
    """Build at 1-executor (N) and 4-executor (4N) cluster sizes; returns
    {'docs_per_sec_1x', 'docs_per_sec_4x', 'efficiency', 'top10_identical',
    'build_secs': {...}} — best-of-`reps`, sizes interleaved.

    deadline_s bounds EACH attempt: later reps are skipped once the
    deadline passes (each size always completes at least once). The
    caller (bench.py, inside the driver's budget) must always reach its
    final metric line — a throttle-phase 1-executor build can take 2-3x
    its healthy wall, and four of those would otherwise stack up.

    STABLE-PHASE protocol (VERDICT r6 #7): the efficiency number is only
    engine evidence when the machine phase held still across the
    measurement — i.e. the before/after memcpy probes agree. When they
    disagree by more than probe_tol, the whole pair is re-measured (up
    to max_attempts); the returned row carries `probes_stable` and
    `attempts` so a phase-swing row can never be silently read as an
    engine number.

    MEASURED NETTING (VERDICT r7 #5): each cluster size also runs ONE
    calibration build over a ~2k-doc corpus through the identical submit
    path — its in-job BUILD_SECONDS is almost pure fixed overhead (stage
    floors, python-pool spin-up, codegen, committer init) with
    negligible data work. `efficiency_netted` recomputes the pair on
    (build - calibration) walls, so the netting is measured per size in
    the same session, not inferred; `efficiency` stays the raw number."""
    sys.path.insert(0, REPO)
    import bench  # reuses the deterministic tmpfs corpus cache

    corpus = bench.corpus_parquet(n_docs)
    work = os.path.join(SHM, "lsearch_standalone")
    os.makedirs(work, exist_ok=True)
    zip_path = _package_zip(os.path.join(work, "lsearch_spark.zip"))
    job_path = os.path.join(work, "job.py")
    with open(job_path, "w") as f:
        f.write(_JOB)

    attempts = 0
    result: dict = {}
    while attempts < max_attempts:
        attempts += 1
        # in-row environment attribution: the multi-worker bandwidth
        # throttle engages under sustained load mid-session (BENCH phase
        # studies), so each attempt carries its OWN same-moment memcpy
        # probes — the efficiency is only meaningful against eff_4_16
        ctl_before = bench.memcpy_control()
        t_start = time.time()
        best = {4: float("inf"), 16: float("inf")}
        cal: dict[int, float | None] = {4: None, 16: None}
        allsecs: dict[int, list[float]] = {4: [], 16: []}
        tops: dict[int, str] = {}
        cal_corpus = bench.corpus_parquet(2_000)
        with StandaloneCluster(n_workers=4, cores_per_worker=4) as cl:
            for rep in range(reps):
                if rep > 0 and time.time() - t_start > deadline_s:
                    break  # both sizes already measured once; stay in budget
                for cores in (4, 16):
                    if cal[cores] is None:
                        # calibration leg first: identical submit path,
                        # ~2k docs — measures this size's per-submit
                        # fixed overhead inside the timed region
                        cal_sec, _ = _submit_build(
                            cl.url, zip_path, job_path, cal_corpus, cores
                        )
                        cal[cores] = round(cal_sec, 3)
                    sec, top = _submit_build(cl.url, zip_path, job_path, corpus, cores)
                    allsecs[cores].append(round(sec, 3))
                    best[cores] = min(best[cores], sec)
                    tops[cores] = top
        ctl_after = bench.memcpy_control()
        thru1, thru4 = n_docs / best[4], n_docs / best[16]
        eb, ea = ctl_before.get("eff_4_16"), ctl_after.get("eff_4_16")
        stable = eb is not None and ea is not None and abs(eb - ea) <= probe_tol
        net1 = best[4] - (cal[4] or 0.0)
        net4 = best[16] - (cal[16] or 0.0)
        eff_netted = (
            round(((n_docs / net4) / (n_docs / net1)) / 4.0, 3)
            if cal[4] and cal[16] and net1 > 0 and net4 > 0
            else None
        )
        result = {
            "n_docs": n_docs,
            "executors_1x": 1, "executors_4x": 4, "executor_cores": 4,
            "build_secs_1x": allsecs[4], "build_secs_4x": allsecs[16],
            "calibration_sec_1x": cal[4], "calibration_sec_4x": cal[16],
            "docs_per_sec_1x": round(thru1, 1),
            "docs_per_sec_4x": round(thru4, 1),
            "efficiency": round((thru4 / thru1) / 4.0, 3),
            "efficiency_netted": eff_netted,
            "top10_identical": tops[4] == tops[16],
            "memcpy_before": ctl_before,
            "memcpy_after": ctl_after,
            "probes_stable": stable,
            "attempts": attempts,
            "protocol": "REAL standalone cluster (1 master + 4x4-core worker JVMs), "
                        "spark-submit --py-files, fixed 4-core executors, "
                        f"best-of-{reps} interleaved; engine evidence only when "
                        f"probes_stable (before/after memcpy eff_4_16 within {probe_tol})",
        }
        if stable:
            break
    return result


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    print(json.dumps(run_standalone_scaling(n, r)))
