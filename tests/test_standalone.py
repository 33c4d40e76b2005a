"""north_rule clause: 'at two cluster sizes (N and 4N executors) ... via
spark-submit --py-files'. test_submit proves the --py-files packaging on
local mode; THIS test proves the engine runs on a REAL standalone cluster —
separate Master/Worker/executor JVMs, Netty shuffle, per-executor Python
worker pools — at BOTH cluster sizes, and that the results are identical
across sizes (doc_id = xxhash64(url) + deterministic tie-breaks make the
index and top-k invariant to executor count). Corpus is tiny (2k docs): the
assertion here is plumbing + determinism; throughput scaling is measured at
bench scale by tools/standalone_scaling.py via bench.py."""

import os
import shutil

import pytest


def test_standalone_cluster_two_sizes(tmp_path):
    if shutil.which("java") is None:
        pytest.skip("no java on PATH")
    if shutil.which("spark-submit") is None:
        pytest.skip("no spark-submit on PATH")
    from tools.standalone_scaling import run_standalone_scaling

    out = run_standalone_scaling(n_docs=2_000, reps=1)
    assert out["top10_identical"] is True, out
    assert out["docs_per_sec_1x"] > 0 and out["docs_per_sec_4x"] > 0, out
    # no efficiency assertion: at 2k docs fixed overheads dominate and the
    # ratio is meaningless — bench.py measures it at 200k+
    assert len(out["build_secs_1x"]) == 1 and len(out["build_secs_4x"]) == 1
    # the tool must not leave worker JVM dirs behind in the repo
    assert not os.path.exists(os.path.join(os.getcwd(), "work"))
