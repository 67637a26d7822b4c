"""Pipeline across real executor processes (VERDICT r2 task 2).

``spark-submit --master local-cluster[2,2,2048] --py-files
dedupe_spark.zip`` launches two separate worker JVMs with their own
Python workers — the deployment shape the north rule names. Everything
local[*] hides (closure pickling, the bloom bitmap broadcast crossing
process boundaries, Arrow batches to per-executor workers) is exercised
for real, and the resulting cluster assignment must equal the
in-process local-mode run bit-for-bit.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_CONVS = 80


def _zip_package(tmp_path) -> str:
    zpath = str(tmp_path / "dedupe_spark.zip")
    pkg = os.path.join(REPO, "dedupe_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def test_local_cluster_matches_local_mode(spark, tmp_path):
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    if not os.path.exists(spark_submit):
        pytest.skip("spark-submit not on PATH in this environment")

    out = str(tmp_path / "clusters.json")
    env = dict(os.environ)
    # worker JVMs must not inherit the test session's python path tricks;
    # --py-files ships the package, which is the point of the test
    env.pop("PYTHONPATH", None)
    env["SPARK_GRAFT_CPUS"] = "4"
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local-cluster[2,2,2048]",
            "--conf", "spark.executor.memory=2g",
            "--py-files", _zip_package(tmp_path),
            os.path.join(REPO, "scripts", "cluster_smoke.py"),
            "--convs", str(N_CONVS),
            "--out", out,
            "--warehouse", str(tmp_path / "wh"),
        ],
        cwd=str(tmp_path),  # NOT the repo root: the package must arrive via --py-files
        env=env,
        capture_output=True,
        text=True,
        timeout=800,
    )
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stderr[-4000:]}"
    with open(out) as f:
        cluster_run = json.load(f)
    # really ran across multiple executor processes (2 workers + driver)
    assert cluster_run["n_executors"] >= 3
    # catalog snapshots committed and re-read across the process boundary
    # (pipeline.commit under real executors — VERDICT r3 task 7)
    assert cluster_run["committed_clusters_equal"]
    assert cluster_run["registry_roundtrip_rows"] == cluster_run["input_rows"] > 0
    assert cluster_run["registry_partitioned"]

    from dedupe_spark import fixtures, pipeline

    res = pipeline.run(fixtures.transcripts(spark, n_conv=N_CONVS))
    local_rows = sorted((r["conv_id"], r["cluster_id"]) for r in res.clusters.collect())
    res.release()
    assert [tuple(r) for r in cluster_run["clusters"]] == local_rows
