"""The spark-submit --py-files contract (north-rule shipping shape)."""

from __future__ import annotations

import json
import os
import subprocess
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files_builds_and_resumes():
    subprocess.run(
        ["sh", os.path.join(REPO, "scripts", "make_pyfiles.sh")],
        check=True, capture_output=True,
    )
    wh = tempfile.mkdtemp(prefix="submit_wh_")
    cmd = [
        "spark-submit",
        "--master", "local[8]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.ui.enabled=false",
        "--py-files", os.path.join(REPO, "dist", "guac_spark.zip"),
        os.path.join(REPO, "jobs", "build_graph.py"),
        "--sf-dir", "/root/testdata/sf0.001",
        "--warehouse", wh,
    ]
    p1 = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    assert p1.returncode == 0, p1.stderr[-3000:]
    out1 = json.loads(p1.stdout.strip().splitlines()[-1])
    assert out1["triples"] > 0
    assert len(out1["stages_run"]) == 8  # alias_dict stage first

    # resubmit with --resume: everything committed, nothing recomputed
    p2 = subprocess.run(
        cmd + ["--resume"], capture_output=True, text=True, timeout=600
    )
    assert p2.returncode == 0, p2.stderr[-3000:]
    out2 = json.loads(p2.stdout.strip().splitlines()[-1])
    assert out2["stages_run"] == []
    assert len(out2["stages_skipped"]) == 8
    assert out2["triples"] == out1["triples"]
