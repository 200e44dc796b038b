"""The cluster deploy path, actually executed (BASELINE.json north_rule:
"run via spark-submit --py-files"): zip the package, launch a REAL
``spark-submit --py-files etlbox_spark.zip`` subprocess against a copied
entrypoint (so the package resolves from the zip, not the repo on
sys.path), and verify the replay summary + final state + idempotent
re-submit. One extra JVM (~40 s) — the price of proving the deploy story
instead of asserting it.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

from etlbox_spark.engine import LakeTable, MergeMode, MergeSpec, replay
from etlbox_spark.engine.gen import gen_events, write_events

from .conftest import REPO_FILES_SCHEMA

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    try:
        import pyspark

        p = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
        return p if os.path.exists(p) else None
    except ImportError:
        return None


@pytest.mark.skipif(_spark_submit() is None, reason="no spark-submit on this host")
def test_spark_submit_py_files_replay(spark, tmp_path):
    ev_dir = str(tmp_path / "events")
    write_events(
        gen_events(spark, n_events=2000, n_repos=10, paths_per_repo=30, epoch_size=500),
        ev_dir,
    )

    # package zip + entrypoint copied OUT of the repo: inside the
    # subprocess, `import etlbox_spark` must resolve from --py-files
    pkg_zip = str(tmp_path / "etlbox_spark.zip")
    with zipfile.ZipFile(pkg_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(os.path.join(REPO, "etlbox_spark")):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    entry = str(tmp_path / "submit_replay.py")
    shutil.copy(os.path.join(REPO, "tools", "submit_replay.py"), entry)

    lake_dir = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt.json")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["SPARK_GRAFT_DRIVER_MEM"] = "4g"  # side JVM: don't grab 16g
    cmd = [
        _spark_submit(), "--master", "local[4]", "--py-files", pkg_zip, entry,
        "--events", ev_dir, "--lake", lake_dir, "--create", "--mode", "delta",
        "--checkpoint", ckpt, "--buckets", "8", "--master", "local[4]",
    ]

    def submit() -> dict:
        p = subprocess.run(cmd, cwd=str(tmp_path), env=env,
                           stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                           text=True, timeout=300)
        assert p.returncode == 0, p.stderr[-3000:]
        summaries = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        assert summaries, p.stdout[-2000:]
        return json.loads(summaries[-1])

    s1 = submit()
    assert s1["epochs_applied"] == 4 and s1["epochs_skipped"] == 0

    # same events through the in-process engine = same final state
    ref = LakeTable.create(str(tmp_path / "ref"), REPO_FILES_SCHEMA, ["repo", "path"], 8)
    replay(spark, ref, ev_dir, MergeSpec(), MergeMode.DELTA)
    want = {(r.repo, r.path): r.content for r in ref.read(spark).collect()}
    got = {(r.repo, r.path): r.content
           for r in LakeTable.load(lake_dir).read(spark).collect()}
    assert got == want

    # re-submit: restart-safe — every epoch skips via checkpoint + markers
    s2 = submit()
    assert s2["epochs_applied"] == 0 and s2["epochs_skipped"] == 4
    assert s2["final_rows"] == s1["final_rows"]
