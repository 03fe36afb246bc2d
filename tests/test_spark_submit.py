"""Packaged-deployment test — the north rule's `spark-submit --py-files`
contract, exercised for real:

  1. build `dist/chronon_spark.zip` with tools/package.py
  2. run tools/example_job.py through the ACTUAL `spark-submit` binary
     with `--py-files <zip>` from a scratch working directory, with the
     repo stripped from PYTHONPATH — driver and executors can import the
     engine ONLY from the zip
  3. assert partitioned output + per-partition manifest lineage
  4. re-submit the identical job: the backfill planner must find zero
     unfilled partitions (checkpoint-resume is a cluster property, not a
     test-session property)
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

SPARK_SUBMIT = shutil.which("spark-submit") or os.path.join(
    os.path.dirname(sys.executable), "spark-submit"
)


def _submit(tmp_path, out_dir: str, zip_path: str) -> str:
    env = os.environ.copy()
    # the zip must be the ONLY way to import chronon_spark
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    res = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "example_job.py"),
            "--events", os.path.join(SF_DIR, "events.parquet"),
            "--output", out_dir,
            "--start", "2024-01-05",
            "--end", "2024-01-08",
            "--step-days", "2",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),  # NOT the repo — imports must come from the zip
        env=env,
    )
    assert res.returncode == 0, res.stderr[-4000:]
    return res.stdout


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on PATH"
)
def test_spark_submit_py_files_end_to_end(tmp_path):
    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package.py"),
         str(tmp_path / "chronon_spark.zip")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    assert os.path.exists(zip_path)

    out_dir = str(tmp_path / "wh")
    stdout = _submit(tmp_path, out_dir, zip_path)
    assert "wrote" in stdout

    # partition-granular output + manifest lineage landed on disk
    table = os.path.join(out_dir, "training_features")
    parts = sorted(
        d for d in os.listdir(table) if d.startswith("ds=")
    )
    assert parts == [f"ds=2024-01-0{d}" for d in (5, 6, 7, 8)]
    manifest = os.path.join(out_dir, "_manifest")
    assert os.path.isdir(manifest)

    # resume: identical re-submit plans ZERO work (manifest + existing
    # partitions consulted by a fresh JVM in a fresh cwd)
    stdout2 = _submit(tmp_path, out_dir, zip_path)
    assert "wrote 0 rows over 0 steps" in stdout2
