"""End-to-end evidence for the north-rule's delivery clause: the
pipeline "ships via spark-submit --py-files" — build
``dist/geomesa_spark.zip`` with the repo's own packager, then run the
checkpointed PIP-join job through the real ``spark-submit`` binary from
a NEUTRAL cwd (so the driver can only import ``geomesa_spark`` from the
``--py-files`` zip, not from the source tree) and assert the job writes
real output plus lineage records.

This complements tests/test_manifest.py (resume semantics, in-process)
and geomesa_spark.contract.ensure_py_files (executor-side shipping,
exercised by every other Spark test): here the DRIVER-side import path
and the CLI surface itself are the things under test.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_job(tmp_path):
    # 1. build the --py-files artifact with the repo's own packager
    built = subprocess.run(
        [sys.executable, os.path.join(REPO, "geomesa_spark", "package_zip.py")],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert built.returncode == 0, built.stderr[-2000:]
    zip_path = built.stdout.strip().splitlines()[-1]
    assert zip_path.endswith("geomesa_spark.zip") and os.path.exists(zip_path)

    out_dir = str(tmp_path / "pip_out")
    ckpt_root = str(tmp_path / "pip_ckpt")
    env = dict(os.environ)
    # neutral import environment: the driver must resolve geomesa_spark
    # from the zip, not from a stray PYTHONPATH or the repo cwd
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--conf",
            "spark.ui.enabled=false",
            "--conf",
            "spark.sql.shuffle.partitions=8",
            "--py-files",
            zip_path,
            os.path.join(REPO, "jobs", "pip_join_job.py"),
            "--pages",
            "4000",
            "--chunks",
            "4",
            "--out",
            out_dir,
            "--checkpoint-root",
            ckpt_root,
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "wrote" in proc.stdout and "polygon rows" in proc.stdout
    assert "lineage:" in proc.stdout  # per-partition lineage surfaced

    # 2. the job's output is real parquet with the contract schema
    import duckdb

    rows = duckdb.sql(
        f"select count(*) n, min(n_mentions) mn from read_parquet('{out_dir}/*.parquet')"
    ).fetchone()
    assert rows[0] > 0 and rows[1] >= 1

    # 3. the manifest committed every chunk (resume would be a no-op)
    sys.path.insert(0, REPO)
    from geomesa_spark.sources import manifest as M

    assert M.completed_partitions(ckpt_root, "entities") == {"0", "1", "2", "3"}
    lin = M.lineage(ckpt_root)
    assert lin and all(r["rows"] > 0 for r in lin)
