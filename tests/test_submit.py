"""Deployment-shape test (BASELINE.json: `spark-submit --py-files`):
package the engine, then run the real spark-submit binary with ONLY
the zip on the path (cwd is outside the repo, so imports must resolve
from --py-files) and check the pipeline output."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_deployment(spark, tmp_path):
    from bdqc_spark.sources.iceberg import IcebergishTable
    from bdqc_spark.synth.clips import generate_clips_df

    table = str(tmp_path / "clips")
    out = str(tmp_path / "qc_out")
    IcebergishTable(table, num_buckets=4).append(generate_clips_df(spark, 300, seed=61))

    subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "package.sh")],
        check=True,
        capture_output=True,
        cwd=REPO,
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--py-files",
            os.path.join(REPO, "dist", "engine.zip"),
            os.path.join(REPO, "run_pipeline.py"),
            "--table",
            table,
            "--out",
            out,
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
        env=env,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads([ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1])
    assert sorted(result["processed_buckets"]) == [0, 1, 2, 3]
    # build_session must NOT clobber the submitted master with its
    # local[] default (it would read local[32] here, not local[4]):
    # detection goes through the PYSPARK_GATEWAY_* env vars, since a
    # pre-gateway SparkConf never sees spark-submit's system props.
    assert result["master"] == "local[4]"

    con = duckdb.connect()
    n, kept = con.execute(
        f"SELECT count(*), sum(CASE WHEN keep THEN 1 ELSE 0 END) "
        f"FROM read_parquet('{out}/decisions/*/*.parquet')"
    ).fetchone()
    assert n == 300
    assert 0 < kept <= 300
