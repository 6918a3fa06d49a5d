"""spark-submit --py-files end-to-end: the north-rule deployment
surface ("run via spark-submit --py-files on a multi-executor
cluster").

Builds ``semhash_spark.zip`` exactly as the README documents, copies
``jobs/dedup_job.py`` into a temp dir (the script inserts its own
repo root into ``sys.path``, so running the checked-out copy would
quietly import the checkout instead of the zip), strips PYTHONPATH,
and runs a REAL ``spark-submit`` from that temp cwd at ``local[2]``.
Every ``semhash_spark`` import in the job must resolve from the zip
alone — the same way a cluster executor resolves them.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_pyfiles_roundtrip(tmp_path):
    zpath = tmp_path / "semhash_spark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for f in sorted((REPO / "semhash_spark").rglob("*.py")):
            z.write(f, f.relative_to(REPO))

    job = tmp_path / "dedup_job.py"
    shutil.copy(REPO / "jobs" / "dedup_job.py", job)
    out = tmp_path / "out"

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    r = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zpath),
            str(job),
            "--input", os.path.join(SF_DIR, "documents.parquet"),
            "--output", str(out),
            "--columns", "text",
            "--threshold", "0.8",
            "--shingle-k", "3",
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert r.returncode == 0, f"spark-submit failed:\n{r.stderr[-4000:]}"

    summary = json.loads(r.stdout.strip().splitlines()[-1])
    # sf0.001 documents at threshold 0.8 / k=3: 25 planted near-dup
    # pairs, one short-doc pair below threshold -> 476/24/0 (the same
    # counts the in-process job test and the verify drive pin)
    assert summary["n_selected"] == 476
    assert summary["n_filtered"] == 24
    assert summary["n_exact"] == 0

    # the three documented output relations exist and round-trip
    import pyarrow.parquet as pq

    n_sel = pq.read_table(out / "selected").num_rows
    n_fil = pq.read_table(out / "filtered").num_rows
    assert (n_sel, n_fil) == (476, 24)
    assert pq.read_table(out / "stats").num_rows == 1
