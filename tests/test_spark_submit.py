"""The north-rule deployment mode, actually executed: `spark-submit
--py-files hyped_spark.zip` runs the cluster entrypoint in a subprocess
whose working directory contains ONLY the job script — the engine must
arrive via the shipped zip (driver and executors alike), exactly as it
would on a real cluster. Final table state is then verified against the
single-threaded reference replayer from the outer test session."""
from __future__ import annotations

import json
import os
import shutil
import subprocess

import pandas as pd
import pyspark


def _spark_submit_bin() -> str:
    bundled = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return bundled if os.path.exists(bundled) else shutil.which("spark-submit")


def test_spark_submit_py_files_deployment(spark, tmp_path):
    from hyped_spark.lake.table import SnapshotTable
    from hyped_spark.session import _package_zip
    from hyped_spark.sources.synthetic import binlog
    from tests.replayer import replay_reference

    log = binlog(spark, n_events=900, n_urls=70)
    src = str(tmp_path / "binlog")
    log.write.parquet(src)

    # isolated deploy dir: the repo is NOT importable from here
    workdir = tmp_path / "deploy"
    workdir.mkdir()
    shutil.copy("/root/repo/scripts/run_ingest_job.py", workdir / "job.py")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}

    cmd = [
        _spark_submit_bin(), "--master", "local[2]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.memory=2g",
        "--py-files", _package_zip(),
        str(workdir / "job.py"),
        "--source", src, "--table", str(tmp_path / "t"),
        "--metrics", str(tmp_path / "m"), "--mode", "batch",
        "--buckets", "8", "--batch-lsns", "300", "--cores", "2",
    ]
    r = subprocess.run(cmd, cwd=workdir, env=env, capture_output=True,
                       text=True, timeout=420)
    assert r.returncode == 0, r.stderr[-4000:]

    # the job's last stdout line is the lineage check JSON
    lineage = json.loads(r.stdout.strip().splitlines()[-1])
    assert lineage["ranges_ordered_non_overlapping"], lineage
    assert lineage["n_batches"] == 3 and lineage["total_rows_applied"] > 0

    # replay equivalence vs the reference replayer, byte-identical text
    expect = replay_reference(log.toPandas()).sort_values("url")
    got = (SnapshotTable(spark, str(tmp_path / "t")).read()
           .select(*expect.columns).toPandas().sort_values("url"))
    for df in (expect, got):  # engine long vs replayer float (schema evo)
        if "fetch_status" in df.columns:
            df["fetch_status"] = df["fetch_status"].astype("Int64")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), expect.reset_index(drop=True),
        check_like=True, check_dtype=False)
