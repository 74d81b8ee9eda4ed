"""The north rule's deployment mechanism: the engine runs via
``spark-submit --py-files <zip>`` with no repo on the executor path.
One end-to-end submit at local[4] (the sandbox stand-in for a cluster
master) — the scaling pair at two parallelism levels rides the same
mechanism in bench.py."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_pagerank(tmp_path):
    zip_path = str(tmp_path / "gds_spark.zip")
    out_path = str(tmp_path / "scores")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package_pyfiles.py"), zip_path],
        check=True, capture_output=True,
    )
    assert os.path.getsize(zip_path) > 10_000

    env = {k: v for k, v in os.environ.items() if not k.startswith("SPARK_GRAFT")}
    env["PYSPARK_PYTHON"] = sys.executable
    # cwd = tmp_path so the repo itself is NOT importable; only --py-files
    # delivers the package.
    proc = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_pagerank.py"),
            "--n-conv", "200", "--out", out_path, "--max-iterations", "30",
        ],
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "SUBMIT-OK" in proc.stdout and "converged=True" in proc.stdout

    # the output is per-turn keyed — the join-back shape the text-equality
    # invariant uses
    import duckdb

    rows = duckdb.sql(
        f"SELECT count(*) n, count(DISTINCT (conv_id, turn_idx)) k, min(score) s "
        f"FROM read_parquet('{out_path}/*.parquet')"
    ).fetchone()
    assert rows[0] > 0 and rows[0] == rows[1]
    assert rows[2] > 0.0
