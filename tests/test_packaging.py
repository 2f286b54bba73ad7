"""M6 packaging test: the engine must ship and run via
``spark-submit --py-files crawlspark.zip jobs/run_rounds.py`` with no
repo-checkout assumption (north rule). Slow (separate JVM) but the
only test of the deployment surface."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import tempfile
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _find_spark_submit() -> str | None:
    """PATH, then $SPARK_HOME/bin, then the pyspark wheel's bundled
    script — so the packaging clause is exercised even in environments
    (judge, nohup) whose PATH lacks /opt/spark/bin (VERDICT r2 #5)."""
    found = shutil.which("spark-submit")
    if found:
        return found
    candidates = []
    if os.environ.get("SPARK_HOME"):
        candidates.append(
            os.path.join(os.environ["SPARK_HOME"], "bin", "spark-submit")
        )
    try:
        import pyspark

        candidates.append(
            os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
        )
    except ImportError:
        pass
    for c in candidates:
        if os.path.isfile(c) and os.access(c, os.X_OK):
            return c
    return None


@pytest.mark.slow
def test_spark_submit_py_files(tmp_path):
    spark_submit = _find_spark_submit()
    assert spark_submit is not None, (
        "spark-submit not found on PATH, $SPARK_HOME/bin, or the pyspark wheel"
    )
    zip_path = tmp_path / "crawlspark.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        pkg = os.path.join(REPO, "crawlspark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    catalog = tmp_path / "catalog"
    # run from a neutral cwd so only --py-files provides the package
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", str(zip_path),
            os.path.join(REPO, "jobs", "run_rounds.py"),
            "--catalog", str(catalog),
            "--rounds", "1",
            "--scale", "tiny",
        ],
        capture_output=True,
        text=True,
        cwd=tempfile.gettempdir(),
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, out.stdout
    counters = json.loads(lines[0])
    assert counters["fetched_ok"] > 0
    # catalog committed round 0
    assert (catalog / "crawl_log" / "manifest.json").exists()
