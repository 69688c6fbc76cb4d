"""The engine ships as a spark-submit --py-files job (north rule).

Proves it by actually running one: zip the package, invoke spark-submit
with --py-files from a NEUTRAL cwd with no repo on PYTHONPATH, and check
the job imports the package from the zip, executes the fused rewrite, and
reports scan equivalence.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "ocel_ocpn_lakehouse_spark")


def _build_zip(dest: str) -> str:
    zpath = os.path.join(dest, "ocel_ocpn_lakehouse_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(PKG):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def test_spark_submit_pyfiles_job(tmp_path):
    zpath = _build_zip(str(tmp_path))
    spark_home = os.path.dirname(os.path.dirname(__import__("pyspark").__file__))
    submit = shutil.which("spark-submit") or os.path.join(
        spark_home, "pyspark", "bin", "spark-submit"
    )
    assert os.path.exists(submit), f"spark-submit not found at {submit}"

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    wh = str(tmp_path / "wh")
    proc = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            os.path.join(REPO, "tools", "submit_job.py"),
            "--warehouse", wh,
            "--op", "rewrite",
            "--rows", "300",
            "--files", "12",
        ],
        cwd=str(tmp_path),  # neutral cwd: the package must come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["status"] == "committed"
    assert out["scan_equivalence"] is True
    assert out["files_after"] < out["files_before"]
    # the import really resolved from the --py-files zip, not a checkout
    assert ".zip" in out["package_origin"], out["package_origin"]
