"""Ship the bdqc_spark package to executor Python workers.

Deployment contract (BASELINE.json:14): `spark-submit --py-files
engine.zip`. In-process sessions (tests, the driver's harness) get
the same effect by zipping the package once and `addPyFile`-ing it —
workers then import bdqc_spark from the shipped zip, exactly as they
would on a real cluster.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_zip_path: str | None = None


def package_zip() -> str:
    """Build (once per process) a zip of the bdqc_spark package."""
    global _zip_path
    if _zip_path and os.path.exists(_zip_path):
        return _zip_path
    fd, path = tempfile.mkstemp(prefix="bdqc_spark_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(_PKG_DIR):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.join("bdqc_spark", os.path.relpath(full, _PKG_DIR))
                    zf.write(full, rel)
    _zip_path = path
    return path


def ensure_shipped(spark: SparkSession) -> None:
    """Idempotently make bdqc_spark importable on executors."""
    sc = spark.sparkContext
    if getattr(sc, "_bdqc_shipped", False):
        return
    sc.addPyFile(package_zip())
    sc._bdqc_shipped = True
