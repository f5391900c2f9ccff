from __future__ import annotations

import os
import zipfile

from .dwrf_datasource import DwrfDataSource

__all__ = ["DwrfDataSource", "register"]


def _package_zip() -> str:
    """Zip the hive_dwrf_spark package so executors can import it.

    On a real cluster the package would be shipped with --py-files; for
    driver-registered sessions (including the test harness) we build the
    archive once and hand it to addPyFile. Cache key = newest source mtime.
    """
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    parent = os.path.dirname(pkg_root)
    newest = 0.0
    for root, _dirs, files in os.walk(pkg_root):
        for fn in files:
            if fn.endswith(".py"):
                newest = max(newest, os.path.getmtime(os.path.join(root, fn)))
    out = f"/tmp/hive_dwrf_spark_pkg_{int(newest)}.zip"
    if not os.path.exists(out):
        tmp = out + ".tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for root, _dirs, files in os.walk(pkg_root):
                for fn in sorted(files):
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        z.write(full, os.path.relpath(full, parent))
        os.replace(tmp, out)
    return out


def register(spark) -> None:
    """Register the dwrf format with a SparkSession (idempotent) and make
    the package importable on executors."""
    if not getattr(spark, "_hive_dwrf_registered", False):
        spark.sparkContext.addPyFile(_package_zip())
        spark.dataSource.register(DwrfDataSource)
        spark._hive_dwrf_registered = True
