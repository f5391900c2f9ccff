"""Ship the hive_dwrf_spark package to executors.

Python workers deserialize our pandas UDFs / DataSource by importing this
package; when the driver runs from an arbitrary cwd (as the harness does)
the package isn't on the workers' path. On a real cluster this is
`spark-submit --py-files hive_dwrf_spark.zip`; here we build the archive
once (keyed by newest source mtime) and addPyFile it, idempotently."""

from __future__ import annotations

import os
import zipfile


def _package_zip() -> str:
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_root)
    newest = 0.0
    for root, _dirs, files in os.walk(pkg_root):
        for fn in files:
            if fn.endswith(".py"):
                newest = max(newest, os.path.getmtime(os.path.join(root, fn)))
    out = f"/tmp/hive_dwrf_spark_pkg_{int(newest)}.zip"
    if not os.path.exists(out):
        tmp = out + f".{os.getpid()}.tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for root, _dirs, files in os.walk(pkg_root):
                for fn in sorted(files):
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        z.write(full, os.path.relpath(full, parent))
        os.replace(tmp, out)
    return out


def ensure_shipped(spark) -> None:
    if getattr(spark, "_hive_dwrf_shipped", False):
        return
    spark.sparkContext.addPyFile(_package_zip())
    spark._hive_dwrf_shipped = True
