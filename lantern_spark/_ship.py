"""Ship the ``lantern_spark`` package to Spark executors.

Pandas UDFs reference module-level functions; Python workers deserialize
them by importing ``lantern_spark``, which fails unless the package is on
the worker's path. On a real cluster this is ``spark-submit --py-files``;
for a driver that builds its own SparkSession we self-ship: zip the
package once and ``sc.addPyFile`` it (idempotent per session).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED: set = set()


def package_zip() -> str:
    """Build (once per process) a zip of the lantern_spark package."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(tempfile.gettempdir(), "lantern_spark_pkg.zip")
    if not os.path.exists(out) or os.path.getmtime(out) < _newest_mtime(pkg_dir):
        tmp = out + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if not f.endswith(".py"):
                        continue
                    full = os.path.join(root, f)
                    rel = os.path.join(
                        "lantern_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
        os.replace(tmp, out)
    return out


def _newest_mtime(d: str) -> float:
    newest = 0.0
    for root, _dirs, files in os.walk(d):
        for f in files:
            if f.endswith(".py"):
                newest = max(newest, os.path.getmtime(os.path.join(root, f)))
    return newest


def ensure_shipped(spark) -> None:
    """Make ``import lantern_spark`` work on executors for this session."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    sc.addPyFile(package_zip())
    _SHIPPED.add(key)
