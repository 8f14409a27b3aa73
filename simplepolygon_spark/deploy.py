"""Self-shipping: make the package importable on Spark workers.

A driver that merely has this repo on its own ``sys.path`` (not in
PYTHONPATH) starts workers that cannot unpickle our Arrow UDFs —
``ModuleNotFoundError: simplepolygon_spark``.  ``ensure_shipped``
zips the package once and registers it with ``addPyFile`` so every
executor fetches it, matching the spark-submit --py-files contract
(BASELINE.json:14) without requiring the caller to manage env vars.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_ATTR = "_simplepolygon_spark_shipped"


def package_zip(pkg_dir: str | None = None) -> str:
    """Zip of the installed package, cached by CONTENT hash — a
    pid-keyed cache would ship stale code when the OS recycles a pid
    after the package was edited (executors then silently run old
    operators against a newer driver).  ``pkg_dir`` defaults to this
    package; tests point it at a scratch tree to prove invalidation."""
    import hashlib

    if pkg_dir is None:
        pkg_dir = os.path.dirname(os.path.abspath(__file__))
    entries = []
    for root, _dirs, files in os.walk(pkg_dir):
        for fn in sorted(files):
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                rel = os.path.join(
                    "simplepolygon_spark", os.path.relpath(full, pkg_dir)
                )
                entries.append((rel, full))
    entries.sort()
    h = hashlib.md5()
    for rel, full in entries:
        h.update(rel.encode())
        with open(full, "rb") as fh:
            h.update(fh.read())
    out = os.path.join(
        tempfile.gettempdir(), f"simplepolygon_spark_{h.hexdigest()[:16]}.zip"
    )
    if not os.path.exists(out):
        tmp = out + f".{os.getpid()}.part"  # atomic publish, racing
        with zipfile.ZipFile(tmp, "w") as z:  # processes never see a
            for rel, full in entries:  # half-written zip
                z.write(full, rel)
        os.replace(tmp, out)
    return out


def ensure_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    sc.addPyFile(package_zip())
    setattr(sc, _SHIPPED_ATTR, True)
