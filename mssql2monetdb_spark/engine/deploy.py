"""Ship the engine package to executor Python workers (``addPyFile``).

``local[*]`` masks a real-cluster failure mode: helper functions that
live at module level (e.g. the multimodal decoders in
``operators/multimodal.py``) are cloudpickled BY REFERENCE, so the
executor-side Python worker must be able to ``import
mssql2monetdb_spark`` when it unpickles the UDF.  In local mode the
worker is forked from the driver and inherits its ``sys.path``; on any
real cluster (separate executor JVMs spawning their own workers) the
import fails with ``ModuleNotFoundError`` unless the package was
shipped.  Found by ``scripts/cluster_mode_probe.py``: on
``local-cluster[2,2,2048]`` the multimodal decode queries crashed in
``cloudpickle.loads`` while every closure-defined UDF ran fine.

The standard production answer is to distribute the package —
``spark-submit --py-files engine.zip`` or a cluster-wide pip install.
:func:`ensure_package_shipped` makes that automatic: it zips the
installed package once per process and registers it with
``SparkContext.addPyFile``, which puts the zip on every executor
worker's ``sys.path``.  Called from ``session.configure_runtime`` so
every query callable is cluster-safe out of the box, whatever session
the caller hands us.

Plain ``local``/``local[N]`` masters are skipped: the driver already
imports the live source tree there, and shadowing it with a zip
snapshot could hide in-session edits during development.
"""

from __future__ import annotations

import os
import re
import tempfile
import zipfile

from pyspark.sql import SparkSession

#: applicationIds already shipped to, so repeat calls are a dict probe.
_SHIPPED: set[str] = set()

#: zip built once per process (source doesn't change mid-run).
_ZIP_PATH: str | None = None

_LOCAL_MASTER = re.compile(r"^local(\[[^\]]*\])?$")


def package_zip() -> str:
    """Build (once) a zip of the package importable from its root.

    Ships ``.py`` sources only — the package carries no data resources
    today; if one is ever added, extend the walk's filter or the
    executors won't see it. The zip is removed at interpreter exit
    (``atexit``), after Spark no longer needs it.
    """
    global _ZIP_PATH
    if _ZIP_PATH is not None and os.path.exists(_ZIP_PATH):
        return _ZIP_PATH
    import atexit

    import mssql2monetdb_spark as pkg

    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    pkg_name = os.path.basename(pkg_dir)
    fd, path = tempfile.mkstemp(prefix="mssql2monetdb_spark_", suffix=".zip")
    os.close(fd)
    atexit.register(lambda: os.path.exists(path) and os.remove(path))
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg_dir):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                zf.write(full, rel)
    _ZIP_PATH = path
    return path


def ensure_package_shipped(spark: SparkSession) -> str | None:
    """Make ``import mssql2monetdb_spark`` work in executor Python workers.

    Returns the zip path when shipped, ``None`` when skipped (plain
    local master, or the context is already shut down).  Idempotent per
    SparkContext — ``addPyFile`` runs once per applicationId.
    """
    try:
        sc = spark.sparkContext
        app_id = sc.applicationId
        master = sc.master or ""
    except Exception:  # pragma: no cover - context already stopped
        return None
    if _LOCAL_MASTER.match(master):
        return None
    if app_id in _SHIPPED:
        return _ZIP_PATH
    path = package_zip()
    sc.addPyFile(path)
    _SHIPPED.add(app_id)
    return path
