"""engine/deploy.py — package shipping for executor Python workers.

The real end-to-end proof is ``scripts/cluster_mode_probe.py`` (a
``local-cluster[2,2,2048]`` sweep of the whole registry, recorded in
SCALE.md); these tests pin the cheap invariants: zip completeness,
local-master skip, and per-process zip reuse.
"""

import zipfile

from mssql2monetdb_spark.engine import deploy


def test_package_zip_contains_full_package():
    path = deploy.package_zip()
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
    # importable package root + the module whose by-reference pickling
    # motivated shipping in the first place
    assert "mssql2monetdb_spark/__init__.py" in names
    assert "mssql2monetdb_spark/operators/multimodal.py" in names
    assert "mssql2monetdb_spark/engine/deploy.py" in names
    # sources only — no caches, nothing outside the package
    assert all(n.startswith("mssql2monetdb_spark/") for n in names)
    assert all(n.endswith(".py") for n in names)
    assert not any("__pycache__" in n for n in names)


def test_package_zip_reused_within_process():
    assert deploy.package_zip() == deploy.package_zip()


def test_local_master_is_skipped(spark):
    # the shared test session is local[N]: shipping would shadow the live
    # source tree with a zip snapshot, so ensure_package_shipped declines
    assert deploy.ensure_package_shipped(spark) is None
