"""spark-submit --py-files packaging helper.

The north_rule launch path is ``spark-submit --py-files pkg.zip job.py`` on
a multi-executor cluster.  :func:`package_pyfiles` builds that zip;
:func:`attach` is the in-process equivalent (``sc.addPyFile``) so python
workers resolve the package no matter where the driver started.
"""

from __future__ import annotations

import os
import tempfile
import zipfile


def package_pyfiles(out_path: str | None = None) -> str:
    """Zip the spiders_for_all_spark package for --py-files distribution."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    out = out_path or os.path.join(
        tempfile.mkdtemp(prefix="sfas_pyfiles_"), "spiders_for_all_spark.zip"
    )
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            for fn in filenames:
                if fn.endswith((".pyc", ".pyo")) or "__pycache__" in dirpath:
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, root))
    return out


def attach(spark) -> str:
    """addPyFile the packaged zip to a running session (worker-side import)."""
    zip_path = package_pyfiles()
    spark.sparkContext.addPyFile(zip_path)
    return zip_path
