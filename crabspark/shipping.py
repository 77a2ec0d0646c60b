"""Ship the crabspark package to Spark Python workers.

On a real cluster the job runs ``spark-submit --py-files crabspark.zip``
(north rule); in-process sessions get the same effect via
``SparkContext.addPyFile`` on a freshly-zipped copy of the package, so
pandas UDFs that close over crabspark kernels unpickle on workers that did
not inherit the driver's sys.path."""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED_ATTR = "_crabspark_shipped"


def build_zip(dest_dir: str | None = None) -> str:
    """Zip the installed crabspark package (py files only) for --py-files."""
    import crabspark

    pkg_dir = os.path.dirname(os.path.abspath(crabspark.__file__))
    dest_dir = dest_dir or tempfile.mkdtemp(prefix="crabspark-ship-")
    zip_path = os.path.join(dest_dir, "crabspark.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for fname in sorted(os.listdir(pkg_dir)):
            if fname.endswith(".py"):
                zf.write(os.path.join(pkg_dir, fname), f"crabspark/{fname}")
    return zip_path


def ship_package(spark) -> None:
    """Idempotently attach the package zip to the session."""
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    sc.addPyFile(build_zip())
    setattr(sc, _SHIPPED_ATTR, True)
