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
    """Zip the installed crabspark package (py files only) for --py-files.
    The zip is content-addressed (source hash in the directory name) and
    reused across sessions in the same interpreter boot — repeated Engine
    constructions must not leak one temp dir each."""
    import hashlib

    import crabspark

    pkg_dir = os.path.dirname(os.path.abspath(crabspark.__file__))
    sources = [
        os.path.join(pkg_dir, f)
        for f in sorted(os.listdir(pkg_dir))
        if f.endswith(".py")
    ]
    h = hashlib.sha1()
    for p in sources:
        with open(p, "rb") as f:
            h.update(p.encode())
            h.update(f.read())
    if dest_dir is None:
        dest_dir = os.path.join(
            tempfile.gettempdir(), f"crabspark-ship-{h.hexdigest()[:12]}"
        )
        os.makedirs(dest_dir, exist_ok=True)
    zip_path = os.path.join(dest_dir, "crabspark.zip")
    if os.path.exists(zip_path):
        return zip_path
    tmp = zip_path + f".tmp-{os.getpid()}"
    with zipfile.ZipFile(tmp, "w") as zf:
        for p in sources:
            zf.write(p, f"crabspark/{os.path.basename(p)}")
    os.replace(tmp, zip_path)
    return zip_path


def ship_package(spark) -> None:
    """Idempotently attach the package zip to the session."""
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    sc.addPyFile(build_zip())
    setattr(sc, _SHIPPED_ATTR, True)
