#!/usr/bin/env python
"""Build dist/crabspark-<version>-py3-none-any.whl from scratch (PEP 427).

Why not `pip install .`: PEP 517 builds need the `wheel` package (or
setuptools >= 70.1, which bundles bdist_wheel); this sandbox ships
setuptools 65 and no `wheel`, and installs are offline. A wheel file is
just a zip with a *.dist-info/ (METADATA, WHEEL, RECORD), so build it
directly — `pip install dist/crabspark-*.whl` then works offline, and
`pip install .` works unchanged anywhere the standard tooling exists
(pyproject.toml stays the source of truth; this script asserts it agrees
on the version).

Usage: python bin/build_wheel.py [outdir]   (default: dist/)
Prints the wheel path on success.
"""

from __future__ import annotations

import base64
import hashlib
import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NAME = "crabspark"


def _version() -> str:
    import crabspark

    v = crabspark.__version__
    with open(os.path.join(REPO, "pyproject.toml")) as f:
        assert f'version = "{v}"' in f.read(), (
            "pyproject.toml and crabspark.__version__ disagree"
        )
    return v


def _record_line(arc: str, data: bytes) -> str:
    digest = base64.urlsafe_b64encode(
        hashlib.sha256(data).digest()
    ).rstrip(b"=").decode()
    return f"{arc},sha256={digest},{len(data)}"


def build(outdir: str) -> str:
    version = _version()
    os.makedirs(outdir, exist_ok=True)
    wheel_path = os.path.join(outdir, f"{NAME}-{version}-py3-none-any.whl")
    info = f"{NAME}-{version}.dist-info"

    metadata = "\n".join(
        [
            "Metadata-Version: 2.1",
            f"Name: {NAME}",
            f"Version: {version}",
            "Summary: PySpark-native web-crawl analytics engine",
            "Requires-Python: >=3.10",
            "Requires-Dist: pyspark>=3.5",
            "Requires-Dist: pandas>=2.0",
            "Requires-Dist: numpy>=1.24",
            "Requires-Dist: pyarrow>=12.0",
            "",
        ]
    ).encode()
    wheel_meta = (
        "Wheel-Version: 1.0\nGenerator: crabspark-build\n"
        "Root-Is-Purelib: true\nTag: py3-none-any\n"
    ).encode()

    entries: list[tuple[str, bytes]] = []
    pkg = os.path.join(REPO, NAME)
    for dirpath, _dirs, files in sorted(os.walk(pkg)):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            full = os.path.join(dirpath, fn)
            arc = os.path.relpath(full, REPO).replace(os.sep, "/")
            with open(full, "rb") as f:
                entries.append((arc, f.read()))
    entries.append((f"{info}/METADATA", metadata))
    entries.append((f"{info}/WHEEL", wheel_meta))

    record = [_record_line(a, d) for a, d in entries]
    record.append(f"{info}/RECORD,,")
    entries.append((f"{info}/RECORD", ("\n".join(record) + "\n").encode()))

    with zipfile.ZipFile(wheel_path, "w", zipfile.ZIP_DEFLATED) as z:
        for arc, data in entries:
            zi = zipfile.ZipInfo(arc, date_time=(2020, 1, 1, 0, 0, 0))
            zi.external_attr = 0o644 << 16
            z.writestr(zi, data)
    return wheel_path


if __name__ == "__main__":
    out = build(sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist"))
    print(out)
