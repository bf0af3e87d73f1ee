"""Minimal offline PEP-427 wheel builder (VERDICT r9 #7).

This sandbox has no ``wheel`` package, setuptools 65 (no bundled
``bdist_wheel``) and no network, so both the legacy and the PEP 517
build_wheel paths are unavailable.  A wheel, however, is only a zip
with a ``*.dist-info`` directory (METADATA / WHEEL / RECORD with
sha256+size rows) — fully specified by PEP 427 — so the artifact can
be produced directly and then VALIDATED by pip itself at install time
(``tests/test_packaging.py::test_wheel_build_and_install_from_artifact``
installs it with ``pip --no-index`` and imports the public API from a
neutral cwd).

Usage:
    python tools/build_wheel.py [dist_dir]     # default ./dist
Prints the wheel path.
"""

from __future__ import annotations

import base64
import hashlib
import os
import sys
import tomllib
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "clickhouse_migrator_spark"


def _record_hash(data: bytes) -> str:
    digest = hashlib.sha256(data).digest()
    return "sha256=" + base64.urlsafe_b64encode(digest).rstrip(b"=").decode()


def build_wheel(dist_dir: str) -> str:
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        proj = tomllib.load(f)["project"]
    sys.path.insert(0, REPO)
    import clickhouse_migrator_spark as pkg_mod

    version = pkg_mod.__version__
    assert version == proj["version"], (version, proj["version"])
    name_norm = proj["name"].replace("-", "_")
    tag = "py3-none-any"
    dist_info = f"{name_norm}-{version}.dist-info"
    wheel_name = f"{name_norm}-{version}-{tag}.whl"
    os.makedirs(dist_dir, exist_ok=True)
    out = os.path.join(dist_dir, wheel_name)

    metadata_lines = [
        "Metadata-Version: 2.1",
        f"Name: {proj['name']}",
        f"Version: {version}",
    ]
    if proj.get("description"):
        metadata_lines.append(f"Summary: {proj['description']}")
    if proj.get("requires-python"):
        metadata_lines.append(f"Requires-Python: {proj['requires-python']}")
    for dep in proj.get("dependencies", []):
        metadata_lines.append(f"Requires-Dist: {dep}")
    for extra, deps in proj.get("optional-dependencies", {}).items():
        metadata_lines.append(f"Provides-Extra: {extra}")
        for dep in deps:
            metadata_lines.append(f'Requires-Dist: {dep} ; extra == "{extra}"')
    metadata = "\n".join(metadata_lines) + "\n"

    wheel_meta = (
        "Wheel-Version: 1.0\n"
        "Generator: tools/build_wheel.py (offline PEP 427)\n"
        "Root-Is-Purelib: true\n"
        f"Tag: {tag}\n"
    )

    record_rows: list[str] = []
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:

        def add(arcname: str, data: bytes) -> None:
            zf.writestr(arcname, data)
            record_rows.append(f"{arcname},{_record_hash(data)},{len(data)}")

        pkg_root = os.path.join(REPO, PKG)
        for base, dirs, files in os.walk(pkg_root):
            dirs[:] = sorted(d for d in dirs if d != "__pycache__")
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                p = os.path.join(base, fn)
                arc = os.path.relpath(p, REPO).replace(os.sep, "/")
                with open(p, "rb") as f:
                    add(arc, f.read())
        add(f"{dist_info}/METADATA", metadata.encode())
        add(f"{dist_info}/WHEEL", wheel_meta.encode())
        record = "\n".join(record_rows + [f"{dist_info}/RECORD,,"]) + "\n"
        zf.writestr(f"{dist_info}/RECORD", record)
    return out


if __name__ == "__main__":
    dist = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist")
    print(build_wheel(dist))
