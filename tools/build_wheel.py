"""Build the bacon-spark wheel with the stdlib only (VERDICT r9 next #6).

This container has setuptools 65 and no ``wheel`` package, so
``pip wheel`` dies in ``bdist_wheel``; a wheel, however, is just a zip
laid out per PEP 427 (package tree + ``*.dist-info/`` with METADATA,
WHEEL, RECORD, entry_points.txt), and all metadata already lives in
pyproject.toml (PEP 621). This script reads pyproject with ``tomllib``
and writes ``dist/bacon_spark-<version>-py3-none-any.whl``
deterministically (fixed zip timestamps, sorted file walk) so a rebuild
of an unchanged tree is byte-identical.

The wheel is what tools/release_smoke.py installs into a clean venv to
catch packaging misses (modules the test suite imports from the repo
checkout that never made it into the package).

Usage: python tools/build_wheel.py [out_dir]   (default: dist/)
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
PACKAGE = "bacon_spark"
# deterministic timestamp for every zip member (wheels are build
# artifacts; their mtimes carry no information)
ZIP_DATE = (2020, 1, 1, 0, 0, 0)


def _record_hash(data: bytes) -> str:
    digest = hashlib.sha256(data).digest()
    return "sha256=" + base64.urlsafe_b64encode(digest).rstrip(b"=").decode()


def _metadata(proj: dict) -> str:
    lines = [
        "Metadata-Version: 2.1",
        f"Name: {proj['name']}",
        f"Version: {proj['version']}",
        f"Summary: {proj['description']}",
        f"License: {proj['license']['text']}",
        f"Requires-Python: {proj['requires-python']}",
    ]
    for kw in (proj.get("keywords") or [])[:1]:
        lines.append("Keywords: " + ",".join(proj["keywords"]))
    for c in proj.get("classifiers", []):
        lines.append(f"Classifier: {c}")
    for dep in proj.get("dependencies", []):
        lines.append(f"Requires-Dist: {dep}")
    for extra, deps in proj.get("optional-dependencies", {}).items():
        lines.append(f"Provides-Extra: {extra}")
        for dep in deps:
            lines.append(f'Requires-Dist: {dep}; extra == "{extra}"')
    body = ""
    readme = proj.get("readme")
    if readme:
        lines.append("Description-Content-Type: text/markdown")
        with open(os.path.join(REPO, readme), encoding="utf-8") as fh:
            body = "\n" + fh.read()
    return "\n".join(lines) + "\n" + body


def _entry_points(proj: dict) -> str:
    scripts = proj.get("scripts", {})
    if not scripts:
        return ""
    out = ["[console_scripts]"]
    out += [f"{name} = {target}" for name, target in sorted(scripts.items())]
    return "\n".join(out) + "\n"


def build(out_dir: str) -> str:
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as fh:
        proj = tomllib.load(fh)["project"]
    name, version = proj["name"].replace("-", "_"), proj["version"]
    dist_info = f"{name}-{version}.dist-info"
    wheel_name = f"{name}-{version}-py3-none-any.whl"
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, wheel_name)

    members: list[tuple[str, bytes]] = []
    pkg_root = os.path.join(REPO, PACKAGE)
    for dirpath, dirnames, filenames in sorted(os.walk(pkg_root)):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith((".pyc", ".pyo")):
                continue
            full = os.path.join(dirpath, fn)
            arc = os.path.relpath(full, REPO).replace(os.sep, "/")
            with open(full, "rb") as fh:
                members.append((arc, fh.read()))

    members.append((f"{dist_info}/METADATA", _metadata(proj).encode()))
    members.append(
        (
            f"{dist_info}/WHEEL",
            (
                "Wheel-Version: 1.0\n"
                "Generator: bacon-spark build_wheel (stdlib)\n"
                "Root-Is-Purelib: true\n"
                "Tag: py3-none-any\n"
            ).encode(),
        )
    )
    eps = _entry_points(proj)
    if eps:
        members.append((f"{dist_info}/entry_points.txt", eps.encode()))
    members.append((f"{dist_info}/top_level.txt", f"{PACKAGE}\n".encode()))

    record_lines = [
        f"{arc},{_record_hash(data)},{len(data)}" for arc, data in members
    ]
    record_lines.append(f"{dist_info}/RECORD,,")
    record = ("\n".join(record_lines) + "\n").encode()

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arc, data in members + [(f"{dist_info}/RECORD", record)]:
            zi = zipfile.ZipInfo(arc, date_time=ZIP_DATE)
            zi.external_attr = 0o644 << 16
            zf.writestr(zi, data)
    return path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist")
    print(build(out))
