"""Packaging (VERDICT r9 next #6): the wheel tools/build_wheel.py emits
must carry every runtime module — the in-repo suite imports from the
checkout and can never catch a packaging miss — and rebuilds must be
deterministic. The full install-into-venv smoke lives in
tools/release_smoke.py (subprocess + venv, run per release); these tests
cover the wheel CONTENT contract cheaply enough for every suite run."""

import hashlib
import os
import sys
import zipfile

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"))


@pytest.fixture(scope="module")
def wheel(tmp_path_factory):
    import build_wheel

    return build_wheel.build(str(tmp_path_factory.mktemp("dist")))


def test_wheel_carries_every_package_module(wheel):
    """Every .py under bacon_spark/ (templatetags included — the classic
    Django-only packaging miss) appears in the wheel and in RECORD."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    want = set()
    for dirpath, dirnames, filenames in os.walk(os.path.join(repo, "bacon_spark")):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for fn in filenames:
            if fn.endswith(".py"):
                want.add(
                    os.path.relpath(os.path.join(dirpath, fn), repo).replace(
                        os.sep, "/"
                    )
                )
    with zipfile.ZipFile(wheel) as zf:
        names = set(zf.namelist())
        record = zf.read("bacon_spark-0.1.0.dist-info/RECORD").decode()
    missing = want - names
    assert not missing, f"modules missing from wheel: {sorted(missing)[:5]}"
    assert "bacon_spark/templatetags/bacon_tags.py" in names
    assert "bacon_spark/observers/template_tags.py" in names
    recorded = {line.split(",")[0] for line in record.strip().splitlines()}
    assert want <= recorded


def test_wheel_metadata_and_entry_points(wheel):
    with zipfile.ZipFile(wheel) as zf:
        meta = zf.read("bacon_spark-0.1.0.dist-info/METADATA").decode()
        eps = zf.read("bacon_spark-0.1.0.dist-info/entry_points.txt").decode()
        whl = zf.read("bacon_spark-0.1.0.dist-info/WHEEL").decode()
    assert "Name: bacon-spark" in meta and "Requires-Dist: pyspark>=4.0" in meta
    assert 'Requires-Dist: flask>=2.2; extra == "flask"' in meta
    assert "bacon-spark-demo = bacon_spark.demo:main" in eps
    assert "Tag: py3-none-any" in whl


def test_wheel_rebuild_is_byte_identical(wheel, tmp_path):
    import build_wheel

    again = build_wheel.build(str(tmp_path))
    h1 = hashlib.sha256(open(wheel, "rb").read()).hexdigest()
    h2 = hashlib.sha256(open(again, "rb").read()).hexdigest()
    assert h1 == h2


def test_state_root_never_site_packages(monkeypatch, tmp_path):
    """Round 11 (found by tools/bench_wheel.py): derived state must never
    land inside site-packages — a wheel install silently rebuilt every
    once-per-ingest artifact under the venv. Resolution order: explicit
    $SPARK_GRAFT_STATE_DIR, else the package parent UNLESS it is a
    site-packages/dist-packages dir, else ~/.cache/bacon_spark."""
    import importlib
    import os

    import bacon_spark
    from bacon_spark.utils import state

    # 1. env override wins
    monkeypatch.setenv("SPARK_GRAFT_STATE_DIR", str(tmp_path / "scratch"))
    assert state.state_root() == str(tmp_path / "scratch")
    monkeypatch.delenv("SPARK_GRAFT_STATE_DIR")

    # 2. checkout: the package parent (this repo)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(bacon_spark.__file__)))
    assert state.state_root() == repo
    assert os.path.basename(repo) not in ("site-packages", "dist-packages")

    # 3. installed package: fall back to the user cache dir
    fake_pkg = tmp_path / "venv" / "lib" / "site-packages" / "bacon_spark"
    fake_pkg.mkdir(parents=True)
    monkeypatch.setattr(bacon_spark, "__file__", str(fake_pkg / "__init__.py"))
    got = state.state_root()
    assert "site-packages" not in got and got.endswith(
        os.path.join(".cache", "bacon_spark")
    )

    # 4. nonstandard install (pip --target, vendored tree, zipapp, or a
    # read-only mount): the basename test passes but the parent is not
    # writable — still fall back to the cache dir (ADVICE r11). os.access
    # is patched because the suite runs as root, for whom W_OK is
    # unconditionally true on rw filesystems.
    vendored = tmp_path / "vendor" / "bacon_spark"
    vendored.mkdir(parents=True)
    monkeypatch.setattr(bacon_spark, "__file__", str(vendored / "__init__.py"))
    monkeypatch.setattr(
        state.os, "access", lambda p, mode: p != str(tmp_path / "vendor")
    )
    got = state.state_root()
    assert got.endswith(os.path.join(".cache", "bacon_spark"))
    monkeypatch.undo()

    # artifact_path rides on it
    from bacon_spark.gate._base import artifact_path

    p = artifact_path("/root/testdata/sf0.001", "toks")
    assert "site-packages" not in p
