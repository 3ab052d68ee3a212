"""Release smoke: wheel -> clean venv -> import + query (VERDICT r9 #6).

The in-repo test suite can never catch a PACKAGING miss — it imports
``bacon_spark`` from the checkout, so a module missing from the wheel
(the class of bug that bit real releases: templatetags packages, data
files, console scripts) stays invisible. This script:

1. builds the wheel with tools/build_wheel.py (stdlib PEP 427 writer),
2. creates a fresh venv at ``.venv_smoke`` with --system-site-packages
   (pyspark/pandas/pyarrow come from the container; nothing is
   downloaded) and installs ONLY the wheel into it, --no-index
   --no-deps,
3. runs a smoke subprocess with the venv's python FROM A NEUTRAL CWD
   that asserts bacon_spark resolves INSIDE the venv (not the repo
   checkout), imports every subpackage the wheel must carry
   (templatetags included), runs the q01 gate query against
   /root/testdata/sf0.001 through the public API, renders a Controller
   table (the framework-free web surface), and checks the
   console-script entry point is installed.

Exit code 0 = the artifact a user would pip-install actually works.

Usage: python tools/release_smoke.py
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VENV = os.path.join(REPO, ".venv_smoke")

SMOKE = r"""
import os, sys

import bacon_spark

# the import must come from the INSTALLED wheel, not a repo checkout
assert ".venv_smoke" in bacon_spark.__file__, bacon_spark.__file__

# every subpackage the wheel must carry (templatetags is the classic
# packaging miss: a directory only Django ever imports)
import bacon_spark.accumulators
import bacon_spark.builders.url
import bacon_spark.cubedef
import bacon_spark.cubenav
import bacon_spark.cubequery
import bacon_spark.demo
import bacon_spark.gate.core
import bacon_spark.llm.dedup
import bacon_spark.observers.controller
import bacon_spark.observers.tables
import bacon_spark.operators.funnel
import bacon_spark.sources.star
import bacon_spark.sql
import bacon_spark.streaming.funnel
import bacon_spark.observers.template_tags  # framework-free tag bodies
import bacon_spark.utils.access_log

# the Django-only modules can't import without Django, but they MUST be
# in the wheel (the classic packaging miss) — assert file presence
pkg = os.path.dirname(bacon_spark.__file__)
for rel in ("templatetags/bacon_tags.py", "templatetags/bacon_nav.py"):
    assert os.path.exists(os.path.join(pkg, rel)), f"missing from wheel: {rel}"

# console script installed by the wheel's entry_points.txt
exe = os.path.join(os.path.dirname(sys.executable), "bacon-spark-demo")
assert os.path.exists(exe), exe

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .appName("release-smoke")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

# gate query through the public API
from bacon_spark.gate.core import QUERIES

rows = QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001").collect()
assert len(rows) > 0, "q01 returned no rows"

# the framework-free web surface: Controller -> rendered table
from bacon_spark.observers.controller import Controller
from bacon_spark.sources.star import StarCuttingBoard, sales_cubedef

board = StarCuttingBoard(
    sales_cubedef(), spark, "/root/testdata/sf0.001", cache_results=False
)
ctl = Controller(board)
page = ctl.render_html({"q": "a:region/v:revenue"})
assert "<table" in page and "revenue" in page, page[:200]

spark.stop()
print("SMOKE OK: wheel install serves imports, q01, and the table surface")
"""


def run() -> int:
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import build_wheel

    wheel = build_wheel.build(os.path.join(REPO, "dist"))
    print(f"wheel: {wheel}")

    shutil.rmtree(VENV, ignore_errors=True)
    import venv

    venv.EnvBuilder(with_pip=True, system_site_packages=True).create(VENV)
    pip = os.path.join(VENV, "bin", "pip")
    subprocess.run(
        [pip, "install", "--no-index", "--no-deps", "--force-reinstall", wheel],
        check=True,
    )
    py = os.path.join(VENV, "bin", "python")
    # neutral cwd: a repo-relative import must not be able to mask a
    # packaging miss
    r = subprocess.run([py, "-c", SMOKE], cwd="/tmp")
    return r.returncode


if __name__ == "__main__":
    sys.exit(run())
