"""Bench the INSTALLED WHEEL, not the checkout (VERDICT r10 next #7).

tools/release_smoke.py proves the wheel imports and answers a query from
a clean venv; this goes one step further and runs the full bench.py
inventory against the wheel, so a packaging-sensitive perf path (a data
file missing from the wheel silently falling back to a slow path) shows
up as a bench delta instead of staying invisible.

Mechanics: bench.py inserts ITS OWN directory at sys.path[0], so running
it in place would import the checkout no matter which python runs it.
The harness copies bench.py to a temp dir and runs it there with the
smoke venv's interpreter — imports then resolve against the installed
wheel (asserted: ``bacon_spark.__file__`` inside ``.venv_smoke``).

Usage: python tools/bench_wheel.py [--compare BENCH_local.json]
       [--out BENCH_wheel.json] [--rebuild]
With --compare, prints the wheel-vs-checkout total delta; the round
convention records it in the BENCH_local note (target: |delta| < 5%).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VENV = os.path.join(REPO, ".venv_smoke")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--compare", default=None,
                    help="checkout bench JSON to diff against")
    ap.add_argument("--out", default=None, help="write the wheel bench JSON here")
    ap.add_argument("--rebuild", action="store_true",
                    help="rebuild wheel + venv even if .venv_smoke exists")
    args = ap.parse_args()

    py = os.path.join(VENV, "bin", "python")
    if args.rebuild or not os.path.exists(py):
        sys.path.insert(0, os.path.join(REPO, "tools"))
        import release_smoke

        rc = release_smoke.run()
        if rc:
            return rc

    with tempfile.TemporaryDirectory() as td:
        bench = shutil.copy(os.path.join(REPO, "bench.py"), td)
        # guard: the venv python must serve bacon_spark from the wheel
        where = subprocess.run(
            [py, "-c", "import bacon_spark; print(bacon_spark.__file__)"],
            capture_output=True, text=True, cwd=td, check=True,
        ).stdout.strip()
        assert ".venv_smoke" in where, f"not the wheel: {where}"
        print(f"wheel import: {where}", file=sys.stderr)
        proc = subprocess.run(
            [py, bench], capture_output=True, text=True, cwd=td,
            env={**os.environ},
        )
        if proc.returncode:
            sys.stderr.write(proc.stderr[-4000:])
            return proc.returncode
        line = proc.stdout.strip().splitlines()[-1]
        rec = json.loads(line)

    rec["note"] = f"installed-wheel run via tools/bench_wheel.py ({where})"
    print(json.dumps({k: rec[k] for k in ("metric", "value", "unit", "sf")}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f)
        print(f"wrote {args.out}", file=sys.stderr)
    if args.compare:
        with open(args.compare) as f:
            base = json.load(f)
        delta = (rec["value"] - base["value"]) / base["value"]
        common = [q for q, v in rec["queries"].items()
                  if v and base["queries"].get(q)]
        worst = sorted(
            ((rec["queries"][q] / base["queries"][q], q) for q in common
             if base["queries"][q] > 0.5),
            reverse=True,
        )[:5]
        print(
            f"wheel {rec['value']}s vs checkout {base['value']}s: "
            f"delta {delta:+.1%}; worst per-query ratios (>0.5s base): "
            + ", ".join(f"{q}={r:.2f}x" for r, q in worst)
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
