"""Where the engine's DERIVED STATE lives (ANN indexes, token tables,
bucketed warehouse tables, staged stream inputs, clustered layouts).

Historically anchored on the parent of the installed ``bacon_spark``
package — correct for a repo checkout (state lands beside the code, and
the harness cwd varies per consumer, see tests/test_driver_contract.py)
but wrong for a WHEEL install: the package parent is ``site-packages``,
which is frequently read-only and never the right place for gigabytes
of per-dataset artifacts.  The round-11 wheel bench
(tools/bench_wheel.py) surfaced exactly that: every once-per-ingest
artifact was silently rebuilt under the venv's site-packages.

Resolution order:

1. ``$SPARK_GRAFT_STATE_DIR`` — explicit override, the production form
   (point it at fast local disk / the cluster's scratch volume).
2. The package parent, when it is NOT a ``site-packages`` /
   ``dist-packages`` dir AND is writable — the checkout case, unchanged
   behavior.  The writability check (ADVICE r11) catches the installs
   the basename test can't: ``pip --target``, vendored trees, zipapps,
   read-only mounts — anywhere the package parent is not a place the
   process may write gigabytes of per-dataset artifacts.
3. ``~/.cache/bacon_spark`` — fallback: per-user, writable, survives
   venv rebuilds (the artifacts are keyed by absolute dataset path, so
   sharing the cache dir is safe).
"""

from __future__ import annotations

import os


def state_root() -> str:
    env = os.environ.get("SPARK_GRAFT_STATE_DIR")
    if env:
        return os.path.abspath(env)
    import bacon_spark

    root = os.path.dirname(os.path.dirname(os.path.abspath(bacon_spark.__file__)))
    if os.path.basename(root) not in ("site-packages", "dist-packages") and os.access(
        root, os.W_OK
    ):
        return root
    return os.path.join(os.path.expanduser("~"), ".cache", "bacon_spark")
