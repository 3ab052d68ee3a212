"""Query inventory facade: every operator from SURVEY §2 as a
(Spark query, DuckDB oracle SQL) pair, keyed by name in QUERIES/ORACLES.

The inventory itself lives in the gate/ package, split by domain
(gate/core.py, gate/streaming.py, gate/llm.py, gate/textprep.py,
gate/temporal.py, gate/warehouse.py, shared helpers in gate/_base.py); importing this
module registers all of them.  The cross-engine determinism rules the
whole inventory follows (identical aliasing both sides, decimal-exact
float aggregation, tz-pinned group keys) are documented in
gate/_base.py.
"""

from .gate import (  # noqa: F401
    ORACLES,
    QUERIES,
    board,
    bucketed_star_tables,
    dec,
    finalize,
    query,
    _read,
    _read_docs,
)
