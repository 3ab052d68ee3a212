"""Expression-level helpers for building efficient Catalyst trees.

``let`` is the load-bearing one: Spark has no common-subexpression sharing
across the branches of one projection (and CollapseProject re-inlines
chained selects), so an expression used N times is *evaluated* N times.
Binding it as a higher-order-function lambda variable —
``transform(array(x), v -> body(v))[0]`` — makes every use a variable
reference: one evaluation, still fully inside whole-stage codegen, no
shuffle, no extra projection. For md5-heavy trees (minhash, simhash,
lang-id) this is a 5-30x saving measured at sf0.1.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate *value* once and feed it to *body* as a variable.

    Equivalent to a SQL lateral alias / LET binding. Works for any data
    type (the value rides inside a 1-element array).
    """
    return F.transform(F.array(value), body)[0]


# ---------------------------------------------------------------------------
# Spark-SQL fragment builders (r13 optimization round)
#
# Building a literal-heavy expression Column-by-Column costs 1-3 py4j
# round-trips per F.lit/F.call — measured ~1.5 ms each on the bench
# host, so a single k×dim literal matrix (e.g. 16×64 JL signs, 8×64
# centroids) costs SECONDS of driver time before the query even
# starts. One ``F.expr()`` over a composed SQL string is ONE round-trip;
# the JVM-side parser builds the identical tree in microseconds. The
# fragments below render Python floats as exact Spark double literals
# (``repr`` round-trips IEEE-754; the ``D`` suffix pins DoubleType, so
# the parsed Literal is bit-identical to ``F.lit(float)``), keeping
# results bit-for-bit equal to the Column-built form — pinned by
# tests/test_fast_exprs.py.
# ---------------------------------------------------------------------------


def dlit(x: float) -> str:
    """Exact Spark-SQL double literal for *x* (``1.5D``, ``1e-05D``;
    non-finite values via a constant-folded string cast)."""
    x = float(x)
    if x != x:
        return "CAST('NaN' AS DOUBLE)"
    if x == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if x == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return f"{x!r}D"


def darr(vals) -> str:
    """Spark-SQL ``array(...)`` of exact double literals."""
    return "array(" + ",".join(dlit(v) for v in vals) + ")"


def sfrag(x) -> str | None:
    """The SQL fragment of a Column-or-fragment argument: the string
    itself (a column name or parenthesized SQL expression) or None for
    a Column — callers use None to fall back to the Column builder."""
    return x if isinstance(x, str) else None
