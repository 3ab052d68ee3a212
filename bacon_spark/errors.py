"""Engine error types.

Mirrors the reference's error taxonomy (/root/reference/bacon/errors.py:4-13):
``QueryError`` for malformed queries (unknown labels/ops), ``DataError`` for
unparseable values. Both map to user-facing 4xx in web adapters.
"""


class BaconSparkError(Exception):
    """Base class for engine errors."""


class QueryError(BaconSparkError):
    """The query references unknown labels/operators or is malformed."""


class DataError(QueryError):
    """A query value failed to parse for its label's type."""
