"""Gate-query package: importing the domain modules registers every
query/oracle pair into the shared QUERIES/ORACLES registries
(gate/_base.py) in q-number order of each domain file."""

from ._base import ORACLES, QUERIES, board, dec, finalize, query, _read, _read_docs  # noqa: F401
from . import core, streaming, llm, temporal, textprep, warehouse  # noqa: E402,F401  (registration side effects)
from .warehouse import bucketed_star_tables  # noqa: F401
