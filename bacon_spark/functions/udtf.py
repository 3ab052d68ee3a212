"""Python UDTFs (Spark 4 user-defined TABLE functions).

The third leg of the SURVEY §2.11 UDF surface next to scalar Columns
(cubedef labels) and pandas UDAFs (functions/udaf.py): a UDTF maps one
input row to ZERO OR MORE output rows — the lateral-view/flatMap shape.
The reference has no equivalent (its extension point is the Accumulator
class); in Spark this is the escape hatch for row-expanding logic that
``explode`` over a built-in array expression cannot compute.

Use built-ins first: everything in llm/text.py expands rows via
``F.explode`` over codegen array expressions, which is strictly faster
(no Python boundary). A UDTF earns its place only when the expansion
needs real Python per row — the tokenizer here exists to pin the UDTF
execution path itself (registration, lateral join, schema contract)
with an exactness oracle, and as the template for genuinely-Python
expansions (custom tokenizers, parsers, decoders).

Scale notes: UDTF rows cross the Python boundary one batch at a time
(Arrow when ``useArrow=True``); the expansion is map-side — no shuffle —
and composes with ``LATERAL`` joins in SQL. Keep heavy per-row state in
``__init__`` (built once per worker task, not per row).
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

#: the shared tokenizer dialect (llm/text.TOKEN_SPLIT_RE keeps the Spark
#: and DuckDB twins identical; this must match it)
_TOKEN_RE = re.compile(r"[^a-z]+")


@udtf(returnType="pos: int, token: string", useArrow=True)
class TokenizeUDTF:
    """(text) -> one row per token with its 1-based position.

    Mirrors llm/text.tokens (lowercase, letter runs, empties dropped) so
    the oracle can replay it with the same shared dialect.
    """

    def eval(self, text: str):
        if text is None:
            return
        pos = 0
        for tok in _TOKEN_RE.split(text.lower()):
            if tok:
                pos += 1
                yield pos, tok


def register_udtfs(spark) -> None:
    """Register the module's UDTFs for SQL use (idempotent)."""
    spark.udtf.register("tokenize", TokenizeUDTF)
