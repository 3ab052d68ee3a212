"""BPE tokenizer-training support: corpus-wide adjacent-pair counting —
the inner loop of byte-pair-encoding vocabulary construction (Sennrich
et al. 2016, arXiv:1508.07909).

A BPE merge step needs, over the whole corpus, the frequency of every
adjacent symbol pair weighted by word frequency.  At 100 TB the naive
formulation (explode every token occurrence into pairs) shuffles the
corpus; the right shape — implemented here — aggregates to the DISTINCT
word vocabulary first (a Zipf-bounded table, tiny relative to the
corpus), then explodes pairs per distinct word weighted by its count:

    corpus --map-side tokenize/explode--> (word) --partial-agg shuffle-->
    (word, cnt) --map-side pair explode--> (pair, cnt) --bounded agg-->

The only row-cardinality shuffle carries bare words with map-side
combine; everything after is vocabulary-sized.  All expression work is
built-in (whole-stage codegen), and the DuckDB twin is generated from
the same constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens, tokens_sql

__all__ = ["bpe_pair_counts", "bpe_pair_counts_sql"]


def bpe_pair_counts(docs: DataFrame, text_col: str = "text", top: int = 50) -> DataFrame:
    """Top-*top* adjacent character pairs across the corpus, weighted by
    word frequency: ``(pair, cnt)`` ordered by cnt desc, pair asc — the
    argmax candidates of the first BPE merge."""
    words = docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("wcnt"))
    pairs = vocab.filter(F.length("w") >= 2).select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
        "wcnt",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wcnt").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(top)
    )


def bpe_pair_counts_sql(table: str = "documents", text_col: str = "text", top: int = 50) -> str:
    """DuckDB twin of :func:`bpe_pair_counts` (same tokenizer, same
    vocabulary-first aggregation order)."""
    return f"""
    WITH _words AS (
        SELECT unnest({tokens_sql(text_col)}) AS w FROM {table}
    ),
    _vocab AS (SELECT w, count(*) AS wcnt FROM _words GROUP BY w),
    _pairs AS (
        SELECT unnest(list_transform(range(1, length(w)), i -> substring(w, i, 2)))
                   AS pair,
               wcnt
        FROM _vocab
        WHERE length(w) >= 2
    )
    SELECT pair, cast(sum(wcnt) as bigint) AS cnt
    FROM _pairs
    GROUP BY pair
    ORDER BY cnt DESC, pair ASC
    LIMIT {top}
    """
