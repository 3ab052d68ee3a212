"""Sequence packing: map documents onto fixed-token-budget training
chunks (concat-then-chunk, the standard LLM pretraining layout).

Engine extension (north star §training-data pipeline): given a token
count per document, documents are conceptually concatenated in id order
and the token stream is split every ``chunk_tokens`` tokens; each
document spans chunks ``floor(start/C) .. floor((end-1)/C)``.

Scale design (100 TB): a single global concatenation order would need one
total-order window — a single-reducer bottleneck. Real pipelines pack
per shard, so the operator shards by a deterministic key
(``doc_id % shards``) and runs the cumulative-sum window *within* each
shard: S independent sort-based windows (spill-friendly), parallelism =
S, reproducible on any engine. Chunk ids are therefore (shard, chunk)
pairs. The window carries only (id, n_tokens) — never document bodies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_chunks(
    docs: DataFrame,
    n_tokens: Column,
    chunk_tokens: int = 2048,
    shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Chunk-span assignment per document: (doc_id, shard, n_tokens,
    first_chunk, last_chunk, n_chunks). Zero-token documents are dropped
    (they occupy no span)."""
    t = docs.select(
        F.col(id_col), n_tokens.cast("long").alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    t = t.withColumn("shard", (F.col(id_col) % shards).cast("int"))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    t = t.withColumn("cum", cum)
    start = F.col("cum") - F.col("n_tokens")
    first = F.floor(start / chunk_tokens).cast("long")
    last = F.floor((F.col("cum") - 1) / chunk_tokens).cast("long")
    return t.select(
        id_col,
        "shard",
        "n_tokens",
        first.alias("first_chunk"),
        last.alias("last_chunk"),
        (last - first + 1).alias("n_chunks"),
    )


def pack_chunks_sql(
    n_tokens_expr: str,
    chunk_tokens: int = 2048,
    shards: int = 8,
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB twin of pack_chunks (same shards, same window, same spans)."""
    return f"""
    WITH t AS (
      SELECT {id_col},
             cast({n_tokens_expr} as bigint) AS n_tokens,
             cast({id_col} % {shards} as int) AS shard
      FROM {table}
      WHERE {n_tokens_expr} > 0
    ),
    c AS (
      SELECT *, sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY {id_col}
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t
    )
    SELECT {id_col}, shard, n_tokens,
           cast(floor((cum - n_tokens) / {chunk_tokens}) as bigint) AS first_chunk,
           cast(floor((cum - 1) / {chunk_tokens}) as bigint) AS last_chunk,
           cast(floor((cum - 1) / {chunk_tokens}) as bigint)
             - cast(floor((cum - n_tokens) / {chunk_tokens}) as bigint) + 1 AS n_chunks
    FROM c
    """
