"""Lexical relevance ranking over the corpus: BM25 and TF-IDF.

Engine extensions beyond the reference (no text scoring anywhere in it;
SURVEY §2 north-star list) — the retrieval/quality-weighting step of a
training-data pipeline.

Scale design: everything is built-in expressions (tokenize via
``llm.text.tokens``, explode, hash-agg) so the hot path is
whole-stage-codegen JVM work.  For BM25 the per-term work is filtered to
the QUERY's terms before the (doc, term) shuffle — corpus-sized input,
query-sized state — and the document-frequency table (≤ |query| rows) is
broadcast back.  Corpus stats (N, total token count) are two scalar
aggregates collected once driver-side.

Determinism discipline (oracle hash-matching): every per-term double is
rounded, summed exactly as decimal (associativity-proof), cast back and
rounded — the same recipe the aggregate queries use — and every floating
expression is written with the identical operator shape on both engines
so IEEE evaluation order matches.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens, tokens_sql

__all__ = ["bm25_scores", "bm25_scores_sql", "tfidf_top_terms", "tfidf_top_terms_sql"]


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    *,
    limit: int = 20,
) -> DataFrame:
    """Top-*limit* documents by BM25 score against *query_terms*
    (Lucene-style idf ``ln((N - df + 0.5)/(df + 0.5) + 1)``), ordered by
    rounded score then id — deterministic under ties."""
    toks = docs.select(id_col, tokens(F.col(text_col)).alias("_toks"))
    dl = toks.select(id_col, F.size("_toks").alias("dl"))
    n_docs = docs.count()
    sum_dl = dl.agg(F.sum("dl")).first()[0]
    avgdl = sum_dl / n_docs  # exact-int sum, one IEEE division: = SQL's
    tf = (
        toks.select(id_col, F.explode("_toks").alias("term"))
        .where(F.col("term").isin(list(query_terms)))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.lit(n_docs) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.lit(avgdl)
    )
    per = (
        tf.join(F.broadcast(df), "term")
        .join(dl, id_col)
        .select(
            id_col,
            F.round(idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom, 7).alias("s"),
        )
    )
    return (
        per.groupBy(id_col)
        .agg(
            F.round(
                F.sum(F.col("s").cast("decimal(38,10)")).cast("double"), 5
            ).alias("bm25")
        )
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(limit)
    )


def bm25_scores_sql(
    query_terms: Sequence[str],
    text_expr: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    *,
    limit: int = 20,
    table: str = "documents",
) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
    WITH toks AS (
      SELECT {id_col}, {tokens_sql(text_expr)} AS t FROM {table}
    ),
    dl AS (SELECT {id_col}, len(t) AS dl FROM toks),
    stats AS (
      SELECT (SELECT count(*) FROM {table}) AS n,
             (SELECT sum(dl)::DOUBLE / count(*) FROM dl) AS avgdl
    ),
    tf AS (
      SELECT {id_col}, term, count(*) AS tf
      FROM (SELECT {id_col}, unnest(t) AS term FROM toks)
      WHERE term IN ({terms})
      GROUP BY 1, 2
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    per AS (
      SELECT tf.{id_col},
             round(ln((n - df + 0.5) / (df + 0.5) + 1.0)
                   * (tf * {k1 + 1.0}) / (tf + {k1} * (1.0 - {b} + {b} * dl / avgdl)),
                   7) AS s
      FROM tf
      JOIN df USING (term)
      JOIN dl USING ({id_col}), stats
    )
    SELECT {id_col},
           round(cast(sum(cast(s AS decimal(38,10))) AS double), 5) AS bm25
    FROM per GROUP BY 1
    ORDER BY bm25 DESC, {id_col} LIMIT {limit}
    """


def tfidf_top_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Top-*k* characteristic terms per document by tf·idf
    (``idf = ln(N/df)``), ranked by rounded score then term.

    The full-vocabulary sibling of BM25: document frequency is an
    aggregate over the (doc, term) tf rows (vocab·docs scale, already
    map-side-combined) joined back on term — NOT a count window
    partitioned by term: WindowExec buffers the whole partition, so a
    ubiquitous term (df ≈ N, stopwords) would concentrate N rows in one
    task's memory. The groupBy+join costs the same term-keyed shuffles
    but carries one aggregated row per term, and a skewed term key is
    AQE-splittable in a join where a window partition is not. Three
    key-partitioned shuffles total: (doc, term) → term → doc."""
    from pyspark.sql import Window

    n_docs = docs.count()
    tf = (
        docs.select(id_col, F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_by_term = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_by_term, "term").withColumn(
        "s",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 7),
    )
    rk = F.row_number().over(
        Window.partitionBy(id_col).orderBy(F.col("s").desc(), F.col("term"))
    )
    return (
        scored.withColumn("rk", rk)
        .where(F.col("rk") <= k)
        .select(id_col, "term", F.col("s").alias("tfidf"), "rk")
    )


def tfidf_top_terms_sql(
    text_expr: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    *,
    table: str = "documents",
) -> str:
    return f"""
    WITH toks AS (
      SELECT {id_col}, unnest({tokens_sql(text_expr)}) AS term FROM {table}
    ),
    tf AS (SELECT {id_col}, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    n AS (SELECT count(*)::DOUBLE AS c FROM {table}),
    scored AS (
      SELECT {id_col}, term,
             round(tf * ln(c / count(*) OVER (PARTITION BY term)), 7) AS s
      FROM tf, n
    ),
    ranked AS (
      SELECT {id_col}, term, s,
             row_number() OVER (PARTITION BY {id_col} ORDER BY s DESC, term) AS rk
      FROM scored
    )
    SELECT {id_col}, term, s AS tfidf, rk FROM ranked WHERE rk <= {k}
    """


# ---------------------------------------------------------------------------
# Inverted index construction
# ---------------------------------------------------------------------------


def inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    top_terms: int = 100,
    postings_cap: int = 20,
) -> DataFrame:
    """Materialized inverted index summary: per term, document frequency,
    collection frequency, and a CAPPED posting list (the *postings_cap*
    lowest doc ids, comma-joined) — ``term, df, cf, postings``; top
    *top_terms* by (df desc, term asc).

    Scale shape: the expensive step is the (term, doc) term-frequency
    aggregation, which partial-aggregates map-side before the term-keyed
    shuffle.  The posting list is bounded BEFORE collection by a per-term
    row_number window (the window rides the same term-keyed exchange),
    so no executor ever holds an unbounded posting — the classic
    build-a-search-index batch job."""
    from pyspark.sql import Window

    tf = (
        docs.select(F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term", "id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )
    w = Window.partitionBy("term").orderBy("id")
    capped = tf.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= postings_cap
    )
    postings = capped.groupBy("term").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list("id")), lambda x: x.cast("string")
            ),
        ).alias("postings")
    )
    return (
        stats.filter(F.col("df") >= min_df)
        .join(postings, "term")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(top_terms)
        .select("term", "df", "cf", "postings")
    )


def inverted_index_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    top_terms: int = 100,
    postings_cap: int = 20,
) -> str:
    """DuckDB twin of :func:`inverted_index` (same cap-before-collect
    posting rule)."""
    return f"""
    WITH _tf AS (
        SELECT term, id, count(*) AS tf
        FROM (SELECT {id_col} AS id, unnest({tokens_sql(text_col)}) AS term
              FROM {table})
        GROUP BY term, id
    ),
    _stats AS (
        SELECT term, cast(count(*) as bigint) AS df,
               cast(sum(tf) as bigint) AS cf
        FROM _tf GROUP BY term
    ),
    _capped AS (
        SELECT term, id,
               row_number() OVER (PARTITION BY term ORDER BY id) AS rn
        FROM _tf
    ),
    _postings AS (
        SELECT term,
               array_to_string(list_sort(list(id)), ',') AS postings
        FROM _capped WHERE rn <= {postings_cap}
        GROUP BY term
    )
    SELECT _stats.term, df, cf, postings
    FROM _stats JOIN _postings USING (term)
    WHERE df >= {min_df}
    ORDER BY df DESC, term ASC
    LIMIT {top_terms}
    """
