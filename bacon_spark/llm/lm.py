"""Statistical language-model quality scoring (CCNet-style perplexity
filtering).

CCNet (Wenzek et al., 2020, arXiv:1911.00359) ranks web documents by the
perplexity of a language model trained on a high-quality target corpus
(Wikipedia) and keeps the head/middle of the distribution. This module
implements the distributable form: an add-one-smoothed BIGRAM model
fitted on a target corpus, scoring every document by its total/mean
bigram log-probability.

    log P(doc) = sum over bigrams (w1, w2) of
                 ln( (c_target(w1 w2) + 1) / (c_target(w1) + V) )

Determinism & the oracle (the q88 trick at bigram granularity): every
per-bigram log-probability is computed from exact integer counts through
one fixed IEEE expression shape and quantized to integer micro-nats
(round(1e6 * ln(...))); per-document scores are pure integer sums of
(count * quantized-logp) — no float accumulation order anywhere, so the
DuckDB twin reproduces scores bit-for-bit.

Scale shape (100 TB): the model tables are TARGET-corpus-sized (the
quality reference set — Wikipedia-scale, not corpus-scale) and join the
per-doc bigram counts via broadcastable equi-joins; the corpus side
shuffles only (doc, w1, w2, cnt) rows bounded by each document's bigram
vocabulary, never bodies. Unseen bigrams/contexts fall back to the
smoothed floor ((0 + 1) / (0 + V)) without special-casing: the LEFT
joins yield nulls that coalesce to zero counts inside the same
expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens, tokens_sql, word_ngrams, word_ngrams_sql

__all__ = ["bigram_lm_scores", "bigram_lm_scores_sql"]


def _doc_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    g = df.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), 2)).alias("bg")
    )
    return g.groupBy(id_col, "bg").agg(F.count(F.lit(1)).alias("cnt"))


def bigram_lm_scores(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document (n_bigrams, logprob_micro, avg_logprob_micro): total
    and per-bigram-mean add-one-smoothed bigram log-probability under the
    *target* corpus model, in integer micro-nats (mean via integer div).
    Zero-bigram documents keep n_bigrams=0 and null scores."""
    tg = target.select(F.explode(word_ngrams(F.col(text_col), 2)).alias("bg"))
    bigrams = tg.groupBy("bg").agg(F.count(F.lit(1)).alias("cb"))
    tu = target.select(F.explode(tokens(F.col(text_col))).alias("w"))
    unigrams = tu.groupBy("w").agg(F.count(F.lit(1)).alias("cu"))
    v = tu.agg(F.count_distinct("w").alias("V"))

    doc = _doc_bigrams(df, text_col, id_col).withColumn(
        "w1", F.split_part(F.col("bg"), F.lit(" "), F.lit(1))
    )
    scored = (
        doc.join(F.broadcast(bigrams), "bg", "left")
        .join(F.broadcast(unigrams), F.col("w1") == F.col("w"), "left")
        .crossJoin(F.broadcast(v))
        .select(
            id_col,
            "cnt",
            F.round(
                F.lit(1_000_000)
                * F.log(
                    (F.coalesce(F.col("cb"), F.lit(0)) + 1)
                    / (F.coalesce(F.col("cu"), F.lit(0)) + F.col("V"))
                ),
                0,
            )
            .cast("long")
            .alias("lp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.sum("cnt").alias("n_bigrams"),
        F.sum(F.col("cnt") * F.col("lp")).alias("logprob_micro"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.col("logprob_micro").cast("long").alias("logprob_micro"),
            F.when(
                F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0,
                # `div` truncates toward zero, exactly like DuckDB's //
                # on these negative scores (verified against the oracle;
                # floor-division would differ by 1 on every negative avg)
                F.expr("logprob_micro div n_bigrams"),
            )
            .cast("long")
            .alias("avg_logprob_micro"),
        )
    )


def bigram_lm_scores_sql(
    target_where: str,
    table: str = "documents",
    text_expr: str = "text",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`bigram_lm_scores` with the target corpus
    ``SELECT * FROM table WHERE target_where`` — identical counts,
    identical IEEE expression shape, identical integer quantization."""
    bg2 = word_ngrams_sql(text_expr, 2)
    toks = tokens_sql(text_expr)
    return f"""
    WITH tgt AS (SELECT * FROM {table} d WHERE {target_where}),
    tbg AS (
      SELECT unnest({bg2}) AS bg FROM tgt
    ),
    bigrams AS (SELECT bg, count(*) AS cb FROM tbg GROUP BY 1),
    tun AS (SELECT unnest({toks}) AS w FROM tgt),
    unigrams AS (SELECT w, count(*) AS cu FROM tun GROUP BY 1),
    vocab AS (SELECT count(DISTINCT w) AS V FROM tun),
    dbg AS (
      SELECT {id_expr} AS doc_id, unnest({bg2}) AS bg FROM {table}
    ),
    doc AS (
      SELECT doc_id, bg, count(*) AS cnt,
             string_split(bg, ' ')[1] AS w1
      FROM dbg GROUP BY 1, 2
    ),
    scored AS (
      SELECT d.doc_id, d.cnt,
             cast(round(1000000 * ln(
               (coalesce(b.cb, 0) + 1)
               / (coalesce(u.cu, 0) + vocab.V))) AS bigint) AS lp
      FROM doc d
      LEFT JOIN bigrams b ON d.bg = b.bg
      LEFT JOIN unigrams u ON d.w1 = u.w, vocab
    ),
    per_doc AS (
      SELECT doc_id, sum(cnt) AS n_bigrams, sum(cnt * lp) AS logprob_micro
      FROM scored GROUP BY 1
    )
    SELECT d.{id_expr} AS doc_id,
           coalesce(p.n_bigrams, 0)::BIGINT AS n_bigrams,
           p.logprob_micro::BIGINT AS logprob_micro,
           (CASE WHEN coalesce(p.n_bigrams, 0) > 0
                 THEN p.logprob_micro // p.n_bigrams END)::BIGINT AS avg_logprob_micro
    FROM {table} d LEFT JOIN per_doc p ON d.{id_expr} = p.doc_id
    ORDER BY doc_id
    """
