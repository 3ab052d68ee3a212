"""DSIR-style data selection: hashed n-gram importance weights.

Implements the estimator of "Data Selection for Language Models via
Importance Resampling" (Xie et al., 2023, arXiv:2302.03169): represent
each document as hashed n-gram counts over ``num_buckets`` buckets, fit
bag-of-buckets unigram models for a TARGET distribution (the
high-quality corpus you want more of) and the RAW distribution (the
corpus you are selecting from), and score every raw document with its
log importance weight

    log w(x) = sum_b  cnt_b(x) * [ log p_target(b) - log p_raw(b) ]

with add-one smoothing. Documents are then selected by (Gumbel-noised)
top-k on the weight — the noising/selection step is the caller's policy;
this module produces the deterministic scores.

Determinism & the oracle (why the score is an INTEGER):

* the bucket of a gram is the shared 60-bit md5 dialect (llm/dedup.hash60,
  identical SQL in Spark and DuckDB) mod ``num_buckets`` — no engine hash
  functions, no seeds;
* the per-bucket log-ratio is computed ONCE per bucket from exact integer
  counts through a fixed IEEE expression shape —
  ``ln(((ct+1)/(cr+1)) * ((R+B)/(T+B)))`` — then scaled to micro-nats and
  rounded to a BIGINT. Identical integer inputs give identical doubles in
  both engines; only ``ln`` is libm-dependent (<=1 ulp), which the 1e-6
  quantization makes irrelevant in practice;
* per-document scores are then pure INTEGER sums ``sum(cnt * lr_b)`` —
  no float accumulation order anywhere in the aggregation.

Scale shape (100 TB): the feature pass is map-side (tokenize, hash,
per-doc bucket counts via one narrow groupBy keyed (doc, bucket) — at
most ``num_buckets`` rows per doc, bodies never shuffled). The bucket
model is ``num_buckets`` rows — broadcast — so scoring is a map-side hash
probe plus one narrow per-doc sum. The target corpus is typically tiny
(a quality reference set) and is re-featurized, not joined.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import hash60, hash60_sql
from .text import word_ngrams, word_ngrams_sql

__all__ = ["hashed_features", "dsir_scores", "dsir_scores_sql"]


def _gram_array(text: Column, ns: tuple[int, ...]) -> Column:
    arrays = [word_ngrams(text, n) for n in ns]
    out = arrays[0]
    for a in arrays[1:]:
        out = F.concat(out, a)
    return out


def _gram_array_sql(expr: str, ns: tuple[int, ...]) -> str:
    parts = [word_ngrams_sql(expr, n) for n in ns]
    out = parts[0]
    for p in parts[1:]:
        out = f"list_concat({out}, {p})"
    return out


def _bucket(gram: Column, num_buckets: int, salt: str) -> Column:
    return hash60(F.concat(F.lit(salt + ":"), gram)) % num_buckets


def _bucket_sql(gram_expr: str, num_buckets: int, salt: str) -> str:
    salted = "'" + salt + ":' || " + gram_expr
    return f"({hash60_sql(salted)} % {num_buckets})"


def hashed_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: tuple[int, ...] = (1, 2),
    num_buckets: int = 64,
    salt: str = "dsir",
) -> DataFrame:
    """(id, bucket, cnt): hashed word n-gram counts per document — the
    DSIR feature map (arXiv:2302.03169 §3.1, hashed n-grams)."""
    grams = df.select(
        F.col(id_col),
        F.explode(_gram_array(F.col(text_col), ns)).alias("gram"),
    )
    return (
        grams.select(id_col, _bucket(F.col("gram"), num_buckets, salt).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_scores(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: tuple[int, ...] = (1, 2),
    num_buckets: int = 64,
    salt: str = "dsir",
) -> DataFrame:
    """Per-document DSIR log importance weights in micro-nats.

    Returns (id, n_feats, dsir_score): n_feats is the document's total
    hashed-gram count, dsir_score = sum_b cnt_b * lr_b with lr_b the
    bucket's smoothed log-probability ratio, quantized to micro-nats.
    Zero-gram documents keep n_feats=0 and a null score."""
    feats = hashed_features(df, text_col, id_col, ns, num_buckets, salt)
    tfeats = hashed_features(target, text_col, id_col, ns, num_buckets, salt)

    raw = feats.groupBy("bucket").agg(F.sum("cnt").alias("cr"))
    tgt = tfeats.groupBy("bucket").agg(F.sum("cnt").alias("ct"))
    totals = raw.agg(F.sum("cr").alias("R")).crossJoin(
        tgt.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("T"))
    )

    B = num_buckets
    lr = (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.round(
                F.lit(1_000_000)
                * F.log(
                    ((F.coalesce(F.col("ct"), F.lit(0)) + 1) / (F.col("cr") + 1))
                    * ((F.col("R") + B) / (F.col("T") + B))
                ),
                0,
            )
            .cast("long")
            .alias("lr"),
        )
    )

    scored = (
        feats.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_feats"),
            F.sum(F.col("cnt") * F.col("lr")).alias("dsir_score"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_feats"), F.lit(0)).cast("long").alias("n_feats"),
            F.col("dsir_score").cast("long").alias("dsir_score"),
        )
    )


def dsir_scores_sql(
    target_where: str,
    table: str = "documents",
    text_expr: str = "text",
    id_expr: str = "doc_id",
    ns: tuple[int, ...] = (1, 2),
    num_buckets: int = 64,
    salt: str = "dsir",
) -> str:
    """DuckDB twin of :func:`dsir_scores` where the target corpus is
    ``SELECT * FROM table WHERE target_where`` — same md5 buckets, same
    IEEE expression shape, same integer quantization."""
    grams = _gram_array_sql(text_expr, ns)
    bucket = _bucket_sql("gram", num_buckets, salt)
    B = num_buckets
    return f"""
    WITH grams AS (
      SELECT {id_expr} AS doc_id, unnest({grams}) AS gram FROM {table}
    ),
    feats AS (
      SELECT doc_id, {bucket} AS bucket, count(*) AS cnt
      FROM grams GROUP BY 1, 2
    ),
    raw AS (SELECT bucket, sum(cnt) AS cr FROM feats GROUP BY 1),
    tgt AS (
      SELECT f.bucket, sum(f.cnt) AS ct
      FROM feats f JOIN {table} d ON f.doc_id = d.{id_expr}
      WHERE {target_where} GROUP BY 1
    ),
    tot AS (
      SELECT (SELECT sum(cr) FROM raw) AS R,
             (SELECT coalesce(sum(ct), 0) FROM tgt) AS T
    ),
    lr AS (
      SELECT r.bucket,
             cast(round(1000000 * ln(
               ((coalesce(t.ct, 0) + 1) / (r.cr + 1))
               * ((tot.R + {B}) / (tot.T + {B})))) AS bigint) AS lr
      FROM raw r LEFT JOIN tgt t ON r.bucket = t.bucket, tot
    ),
    scored AS (
      SELECT f.doc_id, sum(f.cnt) AS n_feats, sum(f.cnt * lr.lr) AS dsir_score
      FROM feats f JOIN lr ON f.bucket = lr.bucket GROUP BY 1
    )
    SELECT d.{id_expr} AS doc_id,
           coalesce(s.n_feats, 0)::BIGINT AS n_feats,
           s.dsir_score::BIGINT AS dsir_score
    FROM {table} d LEFT JOIN scored s ON d.{id_expr} = s.doc_id
    ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# Hashed linear quality classifier (fastText-style filter inference)
# ---------------------------------------------------------------------------


def hashed_linear_logit_micro(c, dim: int = 1024, seed: str = "qlw"):
    """The scoring COLUMN of :func:`hashed_linear_scores` alone — a pure
    whole-stage-codegen expression, so a caller that only needs the keep
    predicate can ``df.filter(hashed_linear_logit_micro(col) > 0)``
    map-side with no join and no second corpus scan (q155 uses this)."""
    from pyspark.sql import functions as F

    from .dedup import hash60
    from .text import tokens

    def w(tok):
        idx = F.pmod(hash60(tok), F.lit(dim))
        return (
            F.pmod(hash60(F.concat(F.lit(seed + ":"), idx.cast("string"))), F.lit(2001))
            - 1000
        )

    toks = tokens(c)
    s = F.aggregate(
        F.transform(toks, lambda t: w(t)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n = F.size(toks)
    return F.when(
        n > 0, F.round(s.cast("double") * 1000.0 / n.cast("double")).cast("long")
    ).otherwise(F.lit(0).cast("long"))


def hashed_linear_scores(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1024,
    seed: str = "qlw",
):
    """Quality-classifier INFERENCE at corpus scale: a linear model over
    hashing-trick token features (the fastText/CCNet-style quality
    filter every production pipeline runs over 100 TB before training).

    The weight for feature bucket j is a pure deterministic function of
    j — ``hash60(seed:j) % 2001 - 1000`` (milli-units in [-1000, 1000]),
    the same md5-derived-constant trick as the LSH hyperplanes — so
    "inference" needs NO broadcast side at all: score =
    Σ_tokens w(bucket(token)) / n_tokens folds entirely into
    whole-stage codegen array expressions, zero shuffle, zero UDFs.
    (A trained model would broadcast a dim-sized weight array instead;
    the plan shape is identical.)

    Emitted integer-exact (``logit_micro`` = round(1e6 · mean weight in
    [-1,1] units)), so the cross-engine hash can't flake on libm: the
    only float op is one double division of exact integers.

    Returns (id, n_tokens, logit_micro, keep) — keep = logit_micro > 0."""
    from pyspark.sql import functions as F

    from .text import tokens

    toks = tokens(F.col(text_col))
    n = F.size(toks)
    logit_micro = hashed_linear_logit_micro(F.col(text_col), dim=dim, seed=seed)
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        logit_micro.alias("logit_micro"),
        (logit_micro > 0).alias("keep"),
    )


def hashed_linear_scores_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1024,
    seed: str = "qlw",
) -> str:
    """DuckDB twin of :func:`hashed_linear_scores` (identical md5 weight
    derivation, identical integer scoring)."""
    from .dedup import hash60_sql
    from .text import tokens_sql

    idx = f"({hash60_sql('t')} % {dim})"
    w = f"({hash60_sql(chr(39) + seed + ':' + chr(39) + ' || ' + idx + '::VARCHAR')} % 2001 - 1000)"
    toks = tokens_sql(text_col)
    return f"""
    WITH _t AS (
        SELECT {id_col},
               {toks} AS toks
        FROM {table}
    )
    SELECT {id_col},
           len(toks)::BIGINT AS n_tokens,
           CASE WHEN len(toks) > 0
                THEN round(list_sum(list_transform(toks, t -> {w}))::DOUBLE
                           * 1000.0 / len(toks)::DOUBLE)::BIGINT
                ELSE 0 END AS logit_micro,
           CASE WHEN len(toks) > 0
                THEN round(list_sum(list_transform(toks, t -> {w}))::DOUBLE
                           * 1000.0 / len(toks)::DOUBLE)::BIGINT > 0
                ELSE FALSE END AS keep
    FROM _t
    """
