"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus is never trained on whole: it is subsampled, stratified,
and mixed from many sources at target weights. These operators implement
those steps *deterministically* — keep/drop is a pure function of a stable
key column plus a salt string, never of RNG state — so a pipeline re-run
(or a re-run on a different cluster / different partitioning) selects the
exact same rows. That property is what `df.sample()` / `df.sampleBy()`
cannot give (their Bernoulli draws depend on partition iteration order),
and it is what makes every operator here oracle-checkable against DuckDB.

Mechanism: the shared 60-bit md5 hash (llm/dedup.hash60 — identical SQL in
Spark and DuckDB) of ``salt || key``, reduced mod 1e6, gives a uniform
draw in [0, 1e6); keep iff draw < rate·1e6. Different salts give
independent draws from the same keys.

Scale notes (100 TB):

* ``hash_sample`` / ``stratified_sample`` / ``mix_sources`` are pure
  map-side filters — no shuffle, no state, arbitrarily parallel; Catalyst
  pushes surviving-column pruning into the scan (the md5 sits above it).
* ``group_sample`` needs the one shuffle the semantics require (hash by
  group) + a per-group sort bounded by group size. For hot groups the
  window sort is the cost; rows are first cut to the sample's upper bound
  map-side only when a per-partition pre-filter is provided by the caller
  (e.g. a coarse ``hash_sample`` at k/|group| · safety-factor, then the
  exact top-k — the classic two-phase reservoir).
* Mixture weights are resolved to per-source rates driver-side from
  cheap ``count()``s (metadata-only on parquet); the data path is again a
  map-side filter per source plus a zero-shuffle ``unionByName``.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..llm.dedup import hash60, hash60_sql

#: granularity of the uniform draw; rates are exact multiples of 1e-6
RESOLUTION = 1_000_000


def _draw(key: Column, salt: str) -> Column:
    """Deterministic uniform draw in [0, RESOLUTION) from (salt, key)."""
    return hash60(F.concat(F.lit(salt + ":"), key.cast("string"))) % RESOLUTION


def draw_sql(key_expr: str, salt: str) -> str:
    """DuckDB-identical SQL form of :func:`_draw` (oracle building block)."""
    h = hash60_sql(f"'{salt}:' || cast({key_expr} as varchar)")
    return f"({h} % {RESOLUTION})"


def hash_sample(df: DataFrame, key: Column | str, rate: float, salt: str = "") -> DataFrame:
    """Deterministic Bernoulli sample: keep ≈``rate`` of rows, chosen by
    the hash of *key* — reproducible across runs, engines, and cluster
    layouts. Map-side only (no shuffle)."""
    key = F.col(key) if isinstance(key, str) else key
    return df.filter(_draw(key, salt) < int(rate * RESOLUTION))


def stratified_sample(
    df: DataFrame,
    strata: Column | str,
    key: Column | str,
    fractions: Mapping[str, float],
    default: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic ``sampleBy``: per-stratum keep rates. A stratum not in
    *fractions* keeps ``default``. Still a pure map-side filter — the
    per-stratum threshold is a CASE expression, not a join."""
    strata = F.col(strata) if isinstance(strata, str) else strata
    key = F.col(key) if isinstance(key, str) else key
    threshold: Column = F.lit(int(default * RESOLUTION))
    for value, rate in fractions.items():
        threshold = F.when(strata == value, int(rate * RESOLUTION)).otherwise(threshold)
    return df.filter(_draw(key, salt) < threshold)


def group_sample(
    df: DataFrame,
    groups: Sequence[str],
    key: Column | str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic uniform-without-replacement sample of *k* rows per
    group (reservoir-sampling semantics, reproducibly): rank rows within
    each group by their hash draw and keep the k smallest. Ties broken by
    the key itself so the result is a total order."""
    key = F.col(key) if isinstance(key, str) else key
    w = Window.partitionBy(*groups).orderBy(_draw(key, salt).asc(), key.asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def mixture_rates(
    counts: Mapping[str, int], weights: Mapping[str, float], target_total: int
) -> dict[str, float]:
    """Resolve mixture *weights* (relative source proportions in the output)
    into per-source sampling rates for :func:`mix_sources`, given each
    source's row count. Rates are capped at 1.0 (no upsampling)."""
    wsum = sum(weights.values())
    return {
        name: min(1.0, (weights[name] / wsum) * target_total / max(counts[name], 1))
        for name in weights
    }


def mix_sources(
    sources: Mapping[str, DataFrame],
    rates: Mapping[str, float],
    key: Column | str,
    salt: str = "",
    tag_column: str = "mix_source",
) -> DataFrame:
    """Deterministically mix several source DataFrames at per-source rates
    (from :func:`mixture_rates` or given directly), tagging each row with
    its source name. The plan is N map-side filters + a zero-shuffle
    union — mixing 100 TB is exactly as parallel as scanning it."""
    parts = [
        hash_sample(df, key, rates[name], salt=f"{salt}/{name}").withColumn(
            tag_column, F.lit(name)
        )
        for name, df in sources.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def dataset_split(
    df: DataFrame,
    key: Column | str,
    fractions: Mapping[str, float],
    salt: str = "split",
    out: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row lands in exactly
    one named split, chosen by its key's hash draw against cumulative
    fraction thresholds. Map-side only, reproducible across engines,
    partitionings, and runs — the property a dataset split MUST have so
    re-running the pipeline never migrates a row between train and eval.
    Fractions must sum to 1 (validated on the ROUNDED per-fraction integer
    thresholds, not the float sum — {1/3, 1/3, 1/3} float-sums to exactly
    1.0 but rounds to 999999/RESOLUTION; the last bucket is therefore an
    ``otherwise`` so every draw lands in exactly one named split)."""
    rounded = {name: round(frac * RESOLUTION) for name, frac in fractions.items()}
    if abs(sum(rounded.values()) - RESOLUTION) > len(rounded):
        raise ValueError(f"fractions must sum to 1, got {sum(fractions.values())}")
    key = F.col(key) if isinstance(key, str) else key
    draw = _draw(key, salt)
    names = list(fractions)
    expr: Column | None = None
    cum = 0
    for name in names[:-1]:
        cum += rounded[name]
        cond = draw < cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = names[-1]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out, expr)


def dataset_split_sql(
    key_expr: str,
    fractions: Mapping[str, float],
    salt: str = "split",
) -> str:
    """DuckDB twin of :func:`dataset_split`'s split expression (same
    last-bucket-as-ELSE rule, so the engines agree on every draw)."""
    draw = draw_sql(key_expr, salt)
    names = list(fractions)
    cases = []
    cum = 0
    for name in names[:-1]:
        cum += round(fractions[name] * RESOLUTION)
        cases.append(f"WHEN {draw} < {cum} THEN '{name}'")
    if not cases:
        return f"'{names[-1]}'"
    return "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"


def temperature_rates(counts: DataFrame, group: str = "source", alpha: float = 0.5) -> DataFrame:
    """Per-group keep rates for temperature-based mixture rebalancing
    (the multilingual/multi-source alpha-sampling rule, e.g. mBERT /
    XLM-R data mixing): sampling probability proportional to
    share^alpha, i.e. relative keep-rate proportional to
    share^(alpha-1) — dominant sources are downsampled toward the
    tail.  Normalized so the SMALLEST group keeps everything:

        rate_g = (cnt_min / cnt_g) ** (1 - alpha)
               = sqrt(cnt_min / cnt_g)                  for alpha = 1/2

    Returns (group, cnt, rate_ppm) with the rate in integer parts-per-
    million.  For alpha = 1/2 the only float ops are one division and
    one sqrt — both IEEE-754 correctly-rounded, so rate_ppm is
    bit-identical in any engine; the paired oracle SQL recomputes it
    from the same counts.

    *counts* must have columns (group, cnt).  Determinism note: only
    alpha = 0.5 is offered — a general pow() is NOT correctly-rounded
    and would drift across libm implementations."""
    if alpha != 0.5:
        raise ValueError("temperature_rates: only alpha=0.5 is IEEE-exact; got %r" % alpha)
    mn = counts.agg(F.min("cnt").alias("_mn"))
    return (
        counts.crossJoin(F.broadcast(mn))
        .withColumn(
            "rate_ppm",
            F.floor(
                F.sqrt(F.col("_mn").cast("double") / F.col("cnt").cast("double"))
                * 1_000_000
            ).cast("long"),
        )
        .select(group, "cnt", "rate_ppm")
    )


def temperature_rates_sql(counts_cte: str, group: str = "source") -> str:
    """DuckDB twin of :func:`temperature_rates` (alpha = 1/2).
    *counts_cte* selects (group, cnt)."""
    return f"""
    WITH _c AS ({counts_cte}),
    _m AS (SELECT min(cnt) AS mn FROM _c)
    SELECT {group}, cnt,
           cast(floor(sqrt(cast(mn as double) / cast(cnt as double))
                      * 1000000) as bigint) AS rate_ppm
    FROM _c CROSS JOIN _m
    """


def mix_to_token_budget(
    docs: DataFrame,
    weights: Mapping[str, float],
    token_budget: int,
    tokens: Column,
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "mixtok",
) -> DataFrame:
    """Domain-mixture downsampling to a TOKEN budget with exact quotas —
    the stronger form of :func:`mix_sources`: rate sampling hits its
    mixture only in expectation, while training-data curation specifies
    "N tokens at these proportions". Each source's quota is
    ``token_budget * weight / Σweights``; within a source, documents are
    ordered by the deterministic md5 draw (an unbiased shuffle) and kept
    while the cumulative tokens BEFORE them stay under the quota, so
    tokens_kept lands within one document of the quota (or is the whole
    source when it's smaller). Sources not in *weights* are excluded.

    Returns the kept (id, source, token_count) selection — join back on
    the id to materialize bodies. Scale shape: one window cumsum per
    source partition (a single source-keyed shuffle of (id, tokens)
    pairs — bodies never move), deterministic across runs/partitionings/
    engines; per-source skew is bounded because only int pairs shuffle
    and the quota cutoff is applied map-side after the cumsum."""
    wsum = float(sum(weights.values()))
    quota = F.create_map(
        *[
            x
            for name, wt in sorted(weights.items())
            for x in (F.lit(name), F.lit(int(token_budget * wt / wsum)))
        ]
    )
    tc = docs.select(
        F.col(id_col),
        F.col(source_col),
        tokens.cast("long").alias("token_count"),
    ).where(F.col(source_col).isin(*weights))
    w = Window.partitionBy(source_col).orderBy(
        _draw(F.col(id_col), salt), F.col(id_col)
    )
    return (
        tc.withColumn("_cb", F.sum("token_count").over(w) - F.col("token_count"))
        .where(F.col("_cb") < F.element_at(quota, F.col(source_col)))
        .select(id_col, source_col, "token_count")
    )


def mix_to_token_budget_sql(
    table: str,
    weights: Mapping[str, float],
    token_budget: int,
    tokens_expr: str,
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "mixtok",
) -> str:
    """DuckDB twin of :func:`mix_to_token_budget` (same draw, same
    integer quotas, same cumsum-before cutoff)."""
    wsum = float(sum(weights.values()))
    quota = " ".join(
        f"WHEN '{name}' THEN {int(token_budget * wt / wsum)}"
        for name, wt in sorted(weights.items())
    )
    srcs = ", ".join(f"'{n}'" for n in weights)
    return f"""
    WITH tc AS (
      SELECT {id_col}, {source_col},
             cast({tokens_expr} as bigint) AS token_count
      FROM {table} WHERE {source_col} IN ({srcs})
    ),
    ord AS (
      SELECT *,
             sum(token_count) OVER (
               PARTITION BY {source_col}
               ORDER BY {draw_sql(id_col, salt)}, {id_col}
             ) - token_count AS _cb
      FROM tc
    )
    SELECT {id_col}, {source_col}, token_count
    FROM ord
    WHERE _cb < (CASE {source_col} {quota} END)
    """
