"""Product quantization (PQ) for approximate nearest-neighbour search —
the memory-compression end of the engine's ANN ladder (q31 brute-force
cosine -> q47 IVF-Flat -> q138/q139 int8 scalar quantization -> PQ).

PQ splits each dim-d vector into m subspaces of d/m components, learns a
k-centroid codebook per subspace (k-means), and stores each vector as m
byte codes: 64 doubles (512 B) become 8 codes (8 B) — the 64x compression
that lets a 100 TB embedding corpus's index live in cluster memory.
Search is asymmetric distance computation (ADC): the probe stays exact,
each corpus vector's distance is the sum over subspaces of the distance
from the probe's slice to the CENTROID its code names (Jégou et al. 2011,
public paper).

Determinism for the oracle gate follows llm/clustering.py exactly:
md5-draw seeding (the k seed vectors are chosen ONCE, globally, and
sliced per subspace), rounded-argmin assignment with centroid-index
tie-break, DECIMAL-exact Lloyd update. Every float comparison is rounded
to 6 dp first, every reduction is a left fold — so the DuckDB oracle
replays codebook learning, encoding, and ADC scoring bit-for-bit.

Scale shape: codebook learning is ONE map-side assignment pass (m*k
sub-centroid literals folded into whole-stage codegen) plus ONE
groupBy(subspace, centroid, component) whose output is m*k*(d/m) = k*d
rows regardless of corpus size; encoding and ADC scoring are pure
map-side expression work against literal codebooks; top-k is a
rank-window per probe (probe-cardinality partitions). The corpus is
never collected and never shuffled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.sampling import draw_sql
from .clustering import _DEC, _D2_SQL, _assign, seed_centroids

Codebooks = list[list[tuple[int, list[float]]]]


def pq_codebooks(
    df: DataFrame,
    m: int = 8,
    k: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "pq",
) -> Codebooks:
    """Per-subspace codebooks after one Lloyd update from shared global
    seeds: codebooks[s] is a list of (centroid index, sub-centroid).

    The k seed VECTORS are drawn once by (md5 draw, id) and sliced per
    subspace, so seeding costs one TakeOrderedAndProject regardless of m.
    The update runs ALL subspaces in a single job: one assignment pass
    emitting m code columns, one posexplode keyed by (subspace, code,
    local component), one bounded collect of k*dim decimal-exact sums.
    Empty clusters drop out (both engines identically); indices are not
    renumbered."""
    subdim = dim // m
    seeds = seed_centroids(df, k, id_col, vec_col, salt)
    cents: Codebooks = [
        [(ci, v[s * subdim : (s + 1) * subdim]) for ci, v in seeds] for s in range(m)
    ]
    vec = F.col(vec_col).cast("array<double>")
    assigned = df.select(
        vec.alias("_v"),
        *[
            _assign(F.slice(vec, s * subdim + 1, subdim), cents[s]).alias(f"_c{s}")
            for s in range(m)
        ],
    )
    code_for_j = F.element_at(
        F.array(*[F.col(f"_c{s}") for s in range(m)]),
        (F.col("_j") / subdim).cast("int") + 1,
    )
    sums = (
        assigned.select(
            F.posexplode("_v").alias("_j", "_x"),
            *[F.col(f"_c{s}") for s in range(m)],
        )
        .select(
            (F.col("_j") / subdim).cast("int").alias("_s"),
            (F.col("_j") % subdim).alias("_jloc"),
            code_for_j.alias("_ci"),
            F.col("_x"),
        )
        .groupBy("_s", "_ci", "_jloc")
        .agg(
            F.sum(F.col("_x").cast(_DEC)).alias("_sum"),
            F.count(F.lit(1)).alias("_n"),
        )
        .collect()  # k*dim rows — bounded, corpus-size-independent
    )
    by_key: dict[tuple[int, int], dict[int, float]] = {}
    n_key: dict[tuple[int, int], int] = {}
    for r in sums:
        by_key.setdefault((r["_s"], r["_ci"]), {})[r["_jloc"]] = float(r["_sum"])
        n_key[(r["_s"], r["_ci"])] = r["_n"]
    out: Codebooks = []
    for s in range(m):
        cb = [
            (ci, [comp[j] / n_key[(s2, ci)] for j in sorted(comp)])
            for (s2, ci), comp in sorted(by_key.items())
            if s2 == s
        ]
        out.append(cb)
    return out


def pq_codes(
    df: DataFrame,
    codebooks: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, c0..c{m-1}) — each vector's m codebook codes, map-side."""
    m = len(codebooks)
    subdim = len(codebooks[0][0][1])
    vec = F.col(vec_col).cast("array<double>")
    return df.select(
        F.col(id_col),
        *[
            _assign(F.slice(vec, s * subdim + 1, subdim), codebooks[s]).alias(f"c{s}")
            for s in range(m)
        ],
    )


def pq_ann_topk(
    df: DataFrame,
    codebooks: Codebooks,
    probes: list[tuple[int, list[float]]],
    n: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-n per probe over PQ codes: (probe_id, id, approx_d, rn).

    Each corpus vector is scored as the left-to-right sum over subspaces
    of d2(probe slice, centroid named by the vector's code) — the probe
    side stays exact, the corpus side is its reconstruction, and only
    literal codebooks enter the expression (no join, no lookup table to
    broadcast). approx_d is rounded to 6 dp with the id as tie-break.

    The scoring pass is the textbook ADC layout: the distance from each
    probe slice to each sub-centroid is precomputed DRIVER-side into an
    m x k lookup table per probe (m*k*|probes| floats — bounded), and
    the corpus pass is m element_at lookups plus a left-folded sum per
    (row, probe) — no per-row distance arithmetic at all. The python
    float fold that builds the tables is the same left-to-right IEEE
    sequence as the oracle's list_sum, so the hash check still closes.

    Lookup slots for clusters that went empty in the Lloyd update hold
    infinity; no code can name them (assignment only ranges over
    surviving centroids)."""
    m = len(codebooks)
    subdim = len(codebooks[0][0][1])
    k = max(ci for cb in codebooks for ci, _ in cb) + 1
    vec = F.col(vec_col).cast("array<double>")

    def adc_table(pv: list[float], s: int) -> list[float]:
        by_ci = dict(codebooks[s])
        ps = pv[s * subdim : (s + 1) * subdim]
        out = []
        for ci in range(k):
            if ci in by_ci:
                d = 0.0
                for a, b in zip(ps, by_ci[ci]):
                    d = d + (a - b) * (a - b)
                out.append(d)
            else:
                out.append(float("inf"))  # placeholder, never addressed
        return out

    coded = df.select(
        F.col(id_col),
        *[
            _assign(F.slice(vec, s * subdim + 1, subdim), codebooks[s]).alias(f"_c{s}")
            for s in range(m)
        ],
    )
    per_probe = []
    for pid, pv in probes:
        d: Column | None = None
        for s in range(m):
            tbl = F.array(*[F.lit(x) for x in adc_table(pv, s)])
            ds = F.element_at(tbl, F.col(f"_c{s}") + 1)
            d = ds if d is None else d + ds
        per_probe.append(
            F.struct(F.lit(pid).alias("probe_id"), F.round(d, 6).alias("approx_d"))
        )
    scored = coded.select(
        F.col(id_col), F.explode(F.array(*per_probe)).alias("_p")
    ).select(
        F.col("_p.probe_id").alias("probe_id"),
        F.col(id_col),
        F.col("_p.approx_d").alias("approx_d"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy("approx_d", id_col)
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= n)
        .orderBy("probe_id", "rn")
    )


# ---------------------------------------------------------------------------
# DuckDB oracle
# ---------------------------------------------------------------------------


def _subspace_cte_sql(
    s: int, k: int, subdim: int, id_col: str, vec_col: str, table: str
) -> str:
    """a0_s / upd_s / c1_s — clustering._kmeans_cte_sql's body for ONE
    subspace, assigning the SLICED vectors against the SLICED global
    seeds."""
    lo, hi = s * subdim + 1, (s + 1) * subdim
    d2 = _D2_SQL
    return f"""sl{s} AS (
      SELECT ci, list_slice(c, {lo}, {hi}) AS c FROM seeds
    ),
    a0_{s} AS (
      SELECT e.{id_col} AS id, list_slice(e.{vec_col}, {lo}, {hi}) AS v
      FROM {table} e
    ),
    as0_{s} AS (
      SELECT id, v,
             (SELECT t.ci FROM sl{s} t
              ORDER BY round({d2.format(v='a.v', c='t.c')}, 6), t.ci
              LIMIT 1) AS ci
      FROM a0_{s} a
    ),
    upd_{s} AS (
      SELECT ci, j,
             sum((v[j]::DOUBLE)::DECIMAL(38,12))::DOUBLE / count(*) AS m
      FROM as0_{s} CROSS JOIN range(1, {subdim} + 1) t(j)
      GROUP BY ci, j
    ),
    c1_{s} AS MATERIALIZED (
      SELECT ci, list(m ORDER BY j) AS c FROM upd_{s} GROUP BY ci
    )"""


def pq_ann_topk_sql(
    m: int = 8,
    k: int = 8,
    dim: int = 64,
    n: int = 10,
    probe_pred: str = "vec_id < 5",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    table: str = "embeddings",
    salt: str = "pq",
) -> str:
    """Replays seeding, per-subspace Lloyd update, encoding, and ADC
    scoring in DuckDB — identical rounding, folds, and tie-breaks."""
    subdim = dim // m
    d2 = _D2_SQL
    subspaces = ",\n    ".join(
        _subspace_cte_sql(s, k, subdim, id_col, vec_col, table) for s in range(m)
    )
    code_cols = ", ".join(
        f"""(SELECT t.ci FROM c1_{s} t
             ORDER BY round({d2.format(v=f"list_slice(e.{vec_col}, {s * subdim + 1}, {(s + 1) * subdim})", c='t.c')}, 6), t.ci
             LIMIT 1) AS c{s}"""
        for s in range(m)
    )
    # probes alias is "pr", NOT "p" — _D2_SQL's lambda parameter is p and
    # must not collide with a table alias
    adc_terms = " + ".join(
        d2.format(
            v=f"list_slice(pr.{vec_col}, {s * subdim + 1}, {(s + 1) * subdim})",
            c=f"(SELECT t.c FROM c1_{s} t WHERE t.ci = codes.c{s})",
        )
        for s in range(m)
    )
    return f"""
    WITH seeds AS (
      SELECT row_number() OVER (ORDER BY {draw_sql(id_col, salt)}, {id_col}) - 1 AS ci,
             {vec_col} AS c
      FROM {table}
      ORDER BY {draw_sql(id_col, salt)}, {id_col}
      LIMIT {k}
    ),
    {subspaces},
    codes AS MATERIALIZED (
      SELECT e.{id_col} AS id, {code_cols}
      FROM {table} e
    ),
    scored AS (
      SELECT pr.{id_col} AS probe_id, codes.id AS {id_col},
             round({adc_terms}, 6) AS approx_d
      FROM {table} pr CROSS JOIN codes
      WHERE {probe_pred.replace(id_col, 'pr.' + id_col)}
    ),
    ranked AS (
      SELECT probe_id, {id_col}, approx_d,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY approx_d, {id_col}) AS rn
      FROM scored
    )
    SELECT probe_id, {id_col}, approx_d, cast(rn as int) AS rn
    FROM ranked WHERE rn <= {n}
    ORDER BY probe_id, rn
    """
