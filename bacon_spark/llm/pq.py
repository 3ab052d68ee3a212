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

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.exprs import darr, dlit
from ..operators.sampling import draw_sql
from .clustering import _DEC, _D2_SQL, _assign, _d2_frag, seed_centroids

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
    vecf = f"CAST(`{vec_col}` AS ARRAY<DOUBLE>)"
    assigned = df.select(
        vec.alias("_v"),
        *[
            _assign(f"slice({vecf}, {s * subdim + 1}, {subdim})", cents[s]).alias(f"_c{s}")
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
    vecf = f"CAST(`{vec_col}` AS ARRAY<DOUBLE>)"
    return df.select(
        F.col(id_col),
        *[
            _assign(f"slice({vecf}, {s * subdim + 1}, {subdim})", codebooks[s]).alias(f"c{s}")
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
    vecf = f"CAST(`{vec_col}` AS ARRAY<DOUBLE>)"
    coded = df.select(
        F.col(id_col),
        *[
            _assign(f"slice({vecf}, {s * subdim + 1}, {subdim})", codebooks[s]).alias(f"_c{s}")
            for s in range(m)
        ],
    )
    return pq_score_topk(coded, codebooks, probes, n, id_col)


def pq_score_topk(
    coded: DataFrame,
    codebooks: Codebooks,
    probes: list[tuple[int, list[float]]],
    n: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """The ADC scoring + rank-window half of :func:`pq_ann_topk`, over an
    ALREADY-CODED frame (columns ``_c0.._c{m-1}``) — shared by the
    end-to-end composition above and the persisted plain-PQ index's
    search path (pq_index.pq_index_search), which reads codes written
    once at ingest instead of re-encoding the corpus per query. Same
    literal lookup tables, same python float fold, bit-identical
    output."""
    m = len(codebooks)
    subdim = len(codebooks[0][0][1])
    k = max(ci for cb in codebooks for ci, _ in cb) + 1

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

    per_probe = []
    for pid, pv in probes:
        d = " + ".join(
            f"element_at({darr(adc_table(pv, s))}, (_c{s} + 1))" for s in range(m)
        )
        per_probe.append(f"struct({pid} AS probe_id, round({d}, 6) AS approx_d)")
    scored = coded.select(
        F.col(id_col), F.expr(f"explode(array({','.join(per_probe)}))").alias("_p")
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
    s: int,
    k: int,
    subdim: int,
    id_col: str,
    vec_col: str,
    table: str,
    seeds_cte: str = "seeds",
) -> str:
    """a0_s / upd_s / c1_s — clustering._kmeans_cte_sql's body for ONE
    subspace, assigning the SLICED vectors against the SLICED global
    seeds (*seeds_cte* names the seed CTE so compositions that already
    use "seeds" for a coarse quantizer can rename)."""
    lo, hi = s * subdim + 1, (s + 1) * subdim
    d2 = _D2_SQL
    return f"""sl{s} AS (
      SELECT ci, list_slice(c, {lo}, {hi}) AS c FROM {seeds_cte}
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
      WHERE {_qualify_pred(probe_pred, id_col, 'pr.' + id_col)}
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


# ---------------------------------------------------------------------------
# IVF-PQ: coarse quantizer + residual product codes (the FAISS IVFPQ shape)
# ---------------------------------------------------------------------------


def adc_lookup_table(
    codebooks: Codebooks, s: int, pr: list[float]
) -> list[float]:
    """ADC lookup table for subspace *s* of (residual) probe *pr*: entry
    ci = d2(probe slice, sub-centroid ci), left-folded python floats —
    the exact IEEE sequence the DuckDB oracle's list_sum replays. Slots
    for clusters that went empty in the Lloyd update hold infinity; no
    code can name them (assignment only ranges over survivors)."""
    subdim = len(codebooks[0][0][1])
    by_ci = dict(codebooks[s])
    ps = pr[s * subdim : (s + 1) * subdim]
    out = []
    for ci in range(max(c for c, _ in codebooks[s]) + 1):
        if ci in by_ci:
            d = 0.0
            for a, b in zip(ps, by_ci[ci]):
                d = d + (a - b) * (a - b)
            out.append(d)
        else:
            out.append(float("inf"))  # placeholder, never addressed
    return out


def ivfpq_model(
    df: DataFrame,
    coarse_k: int = 8,
    m: int = 8,
    k: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    coarse_salt: str = "ivfc",
    pq_salt: str = "pq",
) -> tuple[list[tuple[int, list[float]]], Codebooks, DataFrame]:
    """The IVF-PQ index model: (coarse centroids, residual codebooks,
    managed-persisted residual frame (id, _cell, _rv)). One corpus
    assignment pass builds the residual frame; codebook learning reads
    it (seeding + one Lloyd update) — the caller encodes from the SAME
    persisted frame so the corpus is scanned once end-to-end."""
    from ..utils.caching import managed_persist
    from .clustering import kmeans_centroids

    ccents = kmeans_centroids(df, coarse_k, 1, id_col, vec_col, coarse_salt)
    resid = managed_persist(residual_frame(df, ccents, dim, id_col, vec_col))
    cbs = pq_codebooks(resid, m, k, dim, id_col, "_rv", pq_salt)
    return ccents, cbs, resid


def residual_frame(
    df: DataFrame,
    ccents: list[tuple[int, list[float]]],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, _cell, _rv): each vector assigned to its nearest coarse
    centroid among the FROZEN *ccents* with its residual vector — the
    frame both codebook learning and encoding read. Factored out of
    :func:`ivfpq_model` so an index APPEND (llm/pq_index.py) can code
    new vectors against an existing model without retraining, the
    standard IVF ingest path (Jégou et al. 2011 §V: the quantizers are
    trained once on a sample; subsequent data is only encoded)."""
    vec = F.col(vec_col).cast("array<double>")
    vecf = f"CAST(`{vec_col}` AS ARRAY<DOUBLE>)"
    max_ci = max(ci for ci, _ in ccents) + 1
    by_ci = dict(ccents)
    cent_arr = "array(" + ",".join(
        darr(by_ci.get(ci, [0.0] * dim)) for ci in range(max_ci)
    ) + ")"
    return df.select(
        F.col(id_col),
        _assign(vecf, ccents).alias("_cell"),
        vec.alias("_v"),
    ).select(
        id_col,
        "_cell",
        F.expr(
            f"zip_with(_v, element_at({cent_arr}, (_cell + 1)), (x, y) -> x - y)"
        ).alias("_rv"),
    )


def ivfpq_encode(
    resid: DataFrame, codebooks: Codebooks, id_col: str = "vec_id"
) -> DataFrame:
    """(id, cell, c0..c{m-1}) over a residual frame — the stored form of
    the index: one int cell plus m small int codes per vector (map-side,
    whole-stage codegen against the literal codebooks)."""
    m = len(codebooks)
    subdim = len(codebooks[0][0][1])
    return resid.select(
        F.col(id_col),
        F.col("_cell").cast("int").alias("cell"),
        *[
            _assign(f"slice(_rv, {s * subdim + 1}, {subdim})", codebooks[s])
            .cast("int")
            .alias(f"c{s}")
            for s in range(m)
        ],
    )


def route_probes(
    spark,
    probes: list[tuple[int, list[float]]],
    ccents: list[tuple[int, list[float]]],
    nprobe: int,
    id_col: str = "vec_id",
) -> dict[int, list[int]]:
    """probe id -> its nprobe nearest coarse cells, routed by a
    probe-count-row SPARK job so the rounding tie-breaks are
    engine-identical (never python's)."""
    pdf = spark.createDataFrame(
        [(pid, [float(x) for x in pv]) for pid, pv in probes],
        f"{id_col} long, _pv array<double>",
    )
    structs = ",".join(
        f"struct(round({_d2_frag('_pv', c)}, 6) AS d, {int(ci)} AS ci)"
        for ci, c in ccents
    )
    ranked = f"slice(array_sort(array({structs})), 1, {nprobe})"
    return {
        r[id_col]: list(r["cells"])
        for r in pdf.select(
            F.col(id_col),
            F.expr(f"transform({ranked}, s -> s.ci)").alias("cells"),
        ).collect()
    }


def _rank_topk(scored: DataFrame, n: int, id_col: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy("approx_d", id_col)
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= n)
        .orderBy("probe_id", "rn")
    )


def score_adc_literal(
    coded: DataFrame,
    probes: list[tuple[int, list[float]]],
    probe_cells: dict[int, list[int]],
    ccents: list[tuple[int, list[float]]],
    codebooks: Codebooks,
    n: int = 10,
    id_col: str = "vec_id",
    cell_col: str = "_cell",
) -> DataFrame:
    """ADC scoring with the per-(probe, cell) lookup tables folded into
    the plan as array literals — zero joins, right at gate probe counts,
    O(|probes| * nprobe * m * k) plan growth (see score_adc_batch for
    the large-probe-set form)."""
    m = len(codebooks)
    by_ci = dict(ccents)
    per_probe = []
    for pid, pv in probes:
        whens = []
        for cell in probe_cells[pid]:
            pr = [a - b for a, b in zip(pv, by_ci[cell])]
            d = " + ".join(
                f"element_at({darr(adc_lookup_table(codebooks, s, pr))}, (`_c{s}` + 1))"
                for s in range(m)
            )
            whens.append(f"WHEN `{cell_col}` = {int(cell)} THEN {d}")
        per_probe.append(
            f"struct({pid} AS probe_id, round(CASE {' '.join(whens)} END, 6) AS approx_d)"
        )
    scored = (
        coded.select(
            F.col(id_col), F.expr(f"explode(array({','.join(per_probe)}))").alias("_p")
        )
        .select(
            F.col("_p.probe_id").alias("probe_id"),
            F.col(id_col),
            F.col("_p.approx_d").alias("approx_d"),
        )
        .filter(F.col("approx_d").isNotNull())
    )
    return _rank_topk(scored, n, id_col)


def ivfpq_ann_topk(
    df: DataFrame,
    probes: list[tuple[int, list[float]]],
    coarse_k: int = 8,
    m: int = 8,
    k: int = 8,
    dim: int = 64,
    nprobe: int = 2,
    n: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    coarse_salt: str = "ivfc",
    pq_salt: str = "pq",
) -> DataFrame:
    """IVF-PQ search — the production ANN index structure at corpus
    scale: a coarse k-means quantizer routes each vector to one of
    *coarse_k* inverted lists, the RESIDUAL (vector minus its cell
    centroid) is product-quantized, and a query scans only the *nprobe*
    cells nearest the probe, scoring candidates by ADC over their
    residual codes. Returns (probe_id, id, approx_d, rn) with rn <= n.

    Composition of the engine's two deterministic quantizers
    (clustering.kmeans_centroids for the coarse step, pq_codebooks over
    the residual frame), so the DuckDB oracle replays the whole index
    build bit-for-bit. Probe-to-cell routing runs as a tiny SPARK job
    over the probe list (probe-count rows) so its rounding tie-breaks
    are engine-identical, never python's.

    Scale shape: the residual frame is ints+arrays map-side work,
    persisted (managed) because codebook seeding, the Lloyd update, and
    encoding all read it; at real scale the index is BUILT ONCE and the
    coded corpus written partitioned by cell (llm/pq_index.py — the
    build/search split), so an nprobe probe is a partition-pruned read
    of ~nprobe/coarse_k of the data. This end-to-end form exists as the
    oracle-checked composition; scoring is the same driver-built ADC
    tables as :func:`pq_ann_topk`, one table per (probe, probed cell)."""
    ccents, cbs, resid = ivfpq_model(
        df, coarse_k, m, k, dim, id_col, vec_col, coarse_salt, pq_salt
    )
    probe_cells = route_probes(df.sparkSession, probes, ccents, nprobe, id_col)
    subdim = dim // m
    coded = resid.select(
        F.col(id_col),
        F.col("_cell"),
        *[
            _assign(f"slice(_rv, {s * subdim + 1}, {subdim})", cbs[s]).alias(
                f"_c{s}"
            )
            for s in range(m)
        ],
    )
    return score_adc_literal(
        coded, probes, probe_cells, ccents, cbs, n, id_col, "_cell"
    )


def _qualify_pred(pred: str, id_col: str, repl: str) -> str:
    """Rewrite bare *id_col* references in a predicate to *repl*,
    token-boundary aware: ``doc_id`` is NOT a reference to ``id``, and
    text inside single-quoted string literals is copied verbatim —
    a naive str.replace corrupts both (ADVICE r6)."""
    parts = re.split(r"('(?:[^']|'')*')", pred)
    pat = re.compile(rf"\b{re.escape(id_col)}\b")
    return "".join(p if i % 2 else pat.sub(repl, p) for i, p in enumerate(parts))


def ivfpq_ann_topk_sql(
    coarse_k: int = 8,
    m: int = 8,
    k: int = 8,
    dim: int = 64,
    nprobe: int = 2,
    n: int = 10,
    probe_pred: str = "vec_id < 5",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    table: str = "embeddings",
    coarse_salt: str = "ivfc",
    pq_salt: str = "pq",
    train_pred: str = "TRUE",
) -> str:
    """DuckDB replay of the whole IVF-PQ build and search: coarse
    seeding + Lloyd update, residual frame, per-subspace residual
    codebooks, encoding, nprobe cell routing, ADC scoring — identical
    rounding, folds, and tie-breaks throughout.

    *train_pred* restricts which rows TRAIN the model (coarse seeds +
    Lloyd update, residual codebook seeds + update); every row is still
    ENCODED and searchable — the replay of an index built on a subset
    and then APPENDED to with frozen quantizers (gate q173). The
    default TRUE trains on everything (q161/q169)."""
    subdim = dim // m
    d2 = _D2_SQL
    subspaces = ",\n    ".join(
        _subspace_cte_sql(s, k, subdim, "id", "rv", "tresid", seeds_cte="pseeds")
        for s in range(m)
    )
    code_cols = ", ".join(
        f"""(SELECT t.ci FROM c1_{s} t
             ORDER BY round({d2.format(v=f"list_slice(r.rv, {s * subdim + 1}, {(s + 1) * subdim})", c='t.c')}, 6), t.ci
             LIMIT 1) AS c{s}"""
        for s in range(m)
    )
    presid = (
        "list_transform(list_zip(pc.pv, pc.cc), "
        "q -> q[1]::DOUBLE - q[2]::DOUBLE)"
    )
    adc_terms = " + ".join(
        d2.format(
            v=f"list_slice({presid}, {s * subdim + 1}, {(s + 1) * subdim})",
            c=f"(SELECT t.c FROM c1_{s} t WHERE t.ci = codes.c{s})",
        )
        for s in range(m)
    )
    return f"""
    WITH cseeds AS (
      SELECT row_number() OVER (ORDER BY {draw_sql(id_col, coarse_salt)}, {id_col}) - 1 AS ci,
             {vec_col} AS c
      FROM {table}
      WHERE {train_pred}
      ORDER BY {draw_sql(id_col, coarse_salt)}, {id_col}
      LIMIT {coarse_k}
    ),
    ca0 AS (
      SELECT e.{id_col} AS id, e.{vec_col} AS v,
             (SELECT s.ci FROM cseeds s
              ORDER BY round({d2.format(v=f'e.{vec_col}', c='s.c')}, 6), s.ci
              LIMIT 1) AS ci
      FROM {table} e
      WHERE {_qualify_pred(train_pred, id_col, 'e.' + id_col)}
    ),
    cupd AS (
      SELECT ci, j,
             sum((v[j]::DOUBLE)::DECIMAL(38,12))::DOUBLE / count(*) AS m
      FROM ca0 CROSS JOIN range(1, {dim} + 1) t(j)
      GROUP BY ci, j
    ),
    cc1 AS MATERIALIZED (
      SELECT ci, list(m ORDER BY j) AS c FROM cupd GROUP BY ci
    ),
    resid AS MATERIALIZED (
      SELECT e.{id_col} AS id,
             (SELECT t.ci FROM cc1 t
              ORDER BY round({d2.format(v=f'e.{vec_col}', c='t.c')}, 6), t.ci
              LIMIT 1)::INT AS cell,
             list_transform(
               list_zip(e.{vec_col},
                        (SELECT t.c FROM cc1 t
                         ORDER BY round({d2.format(v=f'e.{vec_col}', c='t.c')}, 6), t.ci
                         LIMIT 1)),
               q -> q[1]::DOUBLE - q[2]::DOUBLE) AS rv
      FROM {table} e
    ),
    tresid AS MATERIALIZED (
      SELECT * FROM resid WHERE {_qualify_pred(train_pred, id_col, 'id')}
    ),
    pseeds AS (
      SELECT row_number() OVER (ORDER BY {draw_sql('id', pq_salt)}, id) - 1 AS ci,
             rv AS c
      FROM tresid
      ORDER BY {draw_sql('id', pq_salt)}, id
      LIMIT {k}
    ),
    {subspaces},
    codes AS MATERIALIZED (
      SELECT r.id, r.cell, {code_cols}
      FROM resid r
    ),
    pcells AS MATERIALIZED (
      SELECT pr.{id_col} AS probe_id, t.ci AS cell, t.c AS cc,
             pr.{vec_col} AS pv
      FROM {table} pr,
           LATERAL (SELECT ci, c FROM cc1
                    ORDER BY round({d2.format(v=f'pr.{vec_col}', c='cc1.c')}, 6), ci
                    LIMIT {nprobe}) t
      WHERE {_qualify_pred(probe_pred, id_col, 'pr.' + id_col)}
    ),
    scored AS (
      SELECT pc.probe_id, codes.id AS {id_col},
             round({adc_terms}, 6) AS approx_d
      FROM pcells pc JOIN codes ON codes.cell = pc.cell
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
