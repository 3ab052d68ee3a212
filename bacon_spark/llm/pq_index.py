"""IVF-PQ build/search split: the ANN index as a once-per-ingest ARTIFACT.

An ANN index is built when the corpus is ingested and queried thousands
of times after; billing the whole build (coarse k-means, residual frame,
codebook learning, encoding) to every query — as the end-to-end
composition `pq.ivfpq_ann_topk` necessarily does — is the wrong cost
model at any scale. This module factors the two halves apart:

* :func:`ivfpq_index_build` trains the model once and PERSISTS it:
  the coded corpus (one int cell + m byte-sized codes per vector) lands
  as a hive-partitioned parquet layout ``codes-*/cell=<i>/`` (the same
  directory-pruning contract as operators/maintenance.
  write_hive_partitioned), and the small model (coarse centroids +
  per-subspace codebooks, ~coarse_k*dim + k*dim doubles) rides in the
  MANIFEST commit (operators/maintenance.commit_manifest) — one
  put-if-absent publish, so a reader pinned to any version always sees
  a complete (codes, model) pair, concurrent rebuilds race on one
  atomic op, and old index versions stay readable until ``vacuum``.

* :func:`ivfpq_index_search` answers probes against a prebuilt version:
  read the model from the manifest, route each probe to its nprobe
  cells (a probe-count-row Spark job — engine-identical rounding), scan
  ONLY the probed cells' partitions (``cell IN (...)`` prunes at the
  directory level: PartitionFilters in the scan, asserted in
  tests/test_pq_index.py), score by ADC, rank-window top-n. No corpus
  pass, no training job — the search cost is nprobe/coarse_k of a
  codes-only scan.

Because every build stage is the deterministic machinery of llm/pq.py
(md5-draw seeding, DECIMAL-exact Lloyd updates, rounded-argmin
encoding), a search against the prebuilt index returns BIT-identically
what the end-to-end composition returns — so the DuckDB oracle for a
search-only gate query is the same full replay, and the hash check
still closes (gate q169/q170).

ADC scoring has two forms, auto-selected by probe volume:

* literal (``pq.score_adc_literal``): lookup tables folded into the
  plan as array literals — zero joins, whole-stage codegen, right at
  interactive probe counts, but each probe adds m*k literal doubles and
  a WHEN-branch per probed cell to the plan.
* batch (:func:`score_adc_batch`): the (probe, cell) ADC tables ride as
  DATA in a broadcast frame joined on ``cell`` — one BroadcastHashJoin,
  O(1) plan size in |probes|, the form a 1000-probe batch needs. The
  per-row float sequence (m element_at lookups, left-folded sum,
  round 6) is identical to the literal form, so the two paths are
  result-identical (equivalence pinned in tests).

The switch threshold LITERAL_ADC_FLOATS is documented in SCALE.md.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.maintenance import (
    commit_manifest,
    read_manifest,
    table_files,
    write_hive_partitioned,
)
from .pq import (
    Codebooks,
    _rank_topk,
    adc_lookup_table,
    ivfpq_encode,
    ivfpq_model,
    residual_frame,
    route_probes,
    score_adc_literal,
)

#: above this many driver-built ADC floats (|probes| * nprobe * m * k),
#: scoring switches from plan-literal lookup tables to the broadcast
#: batch form — the literal plan would otherwise grow by m*k doubles
#: plus a WHEN-branch per (probe, cell)
LITERAL_ADC_FLOATS = 50_000


def ivfpq_index_build(
    df: DataFrame,
    path: str,
    coarse_k: int = 8,
    m: int = 8,
    k: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    coarse_salt: str = "ivfc",
    pq_salt: str = "pq",
) -> dict:
    """Train and persist the IVF-PQ index for *df* under *path*.

    Writes ``path/codes-<rand>/cell=<i>/*.parquet`` (immutable — a
    rebuild writes a fresh directory) and commits a manifest whose
    ``index`` entry carries the model; returns
    ``{"path", "version", "n_vectors", "n_cells", "data_dir"}``."""
    ccents, cbs, resid = ivfpq_model(
        df, coarse_k, m, k, dim, id_col, vec_col, coarse_salt, pq_salt
    )
    coded = ivfpq_encode(resid, cbs, id_col)
    data_dir = f"codes-{uuid.uuid4().hex[:8]}"
    write_hive_partitioned(coded, os.path.join(path, data_dir), ["cell"])
    files = [
        (os.path.relpath(f, path), b)
        for f, b in table_files(os.path.join(path, data_dir))
    ]
    stats = coded.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("cell").alias("cells")
    ).collect()[0]
    version = commit_manifest(
        path,
        files,
        op="ivfpq-build",
        extra={
            "index": {
                "kind": "ivfpq",
                "coarse_k": coarse_k,
                "m": m,
                "k": k,
                "dim": dim,
                "id_col": id_col,
                "data_dir": data_dir,
                "coarse_centroids": [[ci, c] for ci, c in ccents],
                "codebooks": [[[ci, c] for ci, c in cb] for cb in cbs],
                "salts": {"coarse": coarse_salt, "pq": pq_salt},
            }
        },
    )
    return {
        "path": path,
        "version": version,
        "n_vectors": int(stats["n"]),
        "n_cells": int(stats["cells"]),
        "data_dir": data_dir,
    }


def pq_index_build(
    df: DataFrame,
    path: str,
    m: int = 8,
    k: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "pq",
) -> dict:
    """Train and persist a PLAIN product-quantization index (no coarse
    quantizer): per-subspace codebooks in the manifest, the coded corpus
    (id + m small-int codes) as an immutable parquet directory. The
    flat-PQ counterpart of :func:`ivfpq_index_build` — same once-per-
    ingest cost model, same put-if-absent manifest publish, so a search
    never bills codebook training or corpus encoding (the two jobs that
    dominate the end-to-end ``pq.pq_ann_topk`` composition)."""
    from .pq import pq_codebooks, pq_codes

    cbs = pq_codebooks(df, m, k, dim, id_col, vec_col, salt)
    coded = pq_codes(df, cbs, id_col, vec_col).select(
        F.col(id_col), *[F.col(f"c{s}") for s in range(m)]
    )
    data_dir = f"codes-{uuid.uuid4().hex[:8]}"
    coded.write.parquet(os.path.join(path, data_dir))
    files = [
        (os.path.relpath(f, path), b)
        for f, b in table_files(os.path.join(path, data_dir))
    ]
    n = coded.count()
    version = commit_manifest(
        path,
        files,
        op="pq-build",
        extra={
            "index": {
                "kind": "pq",
                "m": m,
                "k": k,
                "dim": dim,
                "id_col": id_col,
                "data_dir": data_dir,
                "codebooks": [[[ci, c] for ci, c in cb] for cb in cbs],
                "salts": {"pq": salt},
            }
        },
    )
    return {"path": path, "version": version, "n_vectors": int(n), "data_dir": data_dir}


def pq_index_search(
    spark: SparkSession,
    path: str,
    probes: list[tuple[int, list[float]]],
    n: int = 10,
    version: int | None = None,
) -> DataFrame:
    """Top-n per probe against the prebuilt plain-PQ index at *path*:
    read the persisted codes, score with the literal ADC tables, rank.
    Bit-identical to ``pq.pq_ann_topk`` on the same corpus/params (the
    scoring half is the SAME function, pq.pq_score_topk; the codes read
    back are the same deterministic ints the inline encode produces)."""
    from .pq import pq_score_topk

    man = read_manifest(path, version)
    if man is None or "index" not in man or man["index"].get("kind") != "pq":
        raise FileNotFoundError(f"no plain-PQ index manifest under {path}")
    idx = dict(man["index"])
    cbs: Codebooks = [
        [(int(ci), [float(x) for x in c]) for ci, c in cb]
        for cb in idx["codebooks"]
    ]
    m, id_col = idx["m"], idx["id_col"]
    legs = [
        spark.read.parquet(os.path.join(path, d)) for d in _data_dirs(idx)
    ]
    codes = legs[0]
    for leg in legs[1:]:
        codes = codes.unionByName(leg)
    coded = codes.select(
        F.col(id_col), *[F.col(f"c{s}").alias(f"_c{s}") for s in range(m)]
    )
    return pq_score_topk(coded, cbs, probes, n, id_col)


def ivfpq_index_append(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
) -> dict:
    """Append new vectors to the prebuilt index at *path* WITHOUT
    retraining — the standard IVF ingest path (Jégou et al. 2011 §V:
    quantizers are trained once on a sample; later data is only
    encoded). New vectors are assigned to their nearest FROZEN coarse
    cell, residual-encoded against the FROZEN codebooks, and written as
    a fresh immutable ``codes-<rand>/cell=<i>/`` directory; the commit
    is one manifest version listing prior + delta files with the model
    unchanged and the delta directory added to ``data_dirs``.

    Snapshot semantics come from the manifest protocol for free: a
    reader pinned to the prior version never sees the delta (pinned in
    tests), concurrent appends race on the put-if-absent manifest link
    (one wins, the loser retries from the new tip), and the append
    touches only the delta's rows — no rewrite, no re-shuffle of the
    existing 100 TB of codes. Searches at the new version scan old and
    new directories through the same ``cell IN (...)`` directory
    pruning (each directory is hive-partitioned by cell)."""
    man = read_manifest(path)
    if man is None or "index" not in man:
        raise FileNotFoundError(f"no IVF-PQ index manifest under {path}")
    idx = load_index(path)
    resid = residual_frame(
        df, idx["coarse_centroids"], idx["dim"], idx["id_col"], vec_col
    )
    coded = ivfpq_encode(resid, idx["codebooks"], idx["id_col"])
    delta_dir = f"codes-{uuid.uuid4().hex[:8]}"
    write_hive_partitioned(coded, os.path.join(path, delta_dir), ["cell"])
    delta_files = [
        (os.path.relpath(f, path), b)
        for f, b in table_files(os.path.join(path, delta_dir))
    ]
    stats = coded.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("cell").alias("cells")
    ).collect()[0]
    prior_files = [(e["path"], e["bytes"]) for e in man["files"]]
    entry = dict(man["index"])  # raw (JSON) model shapes, unchanged
    entry["data_dirs"] = _data_dirs(entry) + [delta_dir]
    version = commit_manifest(
        path,
        prior_files + delta_files,
        base_version=man["version"],
        op="ivfpq-append",
        extra={"index": entry},
    )
    return {
        "path": path,
        "version": version,
        "n_appended": int(stats["n"]),
        "n_cells_touched": int(stats["cells"]),
        "data_dir": delta_dir,
    }


def _data_dirs(idx: dict) -> list[str]:
    """All codes directories of an index entry (builds before the append
    feature carry only the scalar ``data_dir``)."""
    return list(idx.get("data_dirs") or [idx["data_dir"]])


def load_index(path: str, version: int | None = None) -> dict:
    """The manifest's index entry with the model rehydrated to the
    in-memory shapes pq.py uses: ``coarse_centroids`` as
    [(ci, [floats])], ``codebooks`` as Codebooks."""
    man = read_manifest(path, version)
    if man is None or "index" not in man:
        raise FileNotFoundError(f"no IVF-PQ index manifest under {path}")
    idx = dict(man["index"])
    idx["coarse_centroids"] = [
        (int(ci), [float(x) for x in c]) for ci, c in idx["coarse_centroids"]
    ]
    idx["codebooks"] = [
        [(int(ci), [float(x) for x in c]) for ci, c in cb]
        for cb in idx["codebooks"]
    ]
    return idx


def score_adc_batch(
    codes: DataFrame,
    probes: list[tuple[int, list[float]]],
    probe_cells: dict[int, list[int]],
    ccents: list[tuple[int, list[float]]],
    codebooks: Codebooks,
    n: int = 10,
    id_col: str = "vec_id",
    cell_col: str = "cell",
) -> DataFrame:
    """ADC scoring with the lookup tables as a BROADCAST FRAME — one row
    per (probe, probed cell) carrying that pair's m tables — joined to
    the codes on ``cell``. The per-(row, probe) arithmetic is the same m
    element_at lookups and left-folded sum as the literal form (tables
    are built by the identical python fold), so results match it
    bit-for-bit; only the plan shape changes: one BroadcastHashJoin and
    O(1) expression size regardless of probe count."""
    m = len(codebooks)
    by_ci = dict(ccents)
    rows = []
    for pid, pv in probes:
        for cell in probe_cells[pid]:
            pr = [a - b for a, b in zip(pv, by_ci[cell])]
            rows.append(
                (pid, cell, [adc_lookup_table(codebooks, s, pr) for s in range(m)])
            )
    spark = codes.sparkSession
    pframe = spark.createDataFrame(
        rows, f"probe_id long, {cell_col} int, _t array<array<double>>"
    )
    d = None
    for s in range(m):
        ds = F.element_at(F.element_at(F.col("_t"), s + 1), F.col(f"c{s}") + 1)
        d = ds if d is None else d + ds
    scored = (
        codes.join(F.broadcast(pframe), cell_col)
        .select(
            "probe_id",
            F.col(id_col),
            F.round(d, 6).alias("approx_d"),
        )
    )
    return _rank_topk(scored, n, id_col)


def ivfpq_index_search(
    spark: SparkSession,
    path: str,
    probes: list[tuple[int, list[float]]],
    nprobe: int = 2,
    n: int = 10,
    version: int | None = None,
    literal_threshold: int = LITERAL_ADC_FLOATS,
) -> DataFrame:
    """Top-n per probe against the PREBUILT index at *path* — no corpus
    pass, no training. Returns (probe_id, <id_col>, approx_d, rn),
    bit-identical to ``pq.ivfpq_ann_topk`` on the same corpus/params.

    The codes read carries ``cell IN (probed cells)``, which the
    hive-partitioned layout turns into directory pruning — at
    production coarse_k (~1e4 cells) a query touches nprobe/coarse_k of
    the index. Scoring picks literal vs batch ADC by probe volume (see
    module docstring)."""
    idx = load_index(path, version)
    m, k = idx["m"], idx["k"]
    id_col = idx["id_col"]
    ccents, cbs = idx["coarse_centroids"], idx["codebooks"]
    probe_cells = route_probes(spark, probes, ccents, nprobe, id_col)
    cells = sorted({c for cl in probe_cells.values() for c in cl})
    # one read per codes directory, unioned: each directory is its own
    # hive-partitioned root (cell=<i>/), so partition discovery — and
    # the cell IN (...) directory pruning — applies per leg; a single
    # multi-path read would refuse the conflicting partition roots
    legs = [
        spark.read.parquet(os.path.join(path, d)).filter(
            F.col("cell").isin(cells)
        )
        for d in _data_dirs(idx)
    ]
    codes = legs[0]
    for leg in legs[1:]:
        codes = codes.unionByName(leg)
    if len(probes) * nprobe * m * k <= literal_threshold:
        coded = codes.select(
            F.col(id_col),
            F.col("cell").alias("_cell"),
            *[F.col(f"c{s}").alias(f"_c{s}") for s in range(m)],
        )
        return score_adc_literal(
            coded, probes, probe_cells, ccents, cbs, n, id_col, "_cell"
        )
    return score_adc_batch(codes, probes, probe_cells, ccents, cbs, n, id_col)
