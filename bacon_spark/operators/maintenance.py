"""Table-layout maintenance: compaction and clustering.

Absent from the reference (its dataset is an in-memory list,
/root/reference/bacon/cutting.py:122-135); at 100 TB the dominant
operational problems of a parquet lake are (a) the small-file problem —
streaming sinks and incremental appends leave thousands of KB-sized
files whose open/footer costs swamp the scan — and (b) row placement —
min/max footer statistics only prune when rows are clustered, so a
periodic re-sort is what makes predicate pushdown actually skip bytes.

This module is the Delta-OPTIMIZE-shaped answer, expressed with plain
Spark primitives over plain parquet directories:

* ``compact`` bin-packs a directory to ~``target_file_bytes`` files.
  Without clustering it uses ``coalesce`` (narrow — no shuffle, each
  output file unions whole input files). With ``cluster_by`` it uses
  ``repartitionByRange`` + ``sortWithinPartitions`` (one range shuffle)
  so every output file owns a disjoint key range — footer min/max then
  prune point/range lookups to a single file.
* ``zorder_key`` builds a bit-interleaved key over several columns so one
  clustered sort gives balanced skipping across ALL of them, the same
  trade Delta's Z-ORDER makes (each dimension keeps ~bits/n of its
  selectivity instead of the first sort column keeping everything).

The rewrite commits in one of two ways:

* default: stage into a sibling directory and atomically rename on the
  same filesystem — readers see either the old or the new layout.
  Correct on a local/HDFS-style filesystem, NOT on an object store
  (multi-object "rename" is copy+delete, observable half-done).
* ``manifest=True``: a Delta-log-shaped commit. Data files are immutable
  and never renamed; the table's current snapshot is whatever the
  highest-numbered manifest (``_manifest/vNNNNNNNNNN.json``, a list of
  relative file paths) says it is. Committing a compaction = writing the
  new files under a fresh subdirectory, then publishing ONE small
  manifest file with a create-exclusive link — atomic, and exactly the
  put-if-absent primitive object stores offer — so a reader pinned to
  any manifest version always resolves a complete, consistent file set.
  Losers of a concurrent commit race get ``ManifestConflict`` (their
  staged files are rolled back; retry re-reads the new snapshot).
  Old versions stay readable (time travel) until ``vacuum`` drops
  unreferenced files.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "ManifestConflict",
    "commit_manifest",
    "compact",
    "manifest_read",
    "manifest_versions",
    "read_manifest",
    "table_files",
    "vacuum",
    "zorder_key",
    "write_hive_partitioned",
]

_MANIFEST_DIR = "_manifest"


class ManifestConflict(RuntimeError):
    """Another writer committed the same version first (optimistic
    concurrency): re-read the latest manifest and retry."""


def table_files(path: str) -> list[tuple[str, int]]:
    """(file, bytes) for every parquet data file under *path* (local FS)."""
    out = []
    if os.path.isfile(path):
        return [(path, os.path.getsize(path))]
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                full = os.path.join(root, f)
                out.append((full, os.path.getsize(full)))
    return sorted(out)


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(path, _MANIFEST_DIR, f"v{version:010d}.json")


def manifest_versions(path: str) -> list[int]:
    """Committed manifest versions for the table at *path*, ascending."""
    d = os.path.join(path, _MANIFEST_DIR)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.startswith("v") and f.endswith(".json"):
            try:
                out.append(int(f[1:-5]))
            except ValueError:
                pass
    return sorted(out)


def read_manifest(path: str, version: int | None = None) -> dict | None:
    """The manifest dict at *version* (default: latest), or None when the
    table has no manifest log yet."""
    vs = manifest_versions(path)
    if not vs:
        return None
    v = vs[-1] if version is None else version
    if v not in vs:
        raise FileNotFoundError(f"no manifest v{v} under {path} (have {vs})")
    with open(_manifest_path(path, v)) as fh:
        return json.load(fh)


def commit_manifest(
    path: str,
    files: Sequence[tuple[str, int]],
    *,
    base_version: int | None = None,
    op: str = "commit",
    extra: dict | None = None,
) -> int:
    """Publish ``base_version + 1`` listing *files* (relative path, bytes).

    The manifest is fully written and fsynced to a hidden temp name, then
    linked to its final name with create-exclusive semantics: concurrent
    committers of the same version — one manifest file name — race on one
    atomic filesystem op, and every loser gets ``ManifestConflict``. (On
    an object store, the link becomes a put-if-absent of the same single
    object.) A reader can never observe a partially written manifest.
    """
    d = os.path.join(path, _MANIFEST_DIR)
    os.makedirs(d, exist_ok=True)
    if base_version is None:
        vs = manifest_versions(path)
        base_version = vs[-1] if vs else 0
    version = base_version + 1
    entry = {
        "version": version,
        "parent": base_version or None,
        "op": op,
        "files": [{"path": p, "bytes": b} for p, b in files],
        **(extra or {}),
    }
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        json.dump(entry, fh)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, _manifest_path(path, version))
    except FileExistsError:
        raise ManifestConflict(
            f"manifest v{version} already committed under {path}"
        ) from None
    finally:
        os.unlink(tmp)
    return version


def _bootstrap_manifest(path: str) -> dict:
    """v1 = the current directory listing (converts a plain parquet dir
    into a manifest table without touching any data file)."""
    files = [(os.path.relpath(f, path), b) for f, b in table_files(path)]
    commit_manifest(path, files, base_version=0, op="bootstrap")
    return read_manifest(path)


def manifest_read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """The table as of *version* (default: latest committed snapshot).
    Tables without a manifest log fall back to a plain directory read.
    Only files the manifest lists are scanned, so a half-finished or
    conflicted compaction's data files are invisible."""
    man = read_manifest(path, version)
    if man is None:
        return spark.read.parquet(path)
    return spark.read.parquet(*[os.path.join(path, f["path"]) for f in man["files"]])


def vacuum(path: str, keep_versions: int = 1) -> dict:
    """Delete data files referenced by none of the newest *keep_versions*
    manifests (and drop the older manifests). The destructive half of the
    manifest protocol — run it only when no reader still holds a doomed
    version; commits themselves never delete anything."""
    vs = manifest_versions(path)
    if not vs:
        return {"deleted_files": 0, "deleted_bytes": 0, "kept_versions": []}
    keep = vs[-keep_versions:] if keep_versions > 0 else []
    referenced = {
        os.path.normpath(f["path"])
        for v in keep
        for f in read_manifest(path, v)["files"]
    }
    deleted = freed = 0
    for full, b in table_files(path):
        if os.path.normpath(os.path.relpath(full, path)) not in referenced:
            os.unlink(full)
            deleted += 1
            freed += b
    for v in vs[: len(vs) - len(keep)]:
        os.unlink(_manifest_path(path, v))
    # prune data subdirectories holding nothing but _SUCCESS/.crc
    # markers (cosmetic on a real object store, where directories don't
    # exist)
    for root, _dirs, _files in os.walk(path, topdown=False):
        if os.path.normpath(root) == os.path.normpath(path):
            continue
        if os.path.basename(root) == _MANIFEST_DIR:
            continue
        if all(e.startswith(("_", ".")) for e in os.listdir(root)):
            shutil.rmtree(root)
    return {"deleted_files": deleted, "deleted_bytes": freed, "kept_versions": keep}


def zorder_key(
    cols: Sequence[tuple[Column | str, int, int]], bits: int = 12
) -> Column:
    """Bit-interleaved (Morton) key over ``(column, min, max)`` triples.

    Each column is scaled to ``[0, 2^bits)`` with its given min/max (one
    cheap driver-side ``agg(min, max)`` supplies these), then the
    quantized values' bits are interleaved, high bit first, round-robin
    across columns. Pure built-in expressions — whole-stage codegen, no
    Python in the row path.
    """
    quantized = []
    for c, lo, hi in cols:
        c = F.col(c) if isinstance(c, str) else c
        span = max(hi - lo, 1)
        q = ((c.cast("double") - F.lit(float(lo))) / F.lit(float(span))) * F.lit(
            float((1 << bits) - 1)
        )
        # round, don't truncate: (c/span)*span can land an ulp below the
        # exact integer and a bare cast would drop a whole bucket
        q = F.least(
            F.greatest(F.round(q).cast("long"), F.lit(0)), F.lit((1 << bits) - 1)
        )
        quantized.append(q)
    n = len(quantized)
    key = F.lit(0).cast("long")
    # output bit position, from the top: bit b of column j lands at
    # interleaved position (bits-1-b)*n + j
    for b in range(bits - 1, -1, -1):
        for j, q in enumerate(quantized):
            out_pos = (bits - 1 - b) * n + j
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, (bits * n - 1) - out_pos)
    return key


def zorder_key_sql(
    cols: Sequence[tuple[str, int, int]], bits: int = 12
) -> str:
    """DuckDB twin of :func:`zorder_key` — same quantization (round,
    clamp) and the same bit-interleaving loop, emitted as one SQL
    expression so the oracle can pin the clustering key bit-for-bit."""
    quantized = []
    for expr, lo, hi in cols:
        span = max(hi - lo, 1)
        scaled = f"(({expr})::DOUBLE - {float(lo)}) / {float(span)} * {float((1 << bits) - 1)}"
        quantized.append(
            f"least(greatest(round({scaled})::BIGINT, 0), {(1 << bits) - 1})"
        )
    n = len(quantized)
    terms = []
    for b in range(bits - 1, -1, -1):
        for j, q in enumerate(quantized):
            out_pos = (bits - 1 - b) * n + j
            shift = (bits * n - 1) - out_pos
            terms.append(f"(((({q}) >> {b}) & 1) << {shift})")
    return "(" + " + ".join(terms) + ")"


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    cluster_by: Sequence[str] | Column | None = None,
    manifest: bool = False,
) -> dict:
    """Rewrite the parquet directory *path* into ~target-sized files,
    optionally range-clustered on ``cluster_by`` (column names, or a
    single expression such as a ``zorder_key``). Returns before/after
    stats.

    ``manifest=False``: stage + directory rename, atomic on a local
    filesystem only. ``manifest=True``: log-commit protocol (see module
    docstring) — input is the latest manifest snapshot (a plain
    directory is bootstrapped to v1 first), output lands in a fresh
    immutable subdirectory, and the commit is one put-if-absent of the
    next manifest; old snapshots remain readable via ``manifest_read``
    until ``vacuum``. On conflict the staged files are removed and
    ``ManifestConflict`` propagates."""
    if manifest:
        man = read_manifest(path) or _bootstrap_manifest(path)
        before = [(os.path.join(path, f["path"]), f["bytes"]) for f in man["files"]]
        df = spark.read.parquet(*[p for p, _ in before])
    else:
        before = table_files(path)
        df = spark.read.parquet(path)
    in_bytes = sum(b for _, b in before)
    # parquet encodes ~2-4x smaller than its in-memory width; sizing the
    # partition count off the CURRENT file bytes self-corrects because
    # input and output are both parquet
    n_files = max(1, round(in_bytes / target_file_bytes))
    if cluster_by is None:
        out = df.coalesce(n_files)
    else:
        keys = (
            [cluster_by]
            if isinstance(cluster_by, Column)
            else [F.col(c) for c in cluster_by]
        )
        out = df.repartitionByRange(n_files, *keys).sortWithinPartitions(*keys)

    if manifest:
        datadir = os.path.join(path, f"compact-{uuid.uuid4().hex[:8]}")
        out.write.parquet(datadir)
        after = [(os.path.relpath(f, path), b) for f, b in table_files(datadir)]
        try:
            version = commit_manifest(
                path, after, base_version=man["version"], op="compact"
            )
        except ManifestConflict:
            shutil.rmtree(datadir)
            raise
        return {
            "files_before": len(before),
            "files_after": len(after),
            "bytes_before": in_bytes,
            "bytes_after": sum(b for _, b in after),
            "version": version,
        }
    staged = f"{path.rstrip('/')}.__compact_{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(staged)
    old = f"{path.rstrip('/')}.__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(staged, path)
    shutil.rmtree(old)
    after = table_files(path)
    return {
        "files_before": len(before),
        "files_after": len(after),
        "bytes_before": in_bytes,
        "bytes_after": sum(b for _, b in after),
    }


def write_hive_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet layout (``path/col=value/…``) —
    the physical organization that turns partition-key predicates into
    DIRECTORY pruning at plan time: a ``WHERE day = X`` scan lists one
    subdirectory instead of the table (``PartitionFilters`` in the scan,
    asserted in tests/test_maintenance.py).

    At 100 TB this is the first-order scan lever (dwarfs row-group
    skipping): time-partitioned event tables serve point/range queries
    reading only matching partitions.  Combine with z-ordered clustering
    WITHIN partitions (zorder_key) for the second-order skip."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


# ---------------------------------------------------------------------------
# File-level column statistics: manifest-driven data skipping
# ---------------------------------------------------------------------------


def _stat_value(v):
    """JSON-encode a parquet-footer stat value, keeping order semantics:
    numbers/strings pass through, datetimes become ISO strings (ISO
    order == time order)."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        return ("ts", v.isoformat())
    if isinstance(v, _dt.date):
        return ("ts", v.isoformat())
    if isinstance(v, bytes):
        return ("str", v.decode("utf-8", "replace"))
    if isinstance(v, bool) or v is None:
        return ("num", None if v is None else int(v))
    if isinstance(v, (int, float)):
        return ("num", v)
    return ("str", str(v))


def file_column_stats(path: str, cols: Sequence[str]) -> dict:
    """Per-column (min, max, null_count) for ONE parquet file, read from
    the FOOTER row-group metadata via pyarrow — a pure metadata read, no
    data scan (the same numbers Delta writes into its log)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out = {}
    for c in cols:
        if c not in idx:
            continue
        mins, maxs, nulls = [], [], 0
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[c]).statistics
            if st is None or not st.has_min_max:
                mins = []  # any opaque row group poisons the file's stats
                break
            mins.append(st.min)
            maxs.append(st.max)
            nulls += st.null_count or 0
        if mins:
            out[c] = {
                "min": _stat_value(min(mins)),
                "max": _stat_value(max(maxs)),
                "nulls": nulls,
            }
    return out


def attach_file_stats(path: str, cols: Sequence[str]) -> int:
    """Commit a new manifest version whose ``file_stats`` entry carries
    per-file min/max footer statistics for *cols* — Delta-style data
    skipping without a metastore. Stats collection is once-per-ingest
    metadata work (footers only); the committed version is what
    :func:`stats_pruned_read` prunes against. A plain directory is
    bootstrapped to a manifest first."""
    man = read_manifest(path) or _bootstrap_manifest(path)
    files = [(e["path"], e["bytes"]) for e in man["files"]]
    stats = {
        rel: file_column_stats(os.path.join(path, rel), cols) for rel, _ in files
    }
    return commit_manifest(
        path,
        files,
        base_version=man["version"],
        op="attach-stats",
        extra={"file_stats": stats, "stats_cols": list(cols)},
    )


def stats_pruned_read(
    spark: SparkSession,
    path: str,
    col: str,
    lo=None,
    hi=None,
    version: int | None = None,
):
    """Read ONLY the files whose footer [min, max] range for *col*
    overlaps [*lo*, *hi*] (None = unbounded), per the manifest's
    ``file_stats`` — the manifest-driven half of scan pruning (partition
    pruning skips directories; this skips FILES inside them, which is
    what a range predicate on a range-clustered layout needs — pair with
    ``compact(cluster_by=...)``, whose disjoint file ranges make the
    skip rate ~(1 - selectivity)).

    Pruning is a SUPERSET guarantee (a kept file may still hold
    non-matching rows; parquet row-group skipping and the residual
    filter handle those) — the caller applies its own predicate.
    Returns ``(df, {"files_total": N, "files_read": M})``."""
    man = read_manifest(path, version)
    if man is None or "file_stats" not in man:
        raise FileNotFoundError(f"no stats manifest under {path}")
    lo_t, lo_v = _stat_value(lo) if lo is not None else (None, None)
    hi_t, hi_v = _stat_value(hi) if hi is not None else (None, None)
    if lo is not None and hi is not None and lo_t != hi_t:
        raise ValueError(
            f"lo/hi bound types disagree for {col!r}: {lo_t} vs {hi_t}"
        )
    keep = []
    for e in man["files"]:
        st = man["file_stats"].get(e["path"], {}).get(col)
        if st is None:
            keep.append(e["path"])  # no stats: must read (superset rule)
            continue
        (min_t, fmin), (max_t, fmax) = st["min"], st["max"]
        # a bound whose type tag disagrees with the stored stat (numeric
        # bound vs string/timestamp stats, or vice versa) can't order
        # against it — comparing would raise TypeError or, worse,
        # mis-prune; keep the file (superset rule) instead
        if lo is not None and lo_t == max_t and fmax < lo_v:
            continue
        if hi is not None and hi_t == min_t and fmin > hi_v:
            continue
        keep.append(e["path"])
    info = {"files_total": len(man["files"]), "files_read": len(keep)}
    if not keep:
        # empty selection: preserve schema from the full (pinned) set
        full = spark.read.parquet(*[os.path.join(path, e["path"]) for e in man["files"]])
        return full.limit(0), info
    return spark.read.parquet(*[os.path.join(path, p) for p in keep]), info
