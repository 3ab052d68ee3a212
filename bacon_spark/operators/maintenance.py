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

The rewrite stages into a sibling directory and atomically renames on the
same filesystem — readers see either the old or the new layout. On an
object store this swap step is what a table format's transaction log
replaces; everything above it (the rewrite plans) is unchanged.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["compact", "table_files", "zorder_key"]


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


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    cluster_by: Sequence[str] | Column | None = None,
) -> dict:
    """Rewrite the parquet directory *path* into ~target-sized files,
    optionally range-clustered on ``cluster_by`` (column names, or a
    single expression such as a ``zorder_key``). Returns before/after
    stats. The swap is atomic on a local filesystem (stage + rename)."""
    before = table_files(path)
    in_bytes = sum(b for _, b in before)
    df = spark.read.parquet(path)
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
