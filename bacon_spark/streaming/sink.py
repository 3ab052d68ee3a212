"""Exactly-once streaming parquet sink: idempotent foreachBatch writes
through the manifest commit protocol.

Structured Streaming's delivery guarantee to arbitrary sinks is
AT-LEAST-ONCE: after a crash between "batch written" and "offsets
committed", the restarted query REPLAYS the last batch, and a naive
append sink double-counts it.  The standard fix (Spark docs,
"foreachBatch — reusing batch_id for deduplication") is to make the
write idempotent on ``batch_id``; this module implements it on top of
the atomic manifest protocol in operators/maintenance.py:

* each micro-batch writes its files under ``batch-<id>/`` and commits a
  manifest version recording ``{"op": "stream-append", "batch_id": id}``;
* a replayed batch_id is detected from the CURRENT manifest (the set of
  already-committed batch ids rides in the manifest metadata) and is
  SKIPPED — no files written, no version bumped;
* readers go through ``manifest_read``, so a half-written batch whose
  commit never landed is invisible.

The result is an end-to-end exactly-once parquet table from an
at-least-once stream — the property tested by replaying a batch
verbatim in tests/test_streaming_sink.py.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame

from ..operators.maintenance import (
    commit_manifest,
    read_manifest,
    table_files,
)

__all__ = ["idempotent_batch_writer", "committed_batch_ids"]


def committed_batch_ids(path: str) -> set[int]:
    """Batch ids already committed to *path*'s manifest chain."""
    man = read_manifest(path)
    if man is None:
        return set()
    return set(man.get("stream_batches", []))


def idempotent_batch_writer(path: str):
    """Build a ``foreachBatch`` function appending each micro-batch to
    the manifest-committed parquet table at *path* exactly once, even
    when the engine re-delivers a batch after recovery."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        man = read_manifest(path)
        seen = set(man.get("stream_batches", [])) if man else set()
        if batch_id in seen:
            return  # replayed batch: already committed, skip entirely
        datadir = os.path.join(path, f"batch-{batch_id}-{uuid.uuid4().hex[:8]}")
        batch_df.write.parquet(datadir)
        new_files = [
            (os.path.relpath(f, path), b) for f, b in table_files(datadir)
        ]
        base_files = (
            [(f["path"], f["bytes"]) for f in man["files"]] if man else []
        )
        commit_manifest(
            path,
            base_files + new_files,
            base_version=(man["version"] if man else 0),
            op="stream-append",
            extra={"stream_batches": sorted(seen | {batch_id})},
        )

    return write_batch
