"""Sequence-packing invariants: spans are contiguous per shard, no
tokens are lost, and chunk counts match span arithmetic."""

from pyspark.sql import functions as F

from bacon_spark.operators.packing import pack_chunks

C = 64


def test_pack_chunks_invariants(spark):
    rows = [(i, f"word " * (i % 37 + 1)) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    n_tokens = F.size(F.split(F.trim("text"), r"\s+"))
    out = pack_chunks(docs, n_tokens, chunk_tokens=C, shards=4).collect()
    assert len(out) == 200
    by_shard: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        cum = 0
        for r in rs:
            assert r["first_chunk"] == cum // C
            assert r["last_chunk"] == (cum + r["n_tokens"] - 1) // C
            assert r["n_chunks"] == r["last_chunk"] - r["first_chunk"] + 1
            cum += r["n_tokens"]  # contiguity: next doc starts where this ends


def test_pack_chunks_drops_empty(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "   "), (3, "")], "doc_id long, text string"
    )
    n = F.size(F.filter(F.split(F.trim("text"), r"\s+"), lambda x: x != F.lit("")))
    out = pack_chunks(docs, n, chunk_tokens=4, shards=2).collect()
    assert [r["doc_id"] for r in out] == [1]
