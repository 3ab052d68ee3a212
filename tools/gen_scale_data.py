"""Generate a 10x-scale (sf1-equivalent) dataset from the sf0.1 fixtures,
entirely inside the repo (/root/repo/.scale/sf1 — never written to the
read-only testdata tree), for the empirical scaling sweep recorded in
SCALE.md.

Construction: every scaling table is the union of 10 key-remapped
replicas. Key columns are offset by replica * stride (stride = max+1 per
key domain) with FK pairs offset by the SAME stride, so join selectivity,
group sizes per key, and null patterns are preserved exactly — the
workload at 10x is the workload at 1x with 10x the keys, which is what a
grown business would produce. region/nation stay fixed (they are fixed
25/5-row dimensions at every TPC-H SF).

Text/embedding replicas are DECORRELATED (word order scrambled by a
per-replica hash; embeddings rotated by replica index): verbatim copies
would give every document 9 exact duplicates and every vector 9
cosine-1.0 twins, collapsing dedup outputs and exploding candidate-pair
counts quadratically — a 10x corpus in the wild is mostly new content,
and the sweep must measure plan scaling, not artifact explosion. The
word MULTISET per document is preserved, so token counts and quality
ratios stay realistic.

Usage: python tools/gen_scale_data.py [replicas=10] [out_dir] [src_dir]

src_dir (default /root/testdata/sf0.1) lets a bigger replica build on a
replica (sf100-equivalent = 10 replicas OF .scale/sf10, rather than a
1000-way union of sf0.1 — same data volume, bounded plan size).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"


def stride_of(df: DataFrame, col: str) -> int:
    return int(df.agg(F.max(col)).first()[0]) + 1


def replicate(df: DataFrame, n: int, offsets: dict[str, int], transform=None) -> DataFrame:
    """Union of n replicas; replica i offsets each key col by i*stride and
    applies transform(df_cols, i) -> dict of replacement Columns."""
    parts = []
    for i in range(n):
        cols = []
        repl = transform(i) if transform else {}
        for c in df.columns:
            if c in repl:
                cols.append(repl[c].alias(c))
            elif c in offsets:
                cols.append((F.col(c) + F.lit(i * offsets[c])).alias(c))
            else:
                cols.append(F.col(c))
        parts.append(df.select(*cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _alphabet_perm(i: int) -> str:
    """Deterministic full-alphabet permutation for replica *i* (md5-seeded
    Fisher-Yates). The pre-r5 Caesar shift had only 26 distinct images, so
    replicas i and i+26 shared a vocabulary — past ~26 replicas the corpus
    filled with cross-replica exact twins and dedup outputs exploded; a
    seeded permutation gives every replica (up to 26!) its own vocabulary,
    and composes safely when replicating an already-replicated corpus."""
    import hashlib

    lower = list("abcdefghijklmnopqrstuvwxyz")
    state = hashlib.md5(f"scalegen:{i}".encode()).digest()
    out = lower[:]
    for j in range(25, 0, -1):
        # extend the digest stream as needed: one byte of entropy per swap
        if j % 16 == 0:
            state = hashlib.md5(state).digest()
        r = state[j % 16] % (j + 1)
        out[j], out[r] = out[r], out[j]
    return "".join(out)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf1"
    src = sys.argv[3] if len(sys.argv) > 3 else SRC
    os.makedirs(out_dir, exist_ok=True)

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from bacon_spark.sources.star import read_table

    t = {name: read_table(spark, src, name) for name in
         "region nation customer supplier part orders lineitem events documents embeddings".split()}

    s_order = stride_of(t["orders"], "o_orderkey")
    s_cust = stride_of(t["customer"], "c_custkey")
    s_supp = stride_of(t["supplier"], "s_suppkey")
    s_part = stride_of(t["part"], "p_partkey")
    s_event = stride_of(t["events"], "event_id")
    s_user = stride_of(t["events"], "user_id")
    s_doc = stride_of(t["documents"], "doc_id")
    s_vec = stride_of(t["embeddings"], "vec_id")

    dim = len(t["embeddings"].select("embedding").head()[0])

    def doc_transform(i):
        if i == 0:
            return {}
        # per-replica substitution cipher (seeded alphabet permutation):
        # word/char counts, lengths, and whitespace structure are
        # preserved, but the vocabularies of different replicas are
        # DISJOINT — so dedup sees n-times as many dup groups of the
        # original sizes, not every doc with n-1 perfect twins. (A
        # multiset-preserving word scramble fails here: n-gram-set
        # Jaccard and MinHash buckets are order-blind, so scrambled
        # replicas remain similarity-1 pairs and in-bucket verification
        # explodes quadratically — observed 69x wall at 10x data before
        # this fix. And a Caesar shift fails past 26 replicas — see
        # _alphabet_perm.)
        lower = "abcdefghijklmnopqrstuvwxyz"
        rl = _alphabet_perm(i)
        return {
            "text": F.translate(
                F.col("text"), lower + lower.upper(), rl + rl.upper()
            )
        }

    import hashlib as _hl

    def emb_transform(i):
        if i == 0:
            return {}
        # rotate components by i AND flip signs by a per-replica seeded
        # pattern: norm preserved, direction decorrelated. Rotation alone
        # wraps at dim replicas (replicas i and i+dim became cosine-1.0
        # twins); the 2^dim sign patterns remove the wrap.
        signs = _hl.md5(f"scalegen-emb:{i}".encode()).digest() * (dim // 16 + 1)
        rot = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: F.element_at(F.col("embedding"), (j + F.lit(i)) % F.lit(dim) + 1),
        )
        flipped = F.zip_with(
            rot,
            F.array(*[F.lit(1.0 if signs[k] % 2 == 0 else -1.0) for k in range(dim)]),
            lambda v, s: v * s,
        )
        return {"embedding": flipped.cast("array<float>")}

    jobs = [
        ("region", t["region"], {}, None),
        ("nation", t["nation"], {}, None),
        ("customer", t["customer"], {"c_custkey": s_cust}, None),
        ("supplier", t["supplier"], {"s_suppkey": s_supp}, None),
        ("part", t["part"], {"p_partkey": s_part}, None),
        ("orders", t["orders"], {"o_orderkey": s_order, "o_custkey": s_cust}, None),
        (
            "lineitem",
            t["lineitem"],
            {"l_orderkey": s_order, "l_partkey": s_part, "l_suppkey": s_supp},
            None,
        ),
        ("events", t["events"], {"event_id": s_event, "user_id": s_user}, None),
        ("documents", t["documents"], {"doc_id": s_doc}, doc_transform),
        ("embeddings", t["embeddings"], {"vec_id": s_vec}, emb_transform),
    ]
    for name, df, offsets, tr in jobs:
        reps = 1 if name in ("region", "nation") else n
        out = replicate(df, reps, offsets, tr)
        path = f"{out_dir}/{name}.parquet"
        out.write.mode("overwrite").parquet(path)
        print(f"{name}: {spark.read.parquet(path).count()} rows", flush=True)
    print("done ->", out_dir, flush=True)


if __name__ == "__main__":
    main()
