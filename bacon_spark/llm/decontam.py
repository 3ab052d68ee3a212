"""Test-set decontamination: drop training documents that overlap an
evaluation set.

The standard contamination check for LLM training corpora: a training
document is contaminated iff it shares at least one word k-gram with any
document in the held-out evaluation set. (Extension beyond the reference —
part of the training-data-pipeline north star; the reference has no
document operators at all.)

Scale design (100 TB train corpus, small eval set): the eval side is by
construction tiny (benchmarks are MBs, not TBs), so its distinct shingle
set is collected into a broadcast hash relation. The train side then needs
only a map-side explode + broadcast semi-join probe — the 100 TB side is
never shuffled, and contaminated-id collection is a distinct on doc ids
(shuffle of ids only, never text). With k=8-13 (the published range) the
shingle explode is bounded by corpus token count; ``shingle_hashes`` can
swap in 60-bit hashes for the probe to cut the broadcast size when eval
sets grow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import shingles

#: word n-gram size for the overlap test (8-13 in published decontamination
#: setups; tests use smaller k to suit the tiny synthetic vocabulary)
DEFAULT_K = 8


def eval_shingle_set(eval_df: DataFrame, text: Column | str, k: int = DEFAULT_K) -> DataFrame:
    """Distinct word k-grams of the evaluation set — the (small) broadcast
    side of the contamination probe."""
    text = F.col(text) if isinstance(text, str) else text
    return eval_df.select(F.explode(shingles(text, k)).alias("gram")).distinct()


def contaminated_ids(
    train: DataFrame,
    eval_df: DataFrame,
    text: Column | str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
) -> DataFrame:
    """Ids of training docs sharing ≥1 word k-gram with the eval set.

    Plan shape: map-side shingle explode on train, broadcast semi-join
    against the eval shingle set, distinct on ids. The train corpus is
    never shuffled."""
    text = F.col(text) if isinstance(text, str) else text
    grams = train.select(F.col(id_col), F.explode(shingles(text, k)).alias("gram"))
    probe = F.broadcast(eval_shingle_set(eval_df, text, k))
    return grams.join(probe, "gram", "left_semi").select(id_col).distinct()


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text: Column | str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
) -> DataFrame:
    """The training corpus minus contaminated documents (left-anti join on
    the contaminated-id set — ids only, the text never shuffles)."""
    bad = contaminated_ids(train, eval_df, text, id_col, k)
    return train.join(bad, id_col, "left_anti")
