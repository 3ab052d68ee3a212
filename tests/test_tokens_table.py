"""Once-per-ingest token table (llm/tokens_table): the persisted
(doc_id, toks) + (tok, cnt) artifact the n-gram/heavy-hitter gate queries
probe instead of re-tokenizing the corpus per query (VERDICT r7 'what's
wrong #2'). Equivalence is the contract: anything built from the stored
arrays must equal the same build from raw text."""

import pytest
from pyspark.sql import functions as F

from bacon_spark.llm import text as tx
from bacon_spark.llm.tokens_table import token_counts, token_docs, token_table_build


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox 123 jumps"),
        (3, "pack my box with five dozen liquor jugs"),
        (4, ""),  # zero-token document must survive with an empty array
        (5, "the the the"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def built(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("toks"))
    info = token_table_build(docs, path)
    return path, info


def test_build_commits_both_tables_in_one_manifest(spark, built):
    from bacon_spark.operators.maintenance import read_manifest

    path, info = built
    man = read_manifest(path)
    assert man["version"] == info["version"] == 1
    assert man["token_table"]["data_dir"] == info["data_dir"]
    assert man["token_table"]["counts_dir"] == info["counts_dir"]


def test_stored_tokens_equal_inline_tokenize(spark, docs, built):
    path, _ = built
    stored = {
        r["doc_id"]: list(r["toks"]) for r in token_docs(spark, path).collect()
    }
    inline = {
        r["doc_id"]: list(r["t"])
        for r in docs.select("doc_id", tx.tokens(F.col("text")).alias("t")).collect()
    }
    assert stored == inline and stored[4] == []


def test_counts_are_exact_corpus_counts(spark, built):
    path, _ = built
    got = {r["tok"]: r["cnt"] for r in token_counts(spark, path).collect()}
    assert got["the"] == 6 and got["quick"] == 2 and got["jugs"] == 1


def test_ngrams_from_stored_tokens_equal_text_build(spark, docs, built):
    """The expression-identity the gate queries rely on: bigrams built
    from the stored arrays == bigrams from word_ngrams(text)."""
    path, _ = built
    a = sorted(
        tuple(r)
        for r in token_docs(spark, path)
        .select(F.explode(tx.ngrams_from_tokens(F.col("toks"), 2)).alias("g"))
        .collect()
    )
    b = sorted(
        tuple(r)
        for r in docs.select(
            F.explode(tx.word_ngrams(F.col("text"), 2)).alias("g")
        ).collect()
    )
    assert a == b and len(a) > 0


def test_toks_col_seams_match_text_path(spark, docs, built):
    """sampled_top_ngrams / boilerplate_stats over the token table must
    equal the raw-text forms row for row."""
    path, _ = built
    toks_df = token_docs(spark, path)
    want = [
        tuple(r)
        for r in tx.sampled_top_ngrams(docs, n=2, k=5, rate=1.0, oversample=4).collect()
    ]
    got = [
        tuple(r)
        for r in tx.sampled_top_ngrams(
            toks_df, n=2, k=5, rate=1.0, oversample=4, toks_col="toks"
        ).collect()
    ]
    assert got == want
    want_bp = sorted(
        tuple(r) for r in tx.boilerplate_stats(docs, n=1, min_docs=2).collect()
    )
    got_bp = sorted(
        tuple(r)
        for r in tx.boilerplate_stats(
            toks_df, n=1, min_docs=2, toks_col="toks"
        ).collect()
    )
    assert got_bp == want_bp


def test_rebuild_publishes_new_version_pinned_readers_keep_old(spark, docs, built):
    path, _ = built
    info2 = token_table_build(docs.filter(F.col("doc_id") <= 2), path)
    assert info2["version"] == 2
    assert token_docs(spark, path).count() == 2  # tip
    assert token_docs(spark, path, version=1).count() == 5  # pinned snapshot
