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


def test_ngram_synopsis_counts_and_doc_freq_exact(spark, docs, built):
    """r9 synopsis: the persisted (gram, cnt, doc_freq) table equals the
    direct corpus computation for both measures."""
    from bacon_spark.llm.tokens_table import ngram_counts

    path, _ = built
    got = {
        r["gram"]: (r["cnt"], r["doc_freq"])
        # version 1: the preceding rebuild test commits a 2-doc v2 tip
        for r in ngram_counts(spark, path, 2, version=1).collect()
    }
    grams = docs.select(
        "doc_id", F.explode(tx.word_ngrams(F.col("text"), 2)).alias("gram")
    )
    want = {
        r["gram"]: (r["cnt"], r["df"])
        for r in grams.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.count_distinct("doc_id").alias("df"),
        )
        .collect()
    }
    assert got == want and got["the quick"] == (2, 2) and got["the the"] == (2, 1)


def test_sampled_probe_equals_direct_pipeline(spark, docs, built):
    """sampled_top_ngrams_probe over the synopsis == sampled_top_ngrams
    over the corpus: same counts, same tie-breaks, same rows in order."""
    from bacon_spark.llm.tokens_table import ngram_counts, ngram_sample_counts

    path, _ = built
    direct = [
        tuple(r)
        for r in tx.sampled_top_ngrams(
            docs, n=3, k=5, rate=0.25, oversample=8, salt="topngrams"
        ).collect()
    ]
    probe = [
        tuple(r)
        for r in tx.sampled_top_ngrams_probe(
            ngram_counts(spark, path, 3, version=1),
            ngram_sample_counts(spark, path, "topngrams", 0.25, 3, version=1),
            k=5,
            oversample=8,
        ).collect()
    ]
    assert probe == direct


def test_boilerplate_from_synopsis_equals_direct(spark, docs, built):
    """doc_freq-filtered synopsis as the boilerplate set == the direct
    distinct-(doc, gram) pipeline, per document."""
    from bacon_spark.llm.tokens_table import ngram_counts, token_docs as tdocs

    path, _ = built
    toks_df = tdocs(spark, path, version=1)
    bp = ngram_counts(spark, path, 2, version=1).filter(F.col("doc_freq") >= 2)
    got = sorted(
        tuple(r)
        for r in tx.boilerplate_stats(
            toks_df, n=2, toks_col="toks", bp_grams=bp
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in tx.boilerplate_stats(docs, n=2, min_docs=2).collect()
    )
    assert got == want and any(r[2] > 0 for r in got)


def test_ensure_ngram_synopsis_upgrades_presynopsis_artifact(
    spark, docs, tmp_path_factory
):
    """A pre-r9 artifact (no gram tables) upgrades IN PLACE: only the
    missing tables build (from stored toks, no re-tokenize), a new
    manifest version carries parent files + additions, and readers see
    the synopsis afterwards."""
    from bacon_spark.llm.tokens_table import (
        ensure_ngram_synopsis,
        ngram_counts,
        token_table_build,
    )
    from bacon_spark.operators.maintenance import read_manifest

    path = str(tmp_path_factory.mktemp("toks_old"))
    token_table_build(docs, path, ngrams=(), ngram_samples=())
    man1 = read_manifest(path)
    assert man1["token_table"]["ngrams"] == {}
    assert ensure_ngram_synopsis(spark, path) is True
    man2 = read_manifest(path)
    assert man2["version"] == man1["version"] + 1 and man2["op"] == "ngram-upgrade"
    # parent's files all carried forward
    old = {f["path"] for f in man1["files"]}
    new = {f["path"] for f in man2["files"]}
    assert old <= new and len(new) > len(old)
    assert ngram_counts(spark, path, 2).count() > 0
    # idempotent: nothing missing -> no new commit
    assert ensure_ngram_synopsis(spark, path) is False
    assert read_manifest(path)["version"] == man2["version"]


def test_head_tables_equal_full_table_top_k(spark, built):
    """r9b heads: the persisted head is exactly the full table's top rows
    by (cnt desc, gram) — same rows, same counts — for both the full and
    sampled gram tables."""
    from bacon_spark.llm.tokens_table import (
        ngram_counts,
        ngram_head,
        ngram_sample_counts,
        ngram_sample_head,
        synopsis_head_k,
    )

    path, _ = built
    assert synopsis_head_k(path, version=1) >= 120
    for head, full in (
        (
            ngram_head(spark, path, 2, version=1),
            ngram_counts(spark, path, 2, version=1),
        ),
        (
            ngram_sample_head(spark, path, "topngrams", 0.25, 3, version=1),
            ngram_sample_counts(spark, path, "topngrams", 0.25, 3, version=1),
        ),
    ):
        got = [
            tuple(r)
            for r in head.orderBy(F.desc("cnt"), "gram").collect()
        ]
        want = [
            tuple(r)
            for r in full.orderBy(F.desc("cnt"), "gram")
            .limit(4096)
            .collect()
        ]
        assert got == want and got


def test_head_probe_equals_direct_pipeline(spark, docs, built):
    """sampled_top_ngrams_head_probe (candidates from the persisted head,
    exact recount via isin point lookup) == the direct corpus pipeline:
    same counts, same tie-breaks, same rows in order."""
    from bacon_spark.llm.tokens_table import ngram_counts, ngram_sample_head

    path, _ = built
    direct = [
        tuple(r)
        for r in tx.sampled_top_ngrams(
            docs, n=3, k=5, rate=0.25, oversample=8, salt="topngrams"
        ).collect()
    ]
    probe = [
        tuple(r)
        for r in tx.sampled_top_ngrams_head_probe(
            ngram_counts(spark, path, 3, version=1),
            ngram_sample_head(spark, path, "topngrams", 0.25, 3, version=1),
            k=5,
            oversample=8,
            head_k=4096,
        ).collect()
    ]
    assert probe == direct


def test_head_probe_guards_oversized_candidate_pool():
    """k*oversample beyond the persisted head size must refuse loudly —
    silent truncation there would change results."""
    from bacon_spark.llm.text import sampled_top_ngrams_head_probe

    with pytest.raises(ValueError, match="head"):
        sampled_top_ngrams_head_probe(None, None, k=64, oversample=8, head_k=120)


def test_ensure_adds_heads_to_prehead_artifact(spark, docs, tmp_path_factory):
    """An early-r9 artifact (gram tables, NO heads) upgrades in place:
    heads derive from the EXISTING gram tables (dirs unchanged), a new
    manifest version appears, and the head accessors work afterwards."""
    from bacon_spark.llm.tokens_table import (
        ensure_ngram_synopsis,
        ngram_head,
        ngram_sample_head,
        token_table_build,
    )
    from bacon_spark.operators.maintenance import commit_manifest, read_manifest

    path = str(tmp_path_factory.mktemp("toks_prehead"))
    token_table_build(docs, path)
    # fabricate the pre-head manifest state: same files, entry without
    # the head keys (what an early-r9 build on disk looks like)
    man = read_manifest(path)
    entry = dict(man["token_table"])
    for k in ("ngram_heads", "ngram_sample_heads", "head_k"):
        entry.pop(k)
    commit_manifest(
        path,
        [(f["path"], f["bytes"]) for f in man["files"]],
        base_version=man["version"],
        op="test-strip-heads",
        extra={"token_table": entry},
    )
    assert ensure_ngram_synopsis(spark, path) is True
    man3 = read_manifest(path)
    assert man3["op"] == "ngram-upgrade"
    # gram tables were NOT rebuilt; heads were added
    assert man3["token_table"]["ngrams"] == entry["ngrams"]
    assert man3["token_table"]["ngram_samples"] == entry["ngram_samples"]
    assert ngram_head(spark, path, 2).count() > 0
    assert ngram_sample_head(spark, path, "topngrams", 0.25, 3).count() > 0
    # idempotent afterwards
    assert ensure_ngram_synopsis(spark, path) is False


def test_ensure_rebuilds_undersized_heads(spark, docs, tmp_path_factory, monkeypatch):
    """ADVICE r9: heads built under an older, SMALLER default K must be
    treated as stale when the default grows — a truncated head silently
    drops top-k candidates once the k*oversample guard trusts the larger
    advertised K. Simulate by building under a patched tiny DEFAULT_HEAD_K,
    then restoring the real one and running the upgrade."""
    import bacon_spark.llm.tokens_table as tt
    from bacon_spark.operators.maintenance import read_manifest

    path = str(tmp_path_factory.mktemp("toks_smallhead"))
    monkeypatch.setattr(tt, "DEFAULT_HEAD_K", 3)
    tt.token_table_build(docs, path)
    man1 = read_manifest(path)
    assert man1["token_table"]["head_k"] == 3
    assert tt.ngram_head(spark, path, 2).count() == 3  # truncated
    monkeypatch.undo()
    assert tt.DEFAULT_HEAD_K > 3
    assert tt.ensure_ngram_synopsis(spark, path) is True
    man2 = read_manifest(path)
    assert man2["token_table"]["head_k"] == tt.DEFAULT_HEAD_K
    # heads rebuilt from the UNCHANGED gram tables at the full size
    assert man2["token_table"]["ngrams"] == man1["token_table"]["ngrams"]
    assert man2["token_table"]["ngram_heads"] != man1["token_table"]["ngram_heads"]
    full = tt.ngram_counts(spark, path, 2).count()
    assert tt.ngram_head(spark, path, 2).count() == min(full, tt.DEFAULT_HEAD_K) > 3
    # idempotent once rebuilt at the current size
    assert tt.ensure_ngram_synopsis(spark, path) is False


def test_ensure_rebuilds_on_synopsis_rev_bump(
    spark, docs, tmp_path_factory, monkeypatch
):
    """VERDICT r9 next #4: a synopsis-spec revision bump invalidates every
    gram/head table (rebuilt from the stored toks — no re-tokenize), while
    readers pinned to the pre-bump manifest version keep their snapshot."""
    import bacon_spark.llm.tokens_table as tt
    from bacon_spark.operators.maintenance import read_manifest

    path = str(tmp_path_factory.mktemp("toks_specrev"))
    tt.token_table_build(docs, path)
    man1 = read_manifest(path)
    assert man1["token_table"]["synopsis_rev"] == tt.SYNOPSIS_SPEC_REV
    monkeypatch.setattr(tt, "SYNOPSIS_SPEC_REV", tt.SYNOPSIS_SPEC_REV + 1)
    assert tt.ensure_ngram_synopsis(spark, path) is True
    man2 = read_manifest(path)
    e1, e2 = man1["token_table"], man2["token_table"]
    assert e2["synopsis_rev"] == tt.SYNOPSIS_SPEC_REV
    # every gram/sample/head dir replaced; the toks table untouched
    for k in ("ngrams", "ngram_samples", "ngram_heads", "ngram_sample_heads"):
        assert set(e1[k]) == set(e2[k])  # same logical keys ...
        assert not set(e1[k].values()) & set(e2[k].values())  # ... new dirs
    assert e2["data_dir"] == e1["data_dir"]
    # pinned pre-bump reader still resolves the OLD dirs
    assert (
        tt.ngram_counts(spark, path, 2, version=man1["version"]).count()
        == tt.ngram_counts(spark, path, 2).count()
        > 0
    )
    assert tt.ensure_ngram_synopsis(spark, path) is False


def test_tokenizer_rev_mismatch_marks_artifact_stale(
    spark, docs, tmp_path_factory, monkeypatch
):
    """A tokenizer-rev mismatch invalidates the stored toks themselves:
    token_table_stale flags it, a rebuild on the same path clears it, and
    pre-rev manifests (no stored rev) read as rev 1."""
    import bacon_spark.llm.tokens_table as tt
    from bacon_spark.operators.maintenance import commit_manifest, read_manifest

    path = str(tmp_path_factory.mktemp("toks_tokrev"))
    tt.token_table_build(docs, path)
    assert tt.token_table_stale(path) is False
    monkeypatch.setattr(tt, "TOKENIZER_REV", tt.TOKENIZER_REV + 1)
    assert tt.token_table_stale(path) is True
    # the gate's rebuild-on-stale: a fresh build on the same path is a new
    # manifest version stamped with the current rev
    info2 = tt.token_table_build(docs, path)
    assert info2["version"] == 2 and tt.token_table_stale(path) is False
    monkeypatch.undo()
    # a pre-rev-tracking manifest (keys absent) counts as rev 1
    man = read_manifest(path)
    entry = dict(man["token_table"])
    entry.pop("tokenizer_rev")
    commit_manifest(
        path,
        [(f["path"], f["bytes"]) for f in man["files"]],
        base_version=man["version"],
        op="test-strip-rev",
        extra={"token_table": entry},
    )
    assert tt.token_table_stale(path) is (tt.TOKENIZER_REV != 1)


def test_head_probe_differential_random_corpora(spark, tmp_path_factory):
    """Seeded randomized differential for the head-probe path (the r9b
    twin of the cold-fold and funnel fuzzers): random word-soup corpora
    with skewed gram frequencies, random (k, oversample) within the head
    bound — the persisted-head probe must equal the direct corpus
    pipeline row-for-row, and q84's head top-k must equal the full
    synopsis top-k."""
    import random

    from bacon_spark.llm.tokens_table import (
        ngram_counts,
        ngram_head,
        ngram_sample_head,
        token_table_build,
    )

    rng = random.Random(0x9B)
    vocab = [f"w{i}" for i in range(40)]
    for trial in range(3):
        # skew: a few hot words dominate so heavy hitters are real
        weights = [10 if i < 5 else 1 for i in range(len(vocab))]
        rows = []
        for doc_id in range(60):
            words = rng.choices(vocab, weights=weights, k=rng.randint(0, 30))
            rows.append((doc_id, " ".join(words)))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        path = str(tmp_path_factory.mktemp(f"toks_fuzz{trial}"))
        token_table_build(docs, path, ngrams=(2,), ngram_samples=(("fz", 0.5, 2),))
        k = rng.randint(2, 12)
        oversample = rng.randint(2, 6)
        direct = [
            tuple(r)
            for r in tx.sampled_top_ngrams(
                docs, n=2, k=k, rate=0.5, oversample=oversample, salt="fz"
            ).collect()
        ]
        probe = [
            tuple(r)
            for r in tx.sampled_top_ngrams_head_probe(
                ngram_counts(spark, path, 2),
                ngram_sample_head(spark, path, "fz", 0.5, 2),
                k=k,
                oversample=oversample,
                head_k=4096,
            ).collect()
        ]
        assert probe == direct, f"trial {trial} k={k} ov={oversample}"
        top = [
            tuple(r)
            for r in ngram_head(spark, path, 2)
            .orderBy(F.desc("cnt"), "gram")
            .limit(k)
            .select("gram", "cnt")
            .collect()
        ]
        full_top = [
            tuple(r)
            for r in ngram_counts(spark, path, 2)
            .orderBy(F.desc("cnt"), "gram")
            .limit(k)
            .select("gram", "cnt")
            .collect()
        ]
        assert top == full_top, f"trial {trial} head/full top-{k} diverge"
