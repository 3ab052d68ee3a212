"""LLM-pipeline text preparation gates: quality/lang-id/token counts,
PII redaction, decontamination, sampling/splits/mixtures, importance
weights, BPE, feature hashing (SURVEY LLM operators).

Split from the original single-module query inventory (r4); the
registration registry and helpers live in gate/_base.py.
"""

from ._base import *  # noqa: F401,F403


@query(
    "q23_text_quality",
    f"""
    SELECT doc_id,
           {_tx.quality_features_sql('text')['n_chars']} AS n_chars,
           {_tx.quality_features_sql('text')['n_tokens']} AS n_tokens,
           {_tx.quality_features_sql('text')['punct_ratio']} AS punct_ratio,
           {_tx.quality_features_sql('text')['stopword_ratio']} AS stopword_ratio,
           {_tx.quality_features_sql('text')['mean_token_len']} AS mean_token_len
    FROM documents
    WHERE doc_id < 100
    """,
)
def q23_text_quality(spark, sf_dir):
    """Quality scoring: length / punctuation / stopword / token-shape
    features, all JVM-side expressions (no UDFs)."""
    docs = _read_docs(spark, sf_dir).filter(F.col("doc_id") < 100)
    feats = _tx.quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        feats["n_chars"].alias("n_chars"),
        feats["n_tokens"].alias("n_tokens"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        feats["mean_token_len"].alias("mean_token_len"),
    )


@query(
    "q24_lang_id",
    f"""
    SELECT {_tx.lang_id_sql('text')} AS detected_lang, lang AS tagged_lang,
           count(*) AS n
    FROM documents
    GROUP BY 1, 2
    """,
)
def q24_lang_id(spark, sf_dir):
    """Marker-vocabulary language ID crossed against the corpus's own lang
    tag (the synthetic text is English-ish regardless of tag — the operator
    and its determinism are what's under test)."""
    docs = _read_docs(spark, sf_dir)
    return (
        docs.select(
            _tx.lang_id(F.col("text")).alias("detected_lang"),
            F.col("lang").alias("tagged_lang"),
        )
        .groupBy("detected_lang", "tagged_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q25_token_counts",
    f"""
    SELECT source,
           cast(sum({_tx.whitespace_token_count_sql('text')}) as bigint) AS ws_tokens,
           cast(sum({_tx.bpe_piece_count_sql('text')}) as bigint) AS bpe_pieces,
           count(*) AS n_docs
    FROM documents
    GROUP BY 1
    """,
)
def q25_token_counts(spark, sf_dir):
    """Token counting: whitespace tokens + BPE-ish regex pieces, aggregated
    per source."""
    docs = _read_docs(spark, sf_dir)
    return docs.groupBy("source").agg(
        F.sum(_tx.whitespace_token_count(F.col("text"))).alias("ws_tokens"),
        F.sum(_tx.bpe_piece_count(F.col("text"))).alias("bpe_pieces"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@query(
    "q26_fingerprint",
    f"""
    SELECT doc_id, {_tx.fingerprint_sql('text')} AS fp
    FROM documents
    WHERE doc_id < 50
    """,
)
def q26_fingerprint(spark, sf_dir):
    """Document fingerprinting: 60-bit md5 digest of the sorted distinct
    token set (order/duplication-invariant content fingerprint)."""
    docs = _read_docs(spark, sf_dir).filter(F.col("doc_id") < 50)
    return docs.select("doc_id", _tx.fingerprint(F.col("text")).alias("fp"))


_S55_DRAW = "(cast(('0x' || substr(md5('s55:' || cast(doc_id as varchar)), 1, 15)) as bigint) % 1000000)"


_S56_DRAW = "(cast(('0x' || substr(md5('s56:' || cast(event_id as varchar)), 1, 15)) as bigint) % 1000000)"


_S58_DRAW = "(cast(('0x' || substr(md5('s58/' || source || ':' || cast(doc_id as varchar)), 1, 15)) as bigint) % 1000000)"


@query(
    "q55_stratified_sample",
    f"""
    SELECT lang, count(*) AS n_kept, cast(sum(n_chars) as bigint) AS sum_chars
    FROM documents
    WHERE {_S55_DRAW} <
          CASE lang WHEN 'en' THEN 500000 WHEN 'de' THEN 200000 ELSE 100000 END
    GROUP BY 1
    """,
)
def q55_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling (operators/sampling.py): keep 50%
    of 'en', 20% of 'de', 10% of everything else, chosen by a salted md5
    draw on doc_id — reproducible across runs/engines/partitionings, unlike
    df.sampleBy. Pure map-side filter; the oracle recomputes the identical
    draw in DuckDB."""
    docs = _read_docs(spark, sf_dir)
    kept = _samp.stratified_sample(
        docs, "lang", "doc_id", {"en": 0.5, "de": 0.2}, default=0.1, salt="s55"
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"), F.sum("n_chars").alias("sum_chars")
    )


@query(
    "q56_group_reservoir",
    f"""
    SELECT event_type, event_id FROM (
      SELECT event_type, event_id,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY {_S56_DRAW}, event_id) AS rn
      FROM events) t
    WHERE rn <= 5
    """,
)
def q56_group_reservoir(spark, sf_dir):
    """Deterministic per-group reservoir sample (operators/sampling.py):
    the 5 uniformly-chosen events per event_type, selected by ranking the
    salted hash draw inside each group — reservoir-sampling semantics with
    exact reproducibility. One shuffle (by group), as the semantics
    require."""
    ev = _read(spark, sf_dir, "events")
    return _samp.group_sample(ev, ["event_type"], "event_id", k=5, salt="s56").select(
        "event_type", "event_id"
    )


@query(
    "q57_decontamination",
    f"""
    WITH ev AS MATERIALIZED (
      SELECT DISTINCT unnest({_dd.shingles_sql('text', 4)}) AS gram
      FROM documents WHERE doc_id % 20 = 0
    ),
    tr AS (SELECT doc_id, unnest({_dd.shingles_sql('text', 4)}) AS gram
           FROM documents WHERE doc_id % 20 <> 0)
    SELECT DISTINCT tr.doc_id FROM tr JOIN ev USING (gram)
    """,
)
def q57_decontamination(spark, sf_dir):
    """Test-set decontamination (llm/decontam.py): training docs sharing
    any word 4-gram with the (broadcast) eval set's shingle set. The train
    side is never shuffled — map-side explode + broadcast semi-join, then
    a distinct on ids only."""
    docs = _read_docs(spark, sf_dir)
    eval_df = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    return _decon.contaminated_ids(train, eval_df, "text", "doc_id", k=4)


@query(
    "q58_source_mixture",
    f"""
    SELECT source AS mix_source, count(*) AS n, cast(sum(n_chars) as bigint) AS sum_chars
    FROM documents
    WHERE source IN ('src0', 'src1', 'src2')
      AND {_S58_DRAW} <
          CASE source WHEN 'src0' THEN 800000 WHEN 'src1' THEN 400000 ELSE 100000 END
    GROUP BY 1
    """,
)
def q58_source_mixture(spark, sf_dir):
    """Deterministic source mixing (operators/sampling.py): three source
    corpora sampled at 80% / 40% / 10% with independent per-source salted
    draws, then unioned with a source tag — N map-side filters + a
    zero-shuffle unionByName. mixture_rates() resolves target weights to
    these rates from driver-side counts at pipeline-build time."""
    docs = _read_docs(spark, sf_dir)
    sources = {name: docs.filter(F.col("source") == name) for name in ("src0", "src1", "src2")}
    mixed = _samp.mix_sources(
        sources, {"src0": 0.8, "src1": 0.4, "src2": 0.1}, "doc_id", salt="s58"
    )
    return mixed.groupBy("mix_source").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("sum_chars")
    )


_PII_AUG_SQL = """
      SELECT doc_id,
             text || ' contact u' || doc_id || '@example.com via 10.0.' ||
             (doc_id % 256) || '.' || ((doc_id * 7) % 256) ||
             ' ssn 123-45-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ||
             (CASE WHEN doc_id % 2 = 0 THEN ' tel 555-867-5309' ELSE '' END)
             AS aug
      FROM documents
"""


@query(
    "q70_pii_redaction",
    f"""
    WITH aug AS ({_PII_AUG_SQL})
    SELECT doc_id, {_tx.redact_pii_sql('aug')} AS redacted,
           {', '.join(f"{s} AS n_{n}" for n, s in _tx.pii_counts_sql('aug').items())}
    FROM aug
    """,
)
def q70_pii_redaction(spark, sf_dir):
    """PII scrub over the corpus (llm/text.py): email / IPv4 / SSN /
    phone patterns replaced in a fixed order by a pure-codegen
    regexp_replace chain, with per-category match counts from the
    unredacted text. The fixture corpus contains no PII, so the query
    deterministically injects PII-shaped tokens derived from doc_id —
    identically in Spark and in the oracle SQL — making the redaction
    path's verification non-vacuous (every replacement position lands in
    the value hash)."""
    docs = _read_docs(spark, sf_dir)
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com via 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit("."),
            ((F.col("doc_id") * 7) % 256).cast("string"),
            F.lit(" ssn 123-45-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.when(F.col("doc_id") % 2 == 0, F.lit(" tel 555-867-5309")).otherwise(
                F.lit("")
            ),
        ).alias("aug"),
    )
    counts = _tx.pii_counts(F.col("aug"))
    return aug.select(
        "doc_id",
        _tx.redact_pii(F.col("aug")).alias("redacted"),
        *[c.alias(f"n_{n}") for n, c in counts.items()],
    )


_REP_SIGS = _tx.repetition_signals_sql("text")


@query(
    "q77_repetition_signals",
    f"""
    SELECT doc_id,
           {_REP_SIGS['n_lines']} AS n_lines,
           {_REP_SIGS['dup_line_ratio']} AS dup_line_ratio,
           {_REP_SIGS['max_line_share']} AS max_line_share,
           {_REP_SIGS['dup_bigram_ratio']} AS dup_bigram_ratio
    FROM documents
    WHERE doc_id < 200
    """,
)
def q77_repetition_signals(spark, sf_dir):
    """Gopher-style within-document repetition heuristics (llm/text.py):
    duplicate-line ratio, most-repeated-line share, duplicate word-bigram
    ratio — map-side expression work only, the standard boilerplate /
    template / spam filters for pretraining corpora."""
    docs = _read_docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    sigs = _tx.repetition_signals(F.col("text"))
    return docs.select("doc_id", *[c.alias(n) for n, c in sigs.items()])


_SPLITS = {"train": 0.9, "val": 0.05, "test": 0.05}


@query(
    "q82_dataset_split",
    f"""
    SELECT {dataset_split_sql('doc_id', _SPLITS)} AS split,
           count(*) AS n,
           cast(sum({_tx.whitespace_token_count_sql('text')}) as bigint) AS total_tokens,
           min(doc_id) AS min_id
    FROM documents
    GROUP BY 1
    """,
)
def q82_dataset_split(spark, sf_dir):
    """Deterministic train/val/test split (operators/sampling.
    dataset_split): each document lands in exactly one split by its id
    hash against cumulative thresholds — map-side, engine-reproducible,
    so re-running the pipeline never migrates a row between train and
    eval. Aggregated per split with token mass (the number a mixture
    planner actually needs)."""
    docs = _read_docs(spark, sf_dir)
    out = dataset_split(docs, "doc_id", _SPLITS)
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_tx.whitespace_token_count(F.col("text")).cast("long")).alias("total_tokens"),
        F.min("doc_id").alias("min_id"),
    )


@query(
    "q83_text_chunking",
    f"""
    WITH chunks AS (
      SELECT doc_id, unnest({_tx.chunk_tokens_sql('text', 64, 48)}) AS c
      FROM documents
      WHERE doc_id < 100
    )
    SELECT doc_id, c.chunk_id, c.n_tokens, c.digest
    FROM chunks
    """,
)
def q83_text_chunking(spark, sf_dir):
    """Overlapping context-window chunking (llm/text.chunk_tokens):
    64-token windows at stride 48, one output row per chunk carrying a
    digest of the window instead of its text — map-side build + explode,
    document bodies never amplified through the shuffle. The standard
    RAG / pretraining window prep; the oracle rebuilds identical chunks
    and digests from the same token stream."""
    docs = _read_docs(spark, sf_dir).filter(F.col("doc_id") < 100)
    chunks = docs.select(
        "doc_id", F.explode(_tx.chunk_tokens(F.col("text"), 64, 48)).alias("c")
    )
    return chunks.select("doc_id", "c.chunk_id", "c.n_tokens", "c.digest")


@query(
    "q84_top_ngrams",
    f"""
    WITH toks AS (
      SELECT {_tx.tokens_sql('text')} AS t FROM documents
    ),
    grams AS (
      SELECT unnest(CASE WHEN len(t) >= 2 THEN list_transform(range(1, len(t)),
                    i -> array_to_string(list_slice(t, i, i + 1), ' ')) ELSE [] END) AS gram
      FROM toks
    ),
    counted AS (SELECT gram, count(*) AS n FROM grams GROUP BY 1)
    SELECT gram, n FROM counted
    ORDER BY n DESC, gram LIMIT 20
    """,
    prepare=_token_prebuilt,
)
def q84_top_ngrams(spark, sf_dir):
    """Corpus-wide top-20 word bigrams, served from the persisted n-gram
    synopsis HEAD (llm/tokens_table.ngram_head, prepare hook): the probe
    reads the exact top-4096 (gram, cnt) rows by the deterministic
    (count, gram) total order — O(head_k) however large the vocabulary
    grows — instead of a TakeOrdered over the whole synopsis (whose row
    count grows with the corpus, Heaps-law; the gram-assembly pass
    itself, the 6.6x decade ratio of SCALE_SWEEP_R8_ADDENDUM.json, is
    billed once per ingest alongside the tokenize pass). The head is the
    exact top of the same order this probe sorts by, so top-20 results
    are bit-identical to the full-table probe and the inline groupBy."""
    from ..llm.tokens_table import ngram_head

    cnts = ngram_head(spark, _token_prebuilt(spark, sf_dir), 2)
    out = cnts.select("gram", F.col("cnt").alias("n"))
    return out.orderBy(F.col("n").desc(), F.col("gram")).limit(20)


@query(
    "q86_top_ngrams_sampled",
    f"""
    WITH sampled AS (
      SELECT text FROM documents
      WHERE {_draw_sql('doc_id', 'topngrams')} < 250000
    ),
    sgrams AS (
      SELECT unnest({_tx.word_ngrams_sql('text', 3)}) AS gram FROM sampled
    ),
    cand AS (
      SELECT gram FROM (
        SELECT gram, count(*) AS n FROM sgrams GROUP BY 1
        ORDER BY n DESC, gram LIMIT 120
      )
    ),
    grams AS (
      SELECT unnest({_tx.word_ngrams_sql('text', 3)}) AS gram FROM documents
    ),
    exact AS (
      SELECT g.gram, count(*) AS n
      FROM grams g JOIN cand c ON g.gram = c.gram GROUP BY 1
    )
    SELECT gram, n FROM exact ORDER BY n DESC, gram LIMIT 15
    """,
    prepare=_token_prebuilt,
)
def q86_top_ngrams_sampled(spark, sf_dir):
    """Heavy-hitter vocabulary pass with BOUNDED aggregation state
    (llm/text.sampled_top_ngrams): candidates from a deterministic 25%
    md5-hash document sample, then an exact recount of ONLY those
    candidates over the full corpus behind a broadcast semi-join —
    shuffled rows and agg state bounded by k*oversample at ANY corpus
    size, unlike q84's direct groupBy whose state is the whole
    vocabulary (the one >10x entry in SCALE_SWEEP.json).

    The oracle replays the ENTIRE pipeline in DuckDB — same md5 draw
    (shared dialect, operators/sampling.draw_sql), same candidate
    top-(k*oversample) with (count, gram) tie-break, same exact recount
    — so the match is bit-for-bit regardless of the corpus's heavy-
    hitter structure. On the deliberately-uniform synthetic fixture the
    sampled top-k may differ from the TRUE top-k (no gap for Chernoff
    to work with — counts are near-flat ties); on a natural-language
    corpus the heavy hitters dominate and the candidate set contains
    them w.h.p. — tests/test_llm_ops.py pins that with a skewed
    corpus. Round 9: BOTH phases are O(candidates) head probes
    (text.sampled_top_ngrams_head_probe over llm/tokens_table's
    persisted heads) — candidates from the exact top-head_k of the
    sampled gram table, exact recount an isin() point lookup into the
    range-sorted full-count table; neither phase scans the vocabulary,
    which itself grows with the corpus (the 3.8x sf10->sf100 ratio of
    SCALE_SWEEP_DECADE3_R9.json was the candidate TakeOrdered over the
    growing sample synopsis)."""
    from ..llm.tokens_table import ngram_counts, ngram_sample_head, synopsis_head_k

    path = _token_prebuilt(spark, sf_dir)
    return _tx.sampled_top_ngrams_head_probe(
        ngram_counts(spark, path, 3),
        ngram_sample_head(spark, path, "topngrams", 0.25, 3),
        k=15,
        oversample=8,
        head_k=synopsis_head_k(path),
    )


@query(
    "q87_boilerplate_ngrams",
    f"""
    WITH grams AS (
      SELECT doc_id, unnest({_tx.word_ngrams_sql('text', 3)}) AS gram FROM documents
    ),
    bp AS (
      SELECT gram FROM (
        SELECT gram, count(DISTINCT doc_id) AS n_docs FROM grams GROUP BY 1
      ) WHERE n_docs >= 5
    ),
    per_doc AS (
      SELECT g.doc_id, count(*) AS n_grams, count(b.gram) AS n_boiler
      FROM grams g LEFT JOIN bp b ON g.gram = b.gram GROUP BY 1
    )
    SELECT d.doc_id,
           coalesce(p.n_grams, 0) AS n_grams,
           coalesce(p.n_boiler, 0) AS n_boiler,
           (CASE WHEN coalesce(p.n_grams, 0) > 0
                 THEN (p.n_boiler * 1000000) // p.n_grams END)::BIGINT AS boiler_ppm
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    ORDER BY d.doc_id
    """,
    prepare=_token_prebuilt,
)
def q87_boilerplate_ngrams(spark, sf_dir):
    """Boilerplate-contamination scoring (llm/text.boilerplate_stats): the
    RefinedWeb/CCNet repeated-content idea on n-grams — trigrams appearing
    in >= 5 distinct documents are corpus boilerplate; each document gets
    exact occurrence counts and an integer parts-per-million contamination
    score (integer div — no float rounding to flap the oracle).

    Scale shape: the doc-frequency pass shuffles only (gram, doc_id)
    pairs after a per-partition distinct; the boilerplate set (the
    HIGH-frequency tail) is small by construction and broadcast, so the
    per-doc scoring pass is a map-side hash probe plus one narrow
    groupBy(doc_id). Bodies are never shuffled. Round 9: the boilerplate
    SET comes from the persisted synopsis (doc_freq filter over
    llm/tokens_table.ngram_counts) — the corpus-wide distinct-(doc,gram)
    shuffle is billed once per ingest; only the per-doc scoring pass
    (whose OUTPUT is per-document, so inherently corpus-sized) remains."""
    from ..llm.tokens_table import ngram_counts, token_docs

    path = _token_prebuilt(spark, sf_dir)
    toks_df = token_docs(spark, path)
    bp = ngram_counts(spark, path, 3).filter(F.col("doc_freq") >= 5)
    out = _tx.boilerplate_stats(toks_df, n=3, toks_col="toks", bp_grams=bp)
    return out.orderBy("doc_id")


@query(
    "q88_dsir_importance",
    _imp.dsir_scores_sql("d.lang = 'en'"),
)
def q88_dsir_importance(spark, sf_dir):
    """DSIR importance weights (llm/importance.dsir_scores — Xie et al.
    2023, arXiv:2302.03169): hashed {1,2}-gram bucket models for the
    target (lang='en') vs the raw corpus, per-document log importance
    weight in integer micro-nats. The oracle rebuilds the whole model in
    DuckDB from the shared md5 bucket dialect, so the match is exact.

    Scale shape: feature pass shuffles at most num_buckets rows per doc
    (never bodies); the bucket model is 64 rows, broadcast; scoring is a
    map-side probe + one narrow per-doc integer sum."""
    docs = _read_docs(spark, sf_dir)
    return _imp.dsir_scores(docs, docs.filter(F.col("lang") == "en")).orderBy("doc_id")


@query(
    "q93_corpus_prep_pipeline",
    f"""
    WITH quality AS (
      SELECT * FROM documents
      WHERE {_tx.quality_features_sql('text')['n_tokens']} >= 30
        AND {_tx.quality_features_sql('text')['stopword_ratio']} <= 0.12
    ),
    keep AS (
      SELECT min(doc_id) AS doc_id FROM quality GROUP BY {_dd.hash60_sql('text')}
    ),
    deduped AS (
      SELECT q.* FROM quality q JOIN keep k ON q.doc_id = k.doc_id
    )
    SELECT {dataset_split_sql('doc_id', _SPLITS)} AS split, lang,
           count(*) AS n_docs,
           cast(sum({_tx.whitespace_token_count_sql('text')}) as bigint) AS total_tokens
    FROM deduped
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q93_corpus_prep_pipeline(spark, sf_dir):
    """The composed training-corpus preparation pipeline, end to end in
    ONE lazy plan: quality gate (token count + stopword ratio, pure
    codegen expressions) -> exact dedup (min-id per 60-bit digest) ->
    deterministic train/val/test split -> per-(split, lang) doc and
    token mass. Every stage is an operator verified alone elsewhere
    (q23, q22, q82); this gate proves they COMPOSE — filters stay pushed
    beneath the dedup shuffle, the split stays map-side, and one narrow
    (digest,id) exchange plus the final small agg are the only shuffles
    in the whole pipeline."""
    docs = _read_docs(spark, sf_dir)
    qf = _tx.quality_features(F.col("text"))
    quality = docs.filter(
        (qf["n_tokens"] >= 30) & (qf["stopword_ratio"] <= 0.12)
    )
    deduped = _dd.exact_dedup(quality)
    split = dataset_split(deduped, "doc_id", _SPLITS)
    out = split.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(_tx.whitespace_token_count(F.col("text"))).cast("bigint").alias("total_tokens"),
    )
    return out.orderBy("split", "lang")


@query(
    "q98_udtf_tokenize",
    f"""
    WITH toks AS (
      SELECT doc_id, {_tx.tokens_sql('text')} AS t FROM documents WHERE doc_id < 20
    ),
    rows AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t) + 1),
                    i -> {{'pos': i, 'token': t[i]}})) AS r
      FROM toks
    )
    SELECT doc_id, r.pos::INT AS pos, r.token AS token
    FROM rows ORDER BY doc_id, pos
    """,
)
def q98_udtf_tokenize(spark, sf_dir):
    """Python UDTF surface (functions/udtf.TokenizeUDTF, Spark 4
    ``@udtf``): one input row lateral-expands to a row per token with
    its position, through the registered-SQL-function path
    (``LATERAL tokenize(text)``) — pinning the third leg of the
    SURVEY §2.11 UDF surface (scalar Column / pandas UDAF / UDTF) with
    an exactness oracle on the shared tokenizer dialect. Arrow-batched,
    map-side; the bounded doc slice keeps the gate result small."""
    from ..functions.udtf import register_udtfs

    register_udtfs(spark)
    docs = _read_docs(spark, sf_dir).filter(F.col("doc_id") < 20)
    docs.createOrReplaceTempView("q98_docs")
    out = spark.sql(
        "SELECT d.doc_id, t.pos, t.token "
        "FROM q98_docs d, LATERAL tokenize(d.text) t"
    )
    return out.orderBy("doc_id", "pos")


@query(
    "q101_lm_quality_scores",
    _lm.bigram_lm_scores_sql("d.lang = 'en' AND d.source IN ('src0', 'src1')"),
)
def q101_lm_quality_scores(spark, sf_dir):
    """CCNet-style LM quality scoring (llm/lm.bigram_lm_scores — Wenzek
    et al. 2020, arXiv:1911.00359): an add-one-smoothed bigram model
    fitted on the target subcorpus (lang='en', sources src0/src1 — the
    'Wikipedia' stand-in) scores every document's total and mean bigram
    log-probability in integer micro-nats; downstream selection keeps
    the head/middle of this distribution. The oracle refits the entire
    model in DuckDB from the same counts and expression shape — scores
    match bit-for-bit.

    Scale shape: model tables are target-corpus-sized and broadcast;
    the corpus shuffles only (doc, bigram, cnt) rows; integer sums
    everywhere past the 1-per-bigram quantized constant."""
    docs = _read_docs(spark, sf_dir)
    target = docs.filter(
        (F.col("lang") == "en") & (F.col("source").isin("src0", "src1"))
    )
    return _lm.bigram_lm_scores(docs, target).orderBy("doc_id")


@query("q102_bpe_pair_counts", _bpe.bpe_pair_counts_sql("documents", "text", 50))
def q102_bpe_pair_counts(spark, sf_dir):
    """BPE tokenizer-training merge candidates (llm/bpe.py, Sennrich et
    al. 2016): corpus-wide adjacent character-pair frequencies weighted
    by word frequency — the argmax set of the first BPE merge.

    Scale shape: aggregates to the DISTINCT word vocabulary BEFORE
    exploding pairs, so the only corpus-sized shuffle carries bare words
    with map-side combine; pair explosion runs over the Zipf-bounded
    vocabulary table."""
    docs = _read_docs(spark, sf_dir)
    return _bpe.bpe_pair_counts(docs, "text", top=50)


_TYPO_DOC = "joim joim hasj hasj batck batck scen scen columm columm"


@query(
    "q119_spelling_variants",
    _tx.spelling_variant_pairs_sql(
        "(SELECT text FROM documents "
        f"UNION ALL SELECT '{_TYPO_DOC}') _docs",
        "text",
        4,
        2,
        1,
    )
    + " ORDER BY word_a, word_b",
)
def q119_spelling_variants(spark, sf_dir):
    """Spelling-variant / typo mining (llm/text.spelling_variant_pairs):
    vocabulary word pairs at edit distance 1, blocked on (first char,
    length±1) so levenshtein runs only inside equi-join blocks — the
    blocking-then-verify shape of entity resolution, applied to corpus
    normalization.  Corpus collapses to the Zipf-bounded vocabulary
    before any join; bodies never shuffle.  A deterministic typo doc is
    unioned in on both engines so the check can't pass vacuously."""
    docs = _read_docs(spark, sf_dir).select("text")
    typo = spark.range(1).select(F.lit(_TYPO_DOC).alias("text"))
    return _tx.spelling_variant_pairs(docs.unionByName(typo), "text", 4, 2, 1).orderBy(
        "word_a", "word_b"
    )


@query(
    "q153_quality_filter_scores",
    _imp.hashed_linear_scores_sql("documents", "text", "doc_id", 1024, "qlw")
    + " ORDER BY doc_id",
)
def q153_quality_filter_scores(spark, sf_dir):
    """Quality-classifier inference (llm/importance.hashed_linear_scores)
    — the fastText/CCNet-style linear filter every production pipeline
    runs before training.  Hashing-trick features (q143's trick), md5-
    derived deterministic weights (the LSH-hyperplane constant trick, so
    inference needs no broadcast side at all), integer-exact logit in
    micro-units.

    Scale shape: pure whole-stage-codegen array expressions — zero
    shuffle, zero UDFs, zero broadcast; the entire filter is a map-side
    projection over the corpus scan.  (A trained model would broadcast
    a dim-sized weight array; same plan shape.)"""
    docs = _read_docs(spark, sf_dir)
    return _imp.hashed_linear_scores(docs, "text", "doc_id").orderBy("doc_id")


_Q132_DRAW = _draw_sql("doc_id", "s132")


@query(
    "q132_temperature_mixture",
    f"""
    WITH _rates AS ({_samp.temperature_rates_sql(
        "SELECT source, count(*) AS cnt FROM documents GROUP BY source")}),
    _kept AS (
        SELECT d.source, d.n_chars, r.rate_ppm
        FROM documents d JOIN _rates r USING (source)
        WHERE {_Q132_DRAW} < r.rate_ppm
    )
    SELECT source AS mix_source,
           cast(count(*) as bigint) AS n,
           cast(sum(n_chars) as bigint) AS sum_chars,
           min(rate_ppm) AS rate_ppm
    FROM _kept
    GROUP BY source
    ORDER BY mix_source
    """,
)
def q132_temperature_mixture(spark, sf_dir):
    """Temperature-based mixture rebalancing (operators/sampling
    .temperature_rates — the alpha=1/2 multilingual/multi-source
    sampling rule of mBERT/XLM-R): per-source keep rates
    min(1, sqrt(cnt_max/cnt)) in integer ppm, applied via the
    deterministic salted draw.  The only float ops are one division and
    one sqrt — both IEEE correctly-rounded, so rates (and therefore the
    kept set) are bit-identical across engines AND cluster topologies;
    unlike a general pow(share, alpha), which drifts across libm
    implementations (why the operator refuses alpha != 0.5).

    Scale shape: the rate table is source-cardinality (broadcast);
    draw + filter are map-side; one final bounded aggregation."""
    docs = _read_docs(spark, sf_dir)
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("cnt"))
    rates = _samp.temperature_rates(counts, "source", alpha=0.5)
    kept = (
        docs.join(F.broadcast(rates), "source")
        .filter(_samp._draw(F.col("doc_id"), "s132") < F.col("rate_ppm"))
    )
    return (
        kept.groupBy(F.col("source").alias("mix_source"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("rate_ppm").alias("rate_ppm"),
        )
        .orderBy("mix_source")
    )


@query(
    "q143_feature_hashing",
    f"""
    WITH _tok AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                  x -> x <> '')) AS tok
        FROM documents WHERE doc_id < 100
    ),
    _feat AS (
        SELECT doc_id,
               {{h}} % 1024 AS idx,
               cast(count(*) as bigint) AS val
        FROM _tok
        GROUP BY doc_id, {{h}} % 1024
    ),
    _ranked AS (
        SELECT doc_id, idx, val,
               row_number() OVER (PARTITION BY doc_id ORDER BY idx) AS rn
        FROM _feat
    )
    SELECT doc_id,
           cast((SELECT count(*) FROM _feat f WHERE f.doc_id = r.doc_id)
                as bigint) AS nnz,
           array_to_string(list(idx::VARCHAR || ':' || val::VARCHAR
                                ORDER BY idx), ' ') AS features
    FROM _ranked r
    WHERE rn <= 20
    GROUP BY doc_id
    ORDER BY doc_id
    """.format(h="cast(('0x' || substr(md5(tok), 1, 15)) as bigint)"),
)
def q143_feature_hashing(spark, sf_dir):
    """Hashing-trick text vectorization (Weinberger et al. 2009 — the
    fixed-dimension, vocabulary-free featurizer): token counts hashed
    into 1024 buckets via the shared md5 dialect; per doc the nonzero
    count and the 20 lowest-index features as 'idx:val' pairs.  The
    oracle recomputes the identical hash in DuckDB.

    Scale shape: tokenize+hash map-side, one (doc, idx) aggregation,
    WindowGroupLimit caps the per-doc feature sample inside the
    shuffle."""
    from pyspark.sql import Window

    from ..llm.dedup import hash60
    from ..llm.text import tokens as _toks

    docs = _read_docs(spark, sf_dir).filter(F.col("doc_id") < 100)
    feats = (
        docs.select("doc_id", F.explode(_toks(F.col("text"))).alias("tok"))
        .select("doc_id", (hash60(F.col("tok")) % 1024).alias("idx"))
        .groupBy("doc_id", "idx")
        .agg(F.count(F.lit(1)).alias("val"))
    )
    nnz = feats.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nnz"))
    w = Window.partitionBy("doc_id").orderBy("idx")
    top = (
        feats.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("idx"), F.col("val")))
                    ),
                    lambda s: F.concat_ws(
                        ":", s["idx"].cast("string"), s["val"].cast("string")
                    ),
                ),
            ).alias("features")
        )
    )
    return (
        nnz.join(top, "doc_id").select("doc_id", "nnz", "features").orderBy("doc_id")
    )


_Q144_FOLD = "(" + _draw_sql("source", "s144") + ") % 5"


@query(
    "q144_group_kfold",
    f"""
    WITH _f AS (
        SELECT doc_id, source, cast({_Q144_FOLD} as int) AS fold
        FROM documents
    )
    SELECT fold,
           cast(count(*) as bigint) AS n_docs,
           cast(count(DISTINCT source) as bigint) AS n_groups,
           cast((SELECT max(nf) FROM (
               SELECT count(DISTINCT fold) AS nf FROM _f GROUP BY source))
               as bigint) AS max_folds_per_group
    FROM _f
    GROUP BY fold
    ORDER BY fold
    """,
)
def q144_group_kfold(spark, sf_dir):
    """GROUP-aware k-fold assignment (GroupKFold — the anti-leakage CV
    split): the fold is a deterministic salted draw of the GROUP key
    (source), not the row, so every document of a group lands in the
    same fold — near-duplicates and same-origin docs can never straddle
    train/validation.  The result certifies it: max_folds_per_group is
    1 by construction, and the oracle recomputes the same draws.

    Scale shape: fold assignment is a map-side hash of an existing
    column — no group table, no join, reproducible across engines and
    partitionings (the same salted-md5 dialect as q55/q82)."""
    docs = _read_docs(spark, sf_dir)
    f = docs.select(
        "doc_id",
        "source",
        (_samp._draw(F.col("source"), "s144") % 5).cast("int").alias("fold"),
    )
    per_group = f.groupBy("source").agg(
        F.countDistinct("fold").alias("nf")
    )
    max_nf = per_group.agg(F.max("nf").alias("m"))
    return (
        f.groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_groups"),
        )
        .crossJoin(F.broadcast(max_nf))
        .select("fold", "n_docs", "n_groups", F.col("m").alias("max_folds_per_group"))
        .orderBy("fold")
    )
