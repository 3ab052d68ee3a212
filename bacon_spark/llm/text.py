"""Text analysis operators for large-scale training-data pipelines:
tokenization, quality scoring, language ID, document fingerprinting.

These are engine extensions beyond the reference's surface (mandated by the
north star, BASELINE.json): everything compiles to built-in Spark SQL
expressions — regex, array and hash functions — so the hot path stays in
whole-stage codegen with zero Python UDFs, and therefore scales linearly
with executors over a 100 TB corpus (pure map-side work, no shuffle).

Each operator has a paired DuckDB-SQL emitter (``*_sql``) generated from
the SAME constants, so the oracle checks stay in lockstep by construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Tokenization
# ---------------------------------------------------------------------------

#: lowercase-alpha word tokens; [^a-z]+ splits keep both engines identical
TOKEN_SPLIT_RE = "[^a-z]+"
#: BPE-ish piece pattern: words / numbers / single non-space symbols
BPE_PIECE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
#: punctuation class for quality scoring (no quote chars: the constant is
#: embedded verbatim in single-quoted oracle SQL)
PUNCT_RE = "[^.,;:!?()-]"

#: tiny deterministic per-language marker vocabularies for n-gram/stopword
#: language ID (alphabetical check order = deterministic tie-break)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "das", "nicht", "ist"),
    "en": ("the", "and", "of", "to", "is", "in"),
    "es": ("el", "los", "las", "que", "y", "una"),
    "fr": ("le", "la", "et", "les", "des", "une"),
}

STOPWORDS = LANG_MARKERS["en"] + ("a", "an", "for", "on", "with", "at", "by")


#: Revision of :func:`tokens`' SEMANTICS (split regex, casing, empty
#: handling). Bump on ANY change to what the function returns: the token
#: table artifact (llm/tokens_table.py) stores this rev in its manifest,
#: and a mismatch forces a full re-tokenize instead of silently probing
#: token/gram tables built under the old semantics (VERDICT r9 next #4).
TOKENIZER_REV: int = 1


def tokens(c: Column) -> Column:
    """Lowercase word tokens, empties dropped."""
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda x: x != F.lit(""))


def tokens_sql(expr: str) -> str:
    return (
        f"list_filter(string_split_regex(lower({expr}), '{TOKEN_SPLIT_RE}'), x -> x <> '')"
    )


def whitespace_token_count(c: Column) -> Column:
    """Whitespace token count (the cheap token estimator)."""
    return F.size(F.filter(F.split(F.trim(c), "\\s+"), lambda x: x != F.lit("")))


def whitespace_token_count_sql(expr: str) -> str:
    return (
        f"cast(len(list_filter(string_split_regex(trim({expr}), '\\s+'), x -> x <> '')) as int)"
    )


def bpe_piece_count(c: Column) -> Column:
    """BPE-ish piece count: words / number runs / single symbols."""
    return F.size(F.regexp_extract_all(c, F.lit(BPE_PIECE_RE), F.lit(0)))


def bpe_piece_count_sql(expr: str) -> str:
    return f"cast(len(regexp_extract_all({expr}, '{BPE_PIECE_RE}')) as int)"


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------


def _ratio(num: Column, den: Column) -> Column:
    return F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(F.lit(0.0))


def quality_features(c: Column) -> dict[str, Column]:
    toks = tokens(c)
    n_tokens = F.size(toks)
    n_chars = F.length(c)
    n_punct = F.length(F.regexp_replace(c, PUNCT_RE, ""))
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": F.round(_ratio(n_punct, n_chars), 8),
        "stopword_ratio": F.round(_ratio(n_stop, n_tokens), 8),
        "mean_token_len": F.round(
            _ratio(F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x)), n_tokens), 8
        ),
    }


def quality_features_sql(expr: str) -> dict[str, str]:
    toks = tokens_sql(expr)
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    n_tokens = f"len({toks})"
    n_chars = f"length({expr})"
    n_punct = f"length(regexp_replace({expr}, '{PUNCT_RE}', '', 'g'))"
    n_stop = f"len(list_filter({toks}, x -> x IN ({stop_list})))"
    sum_len = f"list_sum(list_transform({toks}, x -> length(x)))"

    def ratio(num, den):
        return (
            f"round(CASE WHEN {den} > 0 THEN cast({num} as double) / cast({den} as double) "
            f"ELSE 0.0 END, 8)"
        )

    return {
        "n_chars": f"cast({n_chars} as int)",
        "n_tokens": f"cast({n_tokens} as int)",
        "punct_ratio": ratio(n_punct, n_chars),
        "stopword_ratio": ratio(n_stop, n_tokens),
        "mean_token_len": ratio(f"coalesce({sum_len}, 0)", n_tokens),
    }


# ---------------------------------------------------------------------------
# Repetition signals (Gopher-style quality heuristics)
# ---------------------------------------------------------------------------


def repetition_signals(c: Column) -> dict[str, Column]:
    """Within-document repetition heuristics: duplicate-line ratio, the
    frequency share of the most repeated line, and duplicate word-bigram
    ratio. Pure map-side expression work (per-doc O(L²) on the distinct
    LINE set, bounded by document size, never a shuffle); the standard
    filters for boilerplate / template / spam documents in pretraining
    corpora."""
    from ..functions.exprs import let

    lines_raw = F.filter(
        F.transform(F.split(c, "\n"), lambda x: F.trim(x)), lambda x: x != F.lit("")
    )

    def with_lines(lines: Column) -> dict[str, Column]:
        n = F.size(lines)
        nd = F.size(F.array_distinct(lines))
        max_freq = F.when(
            n > 0,
            F.array_max(
                F.transform(
                    F.array_distinct(lines),
                    lambda d: F.size(F.filter(lines, lambda x: x == d)),
                )
            ),
        ).otherwise(F.lit(0))
        return n, nd, max_freq

    toks = tokens(c)

    def bigram_cols(t: Column) -> tuple[Column, Column]:
        n = F.size(t)
        grams = F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(0), n - 2),
                lambda i: F.concat_ws(" ", F.slice(t, i + 1, 2)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.size(grams), F.size(F.array_distinct(grams))

    out: dict[str, Column] = {}
    n, nd, mx = with_lines(lines_raw)
    ng, ndg = bigram_cols(toks)
    out["n_lines"] = n
    out["dup_line_ratio"] = F.round(_ratio(n - nd, n), 8)
    out["max_line_share"] = F.round(_ratio(mx, n), 8)
    out["dup_bigram_ratio"] = F.round(_ratio(ng - ndg, ng), 8)
    return out


def repetition_signals_sql(expr: str) -> dict[str, str]:
    lines = (
        f"list_filter(list_transform(string_split({expr}, chr(10)), x -> trim(x)), "
        f"x -> x <> '')"
    )
    toks = tokens_sql(expr)
    grams = (
        f"CASE WHEN len({toks}) >= 2 THEN list_transform(range(1, len({toks})), "
        f"i -> array_to_string(list_slice({toks}, i, i + 1), ' ')) ELSE [] END"
    )

    def ratio(num, den):
        return (
            f"round(CASE WHEN {den} > 0 THEN cast({num} as double) / cast({den} as double) "
            f"ELSE 0.0 END, 8)"
        )

    n = f"len({lines})"
    nd = f"len(list_distinct({lines}))"
    mx = (
        f"CASE WHEN len({lines}) > 0 THEN list_max(list_transform("
        f"list_distinct({lines}), d -> len(list_filter({lines}, x -> x = d)))) "
        f"ELSE 0 END"
    )
    ng = f"len({grams})"
    ndg = f"len(list_distinct({grams}))"
    return {
        "n_lines": f"cast({n} as int)",
        "dup_line_ratio": ratio(f"{n} - {nd}", n),
        "max_line_share": ratio(mx, n),
        "dup_bigram_ratio": ratio(f"{ng} - {ndg}", ng),
    }


# ---------------------------------------------------------------------------
# Language ID
# ---------------------------------------------------------------------------


def _isin_filter(markers):
    # NB: a plain `lambda x, m=markers:` breaks pyspark's higher-order
    # functions (it binds one Column per lambda *parameter*, defaults
    # included) — close over the markers via a factory instead
    def pred(x):
        return x.isin(*markers)

    return pred


def lang_id(c: Column) -> Column:
    """Marker-vocabulary language ID: distinct-token hits per language,
    argmax with alphabetical tie-break; 'und' when nothing matches.

    Tokens and the hit counts are let-bound (one evaluation each,
    functions/exprs.py); argmax is array_position-of-max, whose
    first-occurrence rule IS the alphabetical tie-break since the hits
    array is built in sorted language order. This compiles to a far
    smaller codegen unit than an O(langs²) when-chain."""
    from ..functions.exprs import let

    langs = sorted(LANG_MARKERS)
    langs_arr = F.array(*[F.lit(lang) for lang in langs])

    def pick(hits: Column) -> Column:
        best = F.array_max(hits)
        return F.when(
            best > 0, F.element_at(langs_arr, F.array_position(hits, best).cast("int"))
        ).otherwise(F.lit("und"))

    def score(toks: Column) -> Column:
        hits = F.array(
            *[
                F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])))
                for lang in langs
            ]
        )
        return let(hits, pick)

    return let(F.array_distinct(tokens(c)), score)


def lang_id_sql(expr: str) -> str:
    toks = f"list_distinct({tokens_sql(expr)})"
    hit = {
        lang: f"len(list_filter({toks}, x -> x IN ({', '.join(repr(m) for m in markers)})))"
        for lang, markers in LANG_MARKERS.items()
    }
    langs = sorted(LANG_MARKERS)
    branches = []
    for lang in langs:
        conds = [f"{hit[lang]} > 0"]
        for other in langs:
            if other < lang:
                conds.append(f"{hit[lang]} > {hit[other]}")
            elif other > lang:
                conds.append(f"{hit[lang]} >= {hit[other]}")
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(branches) + " ELSE 'und' END"


# ---------------------------------------------------------------------------
# Document fingerprinting
# ---------------------------------------------------------------------------


def fingerprint(c: Column) -> Column:
    """60-bit content fingerprint: md5 over the sorted distinct token set —
    invariant to word order and duplication (a rolling-hash-class
    fingerprint for near-dup pre-bucketing)."""
    canon = F.concat_ws(" ", F.sort_array(F.array_distinct(tokens(c))))
    return F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")


def fingerprint_sql(expr: str) -> str:
    canon = f"array_to_string(list_sort(list_distinct({tokens_sql(expr)})), ' ')"
    return f"cast(('0x' || substr(md5({canon}), 1, 15)) as bigint)"


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

#: name -> regex, applied in INSERTION ORDER on both engines (order is part
#: of the semantics: earlier replacements must not create later matches).
#: Conservative syntax only — the same pattern string must mean the same
#: thing to Java regex (Spark) and RE2 (DuckDB): \b, \d, classes, bounded
#: repetition; no lookaround, no backrefs.
PII_PATTERNS: dict[str, str] = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4": "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "ssn": "\\b\\d{3}-\\d{2}-\\d{4}\\b",
    "phone": "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b",
}


def redact_pii(c: Column, patterns: dict[str, str] = PII_PATTERNS) -> Column:
    """Replace every PII match with ``<NAME>`` — a sequential
    regexp_replace chain, pure codegen, no Python in the row path."""
    for name, pat in patterns.items():
        c = F.regexp_replace(c, pat, f"<{name.upper()}>")
    return c


def redact_pii_sql(expr: str, patterns: dict[str, str] = PII_PATTERNS) -> str:
    for name, pat in patterns.items():
        expr = f"regexp_replace({expr}, '{pat}', '<{name.upper()}>', 'g')"
    return expr


def pii_counts(c: Column, patterns: dict[str, str] = PII_PATTERNS) -> dict[str, Column]:
    """Per-category match counts on the UNredacted text."""
    return {
        name: F.regexp_count(c, F.lit(pat)).cast("long") for name, pat in patterns.items()
    }


def pii_counts_sql(expr: str, patterns: dict[str, str] = PII_PATTERNS) -> dict[str, str]:
    return {
        name: f"len(regexp_extract_all({expr}, '{pat}'))"
        for name, pat in patterns.items()
    }


# ---------------------------------------------------------------------------
# Text chunking (RAG / pretraining context windows)
# ---------------------------------------------------------------------------


def chunk_tokens(
    c: Column, chunk: int = 64, stride: int = 48
) -> Column:
    """Overlapping token windows: chunk i covers tokens
    [i*stride, i*stride + chunk). Returns an array of structs
    (chunk_id, n_tokens, digest) — the digest (hash60 of the joined
    window) stands in for the chunk text so downstream dedup/indexing
    never ships the text twice. Map-side explode fodder; one chunk per
    stride until the window start passes the end of the document."""
    from ..functions.exprs import let
    from .dedup import hash60

    def build(toks: Column) -> Column:
        n = F.size(toks)
        n_chunks = F.when(
            n > 0, F.floor((n - 1) / stride).cast("int") + 1
        ).otherwise(F.lit(0))
        idx = F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
        return F.when(
            n > 0,
            F.transform(
                idx,
                lambda i: F.struct(
                    i.cast("int").alias("chunk_id"),
                    F.least(n - i * stride, F.lit(chunk)).cast("int").alias("n_tokens"),
                    hash60(
                        F.concat_ws(" ", F.slice(toks, i * stride + 1, chunk))
                    ).alias("digest"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<chunk_id:int,n_tokens:int,digest:bigint>>"))

    return let(tokens(c), build)


def chunk_tokens_sql(expr: str, chunk: int = 64, stride: int = 48) -> str:
    """DuckDB twin: one row per chunk via unnested range (callers unnest);
    returns the SQL for a list of structs matching chunk_tokens."""
    from .dedup import hash60_sql

    toks = tokens_sql(expr)
    digest = hash60_sql(
        f"array_to_string(list_slice({toks}, i * {stride} + 1, i * {stride} + {chunk}), ' ')"
    )
    return (
        f"CASE WHEN len({toks}) > 0 THEN "
        f"list_transform(range(0, (len({toks}) - 1) // {stride} + 1), "
        f"i -> {{'chunk_id': i::INT, "
        f"'n_tokens': least(len({toks}) - i * {stride}, {chunk})::INT, "
        f"'digest': {digest}}}) "
        f"ELSE [] END"
    )


def ngrams_from_tokens(toks: Column, n: int = 2) -> Column:
    """Word n-grams from an ALREADY-TOKENIZED array — the shared builder
    behind :func:`word_ngrams` and the persisted token table
    (llm/tokens_table.py), so grams built from stored token arrays are
    expression-identical to grams built from raw text."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_ngrams(c: Column, n: int = 2) -> Column:
    """Word n-grams joined by single spaces; [] when fewer than n tokens."""
    from ..functions.exprs import let

    return let(tokens(c), lambda toks: ngrams_from_tokens(toks, n))


def _gram_col(text_col: str, toks_col: str | None, n: int):
    """Exploded gram column from raw text, or from stored token arrays
    when *toks_col* names a pre-tokenized column (llm/tokens_table.py)."""
    if toks_col is not None:
        return F.explode(ngrams_from_tokens(F.col(toks_col), n)).alias("gram")
    return F.explode(word_ngrams(F.col(text_col), n)).alias("gram")


def word_ngrams_sql(expr: str, n: int = 2) -> str:
    """DuckDB twin of word_ngrams (1-based list_slice)."""
    toks = tokens_sql(expr)
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(range(1, len({toks}) - {n} + 2), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n} - 1), ' ')) "
        f"ELSE [] END"
    )


def sampled_top_ngrams(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    k: int = 20,
    rate: float = 0.25,
    oversample: int = 8,
    salt: str = "topngrams",
    toks_col: str | None = None,
):
    """Exact top-k corpus n-grams with BOUNDED aggregation state — the
    100 TB shape of the vocabulary heavy-hitter pass.

    A direct groupBy(gram) (q84) carries aggregation state linear in the
    corpus VOCABULARY, which grows with corpus size (measured 13x wall at
    10x data in SCALE_SWEEP.json). Here:

    * Phase 1 (candidates): a deterministic md5 hash-sample of documents
      at ``rate`` is aggregated instead — state is the sample's
      vocabulary — and the ``k * oversample`` most frequent grams become
      the candidate set (driver-small).
    * Phase 2 (exact): the full corpus re-counts ONLY candidate grams:
      the exploded grams pass a broadcast left-semi join BEFORE any
      aggregation, so shuffled rows and final agg state are bounded by
      ``k * oversample`` regardless of corpus size.

    The result is EXACT whenever every true top-k gram appears in the
    candidate set — for genuine heavy hitters (count >> corpus/sample
    variance) that holds w.h.p. by Chernoff bounds; ``rate``/``oversample``
    trade sample cost against the miss probability. Fully deterministic
    given ``salt`` (md5 draw — operators/sampling.py), so oracles can pin
    the output; ties break (count desc, gram asc)."""
    from ..operators.sampling import hash_sample

    # toks_col: pre-tokenized arrays (the persisted token table,
    # llm/tokens_table.py) — grams build from the stored sequence via the
    # identical expression, skipping the per-query tokenize pass
    def _grams():
        if toks_col is not None:
            return F.explode(ngrams_from_tokens(F.col(toks_col), n)).alias("gram")
        return F.explode(word_ngrams(F.col(text_col), n)).alias("gram")

    in_col = toks_col if toks_col is not None else text_col
    grams_all = df.select(_grams())
    sample = hash_sample(df.select(id_col, in_col), F.col(id_col), rate, salt=salt)
    cand = (
        sample.select(_grams())
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("gram"))
        .limit(k * oversample)
        .select("gram")
    )
    exact = grams_all.join(F.broadcast(cand), "gram", "left_semi").groupBy("gram").agg(
        F.count(F.lit(1)).alias("n")
    )
    return exact.orderBy(F.col("n").desc(), F.col("gram")).limit(k)


def sampled_top_ngrams_probe(
    full_counts,
    sample_counts,
    k: int = 20,
    oversample: int = 8,
):
    """:func:`sampled_top_ngrams` served from the PERSISTED n-gram
    synopsis (llm/tokens_table.py): *sample_counts* is (gram, cnt) within
    the deterministic document sample, *full_counts* is the exact corpus
    (gram, cnt[, doc_freq]) table. Both phases become vocabulary-sized
    probes — candidate top-(k*oversample) from the sample table, exact
    recount = a semi-join INTO the full table — so the per-query cost no
    longer assembles grams corpus-wide (the 6x decade ratio of
    SCALE_SWEEP_R8_ADDENDUM.json). Counts, tie-breaks ((cnt desc, gram)),
    and therefore results are identical to the direct pipeline: the
    synopsis stores the same groupBy the query used to run."""
    cand = (
        sample_counts.select("gram", F.col("cnt").alias("n"))
        .orderBy(F.col("n").desc(), F.col("gram"))
        .limit(k * oversample)
        .select("gram")
    )
    exact = full_counts.join(F.broadcast(cand), "gram", "left_semi")
    return (
        exact.select("gram", F.col("cnt").alias("n"))
        .orderBy(F.col("n").desc(), F.col("gram"))
        .limit(k)
    )


def sampled_top_ngrams_head_probe(
    full_counts,
    sample_head,
    k: int = 20,
    oversample: int = 8,
    head_k: int | None = None,
):
    """:func:`sampled_top_ngrams_probe` with BOTH phases O(candidates)
    instead of O(vocabulary) (llm/tokens_table heads): *sample_head* is
    the persisted exact top-``head_k`` of the sample gram table by the
    probe's own total order (cnt desc, gram), so the candidate top-
    (k*oversample) read touches head_k rows however large the corpus
    vocabulary grows (Heaps-law growth made the full-table candidate
    scan 3.8x across the sf10->sf100 decade,
    SCALE_SWEEP_DECADE3_R9.json). The candidate grams — k*oversample
    strings, a BOUNDED driver collect — then become an isin() predicate
    on the full-count lookup table, pushed to the parquet scan, where
    the range-sorted-by-gram layout gives file/page min/max pruning at
    production file counts. Head truncation is invisible: the head is
    the exact top of the same order the candidate phase sorts by, so
    results equal :func:`sampled_top_ngrams` bit-for-bit whenever
    k*oversample <= head_k (guarded when *head_k* is passed)."""
    if head_k is not None and k * oversample > head_k:
        raise ValueError(
            f"candidate pool k*oversample={k * oversample} exceeds the "
            f"persisted head size {head_k}; rebuild the synopsis with a "
            "larger DEFAULT_HEAD_K or probe the full sample table"
        )
    cand = [
        r["gram"]
        for r in (
            sample_head.select("gram", F.col("cnt").alias("n"))
            .orderBy(F.col("n").desc(), F.col("gram"))
            .limit(k * oversample)
            .collect()  # bounded: k*oversample rows
        )
    ]
    exact = full_counts.filter(F.col("gram").isin(cand))
    return (
        exact.select("gram", F.col("cnt").alias("n"))
        .orderBy(F.col("n").desc(), F.col("gram"))
        .limit(k)
    )


def boilerplate_grams(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_docs: int = 10,
    toks_col: str | None = None,
):
    """N-grams appearing in >= *min_docs* DISTINCT documents — the corpus
    boilerplate vocabulary (headers, footers, licence blurbs, nav chrome).

    The filtering idea behind RefinedWeb/CCNet-style repeated-content
    removal, re-based on n-grams because the corpus model here is a token
    stream, not lines. Shape at 100 TB: explode -> per-partition distinct
    of (doc, gram) -> count-distinct shuffle carries only (gram, doc_id)
    pairs, never bodies; the result is vocabulary-sized and usually tiny
    (it is the HIGH-document-frequency tail)."""
    grams = df.select(F.col(id_col), _gram_col(text_col, toks_col, n))
    return (
        grams.distinct()
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def boilerplate_stats(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_docs: int = 10,
    toks_col: str | None = None,
    bp_grams=None,
):
    """Per-document boilerplate contamination: of the document's n-gram
    occurrences, how many belong to the corpus boilerplate set
    (boilerplate_grams), as exact integer counts plus parts-per-million
    (integer division — bit-identical across engines, no float rounding).

    Scale shape: the boilerplate set is broadcast (high-frequency tail is
    small by construction), so the per-doc pass is a map-side hash probe +
    one narrow groupBy(doc); zero-gram documents are preserved via the
    final left join against the (id-only) corpus. *bp_grams* (a (gram)
    frame) supplies a PRECOMPUTED boilerplate set — e.g. a doc_freq
    filter over the persisted n-gram synopsis (llm/tokens_table.py) —
    skipping the corpus-wide distinct-(doc, gram) shuffle entirely."""
    grams = df.select(F.col(id_col), _gram_col(text_col, toks_col, n))
    bp = (
        bp_grams.select("gram")
        if bp_grams is not None
        else boilerplate_grams(df, text_col, id_col, n, min_docs, toks_col).select("gram")
    )
    per_doc = (
        grams.join(F.broadcast(bp).withColumn("_bp", F.lit(1)), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("_bp").alias("n_boiler"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.coalesce(F.col("n_boiler"), F.lit(0)).alias("n_boiler"),
            F.when(
                F.coalesce(F.col("n_grams"), F.lit(0)) > 0,
                # integer div, not float /: bit-exact vs DuckDB's //
                F.expr("(n_boiler * 1000000) div n_grams"),
            ).cast("long").alias("boiler_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Spelling-variant mining (edit-distance blocking)
# ---------------------------------------------------------------------------


def spelling_variant_pairs(
    docs,
    text_col: str = "text",
    min_len: int = 4,
    min_count: int = 2,
    max_dist: int = 1,
):
    """Vocabulary word pairs within edit distance *max_dist* — the
    spelling-variant / typo-mining step of corpus normalization (and the
    blocking-plus-verify shape of entity resolution generally).

    Scale shape: the corpus collapses to the Zipf-bounded distinct-word
    vocabulary first (one partial-aggregated shuffle of bare words); the
    candidate join is BLOCKED on (first char, length, length+1) — an
    equi-join, never all-pairs — and levenshtein runs only inside
    blocks.  Single-substitution variants at position 0 are outside the
    block by construction (documented recall trade of first-letter
    blocking, as in classic ER).

    Dedup is decoupled from length orientation (r4 fix, ADVICE r3):
    equal-length pairs dedup lexicographically (word_a < word_b), while
    insertion pairs are oriented shorter->longer (each unordered pair
    appears exactly once as word_a = the shorter word) — the old
    ``a.w < b.w`` applied to BOTH cases silently dropped insertion pairs
    whose longer word sorts before the shorter (e.g. cat/cart: neither
    orientation satisfied len-diff >= 0 AND a < b).

    Returns (word_a, word_b, dist, cnt_a, cnt_b)."""
    from pyspark.sql import functions as F

    words = docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter((F.length("w") >= min_len) & (F.col("cnt") >= min_count))
        .withColumn("c0", F.substring("w", 1, 1))
        .withColumn("ln", F.length("w"))
    )
    a = vocab.alias("a")
    b = vocab.alias("b")
    cand = a.join(
        b,
        (F.col("a.c0") == F.col("b.c0"))
        & (
            ((F.col("a.ln") == F.col("b.ln")) & (F.col("a.w") < F.col("b.w")))
            | (F.col("b.ln") - F.col("a.ln") == 1)
        ),
    )
    return (
        cand.withColumn("dist", F.levenshtein(F.col("a.w"), F.col("b.w")))
        .filter(F.col("dist").between(1, max_dist))
        .select(
            F.col("a.w").alias("word_a"),
            F.col("b.w").alias("word_b"),
            "dist",
            F.col("a.cnt").alias("cnt_a"),
            F.col("b.cnt").alias("cnt_b"),
        )
    )


def spelling_variant_pairs_sql(
    table: str = "documents",
    text_col: str = "text",
    min_len: int = 4,
    min_count: int = 2,
    max_dist: int = 1,
) -> str:
    """DuckDB twin of :func:`spelling_variant_pairs` (same blocking, same
    levenshtein definition)."""
    return f"""
    WITH _words AS (
        SELECT unnest({tokens_sql(text_col)}) AS w FROM {table}
    ),
    _vocab AS (
        SELECT w, cast(count(*) as bigint) AS cnt,
               substring(w, 1, 1) AS c0, length(w) AS ln
        FROM _words GROUP BY w
        HAVING length(w) >= {min_len} AND count(*) >= {min_count}
    )
    SELECT a.w AS word_a, b.w AS word_b,
           cast(levenshtein(a.w, b.w) as int) AS dist,
           a.cnt AS cnt_a, b.cnt AS cnt_b
    FROM _vocab a JOIN _vocab b
      ON a.c0 = b.c0
     AND ((a.ln = b.ln AND a.w < b.w) OR b.ln - a.ln = 1)
    WHERE levenshtein(a.w, b.w) BETWEEN 1 AND {max_dist}
    """
