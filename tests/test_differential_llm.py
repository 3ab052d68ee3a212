"""Differential tests for the round-3 data-pipeline operators: Spark
implementations vs independent pure-Python models on hypothesis-generated
data (the DuckDB oracle gate covers the fixtures; these cover random
shapes, nulls, empties, and boundary values the fixtures never hit)."""

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bacon_spark.llm.importance import dsir_scores
from bacon_spark.llm.text import boilerplate_stats
from bacon_spark.operators.profile import histogram

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --- histogram -------------------------------------------------------------


def _model_histogram(values, lo, hi, nbins):
    counts = {b: 0 for b in range(nbins + 2)}
    for x in values:
        if x is None:
            continue
        if x < lo:
            b = 0
        elif x >= hi:
            b = nbins + 1
        else:
            b = 1 + int(math.floor((x - lo) * nbins / (hi - lo)))
        counts[b] += 1
    return counts


@given(
    values=st.lists(
        st.one_of(
            st.none(),
            st.floats(min_value=-100, max_value=200, allow_nan=False),
        ),
        max_size=40,
    ),
    nbins=st.integers(min_value=1, max_value=8),
)
@settings(**_SETTINGS)
def test_histogram_matches_model(spark, values, nbins):
    lo, hi = 0.0, 100.0
    df = spark.createDataFrame([(v,) for v in values], "x double")
    got = {r["bucket"]: r["n"] for r in histogram(df, "x", lo, hi, nbins).collect()}
    want = _model_histogram(values, lo, hi, nbins)
    assert got == want
    assert sum(got.values()) == sum(1 for v in values if v is not None)


# --- boilerplate -----------------------------------------------------------


def _tokens(text):
    import re

    return [t for t in re.split(r"[^a-z]+", text.lower()) if t]


def _ngrams(text, n):
    toks = _tokens(text)
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _model_boilerplate(docs, n, min_docs):
    from collections import Counter

    doc_sets = {i: set(_ngrams(t, n)) for i, t in docs}
    df_count = Counter(g for s in doc_sets.values() for g in s)
    bp = {g for g, c in df_count.items() if c >= min_docs}
    out = {}
    for i, t in docs:
        grams = _ngrams(t, n)
        nb = sum(1 for g in grams if g in bp)
        ppm = (nb * 1_000_000) // len(grams) if grams else None
        out[i] = (len(grams), nb, ppm)
    return out


@given(
    texts=st.lists(
        st.text(alphabet="ab c", max_size=30), min_size=1, max_size=12
    ),
    min_docs=st.integers(min_value=1, max_value=4),
)
@settings(**_SETTINGS)
def test_boilerplate_matches_model(spark, texts, min_docs):
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_boiler"], r["boiler_ppm"])
        for r in boilerplate_stats(df, n=2, min_docs=min_docs).collect()
    }
    want = _model_boilerplate(docs, 2, min_docs)
    # model ppm None <-> Spark null; zero-gram docs carry (0, 0, None)
    want = {i: (g, b, p if g else None) for i, (g, b, p) in want.items()}
    assert got == {i: (g, b, p) for i, (g, b, p) in want.items()}


# --- DSIR ------------------------------------------------------------------


def _hash60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _round_half_up(v):
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def _model_dsir(docs, target_ids, B=64, salt="dsir"):
    from collections import Counter

    def feats(text):
        toks = _tokens(text)
        grams = toks + [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        return Counter(_hash60(f"{salt}:{g}") % B for g in grams)

    per_doc = {i: feats(t) for i, t in docs}
    raw = Counter()
    for c in per_doc.values():
        raw.update(c)
    tgt = Counter()
    for i, _t in docs:
        if i in target_ids:
            tgt.update(per_doc[i])
    R, T = sum(raw.values()), sum(tgt.values())
    lr = {
        b: _round_half_up(
            1_000_000
            * math.log(((tgt.get(b, 0) + 1) / (cr + 1)) * ((R + B) / (T + B)))
        )
        for b, cr in raw.items()
    }
    out = {}
    for i, _t in docs:
        c = per_doc[i]
        n = sum(c.values())
        out[i] = (n, sum(cnt * lr[b] for b, cnt in c.items()) if n else None)
    return out


@given(
    texts=st.lists(st.text(alphabet="xy z", max_size=25), min_size=2, max_size=10),
    n_target=st.integers(min_value=1, max_value=3),
)
@settings(**_SETTINGS)
def test_dsir_matches_model(spark, texts, n_target):
    docs = list(enumerate(texts))
    target_ids = {i for i, _ in docs[:n_target]}
    df = spark.createDataFrame(docs, "doc_id long, text string")
    target = df.filter(df.doc_id.isin(list(target_ids)))
    got = {
        r["doc_id"]: (r["n_feats"], r["dsir_score"])
        for r in dsir_scores(df, target).collect()
    }
    assert got == _model_dsir(docs, target_ids)
