"""Round-3 batch-2 operators (timeseries / stats / bpe / pagerank /
winnowing / inverted index) — differential tests against pure-Python
models, plus the determinism properties the oracles rely on."""

import hashlib
import statistics

from pyspark.sql import Row
from pyspark.sql import functions as F

from bacon_spark.llm.bpe import bpe_pair_counts
from bacon_spark.llm.dedup import (
    MINHASH_P,
    duplicate_spans,
    winnow_minimizers,
    winnow_overlap_pairs,
)
from bacon_spark.llm.ranking import inverted_index
from bacon_spark.operators.graph import pagerank_quantized
from bacon_spark.operators.stats import MAD_SIGMA, grouped_regression, mad_outliers
from bacon_spark.operators.timeseries import (
    dyadic_ewma,
    hourly_max_concurrency,
    interval_concurrency,
)

# ---------------------------------------------------------------------------
# dyadic EWMA
# ---------------------------------------------------------------------------


def _py_ewma(values, depth=16):
    out = []
    for i in range(len(values)):
        num = den = 0
        for k in range(min(depth, i + 1)):
            w = 1 << (depth - 1 - k)
            num += values[i - k] * w
            den += w
        out.append(num / den)
    return out


def test_dyadic_ewma_matches_python_model(spark):
    vals = [100, 200, 50, 400, 0, 300, 250, 125]
    rows = [Row(k="a", o=i, v=v) for i, v in enumerate(vals)]
    rows += [Row(k="b", o=0, v=777)]
    df = spark.createDataFrame(rows)
    got = {
        (r["k"], r["o"]): r["ewma"]
        for r in dyadic_ewma(df, "k", ["o"], "v", depth=4).collect()
    }
    want = _py_ewma(vals, depth=4)
    for i, w in enumerate(want):
        assert got[("a", i)] == w  # dyadic weights: bit-exact, no approx
    assert got[("b", 0)] == 777.0  # single row normalizes to itself


def test_dyadic_ewma_short_history_normalizes(spark):
    df = spark.createDataFrame([Row(k="a", o=0, v=10), Row(k="a", o=1, v=30)])
    got = sorted(
        (r["o"], r["ewma"]) for r in dyadic_ewma(df, "k", ["o"], "v", depth=16).collect()
    )
    assert got[0][1] == 10.0
    # two rows: (30*2^15 + 10*2^14) / (2^15 + 2^14) = 70/3
    assert abs(got[1][1] - 70 / 3) < 1e-12


# ---------------------------------------------------------------------------
# interval concurrency sweep-line
# ---------------------------------------------------------------------------


def _py_hourly_peaks(intervals):
    """Global-order sweep model: (hour -> (peak, n_starts))."""
    events = [(s, 1) for s, _ in intervals] + [(e, -1) for _, e in intervals]
    events.sort(key=lambda t: (t[0], t[1]))
    level = 0
    peaks = {}
    for t, d in events:
        before = level
        level += d
        hour = t.replace(minute=0, second=0, microsecond=0)
        p, ns = peaks.get(hour, (0, 0))
        peaks[hour] = (max(p, before, level), ns + (1 if d == 1 else 0))
    return peaks


def test_interval_concurrency_crosses_chunk_boundaries(spark):
    import datetime as dt

    base = dt.datetime(2024, 3, 1, 22, 0, 0)
    intervals = [
        # spans midnight (the day-chunk boundary): carry-in must cover it
        (base, base + dt.timedelta(hours=5)),
        (base + dt.timedelta(hours=1), base + dt.timedelta(hours=2)),
        (base + dt.timedelta(hours=3), base + dt.timedelta(hours=4)),
        # second day only
        (base + dt.timedelta(hours=6), base + dt.timedelta(hours=7)),
        # back-to-back: end meets start, half-open => never concurrent
        (base + dt.timedelta(hours=7), base + dt.timedelta(hours=8)),
    ]
    df = spark.createDataFrame([Row(s=s, e=e) for s, e in intervals])
    got = {
        r["hour"]: (r["peak"], r["n_starts"])
        for r in hourly_max_concurrency(df, "s", "e").collect()
    }
    want = _py_hourly_peaks(intervals)
    assert got == want
    # the midnight-crossing session keeps level 1 alive inside day 2
    levels = {
        (r["t"], r["delta"]): r["level"]
        for r in interval_concurrency(df, "s", "e").collect()
    }
    day2_start = base + dt.timedelta(hours=6)
    assert levels[(day2_start, 1)] == 1  # would be 0 if carry-in were lost


def test_hourly_peak_includes_inherited_plateau(spark):
    import datetime as dt

    s = dt.datetime(2024, 1, 1, 10, 30)
    # session runs 10:30-11:10; hour 11 contains ONLY the end event,
    # so its peak must come from the pre-event level (1), not the
    # post-event level (0)
    df = spark.createDataFrame([Row(s=s, e=s + dt.timedelta(minutes=40))])
    got = {r["hour"].hour: r["peak"] for r in hourly_max_concurrency(df, "s", "e").collect()}
    assert got == {10: 1, 11: 1}


# ---------------------------------------------------------------------------
# grouped regression
# ---------------------------------------------------------------------------


def test_grouped_regression_matches_closed_form(spark):
    pts = [(1, 3), (2, 5), (3, 7), (4, 9)]  # exactly y = 2x + 1
    noisy = [(1, 2), (2, 5), (3, 5), (4, 9), (5, 10)]
    rows = [Row(g="exact", x=x, y=y) for x, y in pts]
    rows += [Row(g="noisy", x=x, y=y) for x, y in noisy]
    rows += [Row(g="degenerate", x=7, y=1), Row(g="degenerate", x=7, y=5)]
    df = spark.createDataFrame(rows)
    got = {r["g"]: r for r in grouped_regression(df, "g", "x", "y").collect()}
    assert got["exact"]["slope"] == 2.0
    assert got["exact"]["intercept"] == 1.0
    assert got["exact"]["r2"] == 1.0
    n = len(noisy)
    sx = sum(x for x, _ in noisy)
    sy = sum(y for _, y in noisy)
    sxy = sum(x * y for x, y in noisy)
    sxx = sum(x * x for x, _ in noisy)
    syy = sum(y * y for _, y in noisy)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(got["noisy"]["slope"] - slope) < 1e-12
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert abs(got["noisy"]["r2"] - r2) < 1e-12
    assert got["degenerate"]["slope"] is None  # zero x-variance => NULL


def test_grouped_regression_overflow_raises_not_null(spark):
    # ADVICE r3: overflow must surface as an ERROR on the Spark side (as
    # DuckDB's HUGEINT does), never as silent NULLs.  Under Spark 4's
    # default ANSI mode the decimal sum itself raises ARITHMETIC_OVERFLOW;
    # with ansi.enabled=false the raise_error guard (n*max^2 >= 9.9e37)
    # fires instead.  Both paths are loud — assert each.
    import pytest

    big = 9 * 10**18  # near long max; big^2 = 8.1e37, n=2 -> 1.6e38 > bound
    df = spark.createDataFrame(
        [Row(g="o", x=big, y=1), Row(g="o", x=big - 1, y=2)]
    )
    with pytest.raises(Exception, match="(?i)overflow"):
        grouped_regression(df, "g", "x", "y").collect()
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with pytest.raises(Exception, match="(?i)overflow risk"):
            grouped_regression(df, "g", "x", "y").collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    # and well-bounded inputs are untouched by the guard
    ok = spark.createDataFrame([Row(g="s", x=1, y=2), Row(g="s", x=2, y=4)])
    assert grouped_regression(ok, "g", "x", "y").collect()[0]["slope"] == 2.0


# ---------------------------------------------------------------------------
# MAD outliers
# ---------------------------------------------------------------------------


def test_mad_outliers_matches_python_model(spark):
    vals = [10, 12, 11, 13, 12, 11, 10, 500, 12, 11]
    df = spark.createDataFrame([Row(g="s", v=v) for v in vals])
    r = mad_outliers(df, "g", "v", k=3.0).collect()[0]
    med = statistics.median(vals)
    mad = statistics.median([abs(v - med) for v in vals])
    assert r["med"] == med
    assert r["mad"] == mad
    want = sum(1 for v in vals if abs(v - med) > 3.0 * MAD_SIGMA * mad)
    assert r["n_outliers"] == want == 1


# ---------------------------------------------------------------------------
# quantized PageRank
# ---------------------------------------------------------------------------


def _py_pagerank_q(nodes, edges, iters=5, scale=10**9):
    edges = {(s, d) for s, d in edges if s != d}
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(nodes)
    base = (scale * 15 // 100) // n
    r = {v: scale // n for v in nodes}
    for _ in range(iters):
        nxt = {v: base for v in nodes}
        for s, d in edges:
            nxt[d] += r[s] * 85 // (outdeg[s] * 100)
        r = nxt
    return r


def test_pagerank_quantized_matches_python_model(spark):
    nodes = list(range(8))
    edges = [(i, (i + 1) % 8) for i in range(8)] + [(0, 4), (2, 4), (6, 4), (7, 0)]
    ndf = spark.createDataFrame([Row(id=v) for v in nodes])
    edf = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    got = {r["id"]: r["rank_q"] for r in pagerank_quantized(ndf, edf, iters=5).collect()}
    assert got == _py_pagerank_q(nodes, edges, iters=5)
    # hub node 4 (3 extra in-links) outranks pure-ring nodes (1, 3 have
    # only their single ring in-link); its sole successor 5 inherits the
    # hub's mass and may exceed it — both far above the ring floor
    assert got[4] > got[1] and got[4] > got[3]
    assert got[5] > got[1]


def test_pagerank_dangling_node_keeps_base_mass(spark):
    # node 2 has no out-edges: it receives, never sends (mass leaks — the
    # standard dangling variant); its rank must still be >= base
    ndf = spark.createDataFrame([Row(id=v) for v in [0, 1, 2]])
    edf = spark.createDataFrame([Row(src=0, dst=2), Row(src=1, dst=2), Row(src=0, dst=1)])
    got = {r["id"]: r["rank_q"] for r in pagerank_quantized(ndf, edf, iters=3).collect()}
    assert got[2] > got[0]
    base = (10**9 * 15 // 100) // 3
    assert got[0] == base  # no in-links at the fixpoint of this DAG


# ---------------------------------------------------------------------------
# BPE pair counts
# ---------------------------------------------------------------------------


def test_bpe_pair_counts_matches_counter(spark):
    texts = ["the cat sat", "the hat", "cat cat"]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = {(r["pair"], r["cnt"]) for r in bpe_pair_counts(df, "text", top=50).collect()}
    from collections import Counter

    words = Counter(w for t in texts for w in t.split())
    pairs = Counter()
    for w, c in words.items():
        for i in range(len(w) - 1):
            pairs[w[i : i + 2]] += c
    assert got == {(p, c) for p, c in pairs.items()}
    # 'at' appears in cat(x3 occurrences... weighted by word freq), hat, sat
    assert dict(got)["at"] == pairs["at"] == 5


# ---------------------------------------------------------------------------
# winnowing
# ---------------------------------------------------------------------------


def _py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MINHASH_P


def _py_minimizers(text, k=3, w=4):
    toks = [t for t in __import__("re").split("[^a-z]+", text.lower()) if t]
    if len(toks) < k:
        return set()
    hs = [_py_hash60(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)]
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}


def test_winnow_minimizers_match_python_model(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog today",
        "pack my box with five dozen liquor jugs right now",
        "short one",
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = {
        r["doc_id"]: set(r["m"])
        for r in df.select(
            "doc_id", winnow_minimizers(F.col("text"), 3, 4).alias("m")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_minimizers(t), f"doc {i}"


def test_winnow_shared_run_guarantees_shared_minimizer(spark):
    # two docs sharing a (w + k - 1) = 6-token run MUST share a minimizer
    shared = "alpha beta gamma delta epsilon zeta"
    texts = [
        f"one two three {shared} four five six",
        f"seven eight nine ten {shared} eleven",
        "nothing in common with those at all here",
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    pairs = {
        (r["id_a"], r["id_b"])
        for r in winnow_overlap_pairs(df, min_shared=1).collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_winnow_max_df_drops_boilerplate_buckets_keeps_rare_overlap(spark):
    # r4: the production df-cap. A boilerplate run shared by EVERY doc
    # must stop generating pairs once its minimizers exceed max_df, while
    # a genuine overlap between two docs (rare minimizers) survives.
    boiler = "all rights reserved contact us today"
    shared = "alpha beta gamma delta epsilon zeta"
    texts = [f"{boiler} doc{i} filler{i} words{i} here{i}" for i in range(6)]
    texts[0] = f"{boiler} {shared} unique0 tail0"
    texts[1] = f"{boiler} {shared} unique1 tail1"
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    capped = {
        (r["id_a"], r["id_b"])
        for r in winnow_overlap_pairs(df, min_shared=1, max_df=3).collect()
    }
    # the genuine rare overlap survives the cap...
    assert (0, 1) in capped
    # ...while boilerplate-only pairs (e.g. docs 2-5) are gone
    assert not any(a >= 2 and b >= 2 for a, b in capped)
    # uncapped, boilerplate connects everything — the quadratic bucket
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in winnow_overlap_pairs(df, min_shared=1).collect()
    }
    assert any(a >= 2 and b >= 2 for a, b in uncapped)


def test_winnow_window_cap_matches_groupby_count_cap(spark):
    # r13: the df-cap is applied as a window count over one exchange on
    # the minimizer key (one corpus scan) instead of a count-aggregate +
    # keep-join (which re-scanned + re-winnowed the corpus for the count
    # branch). Pin the equivalence: the shipped form must emit exactly
    # the pairs of an inline groupBy-count reference, including the
    # shared counts, on a corpus with both hot (df > cap) and rare
    # minimizers.
    boiler = "all rights reserved contact us today"
    shared = "alpha beta gamma delta epsilon zeta"
    texts = [f"{boiler} doc{i} filler{i} words{i} here{i}" for i in range(6)]
    texts[0] = f"{boiler} {shared} unique0 tail0"
    texts[1] = f"{boiler} {shared} unique1 tail1"
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    max_df = 3
    got = {
        (r["id_a"], r["id_b"], r["shared"])
        for r in winnow_overlap_pairs(df, min_shared=1, max_df=max_df).collect()
    }
    # reference: the pre-r13 formulation, groupBy count + keep join
    fps = df.select(
        F.col("doc_id").alias("id"),
        F.explode(winnow_minimizers(F.col("text"), 3, 4)).alias("m"),
    )
    keep = (
        fps.groupBy("m")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("m")
    )
    kept = fps.join(keep, "m")
    a, b = kept.alias("a"), kept.alias("b")
    want = {
        (r["id_a"], r["id_b"], r["shared"])
        for r in (
            a.join(b, (F.col("a.m") == F.col("b.m")) & (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("shared"))
            .filter(F.col("shared") >= 1)
            .collect()
        )
    }
    assert got == want and got


# ---------------------------------------------------------------------------
# duplicate spans
# ---------------------------------------------------------------------------


def test_duplicate_spans_finds_cross_doc_repeats(spark):
    span = "a b c d e f g h"  # exactly k=8 tokens
    texts = [
        f"start {span} end",
        f"other prefix {span}",
        "completely different text with no overlap at all whatsoever",
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = duplicate_spans(df, k=8, top=10).collect()
    assert len(got) == 1
    assert got[0]["n_docs"] == 2
    assert got[0]["n_occ"] == 2
    assert got[0]["first_doc"] == 0
    assert got[0]["span_hash"] == _py_hash60(span.replace("a b", "a b"))  # sanity below
    assert got[0]["span_hash"] == _py_hash60(span) % MINHASH_P == _py_hash60(span)


# ---------------------------------------------------------------------------
# inverted index
# ---------------------------------------------------------------------------


def test_inverted_index_caps_postings_and_counts(spark):
    rows = []
    for d in range(30):
        rows.append(Row(doc_id=d, text="common common word" + (" rare" if d == 0 else "")))
    df = spark.createDataFrame(rows)
    got = {r["term"]: r for r in inverted_index(df, min_df=1, top_terms=10, postings_cap=5).collect()}
    assert got["common"]["df"] == 30
    assert got["common"]["cf"] == 60  # tf 2 per doc
    assert got["common"]["postings"] == "0,1,2,3,4"  # capped to 5 lowest ids
    assert got["rare"]["df"] == 1 and got["rare"]["postings"] == "0"
    # ordering: df desc then term asc
    first = inverted_index(df, min_df=1, top_terms=10, postings_cap=5).collect()[0]
    assert first["term"] == "common"


# ---------------------------------------------------------------------------
# global rank / quantile buckets
# ---------------------------------------------------------------------------


def test_global_rank_matches_sorted_order(spark):
    import random

    rnd = random.Random(7)
    vals = [(i, rnd.randint(0, 100)) for i in range(500)]
    df = spark.createDataFrame([Row(id=i, v=v) for i, v in vals])
    from bacon_spark.operators.ranking import global_rank

    got = {
        r["id"]: r["rank"]
        for r in global_rank(df, [F.desc("v"), F.asc("id")], num_partitions=7).collect()
    }
    want = {
        i: rank + 1
        for rank, (i, _) in enumerate(sorted(vals, key=lambda t: (-t[1], t[0])))
    }
    assert got == want
    # ranks are a permutation of 1..n (no gaps/dups from offset stitching)
    assert sorted(got.values()) == list(range(1, 501))


def test_global_rank_single_partition_edge(spark):
    df = spark.createDataFrame([Row(id=1, v=5), Row(id=2, v=3)])
    from bacon_spark.operators.ranking import global_rank

    got = {r["id"]: r["rank"] for r in global_rank(df, ["v"], num_partitions=1).collect()}
    assert got == {2: 1, 1: 2}


def test_quantile_buckets_ties_share_bucket(spark):
    from bacon_spark.operators.ranking import quantile_buckets

    df = spark.createDataFrame([Row(v=x) for x in [1, 1, 1, 1, 2, 2, 3, 4, 5, 100]])
    got = quantile_buckets(df, "v", n_buckets=4).collect()
    by_val = {}
    for r in got:
        by_val.setdefault(r["v"], set()).add(r["bucket"])
    # equal values NEVER straddle buckets (the anti-ntile property)
    assert all(len(b) == 1 for b in by_val.values())
    # monotone: higher value => bucket >=
    vals = sorted(by_val)
    bks = [next(iter(by_val[v])) for v in vals]
    assert bks == sorted(bks)
    assert bks[-1] == 4  # the max lands in the top bucket


# ---------------------------------------------------------------------------
# batch 3: SCD2 / multiset ops / JSON round-trip
# ---------------------------------------------------------------------------


def test_scd2_intervals_chain(spark):
    import datetime as dt

    from bacon_spark.queries import QUERIES

    rows = QUERIES["q113_scd2_intervals"](spark, "/root/testdata/sf0.001").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, rs in by_user.items():
        # exactly one open row per user, and it is the last one
        opens = [r for r in rs if r["valid_to"] == "current"]
        assert len(opens) == 1, uid
        assert rs[-1]["valid_to"] == "current"
        # each row's valid_to equals the next row's valid_from (no gaps)
        for prev, nxt in zip(rs, rs[1:]):
            assert prev["valid_to"] == nxt["valid_from"]


def test_multiset_ops_match_counter_model(spark):
    from collections import Counter

    from pyspark.sql import Row

    c = spark.createDataFrame([Row(nk=x) for x in [1, 1, 1, 2, 2, 3]])
    s = spark.createDataFrame([Row(nk=x) for x in [1, 2, 2, 2, 4]])
    inter = Counter(r["nk"] for r in c.intersectAll(s).collect())
    exc = Counter(r["nk"] for r in c.exceptAll(s).collect())
    ca, sa = Counter([1, 1, 1, 2, 2, 3]), Counter([1, 2, 2, 2, 4])
    assert inter == Counter({k: min(v, sa[k]) for k, v in ca.items() if k in sa})
    assert exc == Counter({k: v - sa.get(k, 0) for k, v in ca.items() if v > sa.get(k, 0)})


def test_json_roundtrip_survives_hostile_strings(spark):
    from pyspark.sql import Row

    hostile = ['he said "hi"', "back\\slash", "emoji ☃", "new\nline", "tab\there"]
    df = spark.createDataFrame([Row(k=1, t=t, v=i) for i, t in enumerate(hostile)])
    packed = df.groupBy("k").agg(
        F.to_json(F.collect_list(F.struct(F.col("t"), F.col("v")))).alias("doc")
    )
    back = packed.select(
        F.explode(F.from_json("doc", "array<struct<t: string, v: long>>")).alias("i")
    ).select("i.t", "i.v")
    got = {(r["t"], r["v"]) for r in back.collect()}
    assert got == {(t, i) for i, t in enumerate(hostile)}


# ---------------------------------------------------------------------------
# salted skew join / spelling variants
# ---------------------------------------------------------------------------


def test_salted_join_identical_to_plain_join_under_skew(spark):
    import random

    from bacon_spark.operators.scale import salted_join

    rnd = random.Random(11)
    # 90% of fact rows on one hot key
    facts = [Row(k=(7 if rnd.random() < 0.9 else rnd.randint(0, 50)), v=i) for i in range(2000)]
    dims = [Row(k=k, attr=k * 10) for k in range(0, 51)]
    fdf, ddf = spark.createDataFrame(facts), spark.createDataFrame(dims)
    plain = fdf.join(ddf, "k").groupBy("k", "attr").count()
    salted = salted_join(fdf, ddf, "k", salt_buckets=8).groupBy("k", "attr").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key_over_salts(spark):
    from bacon_spark.operators.scale import salted_join

    fdf = spark.createDataFrame([Row(k=1, v=i) for i in range(400)])
    ddf = spark.createDataFrame([Row(k=1, attr="x")])
    plan = (
        salted_join(fdf, ddf, "k", salt_buckets=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the physical join keys must include the salt column
    assert "_salt" in plan


def test_spelling_variants_blocked_model(spark):
    texts = [
        "the filter filter column column colum colum pipeline",
        "another filter text with colum again",
    ]
    df = spark.createDataFrame([Row(text=t) for t in texts])
    from bacon_spark.llm.text import spelling_variant_pairs

    got = {
        (r["word_a"], r["word_b"]): r["dist"]
        for r in spelling_variant_pairs(df, min_len=4, min_count=2, max_dist=1).collect()
    }
    # colum <-> column: distance 1, same first char, len diff 1, both >=2
    assert got == {("colum", "column"): 1}


def test_spelling_variants_insertion_pair_longer_sorts_first(spark):
    # regression (ADVICE r3): insertion pairs whose LONGER word sorts
    # lexicographically BEFORE the shorter were dropped by the old
    # `len-diff BETWEEN 0 AND 1 AND a.w < b.w` dedup — neither join
    # orientation satisfied both conditions.  'abcde' (5 chars) < 'abde'
    # (4 chars) lexicographically, levenshtein = 1 (insert 'c'): the pair
    # must now appear, oriented shorter-first.
    from bacon_spark.llm.text import spelling_variant_pairs

    texts = ["abde abde abcde abcde", "abde abcde pipeline pipeline"]
    df = spark.createDataFrame([Row(text=t) for t in texts])
    got = {
        (r["word_a"], r["word_b"]): r["dist"]
        for r in spelling_variant_pairs(df, min_len=4, min_count=2, max_dist=1).collect()
    }
    assert got.get(("abde", "abcde")) == 1
    # and no duplicate reversed orientation
    assert ("abcde", "abde") not in got


# ---------------------------------------------------------------------------
# LTTB downsampling (applyInPandas grouped map)
# ---------------------------------------------------------------------------


def _py_lttb(points, n_out):
    """Independent scalar-loop LTTB reference (Steinarsson 2013)."""
    n = len(points)
    if n <= n_out:
        return list(points)
    import math

    bounds = []
    for i in range(n_out - 1):
        bounds.append(round(1 + i * (n - 2) / (n_out - 2)))
    # replicate numpy.linspace(1, n-1, n_out-1).astype(int64)
    bounds = [int(1 + i * ((n - 1) - 1) / (n_out - 2)) for i in range(n_out - 1)]
    picked = [0]
    prev = 0
    for i in range(n_out - 2):
        lo, hi = bounds[i], bounds[i + 1]
        nlo, nhi = (hi, n) if i == n_out - 3 else (hi, min(bounds[i + 2], n))
        avg_t = sum(p[0] for p in points[nlo:nhi]) / (nhi - nlo)
        avg_v = sum(p[1] for p in points[nlo:nhi]) / (nhi - nlo)
        best, best_area = lo, -1.0
        tp, vp = points[prev]
        for j in range(lo, hi):
            tj, vj = points[j]
            area = abs((tp - avg_t) * (vj - vp) - (tp - tj) * (avg_v - vp))
            if area > best_area:
                best, best_area = j, area
        picked.append(best)
        prev = best
    picked.append(n - 1)
    return [points[j] for j in picked]


def test_lttb_matches_scalar_reference(spark):
    import random

    from bacon_spark.operators.timeseries import lttb_downsample

    rnd = random.Random(5)
    series = {k: [(t, round(rnd.uniform(-50, 50), 3)) for t in range(200)] for k in (1, 2)}
    rows = [Row(k=k, t=t, v=v) for k, pts in series.items() for t, v in pts]
    df = spark.createDataFrame(rows)
    got = {}
    for r in lttb_downsample(df, "k", "t", "v", n_out=24).collect():
        got.setdefault(r["k"], []).append((r["t"], r["v"]))
    for k, pts in series.items():
        gpts = sorted(got[k])
        want = _py_lttb(pts, 24)
        assert len(gpts) == 24
        assert gpts[0] == pts[0] and gpts[-1] == pts[-1]  # endpoints kept
        assert gpts == sorted(want)


def test_lttb_short_series_passthrough(spark):
    from bacon_spark.operators.timeseries import lttb_downsample

    df = spark.createDataFrame([Row(k=1, t=t, v=float(t)) for t in range(5)])
    got = sorted((r["t"], r["v"]) for r in lttb_downsample(df, "k", "t", "v", n_out=50).collect())
    assert got == [(t, float(t)) for t in range(5)]


# ---------------------------------------------------------------------------
# time-weighted average semantics
# ---------------------------------------------------------------------------


def test_twa_weights_by_holding_time(spark):
    import datetime as dt

    from bacon_spark.queries import QUERIES  # noqa: F401  (pattern parity)

    from pyspark.sql import Window

    base = dt.datetime(2024, 1, 1)
    # value 100 held 1 min, value 0 held 9 min, final event opens no hold
    rows = [
        Row(user_id=1, event_id=1, ts=base, value=1.0),
        Row(user_id=1, event_id=2, ts=base + dt.timedelta(minutes=1), value=0.0),
        Row(user_id=1, event_id=3, ts=base + dt.timedelta(minutes=10), value=999.0),
    ]
    df = spark.createDataFrame(rows)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = df.select(
        "user_id",
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    got = d.groupBy("user_id").agg(
        (F.sum(F.col("cents") * F.col("dur_us")) / F.sum("dur_us")).alias("twa")
    ).collect()[0]["twa"]
    # (100 cents * 1 min + 0 * 9 min) / 10 min = 10 cents; the 999 value
    # opened no holding interval and must not contribute
    assert got == 10.0


# ---------------------------------------------------------------------------
# randomized differential sweeps (seeded; Spark-session-friendly loops)
# ---------------------------------------------------------------------------


def test_interval_concurrency_randomized_vs_model(spark):
    import datetime as dt
    import random

    rnd = random.Random(99)
    base = dt.datetime(2024, 5, 1)
    for trial in range(3):
        intervals = []
        for _ in range(120):
            start = base + dt.timedelta(
                hours=rnd.uniform(0, 96)  # spans 4 day-chunks
            )
            intervals.append(
                (start, start + dt.timedelta(minutes=rnd.uniform(1, 2000)))
            )
        df = spark.createDataFrame([Row(s=s, e=e) for s, e in intervals])
        got = {
            r["hour"]: (r["peak"], r["n_starts"])
            for r in hourly_max_concurrency(df, "s", "e").collect()
        }
        want = _py_hourly_peaks(
            [(s.replace(microsecond=s.microsecond), e) for s, e in intervals]
        )
        assert got == want, f"trial {trial}"


def test_global_rank_randomized_partitions(spark):
    import random

    from bacon_spark.operators.ranking import global_rank

    rnd = random.Random(3)
    for parts in (2, 5, 13):
        vals = [(i, rnd.randint(-1000, 1000)) for i in range(300)]
        df = spark.createDataFrame([Row(id=i, v=v) for i, v in vals])
        got = {
            r["id"]: r["rank"]
            for r in global_rank(df, ["v", "id"], num_partitions=parts).collect()
        }
        want = {
            i: rk + 1
            for rk, (i, _) in enumerate(sorted(vals, key=lambda t: (t[1], t[0])))
        }
        assert got == want, f"parts={parts}"


def test_ewma_randomized_vs_model(spark):
    import random

    rnd = random.Random(17)
    for depth in (3, 8):
        series = {k: [rnd.randint(-500, 500) for _ in range(rnd.randint(1, 40))] for k in range(4)}
        rows = [
            Row(k=k, o=i, v=v) for k, vs in series.items() for i, v in enumerate(vs)
        ]
        df = spark.createDataFrame(rows)
        got = {
            (r["k"], r["o"]): r["ewma"]
            for r in dyadic_ewma(df, "k", ["o"], "v", depth=depth).collect()
        }
        for k, vs in series.items():
            want = _py_ewma(vs, depth=depth)
            for i, wv in enumerate(want):
                assert got[(k, i)] == wv, (k, i, depth)


def test_duplicate_spans_randomized_vs_model(spark):
    import random
    from collections import defaultdict

    rnd = random.Random(23)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    texts = [
        " ".join(rnd.choice(vocab) for _ in range(rnd.randint(0, 30)))
        for _ in range(40)
    ]
    k = 4
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = {
        r["span_hash"]: (r["n_docs"], r["n_occ"], r["first_doc"])
        for r in duplicate_spans(df, k=k, top=1000).collect()
    }
    occ = defaultdict(list)
    for d, t in enumerate(texts):
        toks = t.split()
        for i in range(len(toks) - k + 1):
            occ[_py_hash60(" ".join(toks[i : i + k]))].append(d)
    want = {
        h: (len(set(ds)), len(ds), min(ds))
        for h, ds in occ.items()
        if len(set(ds)) > 1
    }
    assert got == want


# ---------------------------------------------------------------------------
# bloom prefilter / temperature mixture
# ---------------------------------------------------------------------------


def test_bloom_prefilter_equals_exact_probe(spark):
    import random

    from bacon_spark.llm.decontam import contaminated_ids, contaminated_ids_bloom

    rnd = random.Random(31)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rnd.choice(vocab) for _ in range(rnd.randint(4, 25)))
        for _ in range(60)
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    ev = df.filter(F.col("doc_id") % 7 == 0)
    tr = df.filter(F.col("doc_id") % 7 != 0)
    exact = {r["doc_id"] for r in contaminated_ids(tr, ev, k=3).collect()}
    bloom = {r["doc_id"] for r in contaminated_ids_bloom(tr, ev, k=3).collect()}
    assert bloom == exact  # no false negatives, verify kills false positives


def test_temperature_rates_alpha_half_rule(spark):
    from bacon_spark.operators.sampling import temperature_rates

    counts = spark.createDataFrame(
        [Row(source="big", cnt=10000), Row(source="mid", cnt=2500), Row(source="rare", cnt=100)]
    )
    got = {r["source"]: r["rate_ppm"] for r in temperature_rates(counts).collect()}
    # smallest keeps everything; dominant sources downsample by sqrt share
    assert got["rare"] == 1_000_000
    assert got["mid"] == 200_000   # sqrt(100/2500)  = 0.2
    assert got["big"] == 100_000   # sqrt(100/10000) = 0.1
    counts2 = spark.createDataFrame(
        [Row(source="a", cnt=100), Row(source="b", cnt=400)]
    )
    got2 = {r["source"]: r["rate_ppm"] for r in temperature_rates(counts2).collect()}
    assert got2 == {"a": 1_000_000, "b": 500_000}  # sqrt(1/4) = 1/2

    import pytest

    with pytest.raises(ValueError):
        temperature_rates(counts, alpha=0.7)


# ---------------------------------------------------------------------------
# prefix-filtered exact Jaccard join
# ---------------------------------------------------------------------------


def test_prefix_filter_loses_no_pairs_randomized(spark):
    import itertools
    import random

    from bacon_spark.llm.dedup import prefix_filtered_jaccard_join

    rnd = random.Random(41)
    # alphabetic-only vocab: the engine tokenizer splits on [^a-z]+, so
    # digit-bearing tokens would all collapse to the same word
    vocab = [a + b for a in "abcde" for b in "abcdef"]
    docs = {
        i: sorted(rnd.sample(vocab, rnd.randint(3, 12))) for i in range(80)
    }
    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(ts)) for i, ts in docs.items()]
    )
    for t in (0.5, 0.8):
        got = {
            (r["id_a"], r["id_b"]): r["jacc"]
            for r in prefix_filtered_jaccard_join(df, threshold=t).collect()
        }
        want = {}
        for a, b in itertools.combinations(sorted(docs), 2):
            sa, sb = set(docs[a]), set(docs[b])
            j = len(sa & sb) / len(sa | sb)
            if j >= t:
                want[(a, b)] = round(j, 6)
        assert got == want, f"threshold {t}"


# ---------------------------------------------------------------------------
# count-min sketch prefilter property
# ---------------------------------------------------------------------------


def test_cm_sketch_never_underestimates(spark):
    import random
    from collections import Counter

    rnd = random.Random(47)
    words = [rnd.choice(["hot"] * 50 + [f"w{i}" for i in range(200)]) for _ in range(5000)]
    true = Counter(words)
    df = spark.createDataFrame([Row(tok=w) for w in words])
    d, wdt = 4, 512  # small width: force collisions so the bound is non-trivial

    def cell(i):
        return F.pmod(F.xxhash64(F.lit(f"cm{i}"), F.col("tok")), F.lit(wdt))

    cells = df.select(
        F.explode(
            F.array(*[F.struct(F.lit(i).alias("row"), cell(i).alias("col")) for i in range(d)])
        ).alias("c")
    ).select("c.row", "c.col")
    counters = cells.groupBy("row", "col").agg(F.count(F.lit(1)).alias("n")).collect()
    tables = [[0] * wdt for _ in range(d)]
    for r in counters:
        tables[r["row"]][r["col"]] = r["n"]
    lits = [F.lit(t) for t in tables]
    est_col = F.least(
        *[
            F.element_at(lits[i], (cell(i) + 1).cast("int"))
            for i in range(d)
        ]
    )
    est = {
        r["tok"]: r["est"]
        for r in df.select("tok").distinct().withColumn("est", est_col).collect()
    }
    for tok, n in true.items():
        assert est[tok] >= n, tok  # the CM one-sided error guarantee
    # and the hot token's estimate is tight enough to be useful
    assert est["hot"] < true["hot"] * 2
