"""Query inventory: every operator from SURVEY §2 as a (Spark query, DuckDB
oracle SQL) pair, keyed by name. The driver runs both at sf0.01 and
hash-compares sorted values, so:

* every computed column is aliased IDENTICALLY on both sides;
* floating-point aggregates are made cross-engine deterministic by summing
  in exact DECIMAL, casting the exact sum to double, and only then
  rounding/dividing (IEEE double ops on identical inputs are bit-identical);
* group keys avoid raw timestamps (date or formatted string instead) to
  dodge tz-representation differences.

Queries go through the engine (CubeDef/CubeQuery/CuttingBoard) wherever the
operator under test lives there, so the oracle gate exercises the real
execution path, not a parallel hand-written plan.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..accumulators import (
    Average,
    Count,
    CountDistinct,
    Group,
    Max,
    Min,
    RatioSum,
    SketchDistinct,
    SketchPercentile,
    StdDev,
    Sum,
    Union,
)
from ..cubedef import (
    CubeDef,
    DayLabel,
    DOYLabel,
    HourLabel,
    IntLabel,
    ISOWeekNumLabel,
    ISOYearLabel,
    Label,
    Measure,
    MonthdayLabel,
    MonthLabel,
    MonthOfYearLabel,
    QuarterLabel,
    QuarterNumLabel,
    SetLabel,
    WeekdayLabel,
    WeekLabel,
    YearLabel,
)
from ..cubequery import CubeQuery
from ..engine import CuttingBoard
from ..sources.star import sales_fact

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _ensure_workers_import(spark: SparkSession) -> None:
    """Python workers (mapInPandas / pandas UDFs / applyInPandasWithState)
    deserialize functions by module reference; if the harness process was
    not launched from the repo root, executors cannot import bacon_spark.
    Ship the package once per session via addPyFile (a zip of the repo's
    bacon_spark/)."""
    sc = spark.sparkContext
    if getattr(sc, "_bacon_spark_shipped", False):
        return
    import os
    import tempfile
    import zipfile

    # the PACKAGE root, not this file's directory — this helper lives in
    # the gate/ subpackage since the r4 split, and zipping gate/ as
    # "bacon_spark" shipped workers a fake package whose relative imports
    # broke ("attempted relative import beyond top-level package")
    import bacon_spark

    pkg_dir = os.path.dirname(os.path.abspath(bacon_spark.__file__))
    # CONTENT-ADDRESSED path (round 13): a fixed /tmp name raced when
    # several harness shards started at once — each rewrote the zip while
    # another session's executors were still reading it, and Spark fails
    # a task whose downloaded copy mismatches ("exists and does not match
    # contents"). Hash-named + put-if-absent means an existing zip is
    # NEVER rewritten, so every session's addPyFile target is immutable.
    import hashlib
    import io

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for root, dirs, files in os.walk(pkg_dir):
            dirs.sort()  # deterministic walk -> identical zip bytes per tree
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join("bacon_spark", os.path.relpath(full, pkg_dir))
                    z.write(full, rel)
    data = buf.getvalue()
    digest = hashlib.md5(data).hexdigest()[:12]
    zpath = os.path.join(tempfile.gettempdir(), f"bacon_spark_pkg-{digest}.zip")
    if not os.path.exists(zpath):
        tmp = zpath + f".tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        try:
            os.link(tmp, zpath)  # put-if-absent: a racing writer keeps its copy
        except FileExistsError:
            pass
        finally:
            os.remove(tmp)
    sc.addPyFile(zpath)
    sc._bacon_spark_shipped = True


def query(name: str, oracle: str | None = None, prepare=None):
    """Register a gate query (and its DuckDB oracle). *prepare*, when
    given, is a ``(spark, sf_dir) -> None`` hook for ONCE-PER-INGEST
    work the query depends on but that is not part of its per-query
    cost model (e.g. q169's ANN index build): ``bench.py`` runs every
    query's prepare untimed before the timed pass, mirroring production
    where an index is built at ingest and amortized over thousands of
    queries. The query itself must still self-prepare when the artifact
    is absent (idempotent build-if-missing) so correctness harnesses
    need no special handling."""

    def deco(fn):
        def wrapped(spark, sf_dir, _fn=fn):
            _ensure_workers_import(spark)
            return _fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if prepare is not None:
            wrapped.prepare = prepare
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def dec(expr: str, scale: int = 4) -> str:
    """Exact-decimal cast for deterministic cross-engine sums."""
    return f"cast(({expr}) as decimal(38,{scale}))"


def finalize(df: DataFrame, rounds: dict[str, int] | None = None) -> DataFrame:
    """Cast decimal aggregates to double (rounded) for a stable oracle
    schema; leave other columns untouched."""
    rounds = rounds or {}
    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if f.name in rounds:
            cols.append(F.round(c.cast("double"), rounds[f.name]).alias(f.name))
        else:
            cols.append(c)
    return df.select(*cols)


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    from ..sources.star import read_table

    # oracle safety: timestamp rendering (date_format over the converted
    # events ts) is session-tz-sensitive; DuckDB is tz-naive. Pin UTC so
    # results don't depend on the harness session's configuration.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return read_table(spark, sf_dir, table)


def _read_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents, widened for CPU-bound expression work ONLY when the scan
    is narrow.

    The fixture ships documents as ONE parquet file -> one input partition
    -> one core for the md5-heavy text operators; widening buys full-width
    parallelism there. At real scale the corpus is thousands of files and
    ``widen`` returns the scan untouched — no Exchange, the bodies are
    never shuffled (plan-asserted in tests/test_plans.py)."""
    from ..operators.scale import widen

    return widen(_read(spark, sf_dir, "documents"))


def board(cd: CubeDef, df: DataFrame) -> CuttingBoard:
    return CuttingBoard(cd, df, cache_results=False)


def artifact_path(sf_dir: str, kind: str) -> str:
    """Per-dataset artifact cache dir (ANN indexes, token tables, ...),
    anchored on the STATE ROOT (utils/state.state_root: the checkout for
    repo runs, $SPARK_GRAFT_STATE_DIR or ~/.cache for wheel installs —
    the harness cwd varies, see tests/test_driver_contract.py) and keyed
    on the dataset path so sf dirs never share an artifact."""
    import hashlib
    import os

    from ..utils.state import state_root

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return os.path.join(state_root(), ".ann_index", f"{kind}-{key}")


def _token_prebuilt(spark: SparkSession, sf_dir: str) -> str:
    """Build-if-absent the corpus TOKEN TABLE artifact (llm/tokens_table:
    (doc_id, toks) + (tok, cnt) under one manifest commit) — the prepare
    hook shared by the n-gram / heavy-hitter gate queries, so each pays
    probe cost only and the tokenize pass is billed once per ingest."""
    from ..llm.tokens_table import (
        ensure_ngram_synopsis,
        token_table_build,
        token_table_stale,
    )
    from ..operators.maintenance import read_manifest
    from ..utils.caching import release_caches

    path = artifact_path(sf_dir, "toks")
    # r10: a tokenizer-rev mismatch invalidates the stored toks THEMSELVES
    # — full rebuild from documents (new manifest version on the same
    # path; pinned readers keep their snapshot)
    if read_manifest(path) is None or token_table_stale(path):
        token_table_build(_read_docs(spark, sf_dir), path)
        release_caches()
    # r9: the n-gram synopsis rides the same artifact; a pre-synopsis or
    # pre-spec-rev build on disk upgrades in place from its stored toks
    # (no re-tokenize); undersized heads rebuild from stored gram tables
    elif ensure_ngram_synopsis(spark, path):
        release_caches()
    return path


# Shared aliased imports for the gate modules (each does
# `from ._base import *`; underscore names are exported via __all__).
from ..llm import dedup as _dd  # noqa: E402
from ..llm import similarity as _sim  # noqa: E402
from ..llm import text as _tx  # noqa: E402
from ..streaming import windows as _win  # noqa: E402
from ..llm import decontam as _decon  # noqa: E402
from ..operators import sampling as _samp  # noqa: E402
from ..operators import temporal as _temporal  # noqa: E402
from ..operators import scale as _scale  # noqa: E402
from ..operators import graph as _graph  # noqa: E402
from ..llm import ranking as _rank  # noqa: E402
from ..operators.packing import pack_chunks, pack_chunks_sql  # noqa: E402
from ..operators.profile import profile as _profile, profile_sql as _profile_sql  # noqa: E402
from ..operators.maintenance import zorder_key, zorder_key_sql  # noqa: E402
from ..operators.sampling import dataset_split, dataset_split_sql  # noqa: E402
from ..operators.sampling import draw_sql as _draw_sql  # noqa: E402
from ..llm import importance as _imp  # noqa: E402
from ..operators.profile import histogram as _hist, histogram_sql as _hist_sql  # noqa: E402
from ..llm import lm as _lm  # noqa: E402
from ..llm import bpe as _bpe  # noqa: E402
from ..operators import stats as _stats  # noqa: E402
from ..operators import timeseries as _ts  # noqa: E402
from ..operators import ranking as _grank  # noqa: E402
from ..operators import sketch as _sk  # noqa: E402

__all__ = [
    "Average",
    "Count",
    "CountDistinct",
    "CubeDef",
    "CubeQuery",
    "CuttingBoard",
    "DOYLabel",
    "DataFrame",
    "DayLabel",
    "F",
    "Group",
    "HourLabel",
    "ISOWeekNumLabel",
    "ISOYearLabel",
    "IntLabel",
    "Label",
    "Max",
    "Measure",
    "Min",
    "MonthLabel",
    "MonthOfYearLabel",
    "MonthdayLabel",
    "ORACLES",
    "QUERIES",
    "QuarterLabel",
    "QuarterNumLabel",
    "RatioSum",
    "SetLabel",
    "SketchDistinct",
    "SketchPercentile",
    "SparkSession",
    "StdDev",
    "Sum",
    "Union",
    "WeekLabel",
    "WeekdayLabel",
    "YearLabel",
    "_bpe",
    "_dd",
    "_decon",
    "_draw_sql",
    "_ensure_workers_import",
    "_grank",
    "_graph",
    "_hist",
    "_hist_sql",
    "_imp",
    "_lm",
    "_profile",
    "_profile_sql",
    "_rank",
    "_read",
    "_read_docs",
    "_token_prebuilt",
    "artifact_path",
    "_samp",
    "_scale",
    "_sim",
    "_sk",
    "_stats",
    "_temporal",
    "_ts",
    "_tx",
    "_win",
    "board",
    "dataset_split",
    "dataset_split_sql",
    "dec",
    "dt",
    "finalize",
    "pack_chunks",
    "pack_chunks_sql",
    "query",
    "sales_fact",
    "zorder_key",
    "zorder_key_sql",
]
