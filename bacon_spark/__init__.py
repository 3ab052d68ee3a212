"""bacon_spark: a PySpark-native OLAP cube engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of GambitResearch/bacon (reference at /root/reference/, studied
for semantics only): CubeDef schemas (labels/measures/hierarchies),
immutable CubeQuery logical plans, a CuttingBoard executor that compiles
queries to DataFrame plans Catalyst optimizes, a URL query DSL, interactive
navigation, table/pivot/CSV/JSON renderers — plus scale-out extensions the
reference lacks: star-schema joins, streaming windows, and LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).
"""

from .accumulators import (
    Average,
    CollectSet,
    Count,
    CountDistinct,
    Group,
    LabeledAcc,
    Max,
    Min,
    RatioSum,
    SketchDistinct,
    SketchPercentile,
    StdDev,
    Sum,
    Union,
)
from .cubedef import (
    BoolLabel,
    CubeDef,
    DateLabel,
    DatetimeLabel,
    DayLabel,
    DOYLabel,
    FloatLabel,
    HourLabel,
    IntLabel,
    JsonLabel,
    ISOWeekNumLabel,
    ISOYearLabel,
    Label,
    Measure,
    MonthdayLabel,
    MonthLabel,
    MonthOfYearLabel,
    NullableLabel,
    QuarterLabel,
    QuarterNumLabel,
    RatioMeasure,
    SetLabel,
    WeekdayLabel,
    WeekLabel,
    YearLabel,
)
from .cubequery import CubeQuery
from .engine import CuttingBoard, Slice, SliceMatrix
from .errors import BaconSparkError, DataError, QueryError
from .utils.caching import managed_persist, release_caches

__version__ = "0.1.0"
