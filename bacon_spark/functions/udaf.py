"""Custom aggregates via Arrow-batched pandas_udf (GROUPED_AGG).

The escape hatch for aggregates Catalyst can't compose — the Spark analogue
of subclassing the reference's Accumulator (SURVEY §2.11,
/root/reference/bacon/accumulators.py:5-17). Use built-in expressions first
(accumulators.py); reach for these only when the math genuinely needs
whole-group access. Arrow batching keeps transfer vectorized (~10-100x a
row-at-a-time Python UDF).

NB: no ``from __future__ import annotations`` here — pandas_udf resolves
the type hints at decoration time and stringified annotations referencing
function-local imports break it.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def median_udaf(v: pd.Series) -> float:
    """Interpolated median (matches DuckDB/pandas semantics for doubles)."""
    return float(v.median())


@pandas_udf("double")
def geometric_mean_udaf(v: pd.Series) -> float:
    """Geometric mean of positive values (null on empty/nonpositive)."""
    import numpy as np

    pos = v[v > 0]
    if len(pos) == 0:
        return None
    return float(np.exp(np.log(pos.astype("float64")).mean()))
