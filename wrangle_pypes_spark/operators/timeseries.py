"""Grouped time-series operators (the ``applyInPandas`` surface).

These are the ops that are genuinely RECURSIVE along the time axis —
each output depends on the previous output, so no window frame or
aggregate expresses them; the idiomatic Spark shape is a grouped-map
pandas function: one shuffle on the key, then a vectorized per-group
computation (state never leaves the group, groups parallelize across
executors; a single huge group is the scale limit, same as any
window-over-key).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def grouped_ewma(df: DataFrame, *, key_col: str, ts_col: str,
                 value_col: str, alpha: float = 0.3) -> DataFrame:
    """Exponentially-weighted moving average of ``value_col`` per key,
    ordered by ``ts_col``: ``ewma_t = alpha*x_t + (1-alpha)*ewma_{t-1}``.

    Output: (key, ts, value, ewma).  Deterministic: rows are sorted by
    (ts, value) inside each group before the recursion.
    """
    schema = T.StructType([
        df.schema[key_col], df.schema[ts_col], df.schema[value_col],
        T.StructField("ewma", T.DoubleType()),
    ])

    def _one_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, value_col], kind="mergesort")
        ewma = pdf[value_col].astype("float64").ewm(
            alpha=alpha, adjust=False).mean()
        return pd.DataFrame({
            key_col: pdf[key_col], ts_col: pdf[ts_col],
            value_col: pdf[value_col], "ewma": ewma,
        })

    return (df.select(key_col, ts_col, value_col)
            .groupBy(key_col).applyInPandas(_one_group, schema=schema))
