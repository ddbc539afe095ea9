"""Arbitrary-Callable grouped aggregation (the reference accepts any
pandas-recognized callable as `operation`, h3pandas.py:453,496-497):
expressed as an applyInPandas grouped map — the Spark shape for custom
aggregates that built-in expressions can't express."""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType


def apply_in_pandas_aggregate(
    df: DataFrame,
    key_col: str,
    value_cols: list[str],
    fn: Callable[[pd.Series], float],
) -> DataFrame:
    """groupBy(key).agg(fn) for an arbitrary per-column callable."""
    key_field = df.schema[key_col]
    schema = StructType(
        [key_field] + [StructField(c, DoubleType()) for c in value_cols]
    )

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {key_col: [pdf[key_col].iloc[0]]}
        for c in value_cols:
            out[c] = [float(fn(pdf[c]))]
        return pd.DataFrame(out)

    return df.groupBy(key_col).applyInPandas(agg, schema)
