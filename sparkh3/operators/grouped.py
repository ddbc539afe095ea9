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


def grouping_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: list,
    kind: str = "cube",
    all_label: str = "ALL",
) -> DataFrame:
    """Multi-grain aggregate over grouping sets (``kind`` = 'cube' —
    every key subset — or 'rollup' — hierarchical prefixes).

    Spark's Expand operator computes EVERY grain in one pass: each
    input row is replicated per grouping set map-side, then a single
    partial+final hash aggregate runs over the union — one shuffle for
    all grains, vs one scan+shuffle per grain if the caller looped.
    That is the 100 TB shape: a cube over g grains costs one g-times
    fan-out of the (already projected) agg input, not g table scans.

    Output: the key columns with subtotal rows labeled ``all_label``
    (string keys only; rows from finer grains keep their values), a
    ``gid`` bitmask (leftmost key = most significant bit, 1 = the key
    is aggregated away at this grain — Spark's ``grouping_id`` order),
    then the caller's aggregate columns.

    The reference has no grouping-set analog (SURVEY §2.3 notes the
    gap); hierarchical resolution rollups there are chained
    h3_to_parent_aggregate calls — `grouping_aggregate` is the one-pass
    relational generalization.
    """
    from pyspark.sql import functions as F

    if kind == "cube":
        grouped = df.cube(*keys)
    elif kind == "rollup":
        grouped = df.rollup(*keys)
    else:
        raise ValueError(f"kind must be 'cube' or 'rollup', got {kind!r}")
    out = grouped.agg(
        F.grouping_id(*[F.col(k) for k in keys]).alias("gid"), *aggs
    )
    agg_names = [c for c in out.columns if c not in keys and c != "gid"]
    # label from the gid BIT, not from nullness: a genuine NULL data
    # value at a fine grain must stay NULL, not masquerade as the
    # subtotal label
    n = len(keys)
    labeled = [
        F.when(
            F.shiftright(F.col("gid"), n - 1 - i).bitwiseAND(F.lit(1)) == 1,
            F.lit(all_label),
        )
        .otherwise(F.col(k).cast("string"))
        .alias(k)
        for i, k in enumerate(keys)
    ]
    return out.select(
        *labeled,
        F.col("gid").cast("long").alias("gid"),
        *agg_names,
    )
