"""Data-profiling operators: the quality-dashboard aggregates every
large corpus pipeline runs before and after each processing stage
(nulls crept in? value drift? distribution shape changed?).

Everything is a plain partially-combined aggregate — one shuffle of
(bin|column, partial-state) rows however large the table — and every
number is derived with engine-portable arithmetic so the profiles are
oracle-checkable, not just plausible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["value_histogram", "numeric_profile"]


def value_histogram(
    df: DataFrame,
    col: str,
    bin_width: float,
    group_col: str | None = None,
) -> DataFrame:
    """Fixed-width histogram of a numeric column: one row per non-empty
    bin, ``bin_start = floor(value / bin_width) * bin_width`` (pure
    IEEE ops, identical in any engine; nulls excluded). Optionally
    grouped. Returns (group_col?, bin_start, n).

    100 TB shape: a single map-side-combined aggregate keyed on the
    bin — the shuffle carries one row per distinct bin per partition,
    never the values; this is the profile you can afford on every
    pipeline stage."""
    if not bin_width > 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    bin_start = (
        F.floor(F.col(col) / F.lit(float(bin_width)))
        * F.lit(float(bin_width))
    ).alias("bin_start")
    keys = ([group_col] if group_col else []) + ["bin_start"]
    return (
        df.filter(F.col(col).isNotNull())
        .select(*([group_col] if group_col else []), bin_start)
        .groupBy(*keys)
        .agg(F.count("*").alias("n"))
    )


def numeric_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column summary profile: (column, n, n_null, min, max, mean,
    stddev) — one row per requested column, computed in ONE pass over
    the table (a single aggregate projecting every column's partial
    states; the per-column rows come from an unpivot of that one-row
    result, so the table is never rescanned per column). mean/stddev
    (sample) round to 6 decimals to absorb summation-order ulps."""
    if not cols:
        raise ValueError("cols must name at least one column")
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"_n_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nn_{c}"),
            F.min(c).alias(f"_mn_{c}"),
            F.max(c).alias(f"_mx_{c}"),
            F.round(F.avg(c), 6).alias(f"_av_{c}"),
            F.round(F.stddev_samp(c), 6).alias(f"_sd_{c}"),
        ]
    one = df.agg(*aggs)
    pieces = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"_n_{c}").alias("n"),
            F.col(f"_nn_{c}").alias("n_null"),
            F.col(f"_mn_{c}").cast("double").alias("min"),
            F.col(f"_mx_{c}").cast("double").alias("max"),
            F.col(f"_av_{c}").alias("mean"),
            F.col(f"_sd_{c}").alias("stddev"),
        )
        for c in cols
    ]
    return one.select(
        F.explode(F.array(*pieces)).alias("_p")
    ).select("_p.*")
