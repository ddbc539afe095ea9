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

__all__ = [
    "value_histogram",
    "numeric_profile",
    "group_trend_fit",
    "group_zscore",
]


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


def group_trend_fit(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-group ordinary-least-squares line fit (slope + intercept of
    y over x) in FIXED-POINT arithmetic: both inputs must already be
    integer columns (quantize y upstream — e.g. round(value * 1000) —
    and keep x small, e.g. hours since the dataset minimum). All five
    sufficient statistics (n, Σx, Σy, Σx², Σxy) accumulate as exact
    int64 partial aggregates, so the shuffle carries five longs per
    group, the result is independent of partition order (unlike a
    float covariance accumulation), and the closing slope/intercept
    divisions are single exact-rounded IEEE ops — bit-identical in any
    engine. The closing products (n·Σx², Σx·Σx, n·Σxy, Σx·Σy) are
    computed in exact decimal(38,0) — as int64 they would silently
    wrap for large groups (n·Σxy exceeds 2^63 long before the int64
    SUMS do). Caller contract: each SUM must stay below 2^63, i.e.
    n·max|x·y| < 2^63 (the lane's x ≤ ~720, y ≤ ~10^6 allows n up to
    ~10^10 rows per group).

    Returns (group_col, n, slope, intercept), slope/intercept rounded
    to 9 decimals, null for degenerate groups (zero x-variance).
    """
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    g = df.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * x).alias("_sxx"),
        F.sum(x * y).alias("_sxy"),
    )
    # decimal(19,0) holds any int64; the (38,0) product is exact
    dn = g["n"].cast("decimal(19,0)")
    dsx = F.col("_sx").cast("decimal(19,0)")
    dsy = F.col("_sy").cast("decimal(19,0)")
    dsxx = F.col("_sxx").cast("decimal(19,0)")
    dsxy = F.col("_sxy").cast("decimal(19,0)")
    det = dn * dsxx - dsx * dsx
    slope = F.when(
        det != 0,
        F.round(
            (dn * dsxy - dsx * dsy).cast("double") / det.cast("double"),
            9,
        ),
    )
    intercept = F.when(
        det != 0,
        F.round(
            (
                F.col("_sy").cast("double")
                - slope * F.col("_sx").cast("double")
            )
            / g["n"].cast("double"),
            9,
        ),
    )
    return g.select(
        group_col,
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
    )


def group_zscore(
    df: DataFrame,
    value_col: str,
    group_col: str,
    threshold: float = 1.5,
) -> DataFrame:
    """Per-group z-score standardization + outlier flag over an INTEGER
    value column. The per-group mean and (sample) standard deviation
    are derived from exact int64 sufficient statistics (n, Σx, Σx²) —
    never from a float aggregate whose partition-order-dependent
    rounding would differ between engines — so
    ``z = (x − Σx/n) / sqrt((Σx² − Σx²/n)/(n−1))`` is the same fixed
    chain of IEEE ops everywhere (the same shared-float-ladder contract
    as group_trend_fit; caller keeps Σx² below 2^63).

    Returns the input keys + (z rounded to 6 decimals, is_outlier =
    |z| > threshold). Groups with fewer than 2 rows or zero variance
    yield null z / false. Shape: one partially-combined aggregate of
    three longs per group, broadcast back into a narrow map — the
    anomaly scan costs one pass over the fact table however large.
    """
    x = F.col(value_col).cast("long")
    stats = df.groupBy(group_col).agg(
        F.count("*").alias("_n"),
        F.sum(x).alias("_sx"),
        F.sum(x * x).alias("_sxx"),
    ).withColumnRenamed(group_col, "_g")
    # null-SAFE equality: groupBy keeps a null-key group, and rows in
    # it must come back standardized too — a plain equi-join would
    # silently drop every null-group input row
    j = df.join(
        F.broadcast(stats),
        F.col(group_col).eqNullSafe(F.col("_g")),
    ).drop("_g")
    n = F.col("_n").cast("double")
    sx = F.col("_sx").cast("double")
    sxx = F.col("_sxx").cast("double")
    var = (sxx - sx * sx / n) / (n - F.lit(1.0))
    z = F.when(
        (F.col("_n") > 1) & (var > 0),
        F.round((x.cast("double") - sx / n) / F.sqrt(var), 6),
    )
    return j.select(
        *[c for c in df.columns],
        z.alias("z"),
        F.coalesce(
            F.abs(z) > F.lit(float(threshold)), F.lit(False)
        ).alias("is_outlier"),
    )
