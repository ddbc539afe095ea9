"""Skew handling for dense urban cells (north rule): salted two-phase
aggregation on hot H3 prefixes + AQE configuration.

Dense hubs concentrate millions of rows on a handful of cell keys; a
plain groupBy puts each hot key in one reducer. ``salted_cell_count``
detects hot prefixes from a sample, salts ONLY those keys across
``n_salt`` sub-keys for the partial aggregate, then merges — the long
tail keeps a single-pass aggregate (no doubled shuffle volume).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AQE_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
}


def apply_aqe(spark) -> None:
    for k, v in AQE_CONFS.items():
        spark.conf.set(k, v)


def detect_hot_keys(
    df: DataFrame, key_col: str, sample_fraction: float = 0.05, top_n: int = 32
) -> list:
    """Sampled heavy-hitter detection for a grouping key."""
    sampled = df.sample(fraction=sample_fraction, seed=42)
    counts = (
        sampled.groupBy(key_col)
        .count()
        .orderBy(F.col("count").desc())
        .limit(top_n)
    )
    par = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    rows = counts.collect()
    if not rows:
        return []
    total = sum(r["count"] for r in rows)
    mean = total / len(rows)
    # hot = disproportionate vs the other top keys OR vs an even
    # spread of the sampled mass across the cluster's parallelism —
    # the second test catches the single-dominant-key case, where
    # "2x the top-N mean" can never fire (one key IS the mean)
    return [
        r[key_col]
        for r in rows
        if r["count"] > 2 * mean or r["count"] > max(total / par, 1)
    ]


def salted_cell_count(
    df: DataFrame,
    cell_col: str,
    value_col: str | None = None,
    n_salt: int = 16,
    hot_keys: list | None = None,
) -> DataFrame:
    """Two-phase count/sum per cell with salting applied only to hot keys.

    Output: (cell_col, n[, sum_<value_col>]).
    """
    if hot_keys is None:
        hot_keys = detect_hot_keys(df, cell_col)
    hot = F.array(*[F.lit(k) for k in hot_keys]) if hot_keys else F.array()
    # salt from the row POSITION, not a hash of the row's columns:
    # skewed data is typically duplicate-heavy (identical rows on the
    # hot key), and a content hash would map them all to ONE salt
    # bucket — i.e. no spreading at all. monotonically_increasing_id is
    # per-row-position; counts/sums are salt-invariant so the result
    # stays deterministic.
    salted = df.withColumn(
        "_salt",
        F.when(
            F.array_contains(hot, F.col(cell_col)),
            F.pmod(F.monotonically_increasing_id(), F.lit(n_salt)),
        ).otherwise(F.lit(0)),
    )
    aggs = [F.count("*").alias("n")]
    if value_col:
        aggs.append(F.sum(value_col).alias(f"sum_{value_col}"))
    partial = salted.groupBy(cell_col, "_salt").agg(*aggs)
    final_aggs = [F.sum("n").alias("n")]
    if value_col:
        final_aggs.append(F.sum(f"sum_{value_col}").alias(f"sum_{value_col}"))
    return partial.groupBy(cell_col).agg(*final_aggs)
