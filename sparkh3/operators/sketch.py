"""Mergeable frequency sketches: count-min (Cormode & Muthukrishnan,
J. Algorithms 2005) expressed as pure relational algebra.

A count-min sketch is a d x w counter table; every key increments one
counter per row (d independent hashes), and a key's frequency estimate
is the MIN of its d counters — always an overestimate, within eps*N
with probability 1-delta for w = e/eps, d = ln(1/delta).

Why this shape at 100 TB: the aggregate state is d*w counters no matter
how many input rows — the shuffle after map-side partial combine is
bounded by d*w rows per partition, and two sketches of disjoint data
merge by plain counter addition (sum the tables), so per-day / per-shard
sketches roll up like any other partial aggregate. The hashes are the
same portable Knuth integer arithmetic the sampling operators use
(textops.det_hash01), so the ENTIRE sketch table is reproducible in any
SQL engine — the DuckDB oracle pins every counter, not just a summary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkh3.operators.textops import _KNUTH

__all__ = ["countmin_sketch", "cms_estimate", "cms_merge"]

# per-row seed stride: any odd constant; rows r=0..d-1 hash with seed
# r*_ROW_SEED so the d hash functions are pairwise independent-ish
_ROW_SEED = 10007


def _bucket(key, r: int, width: int):
    folded = F.pmod(key + F.lit(r * _ROW_SEED), F.lit(1 << 31))
    return F.pmod(
        F.pmod(folded * F.lit(_KNUTH), F.lit(1 << 32)), F.lit(width)
    )


def countmin_sketch(
    df: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the d x w sketch of an integer key column's frequencies
    (or weighted frequencies with ``weight_col``). Returns
    (r, bucket, cnt) — at most depth*width rows regardless of input
    size. One explode (d rows per input row) + one partially-combined
    aggregate; no UDF."""
    if width <= 0 or depth <= 0:
        raise ValueError(f"width/depth must be positive, got {width}/{depth}")
    key = F.col(key_col).cast("long")
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).cast("long").alias("r"),
                _bucket(key, r, width).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    w = (
        F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    )
    return (
        df.select(F.explode(pairs).alias("_p"), w.alias("_w"))
        .groupBy(F.col("_p.r").alias("r"), F.col("_p.bucket").alias("bucket"))
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int,
    depth: int,
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: estimate =
    min over the d rows of the key's counter (missing counter = 0).
    ``width``/``depth`` must match the sketch's build parameters.
    The sketch is broadcast (<= d*w rows by construction); the key side
    never shuffles. Adds ``est`` (always >= the true count)."""
    key = F.col(key_col).cast("long")
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).cast("long").alias("r"),
                _bucket(key, r, width).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    probes = keys.select(key_col, F.explode(pairs).alias("_p")).select(
        key_col, F.col("_p.r").alias("r"), F.col("_p.bucket").alias("bucket")
    )
    joined = probes.join(F.broadcast(sketch), ["r", "bucket"], "left")
    return (
        joined.groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with identical (width, depth): counter
    addition — the property that makes per-shard sketches roll up."""
    return (
        a.unionByName(b)
        .groupBy("r", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
