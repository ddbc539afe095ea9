"""DataFrame-level operators — the reference's public API surface
(SURVEY.md §2.2, reference h3pandas/h3pandas.py), re-expressed as lazy
Spark DataFrame algebra.

The reference's pandas *index* becomes a named key column ``h3_{res:02d}``
(or ``h3_parent``/``h3_k_ring``/... as each op names it) — same column
names, same values, order-insensitive.

Usage: ``from sparkh3 import h3`` then ``h3(df).geo_to_h3(9)`` (mirrors
``df.h3.geo_to_h3(9)``), or the module-level functions directly.
"""

from __future__ import annotations

import warnings
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import functions as H3F

GEOMETRY_COLS = ("geometry", "geometry_wkt")


def _format_resolution(res: int) -> str:
    return f"h3_{res:02d}"


def _agg_exprs(df: DataFrame, key: str, operation, skip=()) -> list[Column]:
    """Map the reference's `operation` (str | dict | callable) to Spark
    aggregate expressions over all non-key columns (reference
    h3pandas.py:496-497 semantics: groupby().agg(op))."""
    ops = {
        "sum": F.sum,
        "mean": F.avg,
        "avg": F.avg,
        "min": F.min,
        "max": F.max,
        "count": F.count,
        "median": F.median,
        "std": F.stddev,
        "first": F.first,
        "last": F.last,
    }
    cols = [c for c in df.columns if c != key and c not in skip]
    if isinstance(operation, dict):
        return [ops[op](c).alias(c) for c, op in operation.items()]
    return [ops[operation](c).alias(c) for c in cols]


def _grouped_agg(df: DataFrame, key: str, operation) -> DataFrame:
    """groupBy(key).agg(operation) with the reference's full `operation`
    surface (str | dict | Callable, h3pandas.py:453,496-497): strings and
    dicts compile to native Spark aggregates (partial+final map-side
    combine); an arbitrary Python callable routes to an applyInPandas
    grouped map (sparkh3.operators.grouped) — the Spark shape for custom
    aggregates built-ins can't express."""
    if callable(operation) and not isinstance(operation, str):
        from .operators.grouped import apply_in_pandas_aggregate

        # the applyInPandas schema types every aggregated column Double
        # and calls float(fn(col)) — only numeric columns can ride it
        # (pandas .agg(callable) drops/raises on non-numeric too; a
        # string column like `lang` simply doesn't aggregate)
        numeric = ("tinyint", "smallint", "int", "bigint", "float", "double")
        value_cols = [
            c
            for c, t in df.dtypes
            if c != key and (t in numeric or t.startswith("decimal"))
        ]
        return apply_in_pandas_aggregate(df, key, value_cols, operation)
    return df.groupBy(key).agg(*_agg_exprs(df, key, operation))


def geo_to_h3(
    df: DataFrame,
    resolution: int,
    lat_col: str = "lat",
    lng_col: str = "lng",
    geometry_col: str | None = None,
) -> DataFrame:
    """Add H3 address column ``h3_{res:02d}`` from point coordinates.

    Reference: h3pandas.py:31-103 (op 1). Narrow map — no shuffle.
    ``geometry_col`` accepts a point struct<lat,lng>; non-point geometry
    raises ValueError (parity: reference tests/test_h3pandas.py:133-135).
    """
    if geometry_col is not None:
        dt = dict(df.dtypes).get(geometry_col, "")
        if "array" in dt:
            raise ValueError(
                "Only Point geometries are supported for geo_to_h3"
            )
        df = df.withColumn("_lat", F.col(f"{geometry_col}.lat")).withColumn(
            "_lng", F.col(f"{geometry_col}.lng")
        )
        lat_col, lng_col = "_lat", "_lng"
    col = _format_resolution(resolution)
    out = df.withColumn(
        col, H3F.latlng_to_cell_udf(resolution)(F.col(lat_col), F.col(lng_col))
    )
    if geometry_col is not None:
        out = out.drop("_lat", "_lng")
    return out


def h3_to_geo(df: DataFrame, h3_col: str | None = None) -> DataFrame:
    """Add cell-centroid ``lat``/``lng`` (+ ``geometry_wkt`` POINT).

    Reference: h3pandas.py:105-137 (op 2).
    """
    key = h3_col or _h3_key(df)
    c = H3F.cell_to_latlng_udf()(F.col(key))
    out = df.withColumn("_c", c)
    out = out.withColumn("lat", F.col("_c.lat")).withColumn("lng", F.col("_c.lng"))
    out = out.withColumn(
        "geometry_wkt",
        F.concat(F.lit("POINT ("), F.col("lng"), F.lit(" "), F.col("lat"), F.lit(")")),
    )
    return out.drop("_c")


def h3_to_geo_boundary(df: DataFrame, h3_col: str | None = None) -> DataFrame:
    """Add cell boundary polygon as ``geometry`` array<struct<lng,lat>>
    (closed ring, (lng,lat) order like the reference's shapely Polygons).

    Reference: h3pandas.py:139-164 (op 3).
    """
    key = h3_col or _h3_key(df)
    return df.withColumn("geometry", H3F.cell_to_boundary_udf()(F.col(key)))


def h3_get_resolution(df: DataFrame, h3_col: str | None = None) -> DataFrame:
    """Native bit math (op 4)."""
    key = h3_col or _h3_key(df)
    return df.withColumn("h3_resolution", H3F.h3_resolution(key))


def h3_get_base_cell(df: DataFrame, h3_col: str | None = None) -> DataFrame:
    """Native bit math (op 5)."""
    key = h3_col or _h3_key(df)
    return df.withColumn("h3_base_cell", H3F.h3_base_cell(key))


def h3_is_valid(df: DataFrame, h3_col: str | None = None) -> DataFrame:
    """op 6 — never raises; invalid/malformed strings -> false."""
    key = h3_col or _h3_key(df)
    return df.withColumn("h3_is_valid", H3F.is_valid_udf()(F.col(key)))


def k_ring(
    df: DataFrame, k: int = 1, explode: bool = False, h3_col: str | None = None
) -> DataFrame:
    """op 7: grid disk of radius k as ``h3_k_ring`` list column."""
    key = h3_col or _h3_key(df)
    out = df.withColumn("h3_k_ring", H3F.k_ring_udf(k)(F.col(key)))
    if explode:
        out = out.withColumn("h3_k_ring", F.explode_outer("h3_k_ring"))
    return out


def hex_ring(
    df: DataFrame, k: int = 1, explode: bool = False, h3_col: str | None = None
) -> DataFrame:
    """op 8: hollow ring at distance k as ``h3_hex_ring`` list column."""
    key = h3_col or _h3_key(df)
    out = df.withColumn("h3_hex_ring", H3F.hex_ring_udf(k)(F.col(key)))
    if explode:
        out = out.withColumn("h3_hex_ring", F.explode_outer("h3_hex_ring"))
    return out


def h3_to_parent(
    df: DataFrame, resolution: int | None = None, h3_col: str | None = None
) -> DataFrame:
    """op 9 — NATIVE bit math, no UDF. None -> direct parent in column
    ``h3_parent``; else column ``h3_{res:02d}``."""
    key = h3_col or _h3_key(df)
    v = H3F.h3_str_to_int(key)
    if resolution is None:
        # direct parent: res-1, per-row. The variable-width fill —
        # Spark's shiftleft only takes a literal shift — comes from a
        # 16-entry array literal indexed by the value's own res bits
        # (Column ops only: no SQL-text interpolation of the column
        # name, which breaks on names needing backticks / Connect)
        cur = H3F.h3_resolution_int(v).cast("int")
        fills = F.array(
            *[
                F.lit((1 << (3 * (16 - r))) - 1).cast("long")
                for r in range(16)
            ]
        )
        parent = (
            v.bitwiseAND(F.lit(~(15 << 52)))
            .bitwiseOR(F.shiftleft((cur - 1).cast("long"), 52))
            .bitwiseOR(F.element_at(fills, cur + F.lit(1)))
        )
        return df.withColumn("h3_parent", H3F.h3_int_to_str(parent))
    col = _format_resolution(resolution)
    return df.withColumn(col, H3F.h3_parent(key, resolution))


def h3_to_center_child(
    df: DataFrame, resolution: int | None = None, h3_col: str | None = None
) -> DataFrame:
    """op 10 — native bit math; None -> res+1, column ``h3_center_child``."""
    key = h3_col or _h3_key(df)
    v = H3F.h3_str_to_int(key)
    if resolution is None:
        # same array-literal lookup as h3_to_parent (no SQL-text round
        # trip). Mask per current res r: ~(7 << 3*(14-r)); the r=15
        # entry reproduces Java's masked negative shift (7 << 61) for
        # exact parity, though a res-15 cell has no child
        cur = H3F.h3_resolution_int(v).cast("int")

        def _mask(r: int) -> int:
            n = 3 * (14 - r)
            if n >= 0:
                return ~(7 << n)
            m = (7 << (n & 63)) & ((1 << 64) - 1)
            return ~(m - (1 << 64) if m >= (1 << 63) else m)

        masks = F.array(
            *[F.lit(_mask(r)).cast("long") for r in range(16)]
        )
        child = (
            v.bitwiseAND(F.lit(~(15 << 52)))
            .bitwiseOR(F.shiftleft((cur + 1).cast("long"), 52))
            .bitwiseAND(F.element_at(masks, cur + F.lit(1)))
        )
        return df.withColumn("h3_center_child", H3F.h3_int_to_str(child))
    return df.withColumn(
        "h3_center_child", H3F.h3_center_child(key, resolution)
    )


def polyfill(
    df: DataFrame,
    resolution: int,
    explode: bool = False,
    geometry_col: str = "geometry",
) -> DataFrame:
    """op 11: cells whose centroid is inside the (Multi)Polygon, as
    ``h3_polyfill`` list column; explode keeps uncovered rows as NULL
    (pandas .explode() NaN parity, h3pandas.py:357-407)."""
    dt = dict(df.dtypes)[geometry_col]
    udf = (
        H3F.multipolyfill_udf(resolution)
        if dt.count("array") >= 3
        else H3F.polyfill_udf(resolution)
    )
    out = df.withColumn("h3_polyfill", udf(F.col(geometry_col)))
    if explode:
        out = out.withColumn("h3_polyfill", F.explode_outer("h3_polyfill"))
    return out


def cell_area(
    df: DataFrame, unit: str = "km^2", h3_col: str | None = None
) -> DataFrame:
    """op 12: ``h3_cell_area`` double column."""
    key = h3_col or _h3_key(df)
    return df.withColumn("h3_cell_area", H3F.cell_area_udf(unit)(F.col(key)))


def linetrace(
    df: DataFrame,
    resolution: int,
    explode: bool = False,
    line_col: str = "line",
) -> DataFrame:
    """op 13: cells along a (Multi)LineString, sequentially deduplicated,
    as ``h3_linetrace`` list column."""
    out = df.withColumn(
        "h3_linetrace", H3F.linetrace_udf(resolution)(F.col(line_col))
    )
    if explode:
        out = out.withColumn("h3_linetrace", F.explode_outer("h3_linetrace"))
    return out


def geo_to_h3_aggregate(
    df: DataFrame,
    resolution: int,
    operation="sum",
    lat_col: str = "lat",
    lng_col: str = "lng",
    return_geometry: bool = True,
) -> DataFrame:
    """op 14: geo_to_h3 -> drop coords -> groupBy(h3).agg(op)
    (hash aggregate: Spark does partial+final map-side combine)."""
    key = _format_resolution(resolution)
    out = geo_to_h3(df, resolution, lat_col, lng_col).drop(
        lat_col, lng_col, *GEOMETRY_COLS
    )
    out = _grouped_agg(out, key, operation)
    if return_geometry:
        out = h3_to_geo_boundary(out, key)
    return out


def h3_to_parent_aggregate(
    df: DataFrame,
    resolution: int,
    operation="sum",
    h3_col: str | None = None,
    return_geometry: bool = True,
) -> DataFrame:
    """op 15: parent rollup — native parent bit-math + groupBy.agg."""
    key = h3_col or _h3_key(df)
    parent_col = _format_resolution(resolution)
    out = df.withColumn(parent_col, H3F.h3_parent(key, resolution)).drop(
        key, *GEOMETRY_COLS
    )
    out = _grouped_agg(out, parent_col, operation)
    if return_geometry:
        out = h3_to_geo_boundary(out, parent_col)
    return out


def k_ring_smoothing(
    df: DataFrame,
    k: int | None = None,
    weights: list[float] | None = None,
    h3_col: str | None = None,
    return_geometry: bool = True,
) -> DataFrame:
    """op 16: spread numeric values over k-rings (uniform or weighted).

    Exactly one of k / weights (reference h3pandas.py:571-706):
    uniform -> k_ring explode, groupBy sum, divide by ring size
    1+3k(k+1); weighted -> per-distance hex_ring explode x w_i (weights
    normalized by ring sizes), union, groupBy sum.
    """
    key = h3_col or _h3_key(df)
    df = df.drop(*GEOMETRY_COLS)
    numeric = [
        c
        for c, t in df.dtypes
        if c != key and t in ("bigint", "int", "double", "float", "smallint")
    ]
    if weights is not None and k is not None:
        raise ValueError("Exactly one of `k` and `weights` must be set.")
    if weights is not None:
        if len(weights) == 0:
            raise ValueError("weights must not be empty")
        if len(set(weights)) == 1:
            k = len(weights) - 1
            weights = None
    if weights is None:
        if k is None:
            raise ValueError("Exactly one of `k` and `weights` must be set.")
        ring_size = 1 + 3 * k * (k + 1)
        out = k_ring(df.select(key, *numeric), k, explode=True, h3_col=key)
        out = out.groupBy("h3_k_ring").agg(
            *[(F.sum(c) / F.lit(ring_size)).alias(c) for c in numeric]
        )
        result_key = "h3_k_ring"
    else:
        multipliers = [1] + [6 * i for i in range(1, len(weights))]
        denom = float(sum(w * m for w, m in zip(weights, multipliers)))
        parts = []
        for dist, w in enumerate(weights):
            scale = float(w) / denom
            ring = hex_ring(df.select(key, *numeric), dist, explode=True, h3_col=key)
            ring = ring.select(
                F.col("h3_hex_ring"),
                *[(F.col(c) * F.lit(scale)).alias(c) for c in numeric],
            )
            parts.append(ring)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out = out.groupBy("h3_hex_ring").agg(
            *[F.sum(c).alias(c) for c in numeric]
        )
        result_key = "h3_hex_ring"
    if return_geometry:
        out = h3_to_geo_boundary(out, result_key)
    return out


def polyfill_resample(
    df: DataFrame,
    resolution: int,
    return_geometry: bool = True,
    geometry_col: str = "geometry",
) -> DataFrame:
    """op 17: polyfill-explode, re-key on ``h3_polyfill``; uncovered rows
    dropped with a warning (reference h3pandas.py:708-758)."""
    out = polyfill(df, resolution, explode=True, geometry_col=geometry_col)
    n_uncovered = out.filter(F.col("h3_polyfill").isNull()).count()
    if n_uncovered:
        warnings.warn(
            f"{n_uncovered} rows did not generate a H3 cell at resolution "
            f"{resolution} and were dropped",
            UserWarning,
            stacklevel=2,
        )
    out = out.filter(F.col("h3_polyfill").isNotNull())
    if return_geometry:
        out = h3_to_geo_boundary(out, "h3_polyfill")
    return out


def h3_compact(df: DataFrame, cells_col: str) -> DataFrame:
    """North-rule tile algebra: minimal covering set per row."""
    return df.withColumn(cells_col, H3F.compact_udf()(F.col(cells_col)))


def h3_uncompact(df: DataFrame, cells_col: str, resolution: int) -> DataFrame:
    return df.withColumn(
        cells_col, H3F.uncompact_udf(resolution)(F.col(cells_col))
    )


def _h3_key(df: DataFrame) -> str:
    """Find the H3 key column (reference: the pandas index). Preference:
    the last h3_XX column, else h3_polyfill/h3_k_ring/h3_hex_ring."""
    candidates = [
        c
        for c in df.columns
        if c.startswith("h3_")
        and (c[3:].isdigit() or c in ("h3_polyfill", "h3_k_ring", "h3_hex_ring", "h3_parent"))
    ]
    if not candidates:
        raise ValueError(
            "no H3 key column found; pass h3_col= explicitly "
            "(expected h3_XX / h3_polyfill / h3_k_ring / ...)"
        )
    return candidates[-1]


class H3Ops:
    """Accessor facade mirroring the reference's ``df.h3`` API 1:1."""

    def __init__(self, df: DataFrame):
        self._df = df

    def __getattr__(self, name: str) -> Callable:
        fn = globals().get(name)
        if fn is None or not callable(fn):
            raise AttributeError(name)

        def bound(*args, **kwargs):
            return fn(self._df, *args, **kwargs)

        return bound


def h3(df: DataFrame) -> H3Ops:
    return H3Ops(df)
