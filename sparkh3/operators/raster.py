"""Raster <-> vector bridging (SURVEY §2.4; reference analog: DEM
point-grid -> geo_to_h3_aggregate(res, 'mean') in the example notebooks).

A raster is represented relationally as a point grid (row, col, lat,
lng, value) — the natural Spark shape for 100 TB of tiles; raster->hex
is then a geo_to_h3 aggregate and hex->raster a centroid snap back onto
a regular grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import dataframe as dfo


def raster_to_h3(
    raster: DataFrame,
    resolution: int,
    value_col: str = "value",
    operation: str = "mean",
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """Aggregate raster samples into hex cells (raster -> vector)."""
    pts = raster.select(lat_col, lng_col, value_col)
    return dfo.geo_to_h3_aggregate(
        pts, resolution, operation=operation, lat_col=lat_col, lng_col=lng_col,
        return_geometry=False,
    )


def h3_to_raster(
    cells: DataFrame,
    cell_size_deg: float,
    h3_col: str | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Rasterize hex values onto a regular lat/lng grid by centroid snap
    (vector -> raster): output (row, col, lat, lng, value) with value
    averaged when several cells snap to one pixel."""
    df = dfo.h3_to_geo(cells, h3_col)
    px = (
        df.withColumn("row", F.floor((F.col("lat") + 90.0) / cell_size_deg).cast("long"))
        .withColumn("col", F.floor((F.col("lng") + 180.0) / cell_size_deg).cast("long"))
    )
    return (
        px.groupBy("row", "col")
        .agg(F.avg(value_col).alias(value_col))
        .withColumn("lat", (F.col("row") + 0.5) * cell_size_deg - 90.0)
        .withColumn("lng", (F.col("col") + 0.5) * cell_size_deg - 180.0)
    )
