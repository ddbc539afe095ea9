"""Spark polyfill / linetrace / polyfill_resample / compact parity
(reference tests/test_h3pandas.py:214-306,309-439,697-744)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sparkh3 import dataframe as dfo
from sparkh3.kernel import geo
from sparkh3.kernel import index as ix

POLY_T = ArrayType(
    ArrayType(
        StructType([StructField("lng", DoubleType()), StructField("lat", DoubleType())])
    )
)
LINE_T = POLY_T  # same nesting: parts -> points


def ring_lnglat(pts):
    return [{"lng": float(x), "lat": float(y)} for x, y in pts]


def box(x0, y0, x1, y1):
    return ring_lnglat([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)])


@pytest.fixture()
def hex_poly_df(spark):
    """Three res-9 cells' own hex boundaries with values (parity fixture
    h3_geodataframe_with_values)."""
    cells = ["891f1d48177ffff", "891f1d48167ffff", "891f1d4810fffff"]
    vals = [1, 2, 5]
    rows = []
    for c, v in zip(cells, vals):
        b = geo.cell_to_boundary(ix.str_to_int([c]))[0]
        ring = ring_lnglat([(p[1], p[0]) for p in b])
        rows.append((c, v, [ring]))
    schema = StructType(
        [
            StructField("h3_09", StringType()),
            StructField("val", LongType()),
            StructField("geometry", POLY_T),
        ]
    )
    return spark.createDataFrame(rows, schema)


SEVENS = {
    "891f1d48177ffff": {
        "8a1f1d481747fff",
        "8a1f1d48174ffff",
        "8a1f1d481757fff",
        "8a1f1d48175ffff",
        "8a1f1d481767fff",
        "8a1f1d48176ffff",
        "8a1f1d481777fff",
    },
    "891f1d48167ffff": {
        "8a1f1d481647fff",
        "8a1f1d48164ffff",
        "8a1f1d481657fff",
        "8a1f1d48165ffff",
        "8a1f1d481667fff",
        "8a1f1d48166ffff",
        "8a1f1d481677fff",
    },
    "891f1d4810fffff": {
        "8a1f1d4810c7fff",
        "8a1f1d4810cffff",
        "8a1f1d4810d7fff",
        "8a1f1d4810dffff",
        "8a1f1d4810e7fff",
        "8a1f1d4810effff",
        "8a1f1d4810f7fff",
    },
}


class TestPolyfill:
    def test_empty_at_res1(self, hex_poly_df):
        got = dfo.polyfill(hex_poly_df, 1).collect()
        assert all(r.h3_polyfill == [] for r in got)

    def test_sevens_at_res10(self, hex_poly_df):
        got = dfo.polyfill(hex_poly_df, 10).collect()
        for r in got:
            assert set(r.h3_polyfill) == SEVENS[r.h3_09]

    def test_explode(self, hex_poly_df):
        got = dfo.polyfill(hex_poly_df, 10, explode=True)
        assert got.count() == 21
        assert got.filter(F.col("val").isNull()).count() == 0
        cells = {r.h3_polyfill for r in got.collect()}
        assert cells == set().union(*SEVENS.values())

    def test_unequal_lengths(self, spark):
        schema = StructType(
            [StructField("poly_id", LongType()), StructField("geometry", POLY_T)]
        )
        df = spark.createDataFrame(
            [(0, [box(0, 0, 1, 1)]), (1, [box(0, 0, 2, 2)])], schema
        )
        got = dfo.polyfill(df, 3, explode=True)
        assert got.count() == 5
        assert {r.h3_polyfill for r in got.collect()} == {
            "83754efffffffff",
            "83756afffffffff",
            "837541fffffffff",
            "83754cfffffffff",
        }


class TestPolyfillResample:
    def test_resample(self, hex_poly_df):
        got = dfo.polyfill_resample(hex_poly_df, 10, return_geometry=False)
        rows = got.collect()
        assert len(rows) == 21
        assert {r.h3_polyfill for r in rows} == set().union(*SEVENS.values())
        assert {r.val for r in rows} == {1, 2, 5}

    def test_resample_uncovered_warns(self, spark):
        schema = StructType(
            [StructField("poly_id", LongType()), StructField("geometry", POLY_T)]
        )
        df = spark.createDataFrame(
            [(0, [box(0, 0, 1, 1)]), (1, [box(0, 0, 3, 3)])], schema
        )
        with pytest.warns(UserWarning):
            got = dfo.polyfill_resample(df, 2, return_geometry=False)
        assert got.count() == 2  # box(0,0,3,3)@2 -> 2 cells; box(0,0,1,1) -> 0


class TestLinetrace:
    def test_empty_line(self, spark):
        schema = StructType([StructField("line", LINE_T)])
        df = spark.createDataFrame([([],)], schema)
        got = dfo.linetrace(df, 2).collect()
        assert got[0].h3_linetrace == []

    def test_nz_linestring(self, spark):
        schema = StructType(
            [StructField("val", LongType()), StructField("line", LINE_T)]
        )
        line = [
            ring_lnglat([(174.793092, -37.005372), (175.621138, -40.323142)])
        ]
        df = spark.createDataFrame([(10, line)], schema)
        got = dfo.linetrace(df, 3).collect()
        assert got[0].h3_linetrace == [
            "83bb50fffffffff",
            "83bb54fffffffff",
            "83bb72fffffffff",
            "83bb0dfffffffff",
            "83bb2bfffffffff",
        ]
        assert got[0].val == 10
        ex = dfo.linetrace(df, 3, explode=True)
        rows = ex.collect()
        assert len(rows) == 5
        assert all(r.val == 10 for r in rows)

    def test_square_multiline_sequential_dedup(self, spark):
        # tests/util/test_shapely.py:70-78: repeats allowed non-sequentially
        schema = StructType([StructField("line", LINE_T)])
        ml = [
            ring_lnglat([(0, 0), (1, 0), (1, 1)]),
            ring_lnglat([(1, 1), (0, 1), (0, 0)]),
        ]
        df = spark.createDataFrame([(ml,)], schema)
        got = dfo.linetrace(df, 2).collect()
        assert got[0].h3_linetrace == [
            "82754ffffffffff",
            "827547fffffffff",
            "82754ffffffffff",
        ]
        got1 = dfo.linetrace(df, 1).collect()
        assert got1[0].h3_linetrace == ["81757ffffffffff"]


class TestCompact:
    def test_compact_roundtrip(self, spark):
        df = spark.createDataFrame([Row(cells=["811f3ffffffffff"])])
        up = dfo.h3_uncompact(df, "cells", 3)
        rows = up.collect()
        assert len(rows[0].cells) == 49
        back = dfo.h3_compact(up, "cells").collect()
        assert back[0].cells == ["811f3ffffffffff"]


def test_compact_udf_invalid_address_raises(spark):
    """compact/uncompact enforce the same ValueError contract as every
    other string-cell UDF (reference util/decorator.py parity) instead
    of silently coercing bad addresses to cell 0."""
    from pyspark.sql import functions as F

    from sparkh3 import functions as H3F

    df = spark.createDataFrame([(["not-a-cell"],)], "cells array<string>")
    with pytest.raises(Exception, match="invalid H3"):
        df.select(H3F.compact_udf()(F.col("cells"))).collect()
    with pytest.raises(Exception, match="invalid H3"):
        df.select(H3F.uncompact_udf(9)(F.col("cells"))).collect()


def test_center_child_backtick_column_name(spark):
    """h3_center_child is built from Column ops only — a column name
    needing backticks must not break (no SQL-text round trip)."""
    from pyspark.sql import functions as F

    from sparkh3 import functions as H3F
    from sparkh3.kernel import index as ix

    df = spark.createDataFrame([("87283472bffffff",)], ["my-cell"])
    got = df.select(
        H3F.h3_center_child(F.col("my-cell"), 10).alias("c")
    ).collect()[0].c
    exp = ix.int_to_str(
        ix.cell_to_center_child(ix.str_to_int(["87283472bffffff"]), 10)
    )[0]
    assert got == exp
