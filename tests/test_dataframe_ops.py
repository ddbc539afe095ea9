"""Spark DataFrame operator parity with the reference test suite
(/root/reference/tests/test_h3pandas.py), order-insensitive."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sparkh3 import dataframe as dfo


@pytest.fixture()
def basic_df(spark):
    return spark.createDataFrame(
        [Row(lat=50.0, lng=14.0), Row(lat=51.0, lng=15.0)]
    )


@pytest.fixture()
def basic_df_values(spark):
    return spark.createDataFrame(
        [Row(lat=50.0, lng=14.0, val=2), Row(lat=51.0, lng=15.0, val=5)]
    )


@pytest.fixture()
def indexed_df(spark):
    return spark.createDataFrame(
        [
            Row(h3_09="891e3097383ffff", lat=50.0, lng=14.0),
            Row(h3_09="891e2659c2fffff", lat=51.0, lng=15.0),
        ]
    )


@pytest.fixture()
def h3_df_values(spark):
    return spark.createDataFrame(
        [
            Row(h3_09="891f1d48177ffff", val=1),
            Row(h3_09="891f1d48167ffff", val=2),
            Row(h3_09="891f1d4810fffff", val=5),
        ]
    )


class TestGeoToH3:
    def test_geo_to_h3(self, basic_df):
        got = dfo.geo_to_h3(basic_df, 9).orderBy("lat").collect()
        assert [r.h3_09 for r in got] == ["891e3097383ffff", "891e2659c2fffff"]


class TestH3ToGeo:
    def test_h3_to_geo(self, indexed_df):
        got = dfo.h3_to_geo(indexed_df.drop("lat", "lng")).orderBy("h3_09").collect()
        by_key = {r.h3_09: r for r in got}
        r1 = by_key["891e3097383ffff"]
        assert r1.lat == pytest.approx(50.000551554902586, abs=1e-9)
        assert r1.lng == pytest.approx(14.000372151097624, abs=1e-9)
        assert r1.geometry_wkt.startswith("POINT (")

    def test_h3_to_geo_boundary(self, indexed_df):
        got = dfo.h3_to_geo_boundary(indexed_df).collect()
        by_key = {r.h3_09: r.geometry for r in got}
        ring = by_key["891e3097383ffff"]
        assert len(ring) == 7  # closed 6-vertex ring
        assert ring[0] == ring[-1]
        lngs = {round(p.lng, 6) for p in ring}
        assert round(13.997875502962215, 6) in lngs

    def test_invalid_address_raises(self, spark):
        bad = spark.createDataFrame([Row(h3_09="891e3097383ffff"), Row(h3_09="invalid")])
        with pytest.raises(Exception, match="[Ii]nvalid"):
            dfo.h3_to_geo_boundary(bad).collect()


class TestBitOps:
    def test_resolution_base_cell(self, indexed_df):
        got = dfo.h3_get_base_cell(dfo.h3_get_resolution(indexed_df)).collect()
        assert all(r.h3_resolution == 9 for r in got)
        assert all(r.h3_base_cell == 15 for r in got)

    def test_parent_levels(self, h3_df_values):
        got = dfo.h3_to_parent(h3_df_values, 1).collect()
        assert {r.h3_01 for r in got} == {"811f3ffffffffff"}
        got = dfo.h3_to_parent(h3_df_values, 0).collect()
        assert {r.h3_00 for r in got} == {"801ffffffffffff"}

    def test_direct_parent(self, h3_df_values):
        got = {
            r.h3_09: r.h3_parent for r in dfo.h3_to_parent(h3_df_values).collect()
        }
        assert got == {
            "891f1d48177ffff": "881f1d4817fffff",
            "891f1d48167ffff": "881f1d4817fffff",
            "891f1d4810fffff": "881f1d4811fffff",
        }

    def test_center_child(self, indexed_df):
        got = {
            r.h3_09: r.h3_center_child
            for r in dfo.h3_to_center_child(indexed_df).collect()
        }
        assert got == {
            "891e3097383ffff": "8a1e30973807fff",
            "891e2659c2fffff": "8a1e2659c2c7fff",
        }

    def test_center_child_explicit_res(self, spark):
        df = spark.createDataFrame([Row(h3_09="891e3097383ffff")])
        got = dfo.h3_to_center_child(df, 12).collect()[0].h3_center_child
        assert got == "8c1e309738001ff"

    def test_geo_to_h3_geometry_struct(self, spark):
        df = spark.createDataFrame([Row(geometry=Row(lat=50.0, lng=14.0))])
        got = dfo.geo_to_h3(df, 9, geometry_col="geometry").collect()
        assert got[0].h3_09 == "891e3097383ffff"

    def test_geo_to_h3_polygon_raises(self, spark):
        from pyspark.sql.types import (
            ArrayType,
            DoubleType,
            StructField,
            StructType,
        )

        poly_t = ArrayType(
            ArrayType(
                StructType(
                    [
                        StructField("lng", DoubleType()),
                        StructField("lat", DoubleType()),
                    ]
                )
            )
        )
        df = spark.createDataFrame(
            [([[{"lng": 0.0, "lat": 0.0}]],)],
            StructType([StructField("geometry", poly_t)]),
        )
        with pytest.raises(ValueError, match="Point"):
            dfo.geo_to_h3(df, 9, geometry_col="geometry")

    def test_is_valid(self, spark):
        df = spark.createDataFrame(
            [Row(h3_09="891e3097383ffff"), Row(h3_09="invalid")]
        )
        got = {r.h3_09: r.h3_is_valid for r in dfo.h3_is_valid(df).collect()}
        assert got == {"891e3097383ffff": True, "invalid": False}


K1 = {
    "891e3097383ffff",
    "891e3097387ffff",
    "891e309738bffff",
    "891e309738fffff",
    "891e3097393ffff",
    "891e3097397ffff",
    "891e309739bffff",
}


class TestRings:
    def test_k_ring(self, indexed_df):
        got = dfo.k_ring(indexed_df).collect()
        by_key = {r.h3_09: set(r.h3_k_ring) for r in got}
        assert by_key["891e3097383ffff"] == K1

    def test_k_ring_explode(self, indexed_df):
        got = dfo.k_ring(indexed_df, explode=True)
        assert got.count() == 14
        assert got.filter(F.col("lat").isNull()).count() == 0

    def test_hex_ring(self, indexed_df):
        got = dfo.hex_ring(indexed_df).collect()
        by_key = {r.h3_09: set(r.h3_hex_ring) for r in got}
        assert by_key["891e3097383ffff"] == K1 - {"891e3097383ffff"}

    def test_ring_zero(self, indexed_df):
        got = dfo.hex_ring(indexed_df, 0).collect()
        assert all(r.h3_hex_ring == [r.h3_09] for r in got)


class TestCellArea:
    def test_cell_area(self, indexed_df):
        got = {r.h3_09: r.h3_cell_area for r in dfo.cell_area(indexed_df).collect()}
        assert got["891e3097383ffff"] == pytest.approx(0.09937867173389912, rel=1e-9)
        assert got["891e2659c2fffff"] == pytest.approx(0.09775508251476996, rel=1e-9)


class TestAggregates:
    def test_geo_to_h3_aggregate(self, basic_df_values):
        got = dfo.geo_to_h3_aggregate(
            basic_df_values, 1, return_geometry=False
        ).collect()
        assert len(got) == 1
        assert got[0].h3_01 == "811e3ffffffffff"
        assert got[0].val == 7

    def test_h3_to_parent_aggregate(self, h3_df_values):
        got = dfo.h3_to_parent_aggregate(
            h3_df_values, 8, return_geometry=False
        ).collect()
        assert {(r.h3_08, r.val) for r in got} == {
            ("881f1d4811fffff", 5),
            ("881f1d4817fffff", 3),
        }

    def test_mean_aggregate(self, h3_df_values):
        got = dfo.h3_to_parent_aggregate(
            h3_df_values, 8, operation="mean", return_geometry=False
        ).collect()
        assert {(r.h3_08, r.val) for r in got} == {
            ("881f1d4811fffff", 5.0),
            ("881f1d4817fffff", 1.5),
        }

    def test_callable_aggregate(self, h3_df_values):
        """Reference parity: `operation` accepts any Python callable
        (h3pandas.py:453,496-497) — routed through applyInPandas."""

        def rng(s):
            return float(s.max() - s.min())

        got = dfo.h3_to_parent_aggregate(
            h3_df_values, 8, operation=rng, return_geometry=False
        ).collect()
        assert {(r.h3_08, r.val) for r in got} == {
            ("881f1d4811fffff", 0.0),
            ("881f1d4817fffff", 1.0),
        }

    def test_callable_geo_aggregate(self, basic_df_values):
        got = dfo.geo_to_h3_aggregate(
            basic_df_values, 1, operation=lambda s: float(s.sum()),
            return_geometry=False,
        ).collect()
        assert len(got) == 1
        assert got[0].h3_01 == "811e3ffffffffff"
        assert got[0].val == 7.0


class TestSmoothing:
    def test_k_vs_equal_weights(self, h3_df_values):
        a = dfo.k_ring_smoothing(h3_df_values, 2, return_geometry=False)
        b = dfo.k_ring_smoothing(
            h3_df_values, weights=[1, 1, 1], return_geometry=False
        )
        ra = {(r[0], round(r[1], 12)) for r in a.collect()}
        rb = {(r[0], round(r[1], 12)) for r in b.collect()}
        assert ra == rb

    def test_zero_ring(self, h3_df_values):
        got = dfo.k_ring_smoothing(h3_df_values, 0, return_geometry=False).collect()
        assert {(r.h3_k_ring, r.val) for r in got} == {
            ("891f1d48177ffff", 1.0),
            ("891f1d48167ffff", 2.0),
            ("891f1d4810fffff", 5.0),
        }

    def test_2_ring_golden(self, h3_df_values):
        one = h3_df_values.filter(F.col("val") == 1)
        got = dfo.k_ring_smoothing(one, 2, return_geometry=False).collect()
        assert {round(r.val, 15) for r in got} == {round(1 / 19, 15)}
        assert len(got) == 19

    def test_weighted_golden(self, h3_df_values):
        one = h3_df_values.filter(F.col("val") == 1)
        got = dfo.k_ring_smoothing(
            one, weights=[2, 1], return_geometry=False
        ).collect()
        assert {round(r.val, 15) for r in got} == {0.25, 0.125}

    def test_both_args_raises(self, h3_df_values):
        with pytest.raises(ValueError):
            dfo.k_ring_smoothing(h3_df_values, 1, weights=[1, 2])

    def test_empty_weights_raises(self, h3_df_values):
        with pytest.raises(ValueError):
            dfo.k_ring_smoothing(h3_df_values, weights=[])


class TestGroupingAggregate:
    def test_rollup_grains(self, spark):
        from sparkh3.operators.grouped import grouping_aggregate

        df = spark.createDataFrame(
            [("a", "x", 1), ("a", "y", 2), ("b", "x", 4)],
            "g1 string, g2 string, v int",
        )
        got = {
            (r.g1, r.g2, r.gid): r.sv
            for r in grouping_aggregate(
                df, ["g1", "g2"], [F.sum("v").alias("sv")], kind="rollup"
            ).collect()
        }
        # rollup: (g1,g2), (g1), () — no (g2)-only grain
        assert got[("a", "x", 0)] == 1
        assert got[("a", "ALL", 1)] == 3
        assert got[("b", "ALL", 1)] == 4
        assert got[("ALL", "ALL", 3)] == 7
        assert ("ALL", "x", 2) not in got

    def test_cube_has_all_grains(self, spark):
        from sparkh3.operators.grouped import grouping_aggregate

        df = spark.createDataFrame(
            [("a", "x", 1), ("b", "y", 2)], "g1 string, g2 string, v int"
        )
        out = grouping_aggregate(
            df, ["g1", "g2"], [F.count("*").alias("n")], kind="cube"
        )
        assert set(
            r.gid for r in out.select("gid").distinct().collect()
        ) == {0, 1, 2, 3}
        # ONE shuffle for all grains: a single Expand node feeds a
        # single pair of hash aggregates
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Expand") == 1
        assert plan.count("Exchange") == 1

    def test_bad_kind_raises(self, spark):
        from sparkh3.operators.grouped import grouping_aggregate

        df = spark.createDataFrame([("a", 1)], "g string, v int")
        with pytest.raises(ValueError, match="cube"):
            grouping_aggregate(df, ["g"], [F.sum("v").alias("s")], kind="no")


def test_grouping_aggregate_null_key_stays_null(spark):
    """A genuine NULL data value at the finest grain must stay NULL —
    only gid-flagged subtotal rows carry the all_label."""
    from pyspark.sql import functions as F

    from sparkh3.operators.grouped import grouping_aggregate

    df = spark.createDataFrame(
        [(None, 1), ("x", 2)], "g string, v long"
    )
    out = {
        (r.g, r.gid): r.s
        for r in grouping_aggregate(
            df, ["g"], [F.sum("v").alias("s")], kind="cube"
        ).collect()
    }
    assert out[(None, 0)] == 1      # real-null group, NOT relabeled
    assert out[("x", 0)] == 2
    assert out[("ALL", 1)] == 3     # the one subtotal row
