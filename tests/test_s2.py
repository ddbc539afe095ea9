"""S2 cell index: structural goldens from the published id layout,
roundtrip/containment/continuity properties, and the Spark surface.

Goldens that are published facts of the S2 scheme:
* face cells are ids (2k+1) << 60 with tokens '1','3','5','7','9','b';
* the leaf cell containing (0, 0) is 0x1000000000000001 (center of
  face 0);
* Manhattan-area leaf tokens start with '89c2' (the documented S2
  covering prefix for New York).
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sparkh3.kernel import s2


class TestGoldens:
    def test_face_cells(self):
        fc = np.array([(2 * k + 1) << 60 for k in range(6)], dtype=np.uint64)
        assert (s2.get_level(fc) == 0).all()
        assert list(s2.get_face(fc)) == [0, 1, 2, 3, 4, 5]
        assert list(s2.cell_to_token(fc)) == ["1", "3", "5", "7", "9", "b"]
        assert s2.is_valid_cell(fc).all()

    def test_origin_leaf(self):
        c = s2.latlng_to_cell(0.0, 0.0, 30)
        assert int(c[0]) == 0x1000000000000001

    def test_nyc_token_prefix(self):
        c = s2.latlng_to_cell(40.7580, -73.9855, 30)  # Times Square
        assert s2.cell_to_token(c)[0].startswith("89c2")

    def test_invalid_cells(self):
        bad = np.array(
            [0, 6 << 61, (1 << 63), 2 << 61], dtype=np.uint64
        )  # zero, face 6, face-bit-only ids
        assert not s2.is_valid_cell(bad).any()


class TestProperties:
    @settings(max_examples=150, deadline=None)
    @given(
        st.floats(min_value=-89.9, max_value=89.9),
        st.floats(min_value=-179.9, max_value=179.9),
        st.integers(min_value=0, max_value=30),
    )
    def test_roundtrip_and_containment(self, lat, lng, level):
        c = s2.latlng_to_cell(lat, lng, level)
        assert s2.is_valid_cell(c).all()
        assert int(s2.get_level(c)[0]) == level
        # center decodes back into the SAME cell
        la, lo = s2.cell_to_latlng(c)
        assert int(s2.latlng_to_cell(la, lo, level)[0]) == int(c[0])
        # ancestor bit math == direct coarse encode
        leaf = s2.latlng_to_cell(lat, lng, 30)
        assert int(s2.cell_to_parent(leaf, level)[0]) == int(c[0])
        # leaf sits inside the ancestor's descendant range
        lo_r, hi_r = s2.descendant_range(c)
        assert lo_r[0] <= leaf[0] <= hi_r[0]

    def test_children_partition_parent(self):
        lat = np.array([40.75, -33.86, 0.01, 71.0])
        lng = np.array([-73.99, 151.2, 0.01, -42.0])
        par = s2.latlng_to_cell(lat, lng, 12)
        ch = s2.cell_to_children(par).reshape(-1, 4)
        assert (s2.get_level(ch.ravel()) == 13).all()
        lo, hi = s2.descendant_range(par)
        for r in range(len(par)):
            clo, chi = s2.descendant_range(ch[r])
            # children's leaf ranges tile the parent's exactly
            assert clo.min() == lo[r] and chi.max() == hi[r]
            order = np.argsort(ch[r])
            # consecutive leaf ids differ by 2 (odd trailing bit)
            assert (chi[order][:-1] + 2 == clo[order][1:]).all()

    def test_curve_continuity(self):
        """Consecutive leaf ids map to spatially adjacent points — the
        Hilbert locality property that makes id-range pruning work."""
        base = s2.latlng_to_cell(np.array([10.0]), np.array([20.0]), 30)
        seq = base[0] + np.arange(0, 4000, 2).astype(np.uint64) * np.uint64(2)
        la, lo = s2.cell_to_latlng(seq)
        step = np.hypot(np.diff(la), np.diff(lo))
        assert step.max() < 1e-5


class TestSparkSurface:
    def test_udfs_match_kernel(self, spark):
        from pyspark.sql import functions as F

        from sparkh3 import functions as H3F

        pts = [(i, 40.0 + i * 0.37, -73.0 + i * 1.13) for i in range(50)]
        df = spark.createDataFrame(pts, ["id", "lat", "lng"])
        out = (
            df.withColumn("c12", H3F.latlng_to_s2_udf(12)("lat", "lng"))
            .withColumn("p6", H3F.s2_parent_int(F.col("c12"), 6))
            .withColumn("tok", H3F.s2_token_udf()(F.col("c12")))
            .withColumn("ctr", H3F.s2_to_latlng_udf()(F.col("c12")))
            .collect()
        )
        la = np.array([p[1] for p in pts])
        lo = np.array([p[2] for p in pts])
        want12 = s2.latlng_to_cell(la, lo, 12).view(np.int64)
        want6 = s2.cell_to_parent(want12.view(np.uint64), 6).view(np.int64)
        toks = s2.cell_to_token(want12.view(np.uint64))
        cla, clo = s2.cell_to_latlng(want12.view(np.uint64))
        for r, w12, w6, t, wl, wo in zip(out, want12, want6, toks, cla, clo):
            assert r.c12 == w12 and r.p6 == w6 and r.tok == t
            assert abs(r.ctr.lat - wl) < 1e-12 and abs(r.ctr.lng - wo) < 1e-12

    def test_parent_null_safe(self, spark):
        from pyspark.sql import functions as F

        from sparkh3 import functions as H3F

        df = spark.createDataFrame([(None,), (1 << 60,)], "c: long")
        got = df.select(H3F.s2_parent_int(F.col("c"), 0).alias("p")).collect()
        assert got[0].p is None and got[1].p == (1 << 60)
