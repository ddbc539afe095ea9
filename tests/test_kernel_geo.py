"""Projection-kernel goldens from the reference suite + notebook, and the
full-sphere roundtrip conformance test.

Golden sources: /root/reference/tests/test_h3pandas.py:118-121,140-165,
443-448; /root/reference/notebook/00-intro.ipynb saved outputs (NYC);
reference docstring ladder (h3pandas.py:66-84, README.md:60-63).
"""

import numpy as np
import pytest

from sparkh3.kernel import geo
from sparkh3.kernel import index as ix


def i2s(a):
    return list(ix.int_to_str(a))


class TestLatLngToCell:
    def test_golden_ladder(self):
        lat = [50.0, 51.0]
        lng = [14.0, 15.0]
        for res, exp in [
            (1, ["811e3ffffffffff", "811e3ffffffffff"]),
            (8, ["881e309739fffff", "881e2659c3fffff"]),
            (9, ["891e3097383ffff", "891e2659c2fffff"]),
            (10, ["8a1e30973807fff", "8a1e2659c2c7fff"]),
        ]:
            assert i2s(geo.latlng_to_cell(lat, lng, res)) == exp

    def test_nyc_notebook_goldens(self):
        lat = [40.750111, 40.739811, 40.754246, 40.751896, 40.745079]
        lng = [-73.993896, -73.976425, -73.968704, -73.976601, -73.994957]
        exp = [
            "8a2a100d2c87fff",
            "8a2a100d2a07fff",
            "8a2a100d630ffff",
            "8a2a100d629ffff",
            "8a2a100d2557fff",
        ]
        assert i2s(geo.latlng_to_cell(lat, lng, 10)) == exp


class TestCellToLatLng:
    def test_centroid_goldens(self):
        h = ix.str_to_int(["891e3097383ffff", "891e2659c2fffff"])
        lat, lng = geo.cell_to_latlng(h)
        np.testing.assert_allclose(
            lat, [50.000551554902586, 51.000121447274736], atol=1e-9
        )
        np.testing.assert_allclose(
            lng, [14.000372151097624, 14.999768926738376], atol=1e-9
        )


class TestBoundary:
    def test_boundary_golden_ring(self):
        h = ix.str_to_int(["891e3097383ffff"])
        ring = geo.cell_to_boundary(h)[0]  # (n, 2) lat,lng
        exp_lnglat = np.array(
            [
                (13.997875502962215, 50.00126530465277),
                (13.997981974191347, 49.99956539765703),
                (14.000478563108897, 49.99885162163456),
                (14.002868770645003, 49.99983773856239),
                (14.002762412857178, 50.00153765760209),
                (14.000265734090084, 50.00225144767143),
            ]
        )
        got = np.stack([ring[:, 1], ring[:, 0]], axis=1)
        assert len(got) == 6
        # ring start/orientation independent comparison
        best = np.inf
        for s in range(6):
            for g in (np.roll(got, -s, axis=0), np.roll(got, -s, axis=0)[::-1]):
                best = min(best, np.abs(g - exp_lnglat).max())
        assert best < 1e-9


class TestCellArea:
    def test_area_goldens(self):
        h = ix.str_to_int(["891e3097383ffff", "891e2659c2fffff"])
        np.testing.assert_allclose(
            geo.cell_area(h, "km^2"),
            [0.09937867173389912, 0.09775508251476996],
            rtol=1e-9,
        )

    def test_units(self):
        h = ix.str_to_int(["891e3097383ffff"])
        km2 = geo.cell_area(h, "km^2")[0]
        m2 = geo.cell_area(h, "m^2")[0]
        assert m2 == pytest.approx(km2 * 1e6)
        assert geo.cell_area(h, "rads^2")[0] > 0


class TestFullSphereRoundtrip:
    """The strong conformance check: every cell center maps back to its
    cell, across all 122 base cells (incl. all 12 pentagons), and random
    points roundtrip at deep resolutions."""

    def test_all_cells_res2(self):
        bases = np.arange(122, dtype=np.uint64)
        cells0 = ix.build_cell(bases, 0, np.full((122, 15), 7, dtype=np.int64))
        cells = ix.cell_to_children(cells0, 2)
        lat, lng = geo.cell_to_latlng(cells)
        back = geo.latlng_to_cell(lat, lng, 2)
        assert int((back != cells).sum()) == 0

    def test_random_points_deep(self):
        rng = np.random.default_rng(42)
        lat = rng.uniform(-89.9, 89.9, 5000)
        lng = rng.uniform(-180.0, 180.0, 5000)
        for res in (1, 6, 11, 15):
            c = geo.latlng_to_cell(lat, lng, res)
            assert ix.is_valid_cell(c).all()
            la, lo = geo.cell_to_latlng(c)
            back = geo.latlng_to_cell(la, lo, res)
            assert int((back != c).sum()) == 0

    def test_sphere_area_closure(self):
        # boundaries (incl. Class III distortion vertices and pentagon
        # crossings) tile the sphere exactly: areas sum to 4*pi
        bases = np.arange(122, dtype=np.uint64)
        cells0 = ix.build_cell(bases, 0, np.full((122, 15), 7, dtype=np.int64))
        cells = ix.cell_to_children(cells0, 1)
        total = geo.cell_area(cells, "rads^2").sum()
        assert abs(total / (4 * np.pi) - 1.0) < 1e-12

    def test_parent_consistency(self):
        # H3 hexagons do not nest geometrically, so parent(cell(p,9),5) may
        # differ from cell(p,5) for points near res-5 edges — but only for
        # a small fraction (the fractal boundary sliver).
        rng = np.random.default_rng(1)
        lat = rng.uniform(-89, 89, 2000)
        lng = rng.uniform(-180, 180, 2000)
        c9 = geo.latlng_to_cell(lat, lng, 9)
        c5 = geo.latlng_to_cell(lat, lng, 5)
        # measured ~7% — the aperture-7 boundary sliver, constant per level
        mismatch = (ix.cell_to_parent(c9, 5) != c5).mean()
        assert mismatch < 0.10
