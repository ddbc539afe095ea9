"""Property-based kernel invariants (hypothesis): the randomized
complement to the golden-parity suite. Kernel-only — no Spark session.

Invariants:
* centroid roundtrip: latlng_to_cell(cell_to_latlng(c), res) == c
* hierarchy: a cell's centroid encodes to its bit-math parent at the
  parent's resolution (aperture-7 centers stay inside the truncation
  parent)
* compact/uncompact: uncompacting a cell's full child set re-compacts
  to exactly that cell
* grid_path: consecutive path cells are grid neighbors and endpoints
  are preserved
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from sparkh3.kernel import geo, index as ix, traversal as tv

LAT = st.floats(min_value=-89.5, max_value=89.5, allow_nan=False)
LNG = st.floats(min_value=-179.5, max_value=179.5, allow_nan=False)

COMMON = dict(max_examples=30, deadline=None)


class TestRoundtrips:
    @settings(**COMMON)
    @given(lat=LAT, lng=LNG, res=st.integers(0, 9))
    def test_centroid_roundtrip(self, lat, lng, res):
        c = geo.latlng_to_cell(np.array([lat]), np.array([lng]), res)[0]
        la, lo = geo.cell_to_latlng(np.array([c], dtype=np.uint64))
        c2 = geo.latlng_to_cell(la, lo, res)[0]
        assert c2 == c

    @settings(**COMMON)
    @given(lat=LAT, lng=LNG, res=st.integers(1, 9))
    def test_centroid_encodes_to_parent(self, lat, lng, res):
        c = geo.latlng_to_cell(np.array([lat]), np.array([lng]), res)[0]
        parent = ix.cell_to_parent(np.array([c], dtype=np.uint64), res - 1)[0]
        la, lo = geo.cell_to_latlng(np.array([c], dtype=np.uint64))
        snapped = geo.latlng_to_cell(la, lo, res - 1)[0]
        assert snapped == parent


class TestCompact:
    @settings(**COMMON)
    @given(lat=LAT, lng=LNG, res=st.integers(0, 6))
    def test_children_compact_to_cell(self, lat, lng, res):
        c = geo.latlng_to_cell(np.array([lat]), np.array([lng]), res)[0]
        kids = ix.cell_to_children(np.array([c], dtype=np.uint64), res + 2)
        packed = ix.compact_cells(kids)
        assert set(packed.tolist()) == {int(c)}


class TestGridPath:
    @settings(**COMMON)
    @given(
        lat=st.floats(min_value=-60.0, max_value=60.0, allow_nan=False),
        lng=st.floats(min_value=-170.0, max_value=170.0, allow_nan=False),
        dlat=st.floats(min_value=-2.0, max_value=2.0, allow_nan=False),
        dlng=st.floats(min_value=-2.0, max_value=2.0, allow_nan=False),
        res=st.integers(3, 6),
    )
    def test_path_adjacency_and_endpoints(self, lat, lng, dlat, dlng, res):
        a = geo.latlng_to_cell(np.array([lat]), np.array([lng]), res)[0]
        b = geo.latlng_to_cell(
            np.array([lat + dlat]), np.array([lng + dlng]), res
        )[0]
        path = tv.grid_path(int(a), int(b))
        assert path[0] == a and path[-1] == b
        for u, v in zip(path[:-1], path[1:]):
            assert u != v
            nbrs = set(tv.neighbors(int(u)).tolist())
            assert int(v) in nbrs, (hex(int(u)), hex(int(v)))
