"""Polygon coverage: point-in-polygon (even-odd ray cast, planar in
lat/lng like the public H3 polygon algorithms) and polygon_to_cells with
center-containment semantics ("cells whose centroid is inside"), holes
subtracting and MultiPolygon as union — matching the reference polyfill
behavior (reference h3pandas.py:357-407, tests/util/test_shapely.py:39-57).

Algorithm: densified edge trace -> candidate band (edge cells + 1-ring)
-> BFS interior fill through center-inside cells. Exact w.r.t.
center-containment; no bounding-box scans, so cost scales with the
polygon's cell count, not its bbox.
"""

from __future__ import annotations

import numpy as np

from . import geo
from . import traversal as tv

# ring: (M, 2) array of (lat, lng) degrees, closed or open
Rings = list[np.ndarray]


def _normalize_rings(rings: Rings) -> tuple[Rings, bool]:
    """Shift transmeridian polygons into a continuous lng frame (+360 on
    the negative side). The decision is per-POLYGON, the shift applied
    to EVERY ring: a hole that does not itself span >180 deg (e.g. a
    small hole at lng -179.5 inside a shell crossing the antimeridian)
    must still move into the shell's frame, or the ray cast would test
    it against shifted query points and silently ignore it. Returns
    (rings, shifted?)."""
    arrs = [np.asarray(r, dtype=np.float64) for r in rings]
    shifted = any(
        r[:, 1].max() - r[:, 1].min() > 180.0 for r in arrs if len(r)
    )
    if not shifted:
        return arrs, False
    out = []
    for r in arrs:
        r = r.copy()
        r[:, 1] = np.where(r[:, 1] < 0.0, r[:, 1] + 360.0, r[:, 1])
        out.append(r)
    return out, True


def points_in_rings(lat: np.ndarray, lng: np.ndarray, rings: Rings) -> np.ndarray:
    """Even-odd containment of points vs the union of ring boundaries
    (outer ring + holes together implement 'holes subtract')."""
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    rings, shifted = _normalize_rings(rings)
    if shifted:
        lng = np.where(lng < 0.0, lng + 360.0, lng)
    inside = np.zeros(lat.shape, dtype=bool)
    for ring in rings:
        r = ring
        if not (r[0] == r[-1]).all():
            r = np.vstack([r, r[:1]])
        y1 = r[:-1, 0][None, :]
        x1 = r[:-1, 1][None, :]
        y2 = r[1:, 0][None, :]
        x2 = r[1:, 1][None, :]
        yp = lat[:, None]
        xp = lng[:, None]
        cross = (y1 > yp) != (y2 > yp)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1) * (yp - y1) / (y2 - y1) + x1
        hit = cross & (xp < xint)
        inside ^= (hit.sum(axis=1) % 2).astype(bool)
    return inside


def _densify_edges(rings: Rings, step_deg: float) -> tuple[np.ndarray, np.ndarray]:
    """Sample points along every ring edge at ~step_deg spacing, in BOTH
    edge geometries: geodesic (3D lerp) AND planar lat/lng lerp. The
    containment semantics everywhere downstream (points_in_rings, the
    SQL oracles) are PLANAR, so the boundary band must contain every
    cell the planar edges cross — a geodesic-only trace bulges away
    from a long planar edge (e.g. a 20-deg lat=55 rect top deviates
    ~0.4 deg) and can leave planar-crossed cells out of the band, which
    would both break the cover's superset contract and falsely mark
    those cells interior. The geodesic samples are kept so the band
    also bounds the sphere-faithful interpretation."""
    from . import proj

    lats = []
    lngs = []
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if not (r[0] == r[-1]).all():
            r = np.vstack([r, r[:1]])
        a = r[:-1]
        b = r[1:]
        v1 = proj.geo_to_vec3(np.radians(a[:, 0]), np.radians(a[:, 1]))
        v2 = proj.geo_to_vec3(np.radians(b[:, 0]), np.radians(b[:, 1]))
        seg_len = np.degrees(
            2 * np.arcsin(np.clip(np.linalg.norm(v2 - v1, axis=1) / 2, 0, 1))
        )
        for i in range(len(a)):
            n = max(int(np.ceil(seg_len[i] / step_deg)), 1)
            t = np.linspace(0.0, 1.0, n + 1)[:, None]
            pts = v1[i][None, :] * (1 - t) + v2[i][None, :] * t
            nrm = np.linalg.norm(pts, axis=1, keepdims=True)
            pts = pts / np.maximum(nrm, 1e-300)
            la, lo = proj.vec3_to_geo(pts)
            lats.append(np.degrees(la))
            lngs.append(np.degrees(lo))
    # planar samples, in the normalized (non-wrapping) longitude frame;
    # trig in latlng_to_cell is periodic so lng > 180 needs no re-wrap
    nrings, _ = _normalize_rings(rings)
    for ring in nrings:
        r = np.asarray(ring, dtype=np.float64)
        if not (r[0] == r[-1]).all():
            r = np.vstack([r, r[:1]])
        a = r[:-1]
        b = r[1:]
        seg = np.maximum(
            np.abs(b[:, 0] - a[:, 0]), np.abs(b[:, 1] - a[:, 1])
        )
        for i in range(len(a)):
            n = max(int(np.ceil(seg[i] / step_deg)), 1)
            t = np.linspace(0.0, 1.0, n + 1)[:, None]
            p = a[i][None, :] * (1 - t) + b[i][None, :] * t
            lats.append(p[:, 0])
            lngs.append(p[:, 1])
    return np.concatenate(lats), np.concatenate(lngs)


# mean hexagon edge length in degrees by resolution (res-0 edge ~ 20.7 deg
# of arc / sqrt(7) per res); used only to pick a sampling density.
_EDGE_DEG_RES0 = 20.0


def polygon_to_cells(rings: Rings, res: int) -> np.ndarray:
    """Cells at `res` whose center falls inside the polygon (first ring =
    shell, remaining rings = holes, even-odd)."""
    return _polygon_cells_impl(rings, res, cover=False)


def polygon_cover_cells(rings: Rings, res: int) -> np.ndarray:
    """Superset cover: every cell that intersects the polygon (center
    inside OR boundary-crossing band). Candidate set for exact PIP joins —
    no point inside the polygon can fall outside these cells."""
    return _polygon_cells_impl(rings, res, cover=True)


def polygon_cover_cells_classified(
    rings: Rings, res: int
) -> tuple[np.ndarray, np.ndarray]:
    """(cover cells, interior mask): the cover plus a mask marking cells
    PROVEN fully inside the polygon. A cover cell outside the boundary
    band (densified edge trace + 1-ring — the same construction whose
    completeness the cover's superset guarantee already rests on) is
    never crossed by the polygon boundary, and its center is inside, so
    the WHOLE cell is inside. PIP joins skip the exact per-point ray
    cast for points landing in interior cells; only boundary-band cells
    pay it — at scale that is the region's perimeter, not its area."""
    cells, band = _polygon_cells_impl(rings, res, cover=True, with_band=True)
    return cells, ~np.isin(cells, band)


def _polygon_cells_impl(
    rings: Rings, res: int, cover: bool, with_band: bool = False
):
    rings = [np.asarray(r, dtype=np.float64) for r in rings if len(r) >= 3]
    if not rings:
        empty = np.array([], dtype=np.uint64)
        return (empty, empty) if with_band else empty
    step = max(_EDGE_DEG_RES0 / (7 ** (res / 2.0)) * 0.4, 1e-9)
    elat, elng = _densify_edges(rings, step)
    edge_cells = np.unique(geo.latlng_to_cell(elat, elng, res))
    # candidate band: edge cells + their neighbors
    _, nb = tv._neighbors_with_owner(edge_cells)
    band = np.unique(np.concatenate([edge_cells, nb]))
    clat, clng = geo.cell_to_latlng(band)
    inside_mask = points_in_rings(clat, clng, rings)
    result = set(band[inside_mask].tolist())
    visited = set(band.tolist())
    frontier = np.array(sorted(result), dtype=np.uint64)
    while len(frontier):
        _, nb = tv._neighbors_with_owner(frontier)
        nb = np.unique(nb)
        nb = np.array([c for c in nb.tolist() if c not in visited], dtype=np.uint64)
        if len(nb) == 0:
            break
        visited.update(nb.tolist())
        nlat, nlng = geo.cell_to_latlng(nb)
        keep = points_in_rings(nlat, nlng, rings)
        new_inside = nb[keep]
        result.update(new_inside.tolist())
        frontier = new_inside
    if cover:
        result.update(band.tolist())
    out = np.array(sorted(result), dtype=np.uint64)
    return (out, band) if with_band else out


def multipolygon_to_cells(polys: list[Rings], res: int) -> np.ndarray:
    """Union of polygon_to_cells over MultiPolygon parts."""
    out: list[np.ndarray] = []
    for rings in polys:
        out.append(polygon_to_cells(rings, res))
    if not out:
        return np.array([], dtype=np.uint64)
    return np.unique(np.concatenate(out))


def multipolygon_cover_cells(polys: list[Rings], res: int) -> np.ndarray:
    out: list[np.ndarray] = []
    for rings in polys:
        out.append(polygon_cover_cells(rings, res))
    if not out:
        return np.array([], dtype=np.uint64)
    return np.unique(np.concatenate(out))
