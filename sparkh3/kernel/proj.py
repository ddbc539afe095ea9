"""Spherical <-> icosahedral-face gnomonic projection primitives.

Implements the public H3 spec's faceijk projection pipeline, vectorized:
geo -> nearest icosahedron face -> gnomonic hex2d coords (scaled per
resolution, Class III axes rotated) and the inverse. No lookup-table
dependencies — tables.py bootstraps the base-cell tables using these.
"""

from __future__ import annotations

import numpy as np

from .constants import (
    EPSILON,
    FACE_AXES_AZ_RADS_CII,
    FACE_CENTER_GEO,
    FACE_CENTER_POINT,
    INV_RES0_U_GNOMONIC,
    M_2PI,
    M_AP7_ROT_RADS,
    M_SQRT7,
    RES0_U_GNOMONIC,
)


def pos_angle(a: np.ndarray) -> np.ndarray:
    """Normalize angles to [0, 2pi)."""
    return np.mod(a, M_2PI)


def geo_to_vec3(lat: np.ndarray, lng: np.ndarray) -> np.ndarray:
    lat = np.asarray(lat)
    out = np.empty(lat.shape + (3,), dtype=np.float64)
    cl = np.cos(lat)
    np.multiply(cl, np.cos(lng), out=out[..., 0])
    np.multiply(cl, np.sin(lng), out=out[..., 1])
    np.sin(lat, out=out[..., 2])
    return out


def vec3_to_geo(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lat = np.arcsin(np.clip(v[..., 2], -1.0, 1.0))
    lng = np.arctan2(v[..., 1], v[..., 0])
    return lat, lng


def geo_azimuth(lat1, lng1, lat2, lng2) -> np.ndarray:
    """Azimuth (radians) from point 1 to point 2 along the great circle."""
    dl = lng2 - lng1
    return np.arctan2(
        np.cos(lat2) * np.sin(dl),
        np.cos(lat1) * np.sin(lat2) - np.sin(lat1) * np.cos(lat2) * np.cos(dl),
    )


def az_distance_point(lat, lng, az, dist) -> tuple[np.ndarray, np.ndarray]:
    """Destination point given start, azimuth and angular distance."""
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    az = np.asarray(az, dtype=np.float64)
    dist = np.asarray(dist, dtype=np.float64)
    sinlat = np.sin(lat) * np.cos(dist) + np.cos(lat) * np.sin(dist) * np.cos(az)
    sinlat = np.clip(sinlat, -1.0, 1.0)
    nlat = np.arcsin(sinlat)
    y = np.sin(az) * np.sin(dist) * np.cos(lat)
    x = np.cos(dist) - np.sin(lat) * sinlat
    nlng = lng + np.arctan2(y, x)
    # constrain to (-pi, pi]
    nlng = np.mod(nlng + np.pi, M_2PI) - np.pi
    near = dist < EPSILON
    if np.any(near):
        nlat = np.where(near, lat, nlat)
        nlng = np.where(near, lng, nlng)
    return nlat, nlng


def nearest_face(lat, lng) -> tuple[np.ndarray, np.ndarray]:
    """(face index, angular distance to its center) for each point."""
    v = geo_to_vec3(np.asarray(lat, dtype=np.float64), np.asarray(lng, dtype=np.float64))
    dots = v @ FACE_CENTER_POINT.T  # (N, 20)
    face = np.argmax(dots, axis=-1)
    best = np.clip(np.take_along_axis(dots, face[..., None], axis=-1)[..., 0], -1, 1)
    return face.astype(np.int64), np.arccos(best)


def geo_to_hex2d_on_face(lat, lng, face, res: int, r_ang=None) -> np.ndarray:
    """Project points onto the gnomonic plane of the given face(s), scaled
    for `res`, with Class III axis rotation. `face` may be scalar or array.
    If r_ang (angular distance to face center) is precomputed, pass it."""
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    face = np.asarray(face, dtype=np.int64)
    fc_lat = FACE_CENTER_GEO[face, 0]
    fc_lng = FACE_CENTER_GEO[face, 1]
    if r_ang is None:
        v = geo_to_vec3(lat, lng)
        dots = np.clip(np.sum(v * FACE_CENTER_POINT[face], axis=-1), -1, 1)
        r_ang = np.arccos(dots)
    theta = pos_angle(
        FACE_AXES_AZ_RADS_CII[face] - pos_angle(geo_azimuth(fc_lat, fc_lng, lat, lng))
    )
    if res % 2:  # Class III
        theta = pos_angle(theta - M_AP7_ROT_RADS)
    r = np.tan(r_ang) * INV_RES0_U_GNOMONIC * (M_SQRT7**res)
    r = np.where(r_ang < EPSILON, 0.0, r)
    return np.stack([r * np.cos(theta), r * np.sin(theta)], axis=-1)


def hex2d_to_geo(
    pt: np.ndarray, face, res: int, substrate: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """Inverse projection: hex2d point on a face plane -> (lat, lng)."""
    face = np.asarray(face, dtype=np.int64)
    x = pt[..., 0]
    y = pt[..., 1]
    r = np.hypot(x, y)
    theta = np.arctan2(y, x)
    r = r / (M_SQRT7**res)
    if substrate:
        r = r / 3.0
        if res % 2:
            r = r / M_SQRT7
    r = np.arctan(r * RES0_U_GNOMONIC)
    if not substrate and res % 2:
        theta = pos_angle(theta + M_AP7_ROT_RADS)
    az = pos_angle(FACE_AXES_AZ_RADS_CII[face] - theta)
    fc_lat = FACE_CENTER_GEO[face, 0]
    fc_lng = FACE_CENTER_GEO[face, 1]
    lat, lng = az_distance_point(fc_lat, fc_lng, az, r)
    near = r < EPSILON
    if np.any(near):
        lat = np.where(near, fc_lat, lat)
        lng = np.where(near, fc_lng, lng)
    return lat, lng
