"""Icosahedral geometry constants for the from-scratch H3 kernel.

All values are from the public H3 grid-system specification (h3geo.org):
the 20 icosahedron face centers, the azimuth of each face's Class-II
i-axis, and the home FaceIJK of each of the 122 resolution-0 base cells.
The derived lookup tables (face+ijk -> base cell, base-cell orientation
per face, pentagon cw-offset faces) are NOT hand-maintained here — they
are reconstructed geometrically from these anchors in tables.py and
validated by a full-sphere roundtrip test (tests/test_kernel_roundtrip.py)
plus the reference golden suite.
"""

from __future__ import annotations

import math

import numpy as np

M_PI = math.pi
M_2PI = 2.0 * math.pi
M_SIN60 = math.sqrt(3.0) / 2.0
M_SQRT7 = math.sqrt(7.0)
M_RSQRT7 = 1.0 / M_SQRT7

# rotation angle between Class II and Class III resolution axes: asin(sqrt(3/28))
M_AP7_ROT_RADS = math.asin(math.sqrt(3.0 / 28.0))

# scaling factor from hex2d resolution 0 unit length to gnomonic unit length
# (1/phi^2 = (3-sqrt5)/2)
RES0_U_GNOMONIC = 0.38196601125010500003
INV_RES0_U_GNOMONIC = 1.0 / RES0_U_GNOMONIC

# Earth authalic radius (km), as used by the public H3 area functions
EARTH_RADIUS_KM = 6371.007180918475

EPSILON = 1e-10

NUM_ICOSA_FACES = 20

# icosahedron face centers in (lat, lng) radians — public H3 spec layout
# (Dymaxion-like orientation placing all 12 vertices in ocean).
FACE_CENTER_GEO = np.array(
    [
        [0.803582649718989942, 1.248397419617396099],  # face  0
        [1.307747883455638156, 2.536945009877921159],  # face  1
        [1.054751253523952054, -1.347517358900396623],  # face  2
        [0.600191595538186799, -0.450603909469755746],  # face  3
        [0.491715428198773866, 0.401988202911306943],  # face  4
        [0.172745327415618701, 1.678146885280433686],  # face  5
        [0.605929321571350690, 2.953923329812411617],  # face  6
        [0.427370518328979641, -1.888876200336285401],  # face  7
        [-0.079066118549212831, -0.733429513380867741],  # face  8
        [-0.230961644455383637, 0.506495587332349035],  # face  9
        [0.079066118549212831, 2.408163140208925497],  # face 10
        [0.230961644455383637, -2.635097066257444203],  # face 11
        [-0.172745327415618701, -1.463445768309359553],  # face 12
        [-0.605929321571350690, -0.187669323777381622],  # face 13
        [-0.427370518328979641, 1.252716453253507838],  # face 14
        [-0.600191595538186799, 2.690988744120037492],  # face 15
        [-0.491715428198773866, -2.739604450678486295],  # face 16
        [-0.803582649718989942, -1.893195233972397139],  # face 17
        [-1.307747883455638156, -0.604647643711872080],  # face 18
        [-1.054751253523952054, 1.794075294689396615],  # face 19
    ]
)

# azimuth (radians) from each face center to the Class-II i-axis
# (column 0 of the spec's face-axes table; the only column the projection
# algorithms use).
FACE_AXES_AZ_RADS_CII = np.array(
    [
        5.619958268523939882,  # face  0
        5.760339081714187279,  # face  1
        0.780213654393430055,  # face  2
        0.430469363979999913,  # face  3
        6.130269123335111400,  # face  4
        2.692877706530642877,  # face  5
        2.982963003477243874,  # face  6
        3.532912002790141181,  # face  7
        3.494305004259568154,  # face  8
        3.003214169499538391,  # face  9
        5.930472956509811562,  # face 10
        0.138378484090254885,  # face 11
        0.448714947059150361,  # face 12
        0.158629650112549365,  # face 13
        5.891865957979238535,  # face 14
        2.711123289609793325,  # face 15
        3.294508837434268316,  # face 16
        3.804819692245439833,  # face 17
        3.664438879055192436,  # face 18
        2.361378999196363184,  # face 19
    ]
)

# 3D unit vectors of face centers (derived)
_lat = FACE_CENTER_GEO[:, 0]
_lng = FACE_CENTER_GEO[:, 1]
FACE_CENTER_POINT = np.stack(
    [np.cos(_lat) * np.cos(_lng), np.cos(_lat) * np.sin(_lng), np.sin(_lat)], axis=1
)

# home FaceIJK for each of the 122 base cells: (face, i, j, k).
# Public H3 spec base-cell layout; validated structurally in tests
# (uniqueness of centers, pentagons exactly on icosahedron vertices,
# full-sphere coverage) and against reference goldens.
BASE_CELL_DATA = np.array(
    [
        (1, 1, 0, 0),  # 0
        (2, 1, 1, 0),  # 1
        (1, 0, 0, 0),  # 2
        (2, 1, 0, 0),  # 3
        (0, 2, 0, 0),  # 4 pentagon
        (1, 1, 1, 0),  # 5
        (1, 0, 0, 1),  # 6
        (2, 0, 0, 0),  # 7
        (0, 1, 0, 0),  # 8
        (2, 0, 1, 0),  # 9
        (1, 0, 1, 0),  # 10
        (1, 0, 1, 1),  # 11
        (3, 1, 0, 0),  # 12
        (3, 1, 1, 0),  # 13
        (11, 2, 0, 0),  # 14 pentagon
        (4, 1, 0, 0),  # 15
        (0, 0, 0, 0),  # 16
        (6, 0, 1, 0),  # 17
        (0, 0, 0, 1),  # 18
        (2, 0, 1, 1),  # 19
        (7, 0, 0, 1),  # 20
        (2, 0, 0, 1),  # 21
        (0, 1, 1, 0),  # 22
        (6, 0, 0, 1),  # 23
        (10, 2, 0, 0),  # 24 pentagon
        (6, 0, 0, 0),  # 25
        (3, 0, 0, 0),  # 26
        (11, 1, 0, 0),  # 27
        (4, 1, 1, 0),  # 28
        (3, 0, 1, 0),  # 29
        (0, 0, 1, 1),  # 30
        (4, 0, 0, 0),  # 31
        (5, 0, 1, 0),  # 32
        (0, 0, 1, 0),  # 33
        (7, 0, 1, 0),  # 34
        (11, 1, 1, 0),  # 35
        (7, 0, 0, 0),  # 36
        (10, 1, 0, 0),  # 37
        (12, 2, 0, 0),  # 38 pentagon
        (6, 1, 0, 1),  # 39
        (7, 1, 0, 1),  # 40
        (4, 0, 0, 1),  # 41
        (3, 0, 0, 1),  # 42
        (3, 0, 1, 1),  # 43
        (4, 0, 1, 0),  # 44
        (6, 1, 0, 0),  # 45
        (11, 0, 0, 0),  # 46
        (8, 0, 0, 0),  # 47
        (5, 0, 0, 1),  # 48
        (14, 2, 0, 0),  # 49 pentagon
        (5, 0, 0, 0),  # 50
        (12, 1, 0, 0),  # 51
        (10, 1, 1, 0),  # 52
        (4, 0, 1, 1),  # 53
        (12, 1, 1, 0),  # 54
        (7, 1, 0, 0),  # 55
        (11, 0, 1, 0),  # 56
        (10, 0, 0, 0),  # 57
        (13, 2, 0, 0),  # 58 pentagon
        (10, 0, 0, 1),  # 59
        (11, 0, 0, 1),  # 60
        (9, 0, 1, 0),  # 61
        (8, 0, 1, 0),  # 62
        (6, 2, 0, 0),  # 63 pentagon
        (8, 0, 0, 1),  # 64
        (9, 0, 0, 1),  # 65
        (14, 1, 0, 0),  # 66
        (5, 1, 0, 1),  # 67
        (16, 0, 1, 1),  # 68
        (8, 1, 0, 1),  # 69
        (5, 1, 0, 0),  # 70
        (12, 0, 0, 0),  # 71
        (7, 2, 0, 0),  # 72 pentagon
        (12, 0, 1, 0),  # 73
        (10, 0, 1, 0),  # 74
        (9, 0, 0, 0),  # 75
        (13, 1, 0, 0),  # 76
        (16, 0, 0, 1),  # 77
        (15, 0, 1, 1),  # 78
        (15, 0, 1, 0),  # 79
        (16, 0, 1, 0),  # 80
        (14, 1, 1, 0),  # 81
        (13, 1, 1, 0),  # 82
        (5, 2, 0, 0),  # 83 pentagon
        (8, 1, 0, 0),  # 84
        (14, 0, 0, 0),  # 85
        (9, 1, 0, 1),  # 86
        (14, 0, 0, 1),  # 87
        (17, 0, 0, 1),  # 88
        (12, 0, 0, 1),  # 89
        (16, 0, 0, 0),  # 90
        (17, 0, 1, 1),  # 91
        (15, 0, 0, 1),  # 92
        (16, 1, 0, 1),  # 93
        (9, 1, 0, 0),  # 94
        (15, 0, 0, 0),  # 95
        (13, 0, 0, 0),  # 96
        (8, 2, 0, 0),  # 97 pentagon
        (13, 0, 1, 0),  # 98
        (17, 1, 0, 1),  # 99
        (19, 0, 1, 0),  # 100
        (14, 0, 1, 0),  # 101
        (19, 0, 1, 1),  # 102
        (17, 0, 1, 0),  # 103
        (13, 0, 0, 1),  # 104
        (17, 0, 0, 0),  # 105
        (16, 1, 0, 0),  # 106
        (9, 2, 0, 0),  # 107 pentagon
        (15, 1, 0, 1),  # 108
        (15, 1, 0, 0),  # 109
        (18, 0, 1, 1),  # 110
        (18, 0, 0, 1),  # 111
        (19, 0, 0, 1),  # 112
        (17, 1, 0, 0),  # 113
        (19, 0, 0, 0),  # 114
        (18, 0, 1, 0),  # 115
        (18, 1, 0, 1),  # 116
        (19, 2, 0, 0),  # 117 pentagon
        (19, 1, 0, 0),  # 118
        (18, 0, 0, 0),  # 119
        (19, 1, 0, 1),  # 120
        (18, 1, 0, 0),  # 121
    ],
    dtype=np.int64,
)

# quadrant constants for the face-neighbor table
IJ_QUADRANT = 1
KI_QUADRANT = 2
JK_QUADRANT = 3

# For each face: the neighboring face across each edge quadrant, the
# translation of the coordinate origin (in res-0 units, scaled at use
# time), and the number of 60deg ccw rotations. Entry 0 is the face itself.
# Public H3 spec icosahedron unfolding; validated/repaired by the
# full-sphere roundtrip solver in tables.py if inconsistent.
FACE_NEIGHBORS = np.array(
    [
        # face, (i, j, k) translate, ccwRot60 — rows: center, IJ, KI, JK
        [[0, 0, 0, 0, 0], [4, 2, 0, 2, 1], [1, 2, 2, 0, 5], [5, 0, 2, 2, 3]],
        [[1, 0, 0, 0, 0], [0, 2, 0, 2, 1], [2, 2, 2, 0, 5], [6, 0, 2, 2, 3]],
        [[2, 0, 0, 0, 0], [1, 2, 0, 2, 1], [3, 2, 2, 0, 5], [7, 0, 2, 2, 3]],
        [[3, 0, 0, 0, 0], [2, 2, 0, 2, 1], [4, 2, 2, 0, 5], [8, 0, 2, 2, 3]],
        [[4, 0, 0, 0, 0], [3, 2, 0, 2, 1], [0, 2, 2, 0, 5], [9, 0, 2, 2, 3]],
        [[5, 0, 0, 0, 0], [10, 2, 2, 0, 3], [14, 2, 0, 2, 3], [0, 0, 2, 2, 3]],
        [[6, 0, 0, 0, 0], [11, 2, 2, 0, 3], [10, 2, 0, 2, 3], [1, 0, 2, 2, 3]],
        [[7, 0, 0, 0, 0], [12, 2, 2, 0, 3], [11, 2, 0, 2, 3], [2, 0, 2, 2, 3]],
        [[8, 0, 0, 0, 0], [13, 2, 2, 0, 3], [12, 2, 0, 2, 3], [3, 0, 2, 2, 3]],
        [[9, 0, 0, 0, 0], [14, 2, 2, 0, 3], [13, 2, 0, 2, 3], [4, 0, 2, 2, 3]],
        [[10, 0, 0, 0, 0], [5, 2, 2, 0, 3], [6, 2, 0, 2, 3], [15, 0, 2, 2, 3]],
        [[11, 0, 0, 0, 0], [6, 2, 2, 0, 3], [7, 2, 0, 2, 3], [16, 0, 2, 2, 3]],
        [[12, 0, 0, 0, 0], [7, 2, 2, 0, 3], [8, 2, 0, 2, 3], [17, 0, 2, 2, 3]],
        [[13, 0, 0, 0, 0], [8, 2, 2, 0, 3], [9, 2, 0, 2, 3], [18, 0, 2, 2, 3]],
        [[14, 0, 0, 0, 0], [9, 2, 2, 0, 3], [5, 2, 0, 2, 3], [19, 0, 2, 2, 3]],
        [[15, 0, 0, 0, 0], [16, 2, 0, 2, 1], [19, 2, 2, 0, 5], [10, 0, 2, 2, 3]],
        [[16, 0, 0, 0, 0], [17, 2, 0, 2, 1], [15, 2, 2, 0, 5], [11, 0, 2, 2, 3]],
        [[17, 0, 0, 0, 0], [18, 2, 0, 2, 1], [16, 2, 2, 0, 5], [12, 0, 2, 2, 3]],
        [[18, 0, 0, 0, 0], [19, 2, 0, 2, 1], [17, 2, 2, 0, 5], [13, 0, 2, 2, 3]],
        [[19, 0, 0, 0, 0], [15, 2, 0, 2, 1], [18, 2, 2, 0, 5], [14, 0, 2, 2, 3]],
    ],
    dtype=np.int64,
)

# maxDim / unitScale by Class-II resolution (res 0..16): 2*7^(r/2) and 7^(r/2)
MAX_DIM_BY_CII_RES = np.array(
    [2 * 7 ** (r // 2) if r % 2 == 0 else -1 for r in range(17)], dtype=np.int64
)
UNIT_SCALE_BY_CII_RES = np.array(
    [7 ** (r // 2) if r % 2 == 0 else -1 for r in range(17)], dtype=np.int64
)
