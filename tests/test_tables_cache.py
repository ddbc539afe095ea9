"""The checked-in table cache must equal a fresh geometric bootstrap."""

import numpy as np

from sparkh3.kernel import tables


def test_cache_matches_bootstrap():
    bc_c, rot_c, cw_c = tables.face_ijk_tables()
    bc_f, rot_f, cw_f = tables._solve_tables()
    assert np.array_equal(bc_c, bc_f)
    assert np.array_equal(rot_c, rot_f)
    assert np.array_equal(cw_c, cw_f)
