"""Grid-shift kernels: bilinear application + iterative inverse."""

import numpy as np

from proj_4_spark.kernels.gridshift import (
    Grid, hgrid_fwd, hgrid_inv, synthetic_hgrid, vgrid_apply)


RNG = np.random.RandomState(11)
LAM = np.radians(RNG.uniform(-5, 25, 2000))
PHI = np.radians(RNG.uniform(40, 65, 2000))


def test_hgrid_roundtrip():
    g = synthetic_hgrid()
    fl, fp = hgrid_fwd(g, LAM, PHI)
    # shifts applied (non-zero)
    assert np.max(np.abs(fl - LAM)) > 1e-7
    bl, bp = hgrid_inv(g, fl, fp)
    # grids.cpp inverse tolerance: 1e-12 rad
    assert np.max(np.abs(bl - LAM)) < 1e-11
    assert np.max(np.abs(bp - PHI)) < 1e-11


def test_outside_grid_is_identity():
    g = synthetic_hgrid()
    lam = np.radians(np.array([120.0]))
    phi = np.radians(np.array([10.0]))
    fl, fp = hgrid_fwd(g, lam, phi)
    assert fl[0] == lam[0] and fp[0] == phi[0]


def test_vgrid_sign_convention():
    g = synthetic_hgrid()
    und = Grid(g.lon0, g.lat0, g.dlon, g.dlat, g.values[..., 0] * 1e5)
    z = np.zeros_like(LAM)
    z_ortho = vgrid_apply(und, LAM, PHI, z, forward=True)
    z_back = vgrid_apply(und, LAM, PHI, z_ortho, forward=False)
    assert np.max(np.abs(z_back - z)) < 1e-12
    assert np.max(np.abs(z_ortho)) > 0.01  # non-trivial undulation
