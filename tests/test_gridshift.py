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


# --- unified gridshift, deformation, tinshift --------------------------

def test_unified_gridshift_3channel_roundtrip():
    """transformations/gridshift.cpp semantics: channels 0-1 horizontal
    (radians), channel 2 vertical (meters)."""
    import numpy as np

    from proj_4_spark import proj as P
    from proj_4_spark.kernels.gridshift import Grid, synthetic_hgrid
    from proj_4_spark.proj import compile_projstring

    hg = synthetic_hgrid()
    vert = (5.0 + (np.arange(hg.values.shape[0])[:, None]
                   + np.arange(hg.values.shape[1])[None, :]) % 3)[..., None]
    P.GRID_REGISTRY["uni3"] = Grid(
        lon0=hg.lon0, lat0=hg.lat0, dlon=hg.dlon, dlat=hg.dlat,
        values=np.concatenate([hg.values, vert], axis=-1))
    tr = compile_projstring("+proj=gridshift +grids=uni3")
    rng = np.random.RandomState(95)
    lon = rng.uniform(-5, 25, 200)
    lat = rng.uniform(40, 65, 200)
    h = rng.uniform(0, 100, 200)
    lo, la, hh, _ = tr.transform_deg(lon, lat, h)
    assert np.nanmax(np.abs(hh - h)) > 1.0  # vertical applied
    l2, p2, h2, _ = tr.transform_deg(lo, la, hh, direction="inv")
    assert np.nanmax(np.abs(l2 - lon)) < 1e-9
    assert np.nanmax(np.abs(p2 - lat)) < 1e-9
    assert np.nanmax(np.abs(h2 - h)) < 1e-6


def test_deformation_velocity_grid():
    """transformations/deformation.cpp: ENU mm/yr velocities over dt
    years, cartesian in/out; iterative inverse."""
    import numpy as np

    from proj_4_spark import proj as P
    from proj_4_spark.kernels.gridshift import Grid
    from proj_4_spark.proj import compile_projstring

    n = 21
    lonr = np.linspace(np.radians(-10), np.radians(30), n)
    latr = np.linspace(np.radians(35), np.radians(70), n)
    vals = np.zeros((n, n, 3))
    vals[..., 0] = 10.0  # 10 mm/yr east
    P.GRID_REGISTRY["vel1"] = Grid(
        lon0=float(lonr[0]), lat0=float(latr[0]),
        dlon=float(lonr[1] - lonr[0]), dlat=float(latr[1] - latr[0]),
        values=vals)
    tr = compile_projstring(
        "+proj=pipeline +step +proj=cart +ellps=GRS80 "
        "+step +proj=deformation +ellps=GRS80 +grids=vel1 +dt=10")
    rng = np.random.RandomState(97)
    lon = rng.uniform(-5, 25, 100)
    lat = rng.uniform(40, 65, 100)
    X, Y, Z, _ = tr.transform_deg(lon, lat, np.zeros(100))
    tr0 = compile_projstring("+proj=cart +ellps=GRS80")
    X0, Y0, Z0, _ = tr0.transform_deg(lon, lat, np.zeros(100))
    d = np.sqrt((X - X0) ** 2 + (Y - Y0) ** 2 + (Z - Z0) ** 2)
    assert np.all(np.abs(d - 0.1) < 1e-6)  # 10 mm/yr * 10 yr
    lo, la, h, _ = tr.transform_deg(X, Y, Z, direction="inv")
    assert np.nanmax(np.abs(lo - lon)) < 1e-9
    assert np.nanmax(np.abs(h)) < 1e-6


def test_tinshift_barycentric():
    """transformations/tinshift.cpp: triangle location + barycentric
    interpolation of target coords, exact inverse on the flipped TIN."""
    import numpy as np

    from proj_4_spark import proj as P
    from proj_4_spark.kernels.gridshift import Tin
    from proj_4_spark.proj import compile_projstring

    V = np.array([[0, 0, 1, 2, 5.0], [10, 0, 11, 2, 5.0],
                  [10, 10, 11, 12, 5.0], [0, 10, 1, 12, 5.0]])
    T = np.array([[0, 1, 2], [0, 2, 3]])
    P.GRID_REGISTRY["tin1"] = Tin(vertices=V, triangles=T, has_z=True)
    tr = compile_projstring("+proj=tinshift +file=tin1")
    x, y, z, _ = tr.transform(np.array([2.0, 7.0]), np.array([3.0, 8.0]),
                              np.array([0.0, 1.0]))
    assert np.allclose(x, [3.0, 8.0])
    assert np.allclose(y, [5.0, 10.0])
    assert np.allclose(z, [5.0, 6.0])
    xi, yi, zi, _ = tr.transform(x, y, z, direction="inv")
    assert np.allclose(xi, [2.0, 7.0])
    assert np.allclose(zi, [0.0, 1.0])
    # outside the mesh -> NaN
    xo, yo, zo, _ = tr.transform(np.array([50.0]), np.array([50.0]),
                                 np.array([0.0]))
    assert np.isnan(xo[0])
