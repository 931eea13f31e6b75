"""tmerc AUTO hybrid (tmerc.cpp:598-615) and the generic Newton
inverse on Winkel Tripel (src/generic_inverse.cpp)."""

import numpy as np

from proj_4_spark.proj import compile_projstring


def test_auto_matches_each_regime():
    auto = compile_projstring("+proj=tmerc +algo=auto +ellps=GRS80 +lon_0=109")
    exact = compile_projstring("+proj=etmerc +ellps=GRS80 +lon_0=109")
    approx = compile_projstring(
        "+proj=tmerc +approx +ellps=GRS80 +lon_0=109")
    rng = np.random.default_rng(7)
    lon = rng.uniform(60.0, 158.0, 4000)
    lat = rng.uniform(-66.0, 66.0, 4000)
    xa, ya, _, _ = auto.transform_deg(lon, lat)
    near = np.abs(lon - 109.0) <= 3.0
    assert near.any() and (~near).any()  # both branches exercised
    xs, ys, _, _ = approx.transform_deg(lon[near], lat[near])
    np.testing.assert_array_equal(xa[near], xs)
    np.testing.assert_array_equal(ya[near], ys)
    xe, ye, _, _ = exact.transform_deg(lon[~near], lat[~near])
    np.testing.assert_array_equal(xa[~near], xe)
    np.testing.assert_array_equal(ya[~near], ye)


def test_auto_regimes_agree_near_boundary():
    # the two series agree to sub-mm at the 3-degree frontier, so the
    # hybrid is seamless (tmerc.cpp:598 rationale)
    auto = compile_projstring("+proj=tmerc +algo=auto +ellps=GRS80 +lon_0=109")
    exact = compile_projstring("+proj=etmerc +ellps=GRS80 +lon_0=109")
    lon = np.linspace(105.8, 112.2, 1001)
    lat = np.linspace(-60.0, 60.0, 1001)
    xa, ya, _, _ = auto.transform_deg(lon, lat)
    xe, ye, _, _ = exact.transform_deg(lon, lat)
    assert np.max(np.hypot(xa - xe, ya - ye)) < 1e-3


def test_wintri_newton_roundtrip():
    tr = compile_projstring("+proj=wintri")
    rng = np.random.default_rng(0)
    lon = rng.uniform(-179.9, 179.9, 20000)
    lat = rng.uniform(-89.5, 89.5, 20000)
    x, y, _, _ = tr.transform_deg(lon, lat)
    lo, la, _, _ = tr.transform_deg(x, y, direction="inv")
    err = np.hypot(lo - lon, la - lat)
    assert not np.isnan(err).any()
    assert np.nanmax(err) < 1e-8
