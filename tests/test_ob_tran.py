"""ob_tran oblique wrapper (ob_tran.cpp; Snyder 5-7/5-8b rotation).

Golden from /root/reference/test/gie/builtins.gie:4896-4904."""

import numpy as np
import pytest

from proj_4_spark.proj import compile_projstring

PS = ("+proj=ob_tran +R=6400000 +o_proj=latlon +o_lon_p=20 +o_lat_p=20 "
      "+lon_0=180")


def test_gie_golden_rot_latlon():
    tr = compile_projstring(PS)
    x, y, _, _ = tr.transform_deg(np.array([2.0, 2.0, -2.0]),
                                  np.array([1.0, -1.0, 1.0]))
    exp_x = [-2.685687214, -2.695406975, -2.899366393]
    exp_y = [1.237430235, 1.202683395, 1.237430235]
    assert np.allclose(x, exp_x, atol=1e-8)
    assert np.allclose(y, exp_y, atol=1e-8)


@pytest.mark.parametrize("ps", [
    PS,
    "+proj=ob_tran +R=6371000 +o_proj=moll +o_lon_p=45 +o_lat_p=45",
    "+proj=ob_tran +R=6371000 +o_proj=sinu +o_lat_p=0 +o_lon_p=30",  # transverse
])
def test_roundtrip(ps):
    rng = np.random.RandomState(13)
    lon = rng.uniform(-150, 150, 400)
    lat = rng.uniform(-75, 75, 400)
    tr = compile_projstring(ps)
    x, y, _, _ = tr.transform_deg(lon, lat)
    lon2, lat2, _, _ = tr.transform_deg(x, y, direction="inv")
    ok = np.isfinite(lon2)
    assert ok.mean() > 0.95
    assert np.nanmax(np.abs(lon2[ok] - lon[ok])) < 1e-6
    assert np.nanmax(np.abs(lat2[ok] - lat[ok])) < 1e-6
