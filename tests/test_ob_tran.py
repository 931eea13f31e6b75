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


def test_alpha_spec_matches_derived_pole():
    # o_alpha spec (ob_tran.cpp:223-238): lamp/phip derived from the
    # centre + azimuth must drive the identical rotation as the same
    # values given explicitly via o_lon_p/o_lat_p. (PROJ measures the
    # rotation longitude against lon_0, not lamp; lamp only shifts
    # the rotated-longitude origin, so equivalence IS the semantics.)
    import math
    lamc, phic, alpha = map(math.radians, (10.0, 40.0, 30.0))
    lamp = lamc + math.atan2(-math.cos(alpha),
                             -math.sin(alpha) * math.sin(phic))
    phip = math.asin(math.cos(phic) * math.sin(alpha))
    tr_a = compile_projstring(
        "+proj=ob_tran +R=6400000 +o_proj=latlon "
        "+o_lon_c=10 +o_lat_c=40 +o_alpha=30")
    tr_p = compile_projstring(
        "+proj=ob_tran +R=6400000 +o_proj=latlon "
        f"+o_lon_p={math.degrees(lamp)} +o_lat_p={math.degrees(phip)}")
    rng = np.random.RandomState(3)
    lon = rng.uniform(-150, 150, 100)
    lat = rng.uniform(-75, 75, 100)
    xa, ya, _, _ = tr_a.transform_deg(lon, lat)
    xp, yp, _, _ = tr_p.transform_deg(lon, lat)
    assert np.allclose(xa, xp, atol=1e-9)
    assert np.allclose(ya, yp, atol=1e-9)


def test_two_point_spec_matches_derived_pole():
    # two-point spec (ob_tran.cpp:241-278): pole of the great circle
    # through the two points, then the same rotation machinery.
    import math
    lam1, phi1 = map(math.radians, (-10.0, 30.0))
    lam2, phi2 = map(math.radians, (60.0, -20.0))
    lamp = math.atan2(
        math.cos(phi1) * math.sin(phi2) * math.cos(lam1)
        - math.sin(phi1) * math.cos(phi2) * math.cos(lam2),
        math.sin(phi1) * math.cos(phi2) * math.sin(lam2)
        - math.cos(phi1) * math.sin(phi2) * math.sin(lam1))
    phip = math.atan(-math.cos(lamp - lam1) / math.tan(phi1))
    tr_2 = compile_projstring(
        "+proj=ob_tran +R=6400000 +o_proj=latlon "
        "+o_lon_1=-10 +o_lat_1=30 +o_lon_2=60 +o_lat_2=-20")
    tr_p = compile_projstring(
        "+proj=ob_tran +R=6400000 +o_proj=latlon "
        f"+o_lon_p={math.degrees(lamp)} +o_lat_p={math.degrees(phip)}")
    rng = np.random.RandomState(5)
    lon = rng.uniform(-150, 150, 100)
    lat = rng.uniform(-75, 75, 100)
    x2, y2, _, _ = tr_2.transform_deg(lon, lat)
    xp, yp, _, _ = tr_p.transform_deg(lon, lat)
    assert np.allclose(x2, xp, atol=1e-9)
    assert np.allclose(y2, yp, atol=1e-9)


def test_pole_point_maps_to_rotated_north_pole():
    # Under PROJ's convention the new pole sits at geographic
    # (lon_0 + 180, o_lat_p): sin(phi') = s*s + c*c = 1 there.
    tr = compile_projstring(
        "+proj=ob_tran +R=6400000 +o_proj=latlon +o_lon_p=20 +o_lat_p=20 "
        "+lon_0=180")
    _, y, _, _ = tr.transform_deg(np.array([0.0]), np.array([20.0]))
    assert abs(y[0] - np.pi / 2) < 1e-9


def test_two_point_spec_validation():
    for bad in [
        "+o_lon_1=0 +o_lat_1=0 +o_lon_2=60 +o_lat_2=-20",   # lat_1 == 0
        "+o_lon_1=0 +o_lat_1=30 +o_lon_2=60 +o_lat_2=30",   # lat_1 == lat_2
        "+o_lon_1=0 +o_lat_1=90 +o_lon_2=60 +o_lat_2=-20",  # |lat_1| == 90
    ]:
        with pytest.raises(ValueError):
            compile_projstring(
                f"+proj=ob_tran +R=6400000 +o_proj=latlon {bad}")
    with pytest.raises(ValueError):
        compile_projstring(
            "+proj=ob_tran +R=6400000 +o_proj=latlon "
            "+o_lon_c=0 +o_lat_c=90 +o_alpha=30")


@pytest.mark.parametrize("ps", [
    PS,
    "+proj=ob_tran +R=6371000 +o_proj=moll +o_lon_p=45 +o_lat_p=45",
    "+proj=ob_tran +R=6371000 +o_proj=sinu +o_lat_p=0 +o_lon_p=30",  # transverse
    "+proj=ob_tran +R=6371000 +o_proj=latlon +o_lon_c=10 +o_lat_c=40 +o_alpha=30",
    "+proj=ob_tran +R=6371000 +o_proj=latlon "
    "+o_lon_1=-10 +o_lat_1=30 +o_lon_2=60 +o_lat_2=-20",
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
