"""Molodensky + geoc (kernels/molodensky.py): gie fixtures from
/root/reference/test/gie/more_builtins.gie:35-82."""

import math

import numpy as np
import pytest

from proj_4_spark.proj import compile_projstring

_M = ("+proj=molodensky +a=6378160 +rf=298.25 +da=-23 +df=-8.120449e-8 "
      "+dx=-134 +dy=-48 +dz=149")
DEG_M = 111319.0  # meters per degree (N-S)


@pytest.mark.parametrize("pstr", [_M + " +abridged", _M])
def test_molodensky_gie_fixture(pstr):
    """more_builtins.gie:37-58: tolerance 2 m, roundtrip 1 m."""
    tr = compile_projstring(pstr)
    x, y, z, _ = tr.transform_deg(np.array([144.9667]), np.array([-37.8]),
                                  np.array([50.0]))
    coslat = math.cos(math.radians(37.8))
    assert abs(x[0] - 144.968) * DEG_M * coslat < 2.0
    assert abs(y[0] + 37.79848) * DEG_M < 2.0
    assert abs(z[0] - 46.378) < 2.0
    lo, la, zz, _ = tr.transform_deg(x, y, z, direction="inv")
    assert abs(lo[0] - 144.9667) * DEG_M * coslat < 1.0
    assert abs(la[0] + 37.8) * DEG_M < 1.0
    assert abs(zz[0] - 50.0) < 1.0


def test_molodensky_zero_params_identity():
    """more_builtins.gie:63-71."""
    tr = compile_projstring("+proj=molodensky +a=6378160 +rf=298.25 "
                            "+da=0 +df=0 +dx=0 +dy=0 +dz=0")
    x, y, z, _ = tr.transform_deg(np.array([144.9667]), np.array([-37.8]),
                                  np.array([50.0]))
    assert abs(x[0] - 144.9667) < 1e-8
    assert abs(y[0] + 37.8) < 1e-8
    assert abs(z[0] - 50.0) < 1e-3


def test_molodensky_missing_arg_raises():
    """more_builtins.gie:77-82: invalid_op_missing_arg."""
    with pytest.raises(ValueError):
        compile_projstring("+proj=molodensky +a=6378160 +rf=298.25 +dx=0")


def test_geoc_forward_and_roundtrip():
    """geoc.cpp:38-64: tan(geoc) = (1-es) tan(geod); pole passthrough
    within the last-centimeter guard band."""
    tr = compile_projstring("+proj=geoc +ellps=GRS80")
    lat = np.array([0.0, 30.0, 45.0, -60.0, 90.0])
    x, y, z, _ = tr.transform_deg(np.full_like(lat, 12.0), lat,
                                  np.zeros_like(lat))
    es = 0.0066943800229007876
    exp45 = math.degrees(math.atan((1 - es) * math.tan(math.radians(45.0))))
    assert abs(y[2] - exp45) < 1e-12
    assert y[0] == 0.0 and y[4] == 90.0
    lo, la, _, _ = tr.transform_deg(x, y, z, direction="inv")
    assert np.allclose(la, lat, atol=1e-9)


def test_geoc_spherical_identity():
    tr = compile_projstring("+proj=geoc +R=6371000")
    _, y, _, _ = tr.transform_deg(np.array([10.0]), np.array([45.0]),
                                  np.array([0.0]))
    assert y[0] == 45.0


# --- topocentric (conversions/topocentric.cpp) ------------------------

def test_topocentric_iogp_fixture():
    """builtins.gie:8140-8155 (IOGP GN 7-2 test point), 1 mm."""
    tr = compile_projstring("+proj=topocentric +ellps=WGS84 "
                            "+X_0=3652755.3058 +Y_0=319574.6799 "
                            "+Z_0=5201547.3536")
    x, y, z, _ = tr.transform(np.array([3771793.968]),
                              np.array([140253.342]),
                              np.array([5124304.349]))
    assert abs(x[0] + 189013.869) < 1e-3
    assert abs(y[0] + 128642.040) < 1e-3
    assert abs(z[0] + 4220.171) < 1e-3
    xi, yi, zi, _ = tr.transform(x, y, z, direction="inv")
    assert abs(xi[0] - 3771793.968) < 1e-6

    tr2 = compile_projstring(
        "+proj=pipeline +step +proj=cart +ellps=WGS84 "
        "+step +proj=topocentric +ellps=WGS84 +lon_0=5 +lat_0=55 +h_0=200")
    x, y, z, _ = tr2.transform_deg(np.array([2.12955]),
                                   np.array([53.80939444444444]),
                                   np.array([73.0]))
    assert abs(x[0] + 189013.869) < 1e-3
    assert abs(y[0] + 128642.040) < 1e-3
    assert abs(z[0] + 4220.171) < 1e-3
    lo, la, h, _ = tr2.transform_deg(x, y, z, direction="inv")
    assert abs(lo[0] - 2.12955) < 1e-9
    assert abs(la[0] - 53.80939444444444) < 1e-9
    assert abs(h[0] - 73.0) < 1e-4


@pytest.mark.parametrize("bad", [
    "+proj=topocentric +ellps=WGS84",
    "+proj=topocentric +ellps=WGS84 +X_0=0 +Y_0=0",
    "+proj=topocentric +ellps=WGS84 +lon_0=0",
    "+proj=topocentric +ellps=WGS84 +X_0=0 +lon_0=0",
])
def test_topocentric_arg_errors(bad):
    """builtins.gie:8160-8175 error cases."""
    with pytest.raises(ValueError):
        compile_projstring(bad)
