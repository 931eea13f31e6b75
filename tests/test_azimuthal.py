"""Azimuthal + Equal/Natural Earth golden vectors (transcribed from
the reference gie corpus) and roundtrips."""

import numpy as np
import pytest

from proj_4_spark.proj import compile_projstring

CASES = [
    # aeqd ellipsoidal (Karney-geodesic path), builtins.gie:135-146
    ("+proj=aeqd +ellps=GRS80 +lat_0=0", 0, 90, 0.0, 10001965.7292, 1e-4),
    ("+proj=aeqd +ellps=GRS80 +lat_0=0", 0, 0, 0.0, 0.0, 1e-9),
    ("+proj=aeqd +ellps=GRS80 +lat_0=0", 90, 0, 10018754.1714, 0.0, 1e-4),
    # aeqd spherical, builtins.gie:105-113
    ("+proj=aeqd +R=1 +lat_0=0", 0, 90, 0.0, 1.57080, 1e-4),
    # gnom spherical, builtins.gie:2107-2115
    ("+proj=gnom +R=1", 10, 80, 0.1763, 5.7588, 1e-4),
    # ortho oblique, builtins.gie:5273-5290
    ("+proj=ortho +R=1 +lat_0=40", 0, 90, 0.0, 0.7660, 1e-4),
    ("+proj=ortho +R=1 +lat_0=40", 20, 60, 0.1710, 0.3614, 1e-4),
    ("+proj=ortho +R=1 +lat_0=40", 40, -30, 0.5567, -0.8095, 1e-4),
    # eqearth WGS84, more_builtins.gie:574-600 (tolerance 1 cm)
    ("+proj=eqearth +ellps=WGS84", -180, 90, -10216474.79, 8392927.6, 0.01),
    ("+proj=eqearth +ellps=WGS84", 180, 45, 14792474.75, 5466867.76, 0.01),
    ("+proj=eqearth +ellps=WGS84", -70, -31.2, -6241081.64, -3907019.16, 0.01),
    # natearth sphere, builtins.gie:4639-4647
    ("+proj=natearth +a=6400000", 2, 1, 194507.265257889, 112508.737358295,
     1e-4),
]


@pytest.mark.parametrize("ps,lon,lat,ex,ey,tol", CASES,
                         ids=[f"{c[0].split()[0][6:]}-{i}"
                              for i, c in enumerate(CASES)])
def test_gie_golden(ps, lon, lat, ex, ey, tol):
    tr = compile_projstring(ps)
    x, y, _, _ = tr.transform_deg(np.array([float(lon)]),
                                  np.array([float(lat)]))
    assert abs(x[0] - ex) < tol, f"x {x[0]!r} != {ex!r}"
    assert abs(y[0] - ey) < tol, f"y {y[0]!r} != {ey!r}"


@pytest.mark.parametrize("ps", [
    "+proj=aeqd +ellps=GRS80 +lat_0=45 +lon_0=10",
    "+proj=aeqd +R=6371000 +lat_0=-20",
    "+proj=ortho +R=6371000 +lat_0=40",
    "+proj=natearth +a=6400000",
    "+proj=gnom +R=1 +lat_0=30",   # generic Newton inverse
    "+proj=eqearth +ellps=WGS84",  # generic Newton inverse
])
def test_roundtrip(ps):
    rng = np.random.RandomState(5)
    lon = rng.uniform(-25, 45, 300)
    lat = rng.uniform(-10, 70, 300)
    tr = compile_projstring(ps)
    x, y, _, _ = tr.transform_deg(lon, lat)
    lon2, lat2, _, _ = tr.transform_deg(x, y, direction="inv")
    ok = np.isfinite(lon2)
    assert ok.mean() > 0.95
    assert np.nanmax(np.abs(lon2[ok] - lon[ok])) < 1e-6
    assert np.nanmax(np.abs(lat2[ok] - lat[ok])) < 1e-6
