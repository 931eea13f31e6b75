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


# --- nsper / tpers (general perspective) ------------------------------

def test_nsper_gie_golden():
    """builtins.gie:4775-4808."""
    import numpy as np

    from proj_4_spark.proj import compile_projstring

    tr = compile_projstring("+proj=nsper +a=6400000 +h=1000000")
    x, y, _, _ = tr.transform_deg(np.array([2.0, -2.0]),
                                  np.array([1.0, -1.0]))
    assert abs(x[0] - 222239.816114100) < 1e-4
    assert abs(y[0] - 111153.763991925) < 1e-4
    assert abs(x[1] + 222239.816114100) < 1e-4
    assert abs(y[1] + 111153.763991925) < 1e-4
    trp = compile_projstring("+proj=nsper +R=1 +h=3 +lat_0=90")
    x, y, _, _ = trp.transform_deg(np.array([45.0]), np.array([45.0]))
    assert abs(x[0] - 0.4555) < 1e-4 and abs(y[0] + 0.4555) < 1e-4


def test_tpers_gie_golden():
    """builtins.gie:7425-7435."""
    import numpy as np

    from proj_4_spark.proj import compile_projstring

    tr = compile_projstring("+proj=tpers +a=6400000 +h=1000000 +azi=20")
    x, y, _, _ = tr.transform_deg(np.array([2.0, 2.0, -2.0, -2.0]),
                                  np.array([1.0, -1.0, 1.0, -1.0]))
    exp = [(170820.288955531, 180460.865555805),
           (246853.941538942, -28439.878035775),
           (-246853.941538942, 28439.878035775),
           (-170820.288955531, -180460.865555805)]
    for i, (ex, ey) in enumerate(exp):
        assert abs(x[i] - ex) < 1e-4 and abs(y[i] - ey) < 1e-4


def test_nsper_tpers_roundtrip():
    import numpy as np

    from proj_4_spark.proj import compile_projstring

    for pstr, lons, lats in [
        ("+proj=nsper +R=6371000 +h=35785831 +lat_0=40 +lon_0=-100",
         (-150, -50), (-10, 80)),  # geostationary view
        ("+proj=tpers +a=6400000 +h=5500000 +lat_0=40 +azi=20 +tilt=30",
         (-20, 20), (20, 60)),
    ]:
        rng = np.random.RandomState(29)
        lon = rng.uniform(*lons, 400)
        lat = rng.uniform(*lats, 400)
        tr = compile_projstring(pstr)
        x, y, _, _ = tr.transform_deg(lon, lat)
        lo, la, _, _ = tr.transform_deg(x, y, direction="inv")
        assert np.nanmax(np.abs(lo - lon)) < 1e-8
        assert np.nanmax(np.abs(la - lat)) < 1e-8


def test_nsper_behind_horizon_nan():
    import numpy as np

    from proj_4_spark.proj import compile_projstring

    tr = compile_projstring("+proj=nsper +a=6400000 +h=1000000")
    x, y, _, _ = tr.transform_deg(np.array([120.0]), np.array([0.0]))
    assert np.isnan(x[0]) and np.isnan(y[0])
