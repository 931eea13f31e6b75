"""Pseudocylindrical family golden vectors (transcribed from
/root/reference/test/gie/builtins.gie, tolerance 0.1 mm) + roundtrips."""

import numpy as np
import pytest

from proj_4_spark.proj import compile_projstring

# (projstring, exp_x, exp_y) for accept (2, 1)
GOLDEN = [
    ("+proj=eck1 +a=6400000", 204680.888202951, 102912.178426065),
    ("+proj=eck2 +a=6400000", 204472.870907960, 121633.734975242),
    ("+proj=eck3 +a=6400000", 188652.015721538, 94328.919337031),
    ("+proj=eck5 +a=6400000", 197031.392134061, 98523.198847227),
    ("+proj=eck6 +a=6400000", 197021.605628992, 126640.420733174),
    ("+proj=wag1 +a=6400000", 195986.781561158, 127310.075060660),
    ("+proj=wag2 +a=6400000", 206589.888099962, 120778.040357547),
    ("+proj=wag3 +a=6400000", 223387.021718166, 111701.072127637),
    ("+proj=wag5 +a=6400000", 203227.051925325, 138651.631442713),
    ("+proj=kav5 +ellps=GRS80", 200360.905308829, 123685.082476998),
    ("+proj=kav7 +a=6400000", 193462.974943729, 111701.072127637),
]


@pytest.mark.parametrize("ps,ex,ey", GOLDEN,
                         ids=[c[0].split()[0][6:] for c in GOLDEN])
def test_gie_golden(ps, ex, ey):
    tr = compile_projstring(ps)
    x, y, _, _ = tr.transform_deg(np.array([2.0]), np.array([1.0]))
    assert abs(x[0] - ex) < 1e-4, f"x {x[0]!r} != {ex!r}"
    assert abs(y[0] - ey) < 1e-4, f"y {y[0]!r} != {ey!r}"


@pytest.mark.parametrize("ps", [
    "+proj=eck1", "+proj=eck2", "+proj=eck3", "+proj=eck5", "+proj=eck6",
    "+proj=kav5", "+proj=kav7", "+proj=wag1", "+proj=wag2", "+proj=wag3",
    "+proj=wag6", "+proj=putp1", "+proj=qua_aut", "+proj=mbt_s",
    "+proj=mbtfps", "+proj=urmfps +n=0.9", "+proj=fouc",
    "+proj=wag5",  # generic Newton inverse
])
def test_roundtrip(ps):
    rng = np.random.RandomState(9)
    lon = rng.uniform(-170, 170, 500)
    lat = rng.uniform(-80, 80, 500)
    tr = compile_projstring(ps)
    x, y, _, _ = tr.transform_deg(lon, lat)
    lon2, lat2, _, _ = tr.transform_deg(x, y, direction="inv")
    ok = np.isfinite(lon2)
    assert ok.mean() > 0.97
    assert np.nanmax(np.abs(lon2[ok] - lon[ok])) < 1e-6
    assert np.nanmax(np.abs(lat2[ok] - lat[ok])) < 1e-6


def test_vandg_golden_and_roundtrip():
    """van der Grinten I: builtins.gie:7619 (tolerance 0.25 mm) +
    Newton-inverse roundtrip."""
    tr = compile_projstring("+proj=vandg +a=6400000")
    x, y, _, _ = tr.transform_deg(np.array([2.0]), np.array([1.0]))
    assert abs(x[0] - 223395.249543407) < 2.5e-4
    assert abs(y[0] - 111704.596633675) < 2.5e-4
    lon = np.array([2.0, 100.0, -140.0, 30.0])
    lat = np.array([-1.0, 60.0, -45.0, 0.5])
    xx, yy, _, _ = tr.transform_deg(lon, lat)
    lon2, lat2, _, _ = tr.transform_deg(xx, yy, direction="inv")
    assert np.nanmax(np.abs(lon2 - lon)) < 1e-6
    assert np.nanmax(np.abs(lat2 - lat)) < 1e-6


def test_vandg_closed_form_inverse():
    """vandg.cpp:79-130 (Snyder 29-11..29-18 cubic): gie inverse point
    + globe roundtrip (previously fwd-only)."""
    import numpy as np

    from proj_4_spark.proj import compile_projstring

    tr = compile_projstring("+proj=vandg +R=6400000")
    lo, la, _, _ = tr.transform_deg(np.array([200.0]), np.array([100.0]),
                                    direction="inv")
    assert abs(lo[0] - 0.001790493) < 1e-8
    assert abs(la[0] - 0.000895247) < 1e-8
    rng = np.random.RandomState(17)
    lon = rng.uniform(-179, 179, 1000)
    lat = rng.uniform(-85, 85, 1000)
    x, y, _, _ = tr.transform_deg(lon, lat)
    lo, la, _, _ = tr.transform_deg(x, y, direction="inv")
    assert np.nanmax(np.abs(lo - lon)) < 1e-7
    assert np.nanmax(np.abs(la - lat)) < 1e-7
    assert np.isnan(lo).mean() == 0.0
