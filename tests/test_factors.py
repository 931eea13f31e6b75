"""proj_factors analogue vs closed-form scale factors."""

import numpy as np

from proj_4_spark.kernels.factors import factors
from proj_4_spark.proj import compile_projstring

LAT = np.array([0.0, 15.0, 30.0, 45.0, 60.0])
LON = np.zeros_like(LAT) + 7.0


def test_merc_scale():
    """Ellipsoidal Mercator: h = k = sqrt(1-e2 sin2φ)/cosφ (conformal,
    equal scales); areal s = k²."""
    tr = compile_projstring("+proj=merc +ellps=GRS80")
    f = factors(tr, LON, LAT)
    ell = tr.ops[0].ell
    phi = np.radians(LAT)
    expected = np.sqrt(1 - ell.es * np.sin(phi) ** 2) / np.cos(phi)
    assert np.allclose(f["k"], expected, rtol=1e-6)
    assert np.allclose(f["h"], expected, rtol=1e-6)
    assert np.allclose(f["s"], expected ** 2, rtol=1e-6)
    assert np.all(f["omega_deg"] < 1e-4)  # conformal: no angular distortion


def test_cea_equal_area():
    tr = compile_projstring("+proj=cea +ellps=GRS80")
    f = factors(tr, LON, LAT)
    assert np.allclose(f["s"], 1.0, rtol=1e-6)  # equal-area: s == 1


def test_utm_scale_at_cm():
    """UTM scale at the central meridian equals k0 = 0.9996."""
    tr = compile_projstring("+proj=utm +zone=32 +ellps=GRS80")
    f = factors(tr, np.array([9.0]), np.array([0.0]))
    assert abs(f["k"][0] - 0.9996) < 1e-7
    assert abs(f["h"][0] - 0.9996) < 1e-7
