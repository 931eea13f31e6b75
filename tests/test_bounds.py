import numpy as np

from proj_4_spark.kernels.bounds import transform_bounds
from proj_4_spark.proj import compile_projstring


def test_utm_bounds_contains_corners_and_edge_extrema():
    tr = compile_projstring("+proj=utm +zone=32 +ellps=GRS80")
    xmin, ymin, xmax, ymax = transform_bounds(tr, 6.0, 40.0, 12.0, 56.0)
    # corners inside
    for lon, lat in [(6, 40), (12, 40), (6, 56), (12, 56)]:
        x, y, _, _ = tr.transform_deg(np.array([float(lon)]),
                                      np.array([float(lat)]))
        assert xmin - 1e-6 <= x[0] <= xmax + 1e-6
        assert ymin - 1e-6 <= y[0] <= ymax + 1e-6
    # the southern edge bulge: corner-only envelope would miss the
    # minimum northing at the central meridian (9 E)
    x9, y9, _, _ = tr.transform_deg(np.array([9.0]), np.array([40.0]))
    assert ymin <= y9[0] + 1e-6


def test_webmerc_bounds_equals_corner_envelope():
    tr = compile_projstring("+proj=webmerc")
    got = transform_bounds(tr, -10.0, -20.0, 30.0, 40.0)
    x, y, _, _ = tr.transform_deg(np.array([-10.0, 30.0]),
                                  np.array([-20.0, 40.0]))
    assert np.allclose(got, (x[0], y[0], x[1], y[1]))
