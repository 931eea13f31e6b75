"""Geodesic polygon area (Planimeter) golden tests.

Golden VALUES transcribed from the reference geodesic test suite
(/root/reference/src/tests/geodtest.c:861-1021, Planimeter0..15) —
value transcription is permitted; the kernel code is an independent
NumPy re-derivation of the published Karney 2013 area algorithm.
"""
import numpy as np
import pytest

from proj_4_spark.kernels.geodesic import (
    Geodesic, inverse, polygon_area_perimeter,
)

WGS84 = Geodesic.init(6378137.0, 1 / 298.257223563)
GRS80 = Geodesic.init(6378137.0, 1 / 298.257222101)


def pa(pts, polyline=False):
    lats = [p[0] for p in pts]
    lons = [p[1] for p in pts]
    return polygon_area_perimeter(WGS84, lats, lons, polyline=polyline)


def test_geninverse_segment_area():
    # GeodSolve -E -p 10 0 0 60.0832522871723 89.8492185074635 (GRS80)
    _, _, _, _, S12 = inverse(
        GRS80, [0.0], [0.0], [60.0832522871723], [89.8492185074635],
        want_area=True)
    assert abs(float(S12[0]) - 42426932221845.0) <= 0.5


@pytest.mark.parametrize("pts,perim,area,ptol,atol", [
    # Planimeter0: polar caps and a small diamond (geodtest.c:861-892)
    ([(89, 0), (89, 90), (89, 180), (89, 270)],
     631819.8745, 24952305678.0, 1e-4, 1),
    ([(-89, 0), (-89, 90), (-89, 180), (-89, 270)],
     631819.8745, -24952305678.0, 1e-4, 1),
    ([(0, -1), (-1, 0), (0, 1), (1, 0)],
     627598.2731, 24619419146.0, 1e-4, 1),
    ([(90, 0), (0, 0), (0, 90)], 30022685.0, 63758202715511.0, 1, 1),
    # Planimeter5: pole crossing (geodtest.c:894-905)
    ([(89, 0.1), (89, 90.1), (89, -179.9)], 539297.0, 12476152838.5, 1, 1),
    # Planimeter6: lon12 rounding at +/-180 ties (geodtest.c:907-931)
    ([(9, -0.00000000000001), (9, 180), (9, 0)], 36026861.0, 0.0, 1, 1),
    ([(9, 0.00000000000001), (9, 0), (9, 180)], 36026861.0, 0.0, 1, 1),
    ([(9, 0.00000000000001), (9, 180), (9, 0)], 36026861.0, 0.0, 1, 1),
    ([(9, -0.00000000000001), (9, 0), (9, 180)], 36026861.0, 0.0, 1, 1),
    # Planimeter12: arctic-circle slivers (geodtest.c:933-961)
    ([(66.562222222, 0), (66.562222222, 180), (66.562222222, 360)],
     10465729.0, 0.0, 1, 1),
    ([(66.562222222, -0.0), (66.562222222, -180), (66.562222222, -360)],
     10465729.0, 0.0, 1, 1),
    # Planimeter13: multiple circlings of the pole (geodtest.c:963-975)
    ([(89, -360), (89, -240), (89, -120), (89, 0), (89, 120), (89, 240)],
     1160741.0, 32415230256.0, 1, 1),
])
def test_planimeter_goldens(pts, perim, area, ptol, atol):
    p, a = pa(pts)
    assert abs(p - perim) <= ptol
    assert abs(a - area) <= atol


def test_planimeter15_small_triangle():
    # geodtest.c:977-1021 — thin triangle exercising the tan(Gamma/2)
    # near-coincident refinement
    _, a = pa([(2, 1), (1, 2), (3, 3)])
    assert abs(a - 18454562325.45119) <= 0.5


def test_polyline_perimeter():
    p, a = pa([(90, 0), (0, 0), (0, 90)], polyline=True)
    assert abs(p - 20020719.0) <= 1
    assert a is None


def test_signed_orientation():
    pts = [(2, 1), (1, 2), (3, 3)]
    _, ccw = pa(pts)
    _, cw = pa(list(reversed(pts)))
    assert ccw > 0
    assert abs(ccw + cw) < 1e-3
