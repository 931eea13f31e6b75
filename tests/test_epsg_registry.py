"""EPSG registry breadth: every code in the curated + generated
registry compiles to a working Transform, roundtrips a point inside
its area of use, and plans through crs_to_crs from WGS84."""

import numpy as np
import pytest

from proj_4_spark import crs


def _probe_point(code: int, projstr: str) -> tuple[float, float]:
    """A (lon, lat) inside the code's area of use."""
    if code in crs._LCC_FRANCE:
        return 3.0, 42.0 + (code - 3942)
    if code in crs._GK_PULKOVO:
        return float(6 * (code - 28400) - 3), 55.0
    if code in (32661, 5041):
        return 30.0, 85.0
    if code in (32761, 5042):
        return 30.0, -85.0
    if "+proj=utm" in projstr or "tmerc" in projstr:
        import re

        m = re.search(r"\+zone=(\d+)", projstr)
        if m:
            lon = 6 * int(m.group(1)) - 183 + 1.5
        else:
            m = re.search(r"\+lon_0=([0-9.+-]+)", projstr)
            lon = float(m.group(1)) + 0.5
        lat = -30.0 if "+south" in projstr else 45.0
        if "+axis=wsu" in projstr:
            lat = -30.0
        return lon, lat
    return 5.0, 45.0


def test_registry_size():
    codes = crs.registry_codes()
    assert len(codes) >= 380, len(codes)  # 200+ beyond round 3's ~165


@pytest.mark.parametrize("code", crs.registry_codes())
def test_code_compiles_and_roundtrips(code):
    projstr = crs.epsg_projstring(code)
    tr = crs.compile_crs(code)
    lon, lat = _probe_point(code, projstr)
    out = tr.transform_deg(np.array([lon]), np.array([lat]))
    x, y = float(out[0][0]), float(out[1][0])
    assert np.isfinite(x) and np.isfinite(y), (code, projstr)
    if "longlat" not in projstr:
        assert (abs(x) > 1.0 or abs(y) > 1.0), (code, x, y)
        back = tr.transform_deg(np.array([x]), np.array([y]),
                                direction="inverse")
        # +towgs84 codes roundtrip through the iterative Bowring cart
        # inverse (cs2cs emulation): ~1e-8 deg; pure projections ~1e-12
        tol = 2e-7 if "+towgs84" in projstr else 1e-8
        dlon = (float(back[0][0]) - lon + 180.0) % 360.0 - 180.0
        assert dlon == pytest.approx(0.0, abs=tol), code
        assert float(back[1][0]) == pytest.approx(lat, abs=tol), code


@pytest.mark.parametrize("code", crs.registry_codes()[::7])
def test_crs_to_crs_plans_from_wgs84(code):
    """Sampled: the hub planner builds a pipeline for every code."""
    tr = crs.crs_to_crs(4326, code)
    projstr = crs.epsg_projstring(code)
    lon, lat = _probe_point(code, projstr)
    out = tr.transform_deg(np.array([lon]), np.array([lat]))
    assert np.isfinite(float(out[0][0])), code
