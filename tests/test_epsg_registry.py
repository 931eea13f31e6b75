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
    if "+proj=utm" in projstr or "+zone=" in projstr:
        import re

        m = re.search(r"\+zone=(\d+)", projstr)
        if m:
            lon = 6 * int(m.group(1)) - 183 + 1.5
            return lon, -30.0 if "+south" in projstr else 45.0
    # generic: near the projection origin (the generated registry
    # spans every latitude band, so a fixed probe point won't do)
    d = dict(p.split("=", 1) for p in projstr.split() if "=" in p)
    lon = float(d.get("+lon_0", 0.0)) + 1.5
    lat = float(d.get("+lat_0") or d.get("+lat_1")
                or d.get("+lat_ts") or 20.0)
    lat = min(max(lat, -85.0), 85.0)
    if abs(lat) == 85.0:   # polar: step off the pole
        lat = 80.0 if lat > 0 else -80.0
    if lat == 0.0:
        lat = 15.0
    # step off 5-degree multiples: Robinson's spline-table inverse has
    # a reference-faithful ~2e-5 deg seam exactly AT its nodes
    if lat % 5.0 == 0.0:
        lat += 0.37
    return lon, lat


def test_registry_size():
    codes = crs.registry_codes()
    # round 3: ~165; round 4: 383; round 5: 3704 (generated from the
    # published EPSG dataset, epsg_data.py)
    assert len(codes) >= 4506, len(codes)


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
        # inverse (cs2cs emulation) and several generated methods
        # (robin, laea, poly) use iterative/series inverses: ~1e-7 deg
        # (~1 cm) is the registry-sweep bar; mm-level numeric parity is
        # the gie corpus's job
        tol = 2e-7
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
