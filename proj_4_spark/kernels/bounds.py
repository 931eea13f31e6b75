"""Bounding-box transformation — the analogue of proj_trans_bounds
(/root/reference/src/trans_bounds.cpp:335-420): densify each bbox edge
with ``densify_pts`` points (reference recommends 21), transform all
edge points, take the envelope.  Used driver-side for partition
pruning bounds (SURVEY.md §2.2)."""

from __future__ import annotations

import numpy as np


def transform_bounds(tr, lon_min: float, lat_min: float, lon_max: float,
                     lat_max: float, densify_pts: int = 21,
                     direction: str = "fwd"):
    """Returns (xmin, ymin, xmax, ymax) of the transformed bbox."""
    if densify_pts < 2:
        raise ValueError("densify_pts >= 2")
    lons = np.linspace(lon_min, lon_max, densify_pts)
    lats = np.linspace(lat_min, lat_max, densify_pts)
    edge_lon = np.concatenate([
        lons, lons,
        np.full(densify_pts, lon_min), np.full(densify_pts, lon_max)])
    edge_lat = np.concatenate([
        np.full(densify_pts, lat_min), np.full(densify_pts, lat_max),
        lats, lats])
    x, y, _, _ = tr.transform_deg(edge_lon, edge_lat, direction=direction)
    ok = np.isfinite(x) & np.isfinite(y)
    if not ok.any():
        raise ValueError("no finite points in transformed bounds")
    return (float(np.min(x[ok])), float(np.min(y[ok])),
            float(np.max(x[ok])), float(np.max(y[ok])))
