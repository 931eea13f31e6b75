"""hgridshift/vgridshift as compiled pipeline steps (GRID_REGISTRY)."""

import numpy as np
import pytest

from proj_4_spark import proj as P
from proj_4_spark.kernels.gridshift import Grid, synthetic_hgrid


@pytest.fixture(autouse=True)
def _register_grids():
    P.GRID_REGISTRY["test_h"] = synthetic_hgrid()
    g = synthetic_hgrid()
    P.GRID_REGISTRY["test_v"] = Grid(g.lon0, g.lat0, g.dlon, g.dlat,
                                     g.values[..., 0] * 1e5)
    yield
    P.GRID_REGISTRY.clear()


def test_hgridshift_step_roundtrip():
    tr = P.compile_projstring("+proj=hgridshift +grids=test_h")
    lon = np.array([2.0, 10.0, 20.0])
    lat = np.array([45.0, 50.0, 60.0])
    x, y, _, _ = tr.transform_deg(lon, lat)
    assert np.max(np.abs(x - lon)) > 1e-5  # shift applied
    lon2, lat2, _, _ = tr.transform_deg(x, y, direction="inv")
    assert np.max(np.abs(lon2 - lon)) < 1e-9
    assert np.max(np.abs(lat2 - lat)) < 1e-9


def test_gridshift_inside_pipeline():
    """hgridshift composed with a projection in one fused pipeline."""
    tr = P.compile_projstring(
        "+proj=pipeline +step +proj=hgridshift +grids=test_h "
        "+step +proj=webmerc")
    lon = np.array([10.0])
    lat = np.array([50.0])
    x, y, _, _ = tr.transform_deg(lon, lat)
    # reference composition applied manually
    t1 = P.compile_projstring("+proj=hgridshift +grids=test_h")
    l2, p2, _, _ = t1.transform_deg(lon, lat)
    t2 = P.compile_projstring("+proj=webmerc")
    xe, ye, _, _ = t2.transform_deg(l2, p2)
    assert abs(x[0] - xe[0]) < 1e-6 and abs(y[0] - ye[0]) < 1e-6


def test_vgridshift_step():
    tr = P.compile_projstring("+proj=vgridshift +grids=test_v")
    lon = np.array([10.0])
    lat = np.array([50.0])
    x, y, z, _ = tr.transform_deg(lon, lat, np.array([100.0]))
    assert abs(x[0] - 10.0) < 1e-12 and abs(y[0] - 50.0) < 1e-12
    assert abs(z[0] - 100.0) > 0.01  # undulation applied
    _, _, z2, _ = tr.transform_deg(lon, lat, z, direction="inv")
    assert abs(z2[0] - 100.0) < 1e-9


def test_missing_grid_raises():
    with pytest.raises(FileNotFoundError):
        P.compile_projstring("+proj=hgridshift +grids=nope")
