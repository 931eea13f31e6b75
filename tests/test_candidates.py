"""Per-point candidate-operation selection (plans/candidates.py:
trans.cpp:44-173 pj_get_suggested_operation semantics)."""

import numpy as np
import pytest

from proj_4_spark import proj as P
from proj_4_spark.kernels.gridshift import synthetic_hgrid
from proj_4_spark.plans.candidates import (CandidateOp,
                                           CandidateSelector, candidate)


@pytest.fixture(autouse=True)
def _grids():
    P.GRID_REGISTRY.setdefault(
        "cand_w", synthetic_hgrid(lon_lo=-130.0, lon_hi=-60.0,
                                  lat_lo=20.0, lat_hi=60.0))
    P.GRID_REGISTRY.setdefault("cand_e", synthetic_hgrid())


def _selector():
    return CandidateSelector([
        candidate("+proj=pipeline +step +proj=hgridshift +grids=cand_w "
                  "+step +proj=webmerc",
                  bbox=(-130.0, 20.0, -60.0, 60.0), accuracy=0.05),
        candidate("+proj=pipeline +step +proj=hgridshift +grids=cand_e "
                  "+step +proj=webmerc",
                  bbox=(-10.0, 35.0, 30.0, 70.0), accuracy=0.1),
        candidate("+proj=webmerc", bbox=None, accuracy=float("inf")),
    ])


def test_select_picks_best_containing():
    sel = _selector()
    idx = sel.select(np.array([-100.0, 10.0, 150.0]),
                     np.array([40.0, 50.0, 10.0]))
    assert idx.tolist() == [0, 1, 2]


def test_accuracy_orders_candidates():
    """Caller order does not matter: accuracy does."""
    a = candidate("+proj=webmerc", bbox=(-10.0, 35.0, 30.0, 70.0),
                  accuracy=5.0)
    b = candidate("+proj=pipeline +step +proj=hgridshift +grids=cand_e "
                  "+step +proj=webmerc",
                  bbox=(-10.0, 35.0, 30.0, 70.0), accuracy=0.1)
    sel = CandidateSelector([a, b])
    idx = sel.select(np.array([10.0]), np.array([50.0]))
    assert sel.candidates[int(idx[0])] is b


def test_transform_matches_single_pipelines():
    sel = _selector()
    lon = np.array([-100.0, 10.0, 150.0])
    lat = np.array([40.0, 50.0, 10.0])
    x, y, _, op = sel.transform_deg(lon, lat)
    assert op.tolist() == [0, 1, 2]
    for i, c in enumerate(sel.candidates):
        xe, ye, _, _ = c.transform.transform_deg(lon[i:i + 1],
                                                 lat[i:i + 1])
        assert x[i] == pytest.approx(float(xe[0]), abs=1e-9)
        assert y[i] == pytest.approx(float(ye[0]), abs=1e-9)


def test_retry_on_candidate_failure():
    """A candidate whose grid returns NaN inside its advertised bbox is
    retried by the next containing candidate (trans.cpp retry loop)."""
    g = synthetic_hgrid()
    bad = g.values.copy()
    bad[:, :, :] = np.nan
    P.GRID_REGISTRY["cand_bad"] = type(g)(
        lon0=g.lon0, lat0=g.lat0, dlon=g.dlon, dlat=g.dlat, values=bad)
    sel = CandidateSelector([
        candidate("+proj=pipeline +step +proj=hgridshift +grids=cand_bad "
                  "+step +proj=webmerc",
                  bbox=(-10.0, 35.0, 30.0, 70.0), accuracy=0.1),
        candidate("+proj=webmerc", bbox=None, accuracy=float("inf")),
    ])
    x, y, _, op = sel.transform_deg(np.array([10.0]), np.array([50.0]))
    assert int(op[0]) == 1
    assert np.isfinite(x[0]) and np.isfinite(y[0])


def test_no_candidate_contains():
    sel = CandidateSelector([
        candidate("+proj=webmerc", bbox=(0.0, 0.0, 10.0, 10.0),
                  accuracy=1.0)])
    x, y, _, op = sel.transform_deg(np.array([50.0]), np.array([50.0]))
    assert int(op[0]) == -1 and np.isnan(x[0]) and np.isnan(y[0])


def test_antimeridian_bbox():
    c = CandidateOp(transform=None, bbox=(170.0, -10.0, -170.0, 10.0),
                    accuracy=1.0)
    got = c.contains(np.array([175.0, -175.0, 0.0]),
                     np.array([0.0, 0.0, 0.0]))
    assert got.tolist() == [True, True, False]


def test_empty_list_raises():
    with pytest.raises(ValueError):
        CandidateSelector([])
