"""NKG coordinate-operation URN resolution (sources/nkg_ops.py).

The reference resolves ``urn:ogc:def:coordinateOperation:NKG::*``
through proj.db (data/sql/nkg.sql); here a curated table expands them
to +proj=pipeline strings.  The NKG velocity grids ship with
proj-data (absent from the source tree and this sandbox), so numeric
gie expectations cannot be evaluated — these tests certify the
resolution layer itself: every URN in nkg.gie resolves, compiles once
the grids are registered, and the compiled pipeline inverts cleanly.
"""

from __future__ import annotations

import re

import numpy as np
import pytest

from proj_4_spark import proj as P
from proj_4_spark.sources.nkg_ops import (
    NKG_CONCAT, URN_PREFIX, required_grids, resolve_nkg_urn)

GIE = "/root/reference/test/gie/nkg.gie"


def _gie_urns():
    try:
        text = open(GIE).read()
    except OSError:
        return []
    return sorted(set(re.findall(
        r"urn:ogc:def:coordinateOperation:NKG::[\w.-]+", text)))


@pytest.fixture(scope="module", autouse=True)
def _stub_velocity_grids():
    """Register deterministic zero-velocity grids under the proj-data
    names so the pipelines COMPILE (plumbing test — with v=0 the
    deformation steps are exact identities, so no numeric claim about
    the real model is implied)."""
    from proj_4_spark.kernels.gridshift import Grid

    names = ("eur_nkg_nkgrf03vel_realigned.tif", "eur_nkg_nkgrf17vel.tif",
             "no_kv_NKGETRF14_EPSG7922_2000.tif")
    lon = np.radians(np.linspace(0.0, 49.0, 8))
    lat = np.radians(np.linspace(50.0, 75.0, 8))
    vals = np.zeros((8, 8, 3))
    added = []
    for nm in names:
        if nm not in P.GRID_REGISTRY:
            P.GRID_REGISTRY[nm] = Grid(
                lon0=float(lon[0]), lat0=float(lat[0]),
                dlon=float(lon[1] - lon[0]), dlat=float(lat[1] - lat[0]),
                values=vals)
            added.append(nm)
    yield
    for nm in added:
        P.GRID_REGISTRY.pop(nm, None)


def test_gie_urns_all_resolve():
    urns = _gie_urns()
    if not urns:
        pytest.skip("reference nkg.gie not present")
    assert len(urns) == 26
    for u in urns:
        ps = resolve_nkg_urn(u)
        assert ps.startswith("+proj=pipeline +step ")
        assert u[len(URN_PREFIX):] in NKG_CONCAT


@pytest.mark.parametrize("urn", _gie_urns())
def test_urn_compiles_and_inverts(urn):
    tr = P.compile_projstring(urn)
    # the nkg.gie probe point (Denmark, geocentric metres, epoch 2020.5)
    x = np.array([3541657.3778])
    y = np.array([948984.2343])
    z = np.array([5201383.5231])
    t = np.array([2020.5])
    xo, yo, zo, _ = tr.transform(x, y, z, t)
    assert np.isfinite(xo).all() and np.isfinite(yo).all()
    # frame transforms move points by centimetres..metres, not more
    assert abs(float(xo[0]) - float(x[0])) < 5.0
    xb, yb, zb, _ = tr.transform(xo, yo, zo, t, direction=-1)
    assert abs(float(xb[0]) - float(x[0])) < 1e-6
    assert abs(float(yb[0]) - float(y[0])) < 1e-6
    assert abs(float(zb[0]) - float(z[0])) < 1e-6


def test_itrf2000_to_etrf2000_step_alone():
    """EPSG:7941 transcription sanity: at the frame epoch 2000.0 the
    time-dependent terms vanish and the static offsets are the
    published 5.4/5.1/-4.8 cm translation."""
    from proj_4_spark.sources.nkg_ops import NKG_STEP_OPS

    tr = P.compile_projstring(NKG_STEP_OPS["EPSG:7941"])
    x, y, z, _ = tr.transform(np.array([6378137.0]), np.array([0.0]),
                              np.array([0.0]), np.array([2000.0]))
    # position-vector rotation: y' = y + rz*x, rz = -8.712 mas
    assert abs(float(x[0]) - 6378137.0 - 0.054) < 1e-4
    assert abs(float(y[0]) - (0.051 + 6378137.0 *
                              np.radians(-0.008712 / 3600.0))) < 1e-4
    # and z' = z - ry*x, ry = 5.39 mas
    assert abs(float(z[0]) - (-0.048 - 6378137.0 *
                              np.radians(0.00539 / 3600.0))) < 1e-4


def test_required_grids():
    assert required_grids(URN_PREFIX + "ITRF2000_TO_DK") == \
        ["eur_nkg_nkgrf03vel_realigned.tif"] * 2
    assert "no_kv_NKGETRF14_EPSG7922_2000.tif" in \
        required_grids(URN_PREFIX + "ITRF2014_TO_NO")
