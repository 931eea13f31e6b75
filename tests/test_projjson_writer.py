"""PROJJSON writer (crs_io.projstring_to_projjson): reader-roundtrip
over the whole EPSG registry + shape checks."""

import json

import numpy as np
import pytest

from proj_4_spark import crs
from proj_4_spark.crs_io import (projjson_to_projstring,
                                 projstring_to_projjson)
from proj_4_spark.proj import compile_projstring
from tests.test_epsg_registry import _probe_point


@pytest.mark.parametrize("code", crs.registry_codes())
def test_registry_roundtrip(code):
    ps = crs.epsg_projstring(code)
    j = projstring_to_projjson(ps, name=f"EPSG:{code}")
    # must be valid JSON end-to-end
    back = projjson_to_projstring(json.dumps(j))
    t1, t2 = compile_projstring(ps), compile_projstring(back)
    lon, lat = _probe_point(code, ps)
    o1 = t1.transform_deg(np.array([lon]), np.array([lat]))
    o2 = t2.transform_deg(np.array([lon]), np.array([lat]))
    assert float(o1[0][0]) == pytest.approx(float(o2[0][0]), abs=1e-6)
    assert float(o1[1][0]) == pytest.approx(float(o2[1][0]), abs=1e-6)


def test_boundcrs_shape():
    j = projstring_to_projjson(crs.epsg_projstring(27700))
    assert j["type"] == "BoundCRS"
    assert j["source_crs"]["type"] == "ProjectedCRS"
    tr = j["transformation"]
    names = [p["name"] for p in tr["parameters"]]
    assert names[:3] == ["X-axis translation", "Y-axis translation",
                         "Z-axis translation"]
    assert tr["parameters"][6]["unit"]["name"] == "parts per million"


def test_geographic_shape():
    j = projstring_to_projjson("+proj=longlat +ellps=GRS80")
    assert j["type"] == "GeographicCRS"
    assert j["datum"]["ellipsoid"]["name"] == "GRS 1980"
    assert j["$schema"].endswith("projjson.schema.json")


def test_projinfo_carries_projjson():
    info = crs.projinfo("EPSG:2154")
    assert info["projjson"]["type"] == "ProjectedCRS"
