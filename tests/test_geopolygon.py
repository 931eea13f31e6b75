"""Spark polygon-area operator vs the golden-tested NumPy kernel.

The operator (operators/geopolygon.py) must reproduce
geod_polygonarea (geodesic.c:1567-1727) through the distributed
edge-table plan, including the pole-cap and multi-circling cases
whose remainder/crossing correction runs in Catalyst.
"""
import pytest

from proj_4_spark.kernels.geodesic import Geodesic, polygon_area_perimeter
from proj_4_spark.operators.geopolygon import polygon_area

POLYGONS = {
    0: [(89, 0), (89, 90), (89, 180), (89, 270)],          # pole cap
    1: [(-89, 0), (-89, 90), (-89, 180), (-89, 270)],      # south cap (CW)
    2: [(0, -1), (-1, 0), (0, 1), (1, 0)],                 # equator diamond
    3: [(90, 0), (0, 0), (0, 90)],                         # octant
    4: [(89, 0.1), (89, 90.1), (89, -179.9)],              # pole crossing
    5: [(89, -360), (89, -240), (89, -120), (89, 0), (89, 120), (89, 240)],
    6: [(2, 1), (1, 2), (3, 3)],                           # thin triangle
}


def _vertex_df(spark):
    rows = [(pid, i, float(la), float(lo))
            for pid, pts in POLYGONS.items()
            for i, (la, lo) in enumerate(pts)]
    return spark.createDataFrame(
        rows, "poly_id int, vertex_id int, lat double, lon double")


def test_operator_matches_kernel(spark):
    out = {r["poly_id"]: r for r in
           polygon_area(_vertex_df(spark)).collect()}
    g = Geodesic.init(6378137.0, 1 / 298.257223563)
    for pid, pts in POLYGONS.items():
        perim, area = polygon_area_perimeter(
            g, [p[0] for p in pts], [p[1] for p in pts])
        r = out[pid]
        assert r["n_vertices"] == len(pts)
        assert r["perimeter_m"] == pytest.approx(perim, abs=1e-6)
        assert r["area_m2"] == pytest.approx(area, abs=0.5)


def test_operator_polyline(spark):
    out = {r["poly_id"]: r for r in
           polygon_area(_vertex_df(spark), polyline=True).collect()}
    g = Geodesic.init(6378137.0, 1 / 298.257223563)
    for pid, pts in POLYGONS.items():
        perim, _ = polygon_area_perimeter(
            g, [p[0] for p in pts], [p[1] for p in pts], polyline=True)
        assert out[pid]["perimeter_m"] == pytest.approx(perim, abs=1e-6)
        assert out[pid]["n_vertices"] == len(pts)


def test_operator_sphere(spark):
    out = polygon_area(_vertex_df(spark).where("poly_id = 6"),
                       a=6370997.0, f=0.0).collect()[0]
    g = Geodesic.init(6370997.0, 0.0)
    _, area = polygon_area_perimeter(g, [2, 1, 3], [1, 2, 3])
    assert out["area_m2"] == pytest.approx(area, abs=0.5)
