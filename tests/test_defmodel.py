"""defmodel (JSON deformation-model driver) tests.

Scenario structure and expected VALUES transcribed from
/root/reference/test/unit/test_defmodel.cpp (basic :181, ISO8601 :489,
time functions :517-696, evaluator degree :697, metre :1046,
projected :1386).
"""

import json
import math

import numpy as np
import pytest

from proj_4_spark.kernels import defmodel as dm
from proj_4_spark.kernels.defmodel import (DefGrid, DefGridSet, Evaluator,
                                           EvaluatorException, MasterFile,
                                           ParsingException,
                                           iso8601_to_decimal_year)

D2R = math.pi / 180.0

MODEL_MIN_X, MODEL_MIN_Y, MODEL_MAX_X, MODEL_MAX_Y = 158, -58, 194, -25


def min_valid_content():
    return {
        "file_type": "GeoTIFF",
        "format_version": "1.0",
        "source_crs": "EPSG:4959",
        "target_crs": "EPSG:7907",
        "definition_crs": "EPSG:4959",
        "extent": {"type": "bbox", "parameters": {
            "bbox": [MODEL_MIN_X, MODEL_MIN_Y, MODEL_MAX_X, MODEL_MAX_Y]}},
        "time_extent": {"first": "1900-01-01T00:00:00Z",
                        "last": "2050-01-01T00:00:00Z"},
        "components": [],
    }


def component_json(time_function, displacement_type="horizontal",
                   interpolation="bilinear", bbox=None):
    return {
        "description": "description",
        "displacement_type": displacement_type,
        "uncertainty_type": "none",
        "extent": {"type": "bbox", "parameters": {
            "bbox": bbox or [MODEL_MIN_X, MODEL_MIN_Y,
                             MODEL_MAX_X, MODEL_MAX_Y]}},
        "spatial_model": {"type": "GeoTIFF",
                          "interpolation_method": interpolation,
                          "filename": "bla.tif"},
        "time_function": time_function,
    }


# --- parsing -----------------------------------------------------------

def test_parse_basic():
    with pytest.raises(ParsingException):
        MasterFile.parse("foo")
    with pytest.raises(ParsingException):
        MasterFile.parse("null")
    with pytest.raises(ParsingException):
        MasterFile.parse("{}")
    mf = MasterFile.parse(json.dumps(min_valid_content()))
    assert mf.file_type == "GeoTIFF"
    assert mf.source_crs == "EPSG:4959"
    assert mf.extent.minx == MODEL_MIN_X and mf.extent.maxy == MODEL_MAX_Y
    assert mf.time_first == 1900.0
    for key in list(min_valid_content()):
        j = min_valid_content()
        del j[key]
        with pytest.raises(ParsingException):
            MasterFile.parse(json.dumps(j))
    j = min_valid_content()
    j["definition_crs"] = "EPSG:4326"
    with pytest.raises(ParsingException):
        MasterFile.parse(json.dumps(j))
    j = min_valid_content()
    j["extent"]["parameters"]["bbox"] = [0, 1, 2]
    with pytest.raises(ParsingException):
        MasterFile.parse(json.dumps(j))
    j = min_valid_content()
    j["extent"]["parameters"]["bbox"] = [0, 1, 2, "foo"]
    with pytest.raises(ParsingException):
        MasterFile.parse(json.dumps(j))


def test_iso8601():
    assert iso8601_to_decimal_year("2000-01-01T00:00:00Z") == 2000.0
    assert iso8601_to_decimal_year("2000-02-29T12:00:00Z") == \
        2000.0 + ((31 + 28) * 86400.0 + 12 * 3600) / (366 * 86400)
    assert iso8601_to_decimal_year("2000-12-31T23:59:59Z") == \
        2000.0 + (366 * 86400 - 1.0) / (366 * 86400)
    assert iso8601_to_decimal_year("2001-01-01T00:00:00Z") == 2001.0
    assert iso8601_to_decimal_year("2001-12-31T23:59:59Z") == \
        2001.0 + (365 * 86400 - 1.0) / (365 * 86400)
    for bad in ["", "0000-01-01T00:00:00Z", "2001-02-29T00:00:00Z",
                "2000-13-01T00:00:00Z", "2000-01-32T00:00:00Z",
                "2000-01-01T24:00:00Z", "2000-01-01T00:60:00Z",
                "2000-01-01T00:00:61Z"]:
        with pytest.raises(ParsingException):
            iso8601_to_decimal_year(bad)


# --- time functions ----------------------------------------------------

def _tf(time_function):
    j = min_valid_content()
    j["horizontal_offset_unit"] = "metre"
    j["horizontal_offset_method"] = "addition"
    j["components"] = [component_json(time_function)]
    return MasterFile.parse(json.dumps(j)).components[0].time_function


def test_time_functions():
    tf = _tf({"type": "constant", "parameters": {}})
    assert tf.evaluate_at(1999.0) == 1.0 and tf.evaluate_at(2001.0) == 1.0

    tf = _tf({"type": "velocity", "parameters":
              {"reference_epoch": "2000-01-01T00:00:00Z"}})
    assert tf.evaluate_at(1999.0) == -1.0
    assert tf.evaluate_at(2000.0) == 0.0
    assert tf.evaluate_at(2001.0) == 1.0

    tf = _tf({"type": "step", "parameters":
              {"step_epoch": "2000-01-01T00:00:00Z"}})
    assert tf.evaluate_at(1999.99) == 0.0
    assert tf.evaluate_at(2000.0) == 1.0 and tf.evaluate_at(2000.01) == 1.0

    tf = _tf({"type": "reverse_step", "parameters":
              {"step_epoch": "2000-01-01T00:00:00Z"}})
    assert tf.evaluate_at(1999.99) == -1.0
    assert tf.evaluate_at(2000.0) == 0.0 and tf.evaluate_at(2000.01) == 0.0

    tf = _tf({"type": "exponential", "parameters": {
        "reference_epoch": "2000-01-01T00:00:00Z",
        "end_epoch": "2001-01-01T00:00:00Z", "relaxation_constant": 2.0,
        "before_scale_factor": 0.0, "initial_scale_factor": 1.0,
        "final_scale_factor": 3.0}})
    assert tf.evaluate_at(1999.99) == 0.0
    assert tf.evaluate_at(2000.0) == 1.0
    assert tf.evaluate_at(2000.5) == \
        1.0 + 2.0 * (1.0 - math.exp(-(2000.5 - 2000.0) / 2.0))
    assert tf.evaluate_at(2002.0) == \
        1.0 + 2.0 * (1.0 - math.exp(-(2001.0 - 2000.0) / 2.0))


def _piecewise(before="zero", after="constant", model=None):
    return _tf({"type": "piecewise", "parameters": {
        "before_first": before, "after_last": after,
        "model": model if model is not None else [
            {"epoch": "2016-01-01T00:00:00Z", "scale_factor": 0.5},
            {"epoch": "2017-01-01T00:00:00Z", "scale_factor": 1.0},
            {"epoch": "2017-01-01T00:00:00Z", "scale_factor": 2.0},
            {"epoch": "2018-01-01T00:00:00Z", "scale_factor": 1.0}]}})


def test_piecewise():
    tf = _piecewise()
    assert tf.evaluate_at(2015.99) == 0.0
    assert tf.evaluate_at(2016.0) == 0.5
    assert tf.evaluate_at(2016.5) == 0.75
    assert abs(tf.evaluate_at(2017 - 1e-9) - 1.0) < 1e-9
    assert tf.evaluate_at(2017.0) == 2.0
    assert tf.evaluate_at(2017.5) == 1.5
    assert tf.evaluate_at(2018.0) == 1.0 and tf.evaluate_at(2019.0) == 1.0
    assert _piecewise(before="zero").evaluate_at(2015.5) == 0.0
    assert _piecewise(before="constant").evaluate_at(2015.5) == 0.5
    assert _piecewise(before="linear").evaluate_at(2015.5) == 0.25
    assert _piecewise(after="zero").evaluate_at(2018.5) == 0.0
    assert _piecewise(after="constant").evaluate_at(2018.5) == 1.0
    assert _piecewise(after="linear").evaluate_at(2018.5) == 0.5
    assert _piecewise(model=[]).evaluate_at(2015.5) == 0.0
    one = [{"epoch": "2016-01-01T00:00:00Z", "scale_factor": 0.5}]
    tf = _piecewise(before="linear", after="linear", model=one)
    assert tf.evaluate_at(2015.5) == 0.5 and tf.evaluate_at(2016.5) == 0.5
    two = one + [{"epoch": "2016-01-01T00:00:00Z", "scale_factor": 1.0}]
    tf = _piecewise(before="linear", after="linear", model=two)
    assert tf.evaluate_at(2015.5) == 0.5 and tf.evaluate_at(2016.5) == 1.0
    # vectorized evaluation matches the scalar scan
    tf = _piecewise()
    t = np.array([2015.99, 2016.0, 2016.5, 2017.0, 2017.5, 2018.0, 2019.0])
    np.testing.assert_allclose(
        tf.evaluate_at(t), [0.0, 0.5, 0.75, 2.0, 1.5, 1.0, 1.0])


# --- degree-unit evaluator (test_defmodel.cpp:697-1046) ----------------

T_FACTOR = 0.5
G_MIN_X, G_MIN_Y, G_MAX_X, G_MAX_Y = 160.0, -50.0, 190.0, -30.0
G_RES_X, G_RES_Y = 2.0, 0.5
IQX, IQY = 1, 3
LON_OFF_X, LON_OFF_XP1 = 0.01, 0.02
LAT_OFF_Y, LAT_OFF_YP1 = 0.03, 0.04
Z_XY, Z_XP1Y, Z_XYP1, Z_XP1YP1 = 10.0, 11.0, 11.0, 12.0


def _degree_model(displacement="horizontal"):
    j = min_valid_content()
    j["horizontal_offset_method"] = "addition"
    j["horizontal_offset_unit"] = "degree"
    if displacement in ("vertical", "3d"):
        j["vertical_offset_unit"] = "metre"
    j["components"] = [component_json(
        {"type": "piecewise", "parameters": {
            "before_first": "zero", "after_last": "zero",
            "model": [
                {"epoch": "2010-01-01T00:00:00Z", "scale_factor": T_FACTOR},
                {"epoch": "2020-01-01T00:00:00Z",
                 "scale_factor": T_FACTOR}]}},
        displacement_type=displacement,
        bbox=[G_MIN_X, G_MIN_Y, G_MAX_X, G_MAX_Y])]
    return MasterFile.parse(json.dumps(j))


def _degree_grids():
    width = 1 + int(0.5 + (G_MAX_X - G_MIN_X) / G_RES_X)
    height = 1 + int(0.5 + (G_MAX_Y - G_MIN_Y) / G_RES_Y)
    lon = np.full((height, width), np.nan)
    lat = np.full((height, width), np.nan)
    z = np.full((height, width), np.nan)
    for iy, latv in ((IQY, LAT_OFF_Y), (IQY + 1, LAT_OFF_YP1)):
        for ix, lonv in ((IQX, LON_OFF_X), (IQX + 1, LON_OFF_XP1)):
            lon[iy, ix] = lonv * D2R
            lat[iy, ix] = latv * D2R
    z[IQY, IQX] = Z_XY
    z[IQY, IQX + 1] = Z_XP1Y
    z[IQY + 1, IQX] = Z_XYP1
    z[IQY + 1, IQX + 1] = Z_XP1YP1
    grid = dm.grid_from_bands(G_MIN_X, G_MIN_Y, G_RES_X, G_RES_Y,
                              e_or_lon=lon, n_or_lat=lat, z=z)
    return {"bla.tif": DefGridSet(grids=(grid,))}


def _fwd1(ev, lon_deg, lat_deg, z, t):
    x, y, zo = ev.forward(np.array([lon_deg * D2R]),
                          np.array([lat_deg * D2R]), np.array([z]),
                          np.array([t]))
    return x[0] / D2R, y[0] / D2R, zo[0]


def test_evaluator_degree():
    ev = Evaluator(_degree_model(), _degree_grids(), 1.0, 1.0)
    z_val, t_valid, eps = 100.0, 2018.0, 1e-9

    # exact grid intersection
    lon = G_MIN_X + IQX * G_RES_X
    lat = G_MIN_Y + IQY * G_RES_Y
    nx, ny, nz = _fwd1(ev, lon, lat, z_val, t_valid)
    assert abs(nx - (lon + T_FACTOR * LON_OFF_X)) < eps
    assert abs(ny - (lat + T_FACTOR * LAT_OFF_Y)) < eps
    assert nz == z_val

    # between grid points
    ax, ay = 0.25, 0.125
    lon2 = lon + ax * G_RES_X
    lat2 = lat + ay * G_RES_Y
    nx, ny, nz = _fwd1(ev, lon2, lat2, z_val, t_valid)
    assert abs(nx - (lon2 + T_FACTOR *
                     (LON_OFF_X + ax * (LON_OFF_XP1 - LON_OFF_X)))) < eps
    assert abs(ny - (lat2 + T_FACTOR *
                     (LAT_OFF_Y + ay * (LAT_OFF_YP1 - LAT_OFF_Y)))) < eps
    assert nz == z_val

    # outside model extent / time extent -> error (NaN)
    for plon, plat, pt in [(MODEL_MIN_X - 0.1, lat, t_valid),
                           (MODEL_MAX_X + 0.1, lat, t_valid),
                           (lon, MODEL_MIN_Y - 0.1, t_valid),
                           (lon, MODEL_MAX_Y + 0.1, t_valid),
                           (lon, lat, 1000.0), (lon, lat, 3000.0)]:
        nx, ny, nz = _fwd1(ev, plon, plat, z_val, pt)
        assert math.isnan(nx) and math.isnan(ny) and math.isnan(nz)

    # inside model, outside component bbox -> unchanged
    for plon, plat in [(G_MIN_X - 0.1, lat), (G_MAX_X + 0.1, lat),
                       (lon, G_MIN_Y - 0.1), (lon, G_MAX_Y + 0.1)]:
        nx, ny, nz = _fwd1(ev, plon, plat, z_val, t_valid)
        assert abs(nx - plon) < eps and abs(ny - plat) < eps
        assert nz == z_val

    # time factor 0 -> unchanged
    nx, ny, nz = _fwd1(ev, lon, lat, z_val, 2000.0)
    assert abs(nx - lon) < eps and abs(ny - lat) < eps and nz == z_val

    # vertical
    evv = Evaluator(_degree_model("vertical"), _degree_grids(), 1.0, 1.0)
    nx, ny, nz = _fwd1(evv, lon2, lat2, z_val, t_valid)
    z_bot = Z_XY + ax * (Z_XP1Y - Z_XY)
    z_top = Z_XYP1 + ax * (Z_XP1YP1 - Z_XYP1)
    assert abs(nx - lon2) < eps and abs(ny - lat2) < eps
    assert abs(nz - (z_val + T_FACTOR * (z_bot + ay * (z_top - z_bot)))) \
        < eps

    # 3d
    ev3 = Evaluator(_degree_model("3d"), _degree_grids(), 1.0, 1.0)
    nx, ny, nz = _fwd1(ev3, lon2, lat2, z_val, t_valid)
    assert abs(nx - (lon2 + T_FACTOR *
                     (LON_OFF_X + ax * (LON_OFF_XP1 - LON_OFF_X)))) < eps
    assert abs(nz - (z_val + T_FACTOR * (z_bot + ay * (z_top - z_bot)))) \
        < eps


# --- metre-unit evaluator (test_defmodel.cpp:1046-1386) ----------------

A_WGS, B_WGS = 6378137.0, 6356752.314140
M_MIN_X, M_MIN_Y, M_MAX_X, M_MAX_Y = 165.8, -37.5, 166.2, -37.2
M_RES_X = M_MAX_X - M_MIN_X
M_RES_Y = M_MAX_Y - M_MIN_Y
# the reference mock returns float-cast constants (0.4f etc.)
F32 = lambda v: float(np.float32(v))  # noqa: E731
EN_VALS = {(0, 0): (F32(0.4), F32(-0.2)), (1, 0): (F32(0.5), F32(-0.25)),
           (0, 1): (F32(0.8), F32(-0.4)), (1, 1): (F32(1.0), F32(-0.3))}
Z_VALS = {(0, 0): F32(0.84), (1, 0): F32(0.75),
          (0, 1): F32(0.36), (1, 1): F32(0.0)}


def _metre_model(displacement="horizontal", interpolation="bilinear",
                 method="addition"):
    j = min_valid_content()
    j["horizontal_offset_method"] = method
    j["horizontal_offset_unit"] = "metre"
    j["vertical_offset_unit"] = "metre"
    j["components"] = [component_json(
        {"type": "piecewise", "parameters": {
            "before_first": "zero", "after_last": "zero",
            "model": [
                {"epoch": "2010-01-01T00:00:00Z", "scale_factor": T_FACTOR},
                {"epoch": "2020-01-01T00:00:00Z",
                 "scale_factor": T_FACTOR}]}},
        displacement_type=displacement, interpolation=interpolation,
        bbox=[M_MIN_X - M_RES_X, M_MIN_Y - M_RES_Y, M_MAX_X, M_MAX_Y])]
    return MasterFile.parse(json.dumps(j))


def _metre_grids():
    # 3x3 grid with the first row/column duplicating the core 2x2
    # (the reference mock clamps ix-1==-1 -> 0)
    e = np.empty((3, 3))
    n = np.empty((3, 3))
    z = np.empty((3, 3))
    for iy in range(3):
        for ix in range(3):
            key = (max(ix - 1, 0), max(iy - 1, 0))
            e[iy, ix], n[iy, ix] = EN_VALS[key]
            z[iy, ix] = Z_VALS[key]
    grid = dm.grid_from_bands(M_MIN_X - M_RES_X, M_MIN_Y - M_RES_Y,
                              M_RES_X, M_RES_Y, e_or_lon=e, n_or_lat=n, z=z)
    return {"bla.tif": DefGridSet(grids=(grid,))}


def _dlonlat_to_en(phi, dlam, dphi, a, b):
    """DeltaLongLatToEastingNorthing (test_defmodel.cpp:1026-1040)."""
    sp, cp = math.sin(phi), math.cos(phi)
    a2, b2 = a * a, b * b
    X = a2 * cp * cp + b2 * sp * sp
    return dlam * (a2 * cp) / math.sqrt(X), dphi * a2 * b2 / (X ** 1.5)


METRE_POINTS = [
    (M_MIN_X - M_RES_X - 1e-11, M_MIN_Y - M_RES_Y - 1e-11,
     0.4, -0.2, 0, "horizontal", "bilinear"),
    (M_MIN_X, M_MIN_Y, 0.4, -0.2, 0, "horizontal", "bilinear"),
    (M_MAX_X, M_MIN_Y, 0.5, -0.25, 0, "horizontal", "bilinear"),
    (M_MIN_X, M_MAX_Y, 0.8, -0.4, 0, "horizontal", "bilinear"),
    (M_MAX_X, M_MAX_Y, 1.0, -0.3, 0, "horizontal", "bilinear"),
    (M_MAX_X + 1e-11, M_MAX_Y + 1e-11, 1.0, -0.3, 0, "horizontal",
     "bilinear"),
    (165.9, -37.3, 0.70833334, -0.32083334, 0, "horizontal", "bilinear"),
    (165.9, -37.3, 0.70833334, -0.32083334, 0.4525, "3d", "bilinear"),
    (M_MIN_X, M_MIN_Y, 0.4, -0.2, 0, "horizontal", "geocentric_bilinear"),
    (M_MAX_X, M_MIN_Y, 0.5, -0.25, 0, "horizontal", "geocentric_bilinear"),
    (M_MIN_X, M_MAX_Y, 0.8, -0.4, 0, "horizontal", "geocentric_bilinear"),
    (M_MAX_X, M_MAX_Y, 1.0, -0.3, 0, "horizontal", "geocentric_bilinear"),
    (165.9, -37.3, 0.7083692044608846, -0.3209642339711405, 0,
     "horizontal", "geocentric_bilinear"),
    (165.9, -37.3, 0.7083692044608846, -0.3209642339711405, 0.4525, "3d",
     "geocentric_bilinear"),
]


@pytest.mark.parametrize(
    "lon,lat,exp_de,exp_dn,exp_dz,disp,interp", METRE_POINTS)
def test_evaluator_metre(lon, lat, exp_de, exp_dn, exp_dz, disp, interp):
    ev = Evaluator(_metre_model(disp, interp), _metre_grids(),
                   A_WGS, B_WGS)
    nx, ny, nz = ev.forward(np.array([lon * D2R]), np.array([lat * D2R]),
                            np.array([100.0]), np.array([2018.0]))
    assert not math.isnan(nx[0])
    assert abs(nz[0] - 100.0 - T_FACTOR * exp_dz) < 1e-8
    de, dn = _dlonlat_to_en(lat * D2R, nx[0] - lon * D2R, ny[0] - lat * D2R,
                            A_WGS, B_WGS)
    assert abs(de - T_FACTOR * exp_de) < 1e-8
    assert abs(dn - T_FACTOR * exp_dn) < 1e-8


def test_evaluator_metre_inverse_and_geocentric_method():
    ev = Evaluator(_metre_model("3d", "bilinear"), _metre_grids(),
                   A_WGS, B_WGS)
    lon, lat = 165.9, -37.3
    nx, ny, nz = ev.forward(np.array([lon * D2R]), np.array([lat * D2R]),
                            np.array([100.0]), np.array([2018.0]))
    ix, iy, iz = ev.inverse(nx, ny, nz, np.array([2018.0]))
    assert abs(ix[0] / D2R - lon) < 1e-10
    assert abs(iy[0] / D2R - lat) < 1e-10
    assert abs(iz[0] - 100.0) < 1e-4

    evg = Evaluator(_metre_model("3d", "bilinear", method="geocentric"),
                    _metre_grids(), A_WGS, B_WGS)
    nx, ny, nz = evg.forward(np.array([M_MIN_X * D2R]),
                             np.array([M_MIN_Y * D2R]),
                             np.array([100.0]), np.array([2018.0]))
    de, dn = _dlonlat_to_en(M_MIN_Y * D2R, nx[0] - M_MIN_X * D2R,
                            ny[0] - M_MIN_Y * D2R, A_WGS, B_WGS)
    assert abs(de - T_FACTOR * 0.40000000948081327) < 1e-10
    assert abs(dn - T_FACTOR * -0.19999999810542682) < 1e-9
    assert abs(nz[0] - 100.0 - T_FACTOR * 0.84) < 1e-4


# --- projected CRS (test_defmodel.cpp:1386-1514) -----------------------

def test_evaluator_projected_crs():
    j = min_valid_content()
    j["horizontal_offset_method"] = "addition"
    j["horizontal_offset_unit"] = "metre"
    j["vertical_offset_unit"] = "metre"
    j["extent"]["parameters"]["bbox"] = [10000, 20000, 30000, 40000]
    j["components"] = [component_json(
        {"type": "constant", "parameters": {}},
        bbox=[10000, 20000, 30000, 40000])]
    mf = MasterFile.parse(json.dumps(j))
    e = np.array([[0.4, 0.5], [0.8, 1.0]])
    n = np.array([[-0.2, -0.25], [-0.4, -0.3]])
    grid = dm.grid_from_bands(10000, 20000, 20000, 20000, e_or_lon=e,
                              n_or_lat=n, geographic=False)
    grids = {"bla.tif": DefGridSet(grids=(grid,))}
    ev = Evaluator(mf, grids, A_WGS, B_WGS, is_geographic=False)
    nx, ny, nz = ev.forward(np.array([10000.0]), np.array([20000.0]),
                            np.array([100.0]), np.array([2018.0]))
    assert abs(nx[0] - 10000.0 - 0.4) < 1e-8
    assert abs(ny[0] - 20000.0 - (-0.2)) < 1e-8
    assert abs(nz[0] - 100.0) < 1e-8

    j2 = dict(j)
    j2["horizontal_offset_unit"] = "degree"
    with pytest.raises(EvaluatorException):
        Evaluator(MasterFile.parse(json.dumps(j2)), grids, A_WGS, B_WGS,
                  is_geographic=False)
    j2 = dict(j)
    j2["horizontal_offset_method"] = "geocentric"
    with pytest.raises(EvaluatorException):
        Evaluator(MasterFile.parse(json.dumps(j2)), grids, A_WGS, B_WGS,
                  is_geographic=False)
    j2 = json.loads(json.dumps(j))
    j2["components"][0]["spatial_model"]["interpolation_method"] = \
        "geocentric_bilinear"
    with pytest.raises(EvaluatorException):
        Evaluator(MasterFile.parse(json.dumps(j2)), grids, A_WGS, B_WGS,
                  is_geographic=False)


# --- end-to-end through the projstring compiler ------------------------

def test_defmodel_projstring():
    from proj_4_spark.proj import (DEFMODEL_REGISTRY, GRID_REGISTRY,
                                   compile_projstring)

    j = min_valid_content()
    j["horizontal_offset_method"] = "addition"
    j["horizontal_offset_unit"] = "metre"
    j["vertical_offset_unit"] = "metre"
    j["components"] = [component_json(
        {"type": "velocity", "parameters":
         {"reference_epoch": "2000-01-01T00:00:00Z"}},
        displacement_type="3d",
        bbox=[M_MIN_X - M_RES_X, M_MIN_Y - M_RES_Y, M_MAX_X, M_MAX_Y])]
    DEFMODEL_REGISTRY["test_nz_model"] = json.dumps(j)
    GRID_REGISTRY["bla.tif"] = _metre_grids()["bla.tif"]
    try:
        tr = compile_projstring("+proj=defmodel +model=test_nz_model "
                                "+ellps=WGS84")
        lon = np.array([165.9, 165.9, 0.0])
        lat = np.array([-37.3, -37.3, 0.0])
        t = np.array([2010.0, 2018.0, 2010.0])
        x, y, z, _ = tr.transform_deg(lon, lat,
                                      z=np.array([100.0, 100.0, 100.0]), t=t)
        # velocity tfactor = t - 2000 -> displacement scales linearly
        de1, dn1 = _dlonlat_to_en(lat[0] * D2R, (x[0] - lon[0]) * D2R,
                                  (y[0] - lat[0]) * D2R, A_WGS, B_WGS)
        de2, dn2 = _dlonlat_to_en(lat[1] * D2R, (x[1] - lon[1]) * D2R,
                                  (y[1] - lat[1]) * D2R, A_WGS, B_WGS)
        assert abs(de2 / de1 - 18.0 / 10.0) < 1e-6
        assert abs((z[1] - 100.0) / (z[0] - 100.0) - 18.0 / 10.0) < 1e-6
        # outside model extent -> NaN
        assert math.isnan(x[2]) and math.isnan(y[2])
        # missing time -> error (NaN), mirroring PROJ's missing-time error
        x, y, _, _ = tr.transform_deg(lon[:1], lat[:1])
        assert math.isnan(x[0])
        # roundtrip
        x, y, z, _ = tr.transform_deg(lon[:2], lat[:2],
                                      z=np.array([100.0, 100.0]),
                                      t=t[:2])
        bx, by, bz, _ = tr.transform_deg(x, y, z=z, t=t[:2],
                                         direction="inv")
        assert np.allclose(bx, lon[:2], atol=1e-10)
        assert np.allclose(by, lat[:2], atol=1e-10)
        assert np.allclose(bz, 100.0, atol=1e-4)
    finally:
        DEFMODEL_REGISTRY.pop("test_nz_model", None)
        GRID_REGISTRY.pop("bla.tif", None)
