"""Binary grid-file parsers (sources/gridfiles.py) against the
reference's real fixture files (read-only, skipped if absent) and
byte-roundtrip synthetics.

Goldens transcribed from:
- /root/reference/test/gie/more_builtins.gie:894-906
  (test_hgrid_{little,big}_endian.gsb: 4.5,52.5 -> 5.875,55.375, 2 mm)
- /root/reference/test/gie/more_builtins.gie:286-293
  (ntf_r93.gsb inverse: 2.25,46.5 -> 2.250704350387,46.500051597273,
  1 mm)
- /root/reference/test/gie/more_builtins.gie:242-249
  (egm96_15 gtx: 12.5,55.5,0 -> -36.394090697, 1 cm — the test-suite
  grid is the downsampled copy shipped in data/tests)
"""

import os

import numpy as np
import pytest

from proj_4_spark.kernels.gridshift import GridSet
from proj_4_spark.proj import GRID_REGISTRY, compile_projstring
from proj_4_spark.sources import gridfiles as GF

REF = "/root/reference/data/tests"

needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixture dir not present")


def _read(name):
    with open(os.path.join(REF, name), "rb") as f:
        return f.read()


@needs_ref
@pytest.mark.parametrize("fname", ["test_hgrid_little_endian.gsb",
                                   "test_hgrid_big_endian.gsb"])
def test_ntv2_endianness_golden(fname):
    grids = GF.parse_ntv2(_read(fname))
    assert len(grids) == 1
    name, parent, g = grids[0]
    GRID_REGISTRY[fname] = g
    tr = compile_projstring(f"+proj=hgridshift +grids={fname}")
    lon, lat, _, _ = tr.transform_deg(np.array([4.5]), np.array([52.5]))
    # gie tolerance 2 mm; lon tolerance scaled by cos(lat)
    assert abs(lat[0] - 55.375) < 2e-3 / 111320.0
    assert abs(lon[0] - 5.875) < 2e-3 / (111320.0 * np.cos(np.radians(55.375)))


@needs_ref
def test_ntv2_ntf_r93_golden():
    grids = GF.parse_ntv2(_read("ntf_r93.gsb"))
    g = grids[0][2]
    GRID_REGISTRY["ntf_r93.gsb"] = g if len(grids) == 1 else GridSet(
        grids=tuple(x[2] for x in grids))
    tr = compile_projstring("+proj=hgridshift +grids=ntf_r93.gsb "
                            "+ellps=GRS80")
    lon, lat, _, _ = tr.transform_deg(
        np.array([2.25]), np.array([46.5]), direction="inv")
    tol_deg = 1e-3 / 111320.0
    assert abs(lat[0] - 46.500051597273) < tol_deg
    assert abs(lon[0] - 2.250704350387) < tol_deg / np.cos(np.radians(46.5))
    # and the forward goes back
    lon2, lat2, _, _ = tr.transform_deg(lon, lat)
    assert abs(lon2[0] - 2.25) < 1e-9
    assert abs(lat2[0] - 46.5) < 1e-9


@needs_ref
def test_gtx_egm96_golden():
    g = GF.parse_gtx(_read("egm96_15_downsampled.gtx"))
    GRID_REGISTRY["egm96_15_downsampled.gtx"] = g
    tr = compile_projstring(
        "+proj=vgridshift +grids=egm96_15_downsampled.gtx +ellps=GRS80")
    _, _, z, _ = tr.transform_deg(
        np.array([12.5]), np.array([55.5]), np.array([0.0]))
    assert abs(z[0] - (-36.394090697)) < 1e-2


@needs_ref
def test_gtx_nodata():
    g = GF.parse_gtx(_read("test_nodata.gtx"))
    assert np.isnan(g.values).any()


@needs_ref
def test_ntv2_multi_subfile_set():
    grids = GF.parse_ntv2(_read("ntv2_0_downsampled.gsb"))
    obj = GF.load_grid_bytes("ntv2_0_downsampled.gsb",
                             _read("ntv2_0_downsampled.gsb"))
    if len(grids) > 1:
        assert isinstance(obj, GridSet)
        # child grids must refine: every child cell is smaller than the
        # coarsest
        areas = [abs(g.dlon * g.dlat) for _, _, g in grids]
        assert min(areas) < max(areas) or len(set(areas)) == 1


def test_gtx_byte_roundtrip():
    rng = np.random.RandomState(11)
    v = rng.uniform(-80, 80, (13, 17)).astype(np.float32).astype(np.float64)
    v[3, 4] = np.nan
    blob = GF.write_gtx(20.0, -30.0, 2.5, 2.0, v)
    g = GF.parse_gtx(blob)
    assert g.values.shape == (13, 17)
    assert np.isnan(g.values[3, 4])
    m = ~np.isnan(v)
    np.testing.assert_array_equal(g.values[m], v[m])
    assert g.lat0 == pytest.approx(np.radians(20.0))
    assert g.dlon == pytest.approx(np.radians(2.0))


def test_register_grid_file_vgridshift_end_to_end():
    lon = np.linspace(-30.0, 50.0, 41)
    lat = np.linspace(20.0, 70.0, 31)
    LO, LA = np.meshgrid(np.radians(lon), np.radians(lat))
    und = 30.0 * np.sin(2 * LO) * np.cos(3 * LA)
    blob = GF.write_gtx(20.0, -30.0, lat[1] - lat[0], lon[1] - lon[0], und)
    GF.register_grid_file("synthetic_geoid.gtx", blob)
    tr = compile_projstring(
        "+proj=vgridshift +grids=synthetic_geoid.gtx +ellps=GRS80")
    _, _, z, _ = tr.transform_deg(
        np.array([10.0, 100.0]), np.array([45.0, 0.0]), np.array([0.0, 0.0]))
    # in-grid point gets -undulation; out-of-grid is a domain error
    # (reference vgridshift errors outside every grid)
    assert abs(z[0]) > 1.0
    assert np.isnan(z[1])
    # roundtrip
    _, _, z2, _ = tr.transform_deg(
        np.array([10.0]), np.array([45.0]), z[:1], direction="inv")
    assert abs(z2[0]) < 1e-9


def test_ctable2_byte_roundtrip():
    rng = np.random.RandomState(7)
    dlam = rng.uniform(-1e-5, 1e-5, (9, 12))
    dphi = rng.uniform(-1e-5, 1e-5, (9, 12))
    blob = GF.write_ctable2(np.radians(-120.0), np.radians(30.0),
                            np.radians(0.5), np.radians(0.25),
                            dlam, dphi, "roundtrip fixture")
    g = GF.parse_ctable2(blob)
    assert g.values.shape == (9, 12, 2)
    np.testing.assert_allclose(g.values[:, :, 0], dlam, atol=1e-12)
    np.testing.assert_allclose(g.values[:, :, 1], dphi, atol=1e-12)
    assert g.lon0 == pytest.approx(np.radians(-120.0))
    assert g.dlat == pytest.approx(np.radians(0.25))
    assert GF.load_grid_bytes("x.ct2", blob).values.shape == (9, 12, 2)


@needs_ref
def test_ctable2_conus_golden():
    """Golden from test/cli/test_cs2cs_datumfile.yaml:46-53 (NAD27 ->
    NAD83 via +nadgrids=conus): 111W 44N -> 111d0'2.788"W
    43d59'59.725"N; 111W 39N -> 111d0'2.604"W 38d59'59.912"N
    (printed at 0.001 arcsec)."""
    GF.register_grid_file("conus", _read("conus"))
    tr = compile_projstring("+proj=hgridshift +grids=conus +ellps=clrk66")
    lon, lat = np.array([-111.0, -111.0]), np.array([44.0, 39.0])
    xo, yo = tr.transform_deg(lon, lat)[:2]
    exp_lon = -(111.0 + np.array([2.788, 2.604]) / 3600.0)
    exp_lat = np.array([43 + 59 / 60 + 59.725 / 3600,
                        38 + 59 / 60 + 59.912 / 3600])
    np.testing.assert_allclose(xo, exp_lon, atol=3e-7)
    np.testing.assert_allclose(yo, exp_lat, atol=3e-7)
    # inverse roundtrip (iterative) back to 0.1 mm-level
    xi, yi = tr.transform_deg(xo.copy(), yo.copy(), direction="inv")[:2]
    np.testing.assert_allclose(xi, lon, atol=1e-9)
    np.testing.assert_allclose(yi, lat, atol=1e-9)


@needs_ref
def test_ntv1_nadgrids_list_golden():
    """Goldens from test/cli/test_cs2cs_datumfile.yaml:8-15:
    +nadgrids=ntv1_can.dat,conus — 44N goes through ntv1 (first listed
    containing grid wins), 39N through conus."""
    GF.register_grid_file("ntv1_can.dat", _read("ntv1_can.dat"))
    GF.register_grid_file("conus", _read("conus"))
    from proj_4_spark.crs import crs_to_crs

    tr = crs_to_crs("+proj=latlong +ellps=clrk66 "
                    "+nadgrids=ntv1_can.dat,conus",
                    "+proj=longlat +ellps=GRS80")
    lon, lat = np.array([-111.0, -111.0]), np.array([44.0, 39.0])
    xo, yo = tr.transform_deg(lon, lat)[:2]
    exp_lon = -(111.0 + np.array([3.208, 2.604]) / 3600.0)
    exp_lat = np.array([43 + 59 / 60 + 59.732 / 3600,
                        38 + 59 / 60 + 59.912 / 3600])
    np.testing.assert_allclose(xo, exp_lon, atol=3e-7)
    np.testing.assert_allclose(yo, exp_lat, atol=3e-7)
    # inverse of the CRS-to-CRS pipeline restores the input
    xi, yi = tr.transform_deg(xo.copy(), yo.copy(), direction="inv")[:2]
    np.testing.assert_allclose(xi, lon, atol=1e-9)
    np.testing.assert_allclose(yi, lat, atol=1e-9)


@needs_ref
def test_nadgrids_optional_marker():
    from proj_4_spark.crs import crs_to_crs
    from proj_4_spark.proj import compile_projstring

    GF.register_grid_file("conus", _read("conus"))
    tr = crs_to_crs("+proj=latlong +ellps=clrk66 "
                    "+nadgrids=@not_loaded_anywhere,conus",
                    "+proj=longlat +ellps=GRS80")
    xo, _ = tr.transform_deg(np.array([-111.0]), np.array([39.0]))[:2]
    assert abs(xo[0] + (111.0 + 2.604 / 3600.0)) < 3e-7
    with pytest.raises(FileNotFoundError):
        compile_projstring("+proj=hgridshift +grids=definitely_missing")


@needs_ref
def test_nested_gridset_keeps_finest_within_file():
    """An NTv2 file with parent+children used inside an ordered
    +nadgrids list must still select the finest subgrid within the
    file (review fix: no flattening into the first-wins list)."""
    from proj_4_spark.kernels.gridshift import GridSet

    data = _read("ntv2_0_downsampled.gsb")
    obj = GF.load_grid_bytes("ntv2_0_downsampled.gsb", data)
    if not isinstance(obj, GridSet):
        pytest.skip("fixture has a single subgrid")
    GF.register_grid_file("ntv2_0_downsampled.gsb", data)
    GF.register_grid_file("conus", _read("conus"))
    single = compile_projstring(
        "+proj=hgridshift +grids=ntv2_0_downsampled.gsb +ellps=GRS80")
    listed = compile_projstring(
        "+proj=hgridshift +grids=ntv2_0_downsampled.gsb,conus "
        "+ellps=GRS80")
    # points inside the NTv2 extent: identical results whether the
    # file stands alone (finest policy) or leads an ordered list
    lon = np.array([-66.0, -70.0, -111.0])
    lat = np.array([45.5, 46.0, 50.0])
    xa, ya = single.transform_deg(lon.copy(), lat.copy())[:2]
    xb, yb = listed.transform_deg(lon.copy(), lat.copy())[:2]
    np.testing.assert_allclose(xa, xb, atol=1e-12)
    np.testing.assert_allclose(ya, yb, atol=1e-12)


@needs_ref
def test_multi_entry_geotiff_tuple_in_hgridshift():
    """A two-IFD GeoTIFF registered under one name must work through
    plain hgridshift (review fix: tuple registry values)."""
    name = "us_noaa_nadcon5_nad83_2007_nad83_2011_alaska_extract.tif"
    GF.register_grid_file(name, _read(name))
    tr = compile_projstring(f"+proj=hgridshift +grids={name} "
                            "+ellps=GRS80")
    x, y = tr.transform_deg(np.array([-158.0]), np.array([61.5]))[:2]
    assert abs(x[0] + 157.9999996115) < 1e-8
