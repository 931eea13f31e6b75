"""GeoTIFF grid reader + unified gridshift against the reference's
real NADCON5 fixtures.

Goldens transcribed from /root/reference/test/gie/gridshift.gie:
- :109-140 (conus extract, GEOGRAPHIC_3D_OFFSET, biquadratic default)
- :150-168 (alaska extract, split HORIZONTAL/ELLIPSOIDAL_HEIGHT IFDs)
- :175-190 (combined two-file grid list)
- :197-207 (+no_z_transform)
- :210-230 (+interpolation biquadratic vs bilinear, 0.005/0.001 mm)
- :232-240 (sanfrancisco biquadratic inverse at a window boundary,
  0.005 mm — the NCAT no-reverse-iteration behavior)
"""

import os

import numpy as np
import pytest

from proj_4_spark.proj import compile_projstring
from proj_4_spark.sources import gridfiles as GF

REF = "/root/reference/data/tests"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixture dir not present")

CONUS = "us_noaa_nadcon5_nad83_2007_nad83_2011_conus_extract.tif"
ALASKA = "us_noaa_nadcon5_nad83_2007_nad83_2011_alaska_extract.tif"
SF = "us_noaa_nadcon5_nad83_1986_nad83_harn_conus_extract_sanfrancisco.tif"

MM = 1.0 / 111_000_000.0  # ~1 mm in degrees


def _reg(name):
    with open(os.path.join(REF, name), "rb") as f:
        GF.register_grid_file(name, f.read())


@needs_ref
class TestGeotiffGridshift:
    def test_parse_structure(self):
        with open(os.path.join(REF, ALASKA), "rb") as f:
            entries = GF.parse_geotiff(f.read())
        assert [e["type"] for e in entries] == \
            ["HORIZONTAL_OFFSET", "ELLIPSOIDAL_HEIGHT_OFFSET"]
        assert entries[0]["interp"] == "biquadratic"
        assert entries[0]["grid"].values.shape == (11, 11, 2)
        # 0-360 Alaska georeferencing is kept verbatim; queries are
        # normalized into the grid frame at sample time (wrap_lam)
        assert 195 < np.degrees(entries[0]["grid"].lon0) < 210
        from proj_4_spark.kernels.gridshift import in_grid
        assert in_grid(entries[0]["grid"],
                       np.radians(np.array([-158.4])),
                       np.radians(np.array([61.3])))[0]

    def test_conus_3d_offset_goldens(self):
        _reg(CONUS)
        tr = compile_projstring(f"+proj=gridshift +grids={CONUS} "
                                "+ellps=GRS80")
        lon = np.array([-95.5, -95.4916666666, -95.4916666667,
                        -95.416667, -95.58333])
        lat = np.array([37.0, 37.0083333333, 37.0083333334,
                        37.083333, 36.91667])
        z = np.array([10.0, 10.0, 10.0, 0.0, 0.0])
        x, y, zo, _ = tr.transform_deg(lon.copy(), lat.copy(), z.copy())
        exp_x = [-95.4999998219, -95.4916664889, -95.4916664890,
                 -95.4166668251, -95.5833298166]
        exp_y = [37.0000000147, 37.0083333484, 37.0083333485,
                 37.0833330159, 36.9166700108]
        exp_z = [9.984, 9.984, 9.984, -0.0157, -0.0157]
        np.testing.assert_allclose(x, exp_x, atol=MM)
        np.testing.assert_allclose(y, exp_y, atol=MM)
        np.testing.assert_allclose(zo, exp_z, atol=1e-3)
        xi, yi, zi, _ = tr.transform_deg(x.copy(), y.copy(), zo.copy(),
                                         direction="inv")
        np.testing.assert_allclose(xi, lon, atol=MM)
        np.testing.assert_allclose(yi, lat, atol=MM)
        np.testing.assert_allclose(zi, z, atol=1e-3)

    def test_alaska_split_ifds(self):
        _reg(ALASKA)
        tr = compile_projstring(f"+proj=gridshift +grids={ALASKA} "
                                "+ellps=GRS80")
        x, y, zo, _ = tr.transform_deg(np.array([-158.0, -158.1]),
                                       np.array([61.5, 61.51]),
                                       np.array([10.0, 10.0]))
        np.testing.assert_allclose(
            x, [-157.9999996115, -158.0999996011], atol=MM)
        np.testing.assert_allclose(
            y, [61.499999564, 61.5099995458], atol=MM)
        np.testing.assert_allclose(zo, [9.987, 9.987], atol=1e-3)

    def test_combined_grid_list(self):
        _reg(CONUS)
        _reg(ALASKA)
        tr = compile_projstring(
            f"+proj=gridshift +grids={CONUS},{ALASKA} +ellps=GRS80")
        x, y, zo, _ = tr.transform_deg(np.array([-95.5, -158.0]),
                                       np.array([37.0, 61.5]),
                                       np.array([10.0, 10.0]))
        np.testing.assert_allclose(
            x, [-95.4999998219, -157.9999996115], atol=MM)
        np.testing.assert_allclose(zo, [9.984, 9.987], atol=1e-3)

    def test_no_z_transform(self):
        _reg(CONUS)
        tr = compile_projstring(f"+proj=gridshift +grids={CONUS} "
                                "+no_z_transform +ellps=GRS80")
        x, y, zo, _ = tr.transform_deg(np.array([-95.5]),
                                       np.array([37.0]),
                                       np.array([10.0]))
        assert abs(x[0] + 95.4999998219) < MM
        assert zo[0] == 10.0

    def test_interpolation_variants(self):
        _reg(CONUS)
        p = (np.array([-95.4916666666]), np.array([37.0083333333]),
             np.array([10.0]))
        tr_q = compile_projstring(f"+proj=gridshift +grids={CONUS} "
                                  "+interpolation=biquadratic +ellps=GRS80")
        x, y, z, _ = tr_q.transform_deg(*[a.copy() for a in p])
        assert abs(x[0] + 95.49166648893) < 0.005e-3 / 111000
        assert abs(y[0] - 37.00833334837) < 0.005e-3 / 111000
        assert abs(z[0] - 9.984340) < 5e-5
        tr_b = compile_projstring(f"+proj=gridshift +grids={CONUS} "
                                  "+interpolation=bilinear +ellps=GRS80")
        x, y, z, _ = tr_b.transform_deg(*[a.copy() for a in p])
        assert abs(x[0] + 95.49166648893) < 0.001e-3 / 111000
        assert abs(y[0] - 37.00833334838) < 0.001e-3 / 111000
        assert abs(z[0] - 9.984341) < 5e-5
        with pytest.raises(ValueError, match="interpolation"):
            compile_projstring(f"+proj=gridshift +grids={CONUS} "
                               "+interpolation=cubic +ellps=GRS80")

    def test_sanfrancisco_biquadratic_inverse_window_boundary(self):
        _reg(SF)
        tr = compile_projstring(f"+proj=gridshift +grids={SF} "
                                "+interpolation=biquadratic +ellps=GRS80")
        x, y, _, _ = tr.transform_deg(np.array([-122.4250009683]),
                                      np.array([37.8286740788]),
                                      direction="inv")
        assert abs(x[0] + 122.4249999391) < 0.005e-3 / 111000
        assert abs(y[0] - 37.8286728006) < 0.005e-3 / 111000

    def test_hgridshift_takes_horizontal_component(self):
        _reg(ALASKA)
        tr = compile_projstring(f"+proj=hgridshift +grids={ALASKA} "
                                "+ellps=GRS80")
        x, y, _, _ = tr.transform_deg(np.array([-158.0]),
                                      np.array([61.5]))
        assert abs(x[0] + 157.9999996115) < MM
        assert abs(y[0] - 61.499999564) < MM


def test_write_geotiff_3d_roundtrip():
    dphi = np.arange(30.0).reshape(5, 6) * 0.01
    dlam = np.arange(30.0).reshape(5, 6) * 0.02 - 0.2
    dz = np.arange(30.0).reshape(5, 6) * 0.001
    blob = GF.write_geotiff_3d(-10.0, 40.0, 0.5, 0.25, dphi, dlam, dz)
    e = GF.parse_geotiff(blob)[0]
    assert e["type"] == "GEOGRAPHIC_3D_OFFSET"
    assert e["interp"] == "biquadratic"
    g = e["grid"]
    sec = np.pi / 180.0 / 3600.0
    np.testing.assert_allclose(g.values[:, :, 0],
                               np.float32(dlam).astype(float) * sec,
                               rtol=1e-7)
    np.testing.assert_allclose(g.values[:, :, 1],
                               np.float32(dphi).astype(float) * sec,
                               rtol=1e-7)
    np.testing.assert_allclose(g.values[:, :, 2],
                               np.float32(dz).astype(float), rtol=1e-7)
    assert g.lon0 == pytest.approx(np.radians(-10.0))
    assert g.lat0 == pytest.approx(np.radians(40.0))
