"""Classic +init=FILE:KEY resolution, +datum= expansion, and DMS
parameter values.

Goldens: test/gie/more_builtins.gie:559-568 (+init=nad27:3901 South
Carolina north state-plane in US survey feet); init files parsed are
the reference's own data/nad27, data/world, data/ITRF2014 (read-only
fixtures, skipped if absent)."""

import os

import numpy as np
import pytest

from proj_4_spark.proj import DATUMS, compile_projstring, parse_projstring
from proj_4_spark.sources.initfiles import parse_init_text, \
    register_init_file

REF = "/root/reference/data"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference data dir not present")


class TestDmsValues:
    def test_dms_parameter_forms(self):
        p = parse_projstring("+proj=lcc +lat_1=34d58 +lat_2=33d46 "
                             "+lat_0=33 +lon_0=-81 +ellps=clrk66")[0]
        assert abs(float(p["lat_1"]) - (34 + 58 / 60)) < 1e-12
        assert abs(float(p["lat_2"]) - (33 + 46 / 60)) < 1e-12
        assert p["lat_0"] == "33"

    def test_dms_with_seconds_and_hemisphere(self):
        p = parse_projstring("+proj=somerc +lat_0=46d57'8.660\"N "
                             "+lon_0=7d26'22.500\"E +ellps=bessel")[0]
        assert abs(float(p["lat_0"])
                   - (46 + 57 / 60 + 8.66 / 3600)) < 1e-12
        p2 = parse_projstring("+proj=labrd +lat_0=18d54S +lon_0=46 "
                              "+ellps=intl +azi=18.9")[0]
        assert abs(float(p2["lat_0"]) + (18 + 54 / 60)) < 1e-12

    def test_scientific_notation_untouched(self):
        p = parse_projstring("+proj=tmerc +k=1e-0 +x_0=1.5e5")[0]
        assert p["x_0"] == "1.5e5"


class TestDatumParam:
    def test_datum_expands_ellps_and_shift(self):
        p = parse_projstring("+proj=latlong +datum=potsdam")[0]
        assert p["ellps"] == "bessel"
        # the reference's current datums table routes potsdam through
        # the BETA2007 NTv2 grid, not a Helmert (datums.cpp)
        assert p["nadgrids"] == "@BETA2007.gsb"
        p = parse_projstring("+proj=latlong +datum=NAD27")[0]
        assert p["ellps"] == "clrk66"
        assert p["nadgrids"].startswith("@conus")

    def test_explicit_param_wins_over_datum(self):
        p = parse_projstring("+proj=latlong +ellps=GRS80 +datum=potsdam")[0]
        assert p["ellps"] == "GRS80"

    def test_all_optional_grids_missing_is_noop(self):
        tr = compile_projstring(
            "+proj=hgridshift +grids=@definitely_not_there +ellps=WGS84")
        x, y = tr.transform_deg(np.array([12.0]), np.array([56.0]))[:2]
        assert (x[0], y[0]) == (12.0, 56.0)


@needs_ref
class TestInitFiles:
    def test_nad27_3901_gie_golden(self):
        with open(os.path.join(REF, "nad27")) as f:
            register_init_file("nad27", f.read())
        tr = compile_projstring(
            "+proj=pipeline +step +proj=latlong +datum=NAD27 +inv "
            "+step +units=us-ft +init=nad27:3901")
        lon = np.array([-(80 + 32 / 60 + 30 / 3600), -81.0])
        lat = np.array([34 + 32 / 60 + 30 / 3600,
                        34 + 32 / 60 + 30 / 3600])
        x, y, _, _ = tr.transform_deg(lon, lat)
        np.testing.assert_allclose(x, [2138028.224, 2000000.000],
                                   atol=1e-2)
        np.testing.assert_allclose(y, [561330.721, 561019.077],
                                   atol=1e-2)

    def test_world_ch1903_matches_epsg(self):
        with open(os.path.join(REF, "world")) as f:
            register_init_file("world", f.read())
        from proj_4_spark.crs import epsg_projstring

        a = compile_projstring("+init=world:CH1903")
        # registry entry minus its datum bridge (the init entry is the
        # bare projection; +towgs84 compiles to a WGS84-hub pipeline)
        b = compile_projstring(
            epsg_projstring(21781).split(" +towgs84=")[0])
        lon, lat = np.array([7.44, 8.5]), np.array([46.95, 47.4])
        xa, ya = a.transform_deg(lon.copy(), lat.copy())[:2]
        xb, yb = b.transform_deg(lon.copy(), lat.copy())[:2]
        np.testing.assert_allclose(xa, xb, atol=1e-6)
        np.testing.assert_allclose(ya, yb, atol=1e-6)

    def test_itrf2014_kinematic_helmert(self):
        with open(os.path.join(REF, "ITRF2014")) as f:
            register_init_file("ITRF2014", f.read())
        pipe = ("+proj=pipeline +ellps=GRS80 "
                "+step +proj=cart "
                "+step +init=ITRF2014:ITRF2000 +t_epoch=2010.0 "
                "+step +inv +proj=cart")
        explicit = pipe.replace(
            "+init=ITRF2014:ITRF2000 +t_epoch=2010.0",
            "+proj=helmert +x=0.0007 +y=0.0012 +z=-0.0261 +s=0.00212 "
            "+dx=0.0001 +dy=0.0001 +dz=-0.0019 +ds=0.00011 "
            "+t_epoch=2010.0 +convention=position_vector")
        a = compile_projstring(pipe)
        b = compile_projstring(explicit)
        lon, lat = np.array([12.0]), np.array([55.0])
        t = np.array([2020.0])
        ra = a.transform_deg(lon.copy(), lat.copy(), np.array([0.0]), t)
        rb = b.transform_deg(lon.copy(), lat.copy(), np.array([0.0]), t)
        np.testing.assert_allclose(ra[0], rb[0], atol=1e-12)
        np.testing.assert_allclose(ra[1], rb[1], atol=1e-12)
        # the kinematic part must actually move between epochs
        t2 = np.array([1990.0])
        rc = a.transform_deg(lon.copy(), lat.copy(), np.array([0.0]), t2)
        assert abs(rc[0][0] - ra[0][0]) > 0

    def test_parse_entries_count(self):
        with open(os.path.join(REF, "nad27")) as f:
            e = parse_init_text(f.read())
        assert len(e) > 100
        assert "no_defs" not in e["3901"]


def test_init_epsg_resolves_registry():
    """+init=epsg:NNNN — the classic proj4 idiom — resolves through
    the curated EPSG registry."""
    a = compile_projstring("+init=epsg:32632")
    b = compile_projstring("+proj=utm +zone=32 +ellps=WGS84")
    x1, y1 = a.transform_deg(np.array([12.0]), np.array([56.0]))[:2]
    x2, y2 = b.transform_deg(np.array([12.0]), np.array([56.0]))[:2]
    assert x1[0] == x2[0] and y1[0] == y2[0]
    assert abs(x1[0] - 687071.439) < 1e-3
