"""WKT1/WKT2/PROJJSON readers vs the curated EPSG registry.

The WKT texts below are the standard export shapes of the reference
for the corresponding codes (grammar src/wkt2_grammar.y, writer
src/iso19111/io.cpp); numeric expectations come from compiling the
registry proj-string for the same code — the two definitions must
produce identical coordinates.
"""

import json
import math

import numpy as np
import pytest

from proj_4_spark.crs import compile_crs, crs_to_crs, epsg_projstring
from proj_4_spark.crs_io import (parse_wkt, projjson_to_projstring,
                                 wkt_to_projstring)

LON = np.array([-1.5, 0.5, 2.0, 9.0, 5.4])
LAT = np.array([52.0, 51.0, 48.5, 47.0, 52.2])


def _same_forward(defn_a, defn_b, lon=LON, lat=LAT, tol=1e-6):
    ta, tb = compile_crs(defn_a), compile_crs(defn_b)
    xa, ya = ta.transform_deg(lon.copy(), lat.copy())[:2]
    xb, yb = tb.transform_deg(lon.copy(), lat.copy())[:2]
    np.testing.assert_allclose(xa, xb, rtol=0, atol=tol)
    np.testing.assert_allclose(ya, yb, rtol=0, atol=tol)


WKT2_32632 = """PROJCRS["WGS 84 / UTM zone 32N",
  BASEGEOGCRS["WGS 84",
    DATUM["World Geodetic System 1984",
      ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]]],
    PRIMEM["Greenwich",0,ANGLEUNIT["degree",0.0174532925199433]]],
  CONVERSION["UTM zone 32N",
    METHOD["Transverse Mercator",ID["EPSG",9807]],
    PARAMETER["Latitude of natural origin",0,
      ANGLEUNIT["degree",0.0174532925199433]],
    PARAMETER["Longitude of natural origin",9,
      ANGLEUNIT["degree",0.0174532925199433]],
    PARAMETER["Scale factor at natural origin",0.9996,
      SCALEUNIT["unity",1]],
    PARAMETER["False easting",500000,LENGTHUNIT["metre",1]],
    PARAMETER["False northing",0,LENGTHUNIT["metre",1]]],
  CS[Cartesian,2],
    AXIS["(E)",east,ORDER[1],LENGTHUNIT["metre",1]],
    AXIS["(N)",north,ORDER[2],LENGTHUNIT["metre",1]],
  ID["EPSG",32632]]"""

WKT1_27700 = """PROJCS["OSGB 1936 / British National Grid",
  GEOGCS["OSGB 1936",
    DATUM["OSGB_1936",
      SPHEROID["Airy 1830",6377563.396,299.3249646],
      TOWGS84[446.448,-125.157,542.06,0.15,0.247,0.842,-20.489]],
    PRIMEM["Greenwich",0],
    UNIT["degree",0.0174532925199433]],
  PROJECTION["Transverse_Mercator"],
  PARAMETER["latitude_of_origin",49],
  PARAMETER["central_meridian",-2],
  PARAMETER["scale_factor",0.9996012717],
  PARAMETER["false_easting",400000],
  PARAMETER["false_northing",-100000],
  UNIT["metre",1]]"""

WKT2_28992 = """PROJCRS["Amersfoort / RD New",
  BASEGEOGCRS["Amersfoort",
    DATUM["Amersfoort",
      ELLIPSOID["Bessel 1841",6377397.155,299.1528128,
        LENGTHUNIT["metre",1]]],
    PRIMEM["Greenwich",0,ANGLEUNIT["degree",0.0174532925199433]]],
  CONVERSION["RD New",
    METHOD["Oblique Stereographic",ID["EPSG",9809]],
    PARAMETER["Latitude of natural origin",52.15616055555555,
      ANGLEUNIT["degree",0.0174532925199433]],
    PARAMETER["Longitude of natural origin",5.38763888888889,
      ANGLEUNIT["degree",0.0174532925199433]],
    PARAMETER["Scale factor at natural origin",0.9999079,
      SCALEUNIT["unity",1]],
    PARAMETER["False easting",155000,LENGTHUNIT["metre",1]],
    PARAMETER["False northing",463000,LENGTHUNIT["metre",1]]],
  CS[Cartesian,2],
    AXIS["(E)",east,ORDER[1],LENGTHUNIT["metre",1]],
    AXIS["(N)",north,ORDER[2],LENGTHUNIT["metre",1]]]"""

WKT2_2154 = """PROJCRS["RGF93 v1 / Lambert-93",
  BASEGEOGCRS["RGF93 v1",
    DATUM["Reseau Geodesique Francais 1993 v1",
      ELLIPSOID["GRS 1980",6378137,298.257222101,
        LENGTHUNIT["metre",1]]],
    PRIMEM["Greenwich",0,ANGLEUNIT["degree",0.0174532925199433]]],
  CONVERSION["Lambert-93",
    METHOD["Lambert Conic Conformal (2SP)",ID["EPSG",9802]],
    PARAMETER["Latitude of false origin",46.5,
      ANGLEUNIT["degree",0.0174532925199433]],
    PARAMETER["Longitude of false origin",3,
      ANGLEUNIT["degree",0.0174532925199433]],
    PARAMETER["Latitude of 1st standard parallel",49,
      ANGLEUNIT["degree",0.0174532925199433]],
    PARAMETER["Latitude of 2nd standard parallel",44,
      ANGLEUNIT["degree",0.0174532925199433]],
    PARAMETER["Easting at false origin",700000,LENGTHUNIT["metre",1]],
    PARAMETER["Northing at false origin",6600000,
      LENGTHUNIT["metre",1]]],
  CS[Cartesian,2],
    AXIS["(E)",east,ORDER[1],LENGTHUNIT["metre",1]],
    AXIS["(N)",north,ORDER[2],LENGTHUNIT["metre",1]]]"""

# NTF (Paris) / Lambert zone II — angular unit is GRAD for both the
# base CRS and the parameters, prime meridian Paris (2.5969213 grads)
WKT1_27572 = """PROJCS["NTF (Paris) / Lambert zone II",
  GEOGCS["NTF (Paris)",
    DATUM["Nouvelle_Triangulation_Francaise_Paris",
      SPHEROID["Clarke 1880 (IGN)",6378249.2,293.4660212936269],
      TOWGS84[-168,-60,320,0,0,0,0]],
    PRIMEM["Paris",2.5969213],
    UNIT["grad",0.0157079632679489]],
  PROJECTION["Lambert_Conformal_Conic_1SP"],
  PARAMETER["latitude_of_origin",52],
  PARAMETER["central_meridian",0],
  PARAMETER["scale_factor",0.99987742],
  PARAMETER["false_easting",600000],
  PARAMETER["false_northing",2200000],
  UNIT["metre",1]]"""


class TestWktParser:
    def test_nested_nodes_and_quotes(self):
        n = parse_wkt('FOO["a ""b""",1.5,BAR[2],baz]')
        assert n.name == "FOO"
        assert n.strings() == ['a "b"']
        assert n.numbers() == [1.5]
        assert n.child("BAR").numbers() == [2.0]
        assert n.child("BAZ") is not None

    def test_paren_style(self):
        n = parse_wkt('GEOGCS("x",DATUM("d",SPHEROID("s",6378137,298.25)))')
        assert n.child("DATUM").child("SPHEROID").numbers()[0] == 6378137


class TestWkt2:
    def test_utm_zone_shortcut(self):
        assert wkt_to_projstring(WKT2_32632) == \
            "+proj=utm +zone=32 +ellps=WGS84"

    def test_utm_matches_registry(self):
        _same_forward(WKT2_32632, 32632)

    def test_sterea_matches_registry(self):
        # registry 28992 carries a towgs84 (projection math unaffected)
        _same_forward(WKT2_28992,
                      "+proj=sterea +lat_0=52.15616055555555 "
                      "+lon_0=5.38763888888889 +k=0.9999079 "
                      "+x_0=155000 +y_0=463000 +ellps=bessel")

    def test_lcc_2sp_false_origin_params(self):
        _same_forward(WKT2_2154, 2154)


class TestWkt1:
    def test_osgb_towgs84_preserved(self):
        s = wkt_to_projstring(WKT1_27700)
        assert "+towgs84=446.448,-125.157,542.06" in s
        assert s.startswith("+proj=tmerc +lat_0=49 +lon_0=-2")

    def test_osgb_matches_registry(self):
        _same_forward(WKT1_27700, 27700)

    def test_grad_units_and_paris_meridian(self):
        s = wkt_to_projstring(WKT1_27572)
        # 52 grads = 46.8 degrees; Paris PM = 2.5969213 grads E
        assert "+lat_1=46.8" in s
        assert "+pm=2.33722917" in s
        tr = compile_crs(s)
        # Lambert zone II anchor: Paris observatory area
        x, y = tr.transform_deg(np.array([2.3522]),
                                np.array([48.8566]))[:2]
        assert abs(x[0] - 600904.0) < 300.0   # zone II easting ballpark
        assert abs(y[0] - 2427315.0) < 2000.0


class TestBoundCrs:
    WKT2_BOUND = """BOUNDCRS[
      SOURCECRS[GEOGCRS["ED50",
        DATUM["European Datum 1950",
          ELLIPSOID["International 1924",6378388,297,
            LENGTHUNIT["metre",1]]],
        PRIMEM["Greenwich",0,ANGLEUNIT["degree",0.0174532925199433]]]],
      TARGETCRS[GEOGCRS["WGS 84",
        DATUM["World Geodetic System 1984",
          ELLIPSOID["WGS 84",6378137,298.257223563,
            LENGTHUNIT["metre",1]]],
        PRIMEM["Greenwich",0,ANGLEUNIT["degree",0.0174532925199433]]]],
      ABRIDGEDTRANSFORMATION["ED50 to WGS 84",
        METHOD["Geocentric translations (geog2D domain)",
          ID["EPSG",9603]],
        PARAMETER["X-axis translation",-87,ID["EPSG",8605]],
        PARAMETER["Y-axis translation",-98,ID["EPSG",8606]],
        PARAMETER["Z-axis translation",-121,ID["EPSG",8607]]]]"""

    def test_geocentric_translations(self):
        s = wkt_to_projstring(self.WKT2_BOUND)
        assert s == "+proj=longlat +ellps=intl +towgs84=-87,-98,-121"
        _same_forward(s, 4230)

    def test_position_vector_scale_ratio(self):
        wkt = self.WKT2_BOUND.replace(
            "Geocentric translations (geog2D domain)",
            "Position Vector transformation (geog2D domain)").replace(
            'PARAMETER["Z-axis translation",-121,ID["EPSG",8607]]',
            'PARAMETER["Z-axis translation",-121,ID["EPSG",8607]],'
            'PARAMETER["X-axis rotation",0.15,ID["EPSG",8608]],'
            'PARAMETER["Y-axis rotation",0.247,ID["EPSG",8609]],'
            'PARAMETER["Z-axis rotation",0.842,ID["EPSG",8610]],'
            'PARAMETER["Scale difference",0.999979511,ID["EPSG",8611]]')
        s = wkt_to_projstring(wkt)
        # ratio 0.999979511 -> -20.489 ppm, rotations pass through
        assert "+towgs84=-87,-98,-121,0.15,0.247,0.842,-20.489" in s

    def test_coordinate_frame_flips_rotations(self):
        wkt = self.WKT2_BOUND.replace(
            "Geocentric translations (geog2D domain)",
            "Coordinate Frame rotation (geog2D domain)").replace(
            'PARAMETER["Z-axis translation",-121,ID["EPSG",8607]]',
            'PARAMETER["Z-axis translation",-121,ID["EPSG",8607]],'
            'PARAMETER["X-axis rotation",-0.15,ID["EPSG",8608]],'
            'PARAMETER["Y-axis rotation",-0.247,ID["EPSG",8609]],'
            'PARAMETER["Z-axis rotation",-0.842,ID["EPSG",8610]]')
        s = wkt_to_projstring(wkt)
        assert "+towgs84=-87,-98,-121,0.15,0.247,0.842,0" in s


class TestProjjson:
    PJ_32631 = {
        "$schema": "https://proj.org/schemas/v0.7/projjson.schema.json",
        "type": "ProjectedCRS",
        "name": "WGS 84 / UTM zone 31N",
        "base_crs": {
            "type": "GeographicCRS",
            "name": "WGS 84",
            "datum": {
                "type": "GeodeticReferenceFrame",
                "name": "World Geodetic System 1984",
                "ellipsoid": {"name": "WGS 84",
                              "semi_major_axis": 6378137,
                              "inverse_flattening": 298.257223563}},
        },
        "conversion": {
            "name": "UTM zone 31N",
            "method": {"name": "Transverse Mercator",
                       "id": {"authority": "EPSG", "code": 9807}},
            "parameters": [
                {"name": "Latitude of natural origin", "value": 0,
                 "unit": "degree"},
                {"name": "Longitude of natural origin", "value": 3,
                 "unit": "degree"},
                {"name": "Scale factor at natural origin",
                 "value": 0.9996, "unit": "unity"},
                {"name": "False easting", "value": 500000,
                 "unit": "metre"},
                {"name": "False northing", "value": 0, "unit": "metre"},
            ],
        },
    }

    def test_utm_projjson(self):
        assert projjson_to_projstring(self.PJ_32631) == \
            "+proj=utm +zone=31 +ellps=WGS84"

    def test_dict_and_string_accepted_by_compile_crs(self):
        _same_forward(self.PJ_32631, 32631)
        _same_forward(json.dumps(self.PJ_32631), 32631)

    def test_geographic(self):
        g = {"type": "GeographicCRS", "name": "WGS 84",
             "datum": {"ellipsoid": {"semi_major_axis": 6378137,
                                     "inverse_flattening": 298.257223563}}}
        assert projjson_to_projstring(g) == "+proj=longlat +ellps=WGS84"


class TestCrsToCrsWithWkt:
    def test_wkt_src_matches_epsg_src(self):
        t_wkt = crs_to_crs(WKT1_27700, 4326)
        t_reg = crs_to_crs(27700, 4326)
        e = np.array([400000.0, 531000.0])
        n = np.array([-100000.0, 180000.0])
        a = t_wkt.transform_deg(e.copy(), n.copy())
        b = t_reg.transform_deg(e.copy(), n.copy())
        np.testing.assert_allclose(a[0], b[0], atol=1e-9)
        np.testing.assert_allclose(a[1], b[1], atol=1e-9)

    def test_polar_stereographic_variant_b(self):
        wkt = """PROJCRS["WGS 84 / NSIDC Sea Ice Polar Stereographic North",
          BASEGEOGCRS["WGS 84",
            DATUM["World Geodetic System 1984",
              ELLIPSOID["WGS 84",6378137,298.257223563,
                LENGTHUNIT["metre",1]]],
            PRIMEM["Greenwich",0,
              ANGLEUNIT["degree",0.0174532925199433]]],
          CONVERSION["US NSIDC Sea Ice polar stereographic north",
            METHOD["Polar Stereographic (variant B)",ID["EPSG",9829]],
            PARAMETER["Latitude of standard parallel",70,
              ANGLEUNIT["degree",0.0174532925199433]],
            PARAMETER["Longitude of origin",-45,
              ANGLEUNIT["degree",0.0174532925199433]],
            PARAMETER["False easting",0,LENGTHUNIT["metre",1]],
            PARAMETER["False northing",0,LENGTHUNIT["metre",1]]],
          CS[Cartesian,2],
            AXIS["(E)",east,ORDER[1],LENGTHUNIT["metre",1]],
            AXIS["(N)",north,ORDER[2],LENGTHUNIT["metre",1]]]"""
        lon = np.array([-45.0, 10.0, 100.0])
        lat = np.array([70.0, 75.0, 80.0])
        _same_forward(wkt, 3413, lon=lon, lat=lat)


class TestErrors:
    def test_unknown_method_raises(self):
        with pytest.raises(ValueError, match="unsupported projection"):
            wkt_to_projstring(
                'PROJCS["x",GEOGCS["g",DATUM["d",'
                'SPHEROID["s",6378137,298.25]],PRIMEM["Greenwich",0],'
                'UNIT["degree",0.017453292519943295]],'
                'PROJECTION["Space_Elevator"],UNIT["metre",1]]')

    def test_unknown_root_raises(self):
        with pytest.raises(ValueError, match="unsupported WKT root"):
            wkt_to_projstring('VERTCRS["h"]')

    def test_non_metre_unit(self):
        s = wkt_to_projstring(WKT1_27700.replace(
            'UNIT["metre",1]]', 'UNIT["foot",0.3048]]'))
        assert s.endswith("+units=ft +towgs84=446.448,-125.157,542.06,"
                          "0.15,0.247,0.842,-20.489") or "+units=ft" in s


class TestWkt2Writer:
    CODES = [4326, 4277, 3857, 2154, 28992, 27700, 32632, 32733,
             3413, 3035, 5070, 2193, 31466]

    def test_roundtrip_compiles_identically(self):
        from proj_4_spark.crs_io import projstring_to_wkt2

        lon = np.array([5.0, 9.5, -1.0, 173.5])
        lat = np.array([50.0, 47.0, 52.0, -41.0])
        for c in self.CODES:
            s = epsg_projstring(c)
            s2 = wkt_to_projstring(projstring_to_wkt2(s, f"EPSG {c}"))
            ta, tb = compile_crs(s), compile_crs(s2)
            xa, ya = ta.transform_deg(lon.copy(), lat.copy())[:2]
            xb, yb = tb.transform_deg(lon.copy(), lat.copy())[:2]
            np.testing.assert_allclose(xa, xb, atol=1e-6, err_msg=str(c))
            np.testing.assert_allclose(ya, yb, atol=1e-6, err_msg=str(c))

    def test_towgs84_survives_boundcrs_roundtrip(self):
        from proj_4_spark.crs_io import projstring_to_wkt2

        s = epsg_projstring(27700)
        w = projstring_to_wkt2(s, "OSGB")
        assert w.startswith("BOUNDCRS[")
        s2 = wkt_to_projstring(w)
        assert "+towgs84=446.448,-125.157,542.06," \
               "0.15,0.247,0.842,-20.489" in s2
        # datum bridge equivalence through the cs2cs planner
        t1 = crs_to_crs(s, 4326)
        t2 = crs_to_crs(s2, 4326)
        e = np.array([400000.0, 531000.0])
        n = np.array([-100000.0, 180000.0])
        a = t1.transform_deg(e.copy(), n.copy())
        b = t2.transform_deg(e.copy(), n.copy())
        np.testing.assert_allclose(a[0], b[0], atol=1e-9)
        np.testing.assert_allclose(a[1], b[1], atol=1e-9)

    def test_unsupported_method_raises(self):
        from proj_4_spark.crs_io import projstring_to_wkt2

        with pytest.raises(ValueError, match="export subset"):
            projstring_to_wkt2("+proj=airocean +ellps=GRS80")


class TestReviewFixes:
    def test_utm_name_with_noncanonical_params_not_shortcut(self):
        """EPSG:4647-style 'UTM zone 32N (zE-N)' carries a 32.5 Mm
        false easting — the name must NOT win over the parameters."""
        wkt = WKT2_32632.replace(
            'PARAMETER["False easting",500000,LENGTHUNIT["metre",1]]',
            'PARAMETER["False easting",32500000,LENGTHUNIT["metre",1]]')
        s = wkt_to_projstring(wkt)
        assert s.startswith("+proj=tmerc")
        assert "+x_0=32500000" in s

    def test_sears_foot_keeps_exact_to_meter(self):
        wkt = WKT1_27700.replace(
            'UNIT["metre",1]]',
            'UNIT["British foot (Sears 1922)",0.3047994715386557]]')
        s = wkt_to_projstring(wkt)
        assert "+to_meter=0.3047994715386557" in s
        assert "ind-ft" not in s

    def test_lcc_1sp_reader_sets_lat_0(self):
        """The reference exports LCC 1SP as +lat_1 AND +lat_0
        (conversion.cpp:4334-4338)."""
        s = wkt_to_projstring(WKT1_27572)
        assert "+lat_1=46.8" in s and "+lat_0=46.8" in s

    def test_writer_merc_variant_b_roundtrip(self):
        from proj_4_spark.crs_io import projstring_to_wkt2

        src = "+proj=merc +lat_ts=30 +lon_0=10 +x_0=1000 +ellps=WGS84"
        w = projstring_to_wkt2(src)
        assert "Mercator (variant B)" in w
        _same_forward(src, wkt_to_projstring(w))

    def test_writer_lcc_1sp_roundtrip(self):
        from proj_4_spark.crs_io import projstring_to_wkt2

        src = ("+proj=lcc +lat_1=46.8 +lat_0=46.8 +lon_0=0 "
               "+k_0=0.99987742 +x_0=600000 +y_0=2200000 "
               "+ellps=clrk80ign")
        w = projstring_to_wkt2(src)
        assert "Lambert Conic Conformal (1SP)" in w
        _same_forward(src, wkt_to_projstring(w))
        with pytest.raises(ValueError, match="no EPSG method"):
            projstring_to_wkt2("+proj=lcc +lat_1=40 +lat_0=30 "
                               "+ellps=WGS84")

    def test_projjson_boundcrs_unit_object(self):
        obj = {"type": "BoundCRS",
               "source_crs": {"type": "GeographicCRS", "name": "ED50",
                              "datum": {"ellipsoid": {
                                  "semi_major_axis": 6378388,
                                  "inverse_flattening": 297}}},
               "target_crs": {"type": "GeographicCRS", "name": "WGS 84",
                              "datum": {"ellipsoid": {
                                  "semi_major_axis": 6378137,
                                  "inverse_flattening": 298.257223563}}},
               "transformation": {
                   "name": "x", "method": {
                       "name": "Position Vector transformation"},
                   "parameters": [
                       {"name": "X-axis translation", "value": -87,
                        "unit": "metre"},
                       {"name": "Scale difference", "value": 0.999979511,
                        "unit": {"type": "ScaleUnit", "name": "unity",
                                 "conversion_factor": 1.0}}]}}
        s = projjson_to_projstring(obj)
        assert "+towgs84=-87,0,0,0,0,0,-20.489" in s


class TestWkt1Writer:
    """projstring_to_wkt1 (PJ_WKT1_GDAL direction, io.cpp WKT1
    formatter): reader-roundtrip over the FULL registry."""

    def test_full_registry_roundtrip(self):
        from proj_4_spark.crs import registry_codes
        from proj_4_spark.crs_io import projstring_to_wkt1

        lon = np.array([5.0, 9.5, -1.0, 173.5])
        lat = np.array([50.0, 47.0, 52.0, -41.0])
        bad = []
        for c in registry_codes():
            s = epsg_projstring(c)
            try:
                w = projstring_to_wkt1(s, f"EPSG {c}")
                s2 = wkt_to_projstring(w)
                ta, tb = compile_crs(s), compile_crs(s2)
                xa, ya = ta.transform_deg(lon.copy(), lat.copy())[:2]
                xb, yb = tb.transform_deg(lon.copy(), lat.copy())[:2]
                if not (np.allclose(np.nan_to_num(xa), np.nan_to_num(xb),
                                    atol=1e-6)
                        and np.allclose(np.nan_to_num(ya),
                                        np.nan_to_num(yb), atol=1e-6)):
                    bad.append((c, "value"))
            except Exception as e:  # noqa: BLE001
                bad.append((c, str(e)[:60]))
        assert not bad, f"{len(bad)} WKT1 roundtrip failures: {bad[:8]}"

    def test_geogcs_only_for_angular(self):
        from proj_4_spark.crs_io import projstring_to_wkt1

        w = projstring_to_wkt1("+proj=longlat +ellps=GRS80", "g")
        assert w.startswith('GEOGCS["g"')
        assert "PROJCS" not in w

    def test_towgs84_in_datum(self):
        from proj_4_spark.crs_io import projstring_to_wkt1

        w = projstring_to_wkt1(epsg_projstring(27700), "OSGB")
        assert "TOWGS84[446.448,-125.157,542.06," in w
        s2 = wkt_to_projstring(w)
        assert "+towgs84=446.448,-125.157,542.06" in s2
        _same_forward(epsg_projstring(27700), s2)

    def test_axis_wsu_survives(self):
        from proj_4_spark.crs_io import projstring_to_wkt1

        s = epsg_projstring(2046)  # Hartebeesthoek Lo15: westing/southing
        w = projstring_to_wkt1(s, "Lo15")
        assert 'AXIS["Westing",WEST],AXIS["Southing",SOUTH]' in w
        s2 = wkt_to_projstring(w)
        assert "+axis=wsu" in s2
        _same_forward(s, s2)

    def test_polar_variant_b(self):
        from proj_4_spark.crs_io import projstring_to_wkt1

        s = epsg_projstring(3413)
        w = projstring_to_wkt1(s, "NSIDC")
        s2 = wkt_to_projstring(w)
        assert "+lat_ts=70" in s2 and "+lat_0=90" in s2
        _same_forward(s, s2, lon=np.array([-45.0, 10.0]),
                      lat=np.array([80.0, 75.0]))

    def test_unsupported_method_raises(self):
        from proj_4_spark.crs_io import projstring_to_wkt1

        with pytest.raises(ValueError, match="export subset"):
            projstring_to_wkt1("+proj=airocean +ellps=GRS80")

    def test_projinfo_reports_wkt1(self):
        from proj_4_spark.crs import projinfo

        info = projinfo("EPSG:32632")
        assert info["wkt1"].startswith("PROJCS[")
        assert 'PROJECTION["Transverse_Mercator"]' in info["wkt1"]
