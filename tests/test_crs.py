"""CRS-level API: EPSG subset, towgs84 expansion (angular, projected,
in-pipeline), crs_to_crs composition.

Golden VALUES transcribed from
/root/reference/test/gie/4D-API_cs2cs-style.gie (:44-52 angular
7-param, :160-169 projected CH1903+/LV95, :261-268 towgs84 inside a
pipeline step).
"""

import numpy as np
import pytest

from proj_4_spark.crs import EPSG, compile_crs, crs_to_crs, epsg_projstring
from proj_4_spark.proj import compile_projstring


def test_towgs84_angular_gie():
    # 4D-API_cs2cs-style.gie:44-52, tolerance 25 mm (~3e-7 deg)
    tr = compile_projstring(
        "+proj=latlong +ellps=intl +towgs84=-081.07030,-089.36030,"
        "-115.75260,000.48488,000.02436,000.41321,-0.540645")
    x, y, z, _ = tr.transform_deg(np.array([16.82]), np.array([55.17]),
                                  z=np.array([61.0]))
    assert abs(x[0] - 16.8210462130) < 3e-7
    assert abs(y[0] - 55.1705688946) < 3e-7
    assert abs(z[0] - 29.0317) < 0.025


def test_towgs84_projected_gie():
    # 4D-API_cs2cs-style.gie:160-169 (CH1903+/LV95), tolerance 20 cm
    tr = compile_projstring(
        "+proj=somerc +lat_0=46.95240555555556 +lon_0=7.439583333333333 "
        "+k_0=1 +x_0=2600000 +y_0=1200000 +ellps=bessel "
        "+towgs84=674.374,15.056,405.346")
    x, y, _, _ = tr.transform_deg(np.array([7.438632495]),
                                  np.array([46.951082877]))
    assert abs(x[0] - 2600000.0) < 0.2 and abs(y[0] - 1200000.0) < 0.2


def test_towgs84_pipeline_step_gie():
    # 4D-API_cs2cs-style.gie:261-268, tolerance 20 cm
    tr = compile_projstring(
        "+proj=pipeline "
        "+step +proj=utm +zone=11 +ellps=clrk66 +towgs84=0,0,0 +inv "
        "+step +proj=utm +zone=11 +ellps=WGS84")
    x, y, z, _ = tr.transform(np.array([440720.0]),
                              np.array([3751320.0]), z=np.array([0.0]))
    assert abs(x[0] - 440719.958709357) < 0.2
    assert abs(y[0] - 3751294.2109841) < 0.2
    assert abs(z[0] - (-4.44340920541435)) < 0.2


def test_epsg_registry_compiles():
    for code in list(EPSG) + [32632, 32732, 25832]:
        tr = compile_crs(f"EPSG:{code}")
        x, y, _, _ = tr.transform_deg(np.array([7.0]), np.array([47.0]))
        assert np.isfinite(x[0]) and np.isfinite(y[0]), code
    with pytest.raises(KeyError):
        epsg_projstring(99999)
    # utm anchor through the EPSG path
    x, y, _, _ = compile_crs(32632).transform_deg(np.array([12.0]),
                                                  np.array([56.0]))
    assert abs(x[0] - 687071.439) < 1e-3 and abs(y[0] - 6210141.327) < 1e-3


def test_crs_to_crs_webmerc():
    t = crs_to_crs("EPSG:4326", "EPSG:3857")
    x, y, _, _ = t.transform_deg(np.array([12.0]), np.array([55.0]))
    ref = compile_projstring("+proj=webmerc +ellps=WGS84")
    xr, yr, _, _ = ref.transform_deg(np.array([12.0]), np.array([55.0]))
    assert abs(x[0] - xr[0]) < 1e-9 and abs(y[0] - yr[0]) < 1e-9


def test_crs_to_crs_datum_bridge():
    # WGS84 -> LV95 through the hub matches the direct gie golden
    t = crs_to_crs(4326, 2056)
    x, y, _, _ = t.transform_deg(np.array([7.438632495]),
                                 np.array([46.951082877]))
    assert abs(x[0] - 2600000.0) < 0.2 and abs(y[0] - 1200000.0) < 0.2
    # LV03 -> LV95: same datum cancels, exact +2000000/+1000000
    t = crs_to_crs(21781, 2056)
    x, y, _, _ = t.transform(np.array([600000.0]), np.array([200000.0]))
    assert abs(x[0] - 2600000.0) < 1e-6 and abs(y[0] - 1200000.0) < 1e-6
    # the Helmert bridge cancelled: no cart/helmert steps remain
    assert [op.proj_id for op in t.ops].count("helmert") == 0


def test_crs_to_crs_roundtrip_and_shift():
    t = crs_to_crs(27700, 4326)
    lon, lat, _, _ = t.transform_deg(np.array([400000.0]),
                                     np.array([-100000.0]))
    # OSGB false origin is (49N, 2W) in OSGB36; the WGS84 position
    # differs by the datum shift (~0.001 deg)
    assert abs(lon[0] + 2.0) < 0.01 and abs(lat[0] - 49.0) < 0.01
    assert abs(lon[0] + 2.0) > 1e-5 and abs(lat[0] - 49.0) > 1e-5
    b = crs_to_crs(4326, 27700)
    e, n, _, _ = b.transform_deg(lon, lat)
    # sub-cm 2D roundtrip (height is dropped at the angular edge)
    assert abs(e[0] - 400000.0) < 5e-3 and abs(n[0] + 100000.0) < 5e-3


def test_crs_to_crs_geographic_pairs():
    t = crs_to_crs(4326, 4258)   # WGS84 ~ ETRS89: identity here
    lon, lat, _, _ = t.transform_deg(np.array([10.0]), np.array([50.0]))
    assert abs(lon[0] - 10.0) < 1e-12 and abs(lat[0] - 50.0) < 1e-12
    t = crs_to_crs(4267, 4326)   # NAD27 -> WGS84: real shift
    lon, lat, _, _ = t.transform_deg(np.array([-100.0]), np.array([40.0]))
    assert 1e-5 < abs(lon[0] + 100.0) < 0.01
    assert abs(lat[0] - 40.0) < 0.01


def test_crs_to_crs_rejects_pipeline():
    with pytest.raises(ValueError):
        crs_to_crs("+proj=pipeline +step +proj=utm +zone=32", 4326)


def test_always_xy_axis_order():
    """always_xy=False follows the authority order: EPSG:4326 is
    lat,lon (4D_api.cpp proj_normalize_for_visualization inverse
    direction)."""
    import numpy as np

    from proj_4_spark.crs import crs_to_crs

    xy = crs_to_crs(4326, 32632)
    auth = crs_to_crs(4326, 32632, always_xy=False)
    e1, n1 = xy.transform_deg(np.array([12.0]), np.array([56.0]))[:2]
    # authority order: first coordinate is LATITUDE
    e2, n2 = auth.transform_deg(np.array([56.0]), np.array([12.0]))[:2]
    assert abs(e1[0] - 687071.439) < 1e-3
    assert abs(e1[0] - e2[0]) < 1e-9 and abs(n1[0] - n2[0]) < 1e-9
    # geographic destination swaps the OUTPUT too
    back = crs_to_crs(32632, "EPSG:4326", always_xy=False)
    la, lo = back.transform_deg(e1.copy(), n1.copy())[:2]
    assert abs(la[0] - 56.0) < 1e-9 and abs(lo[0] - 12.0) < 1e-9
    # projected codes are x,y in both modes
    both = crs_to_crs(27700, 32630, always_xy=False)
    bxy = crs_to_crs(27700, 32630)
    a = both.transform_deg(np.array([400000.0]), np.array([180000.0]))
    b = bxy.transform_deg(np.array([400000.0]), np.array([180000.0]))
    assert abs(a[0][0] - b[0][0]) < 1e-9


def test_sa_lo_grid_wsu():
    """EPSG:2053 (Hartebeesthoek94 / Lo29): south-west oriented Gauss
    conformal via the +axis=wsu expansion."""
    import numpy as np

    from proj_4_spark.crs import crs_to_crs, epsg_projstring

    assert "+axis=wsu" in epsg_projstring(2053)
    tr = crs_to_crs(4326, 2053)
    lon, lat = np.array([28.1881]), np.array([-25.7461])
    x, y = tr.transform_deg(lon.copy(), lat.copy())[:2]
    # west of Lo29 (lon 28.19 < 29) => positive westing; southern
    # hemisphere => positive southing
    assert x[0] > 0 and y[0] > 0
    li, pi = tr.transform_deg(x.copy(), y.copy(), direction="inv")[:2]
    assert abs(li[0] - lon[0]) < 1e-9 and abs(pi[0] - lat[0]) < 1e-9


def test_geoidgrids_vertical_datum():
    """+geoidgrids= emulation: orthometric CRS heights <-> ellipsoidal
    hub heights via vgridshift at hub lon/lat."""
    import numpy as np

    from proj_4_spark.crs import crs_to_crs
    from proj_4_spark.kernels.gridshift import _bilinear
    from proj_4_spark.sources import gridfiles as GF

    GF.register_grid_file("test_geoid.gtx", GF.synthetic_geoid_gtx_bytes())
    tr = crs_to_crs("+proj=longlat +ellps=WGS84 "
                    "+geoidgrids=test_geoid.gtx", 4326)
    lon, lat = np.array([10.0]), np.array([45.0])
    z = np.array([100.0])
    # src orthometric -> dst ellipsoidal adds the undulation
    _, _, zo, _ = tr.transform_deg(lon.copy(), lat.copy(), z.copy())
    from proj_4_spark.proj import GRID_REGISTRY
    u = _bilinear(GRID_REGISTRY["test_geoid.gtx"],
                  np.radians(lon), np.radians(lat))
    assert abs(zo[0] - (100.0 + u[0])) < 1e-9
    assert abs(u[0]) > 1.0
    # roundtrip
    _, _, zi, _ = tr.transform_deg(lon.copy(), lat.copy(), zo.copy(),
                                   direction="inv")
    assert abs(zi[0] - 100.0) < 1e-9
    # null geoid = identity
    tr2 = crs_to_crs("+proj=longlat +ellps=WGS84 +geoidgrids=null", 4326)
    _, _, z2, _ = tr2.transform_deg(lon.copy(), lat.copy(), z.copy())
    assert z2[0] == 100.0


def test_projinfo_projected_epsg():
    from proj_4_spark.crs import projinfo
    info = projinfo("EPSG:32632")
    assert info["kind"] == "projected"
    assert "+proj=utm" in info["projstring"] and "zone=32" in info["projstring"]
    assert info["wkt2"] is not None and "UTM zone 32N" in info["wkt2"]
    assert info["ellipsoid"]["a"] == 6378137.0
    assert abs(1.0 / info["ellipsoid"]["f"] - 298.257223563) < 1e-6
    assert info["input_units"] == "radians"


def test_projinfo_geographic_and_wkt_roundtrip():
    from proj_4_spark.crs import projinfo
    info = projinfo(4326)
    assert info["kind"] == "geographic"
    assert info["wkt2"] is not None
    # the WKT2 export is itself an accepted input form
    again = projinfo(info["wkt2"])
    assert again["kind"] == "geographic"
    assert again["ellipsoid"]["a"] == info["ellipsoid"]["a"]


def test_projinfo_pipeline_is_transformation():
    from proj_4_spark.crs import projinfo
    info = projinfo("+proj=pipeline +step +proj=cart +ellps=WGS84 "
                    "+step +proj=helmert +x=100 +y=0 +z=0")
    assert info["kind"] == "transformation"
    assert info["n_steps"] >= 2
