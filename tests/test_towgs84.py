"""cs2cs-emulation (+towgs84) expansion.

Golden value transcribed from
/root/reference/test/gie/4D-API_cs2cs-style.gie:44-53 (ED50 <-> ETRS89
via KMStrans2; tolerance 25 mm).  PROJ's forward for a
latlong+towgs84 PJ maps WGS84 angular -> local-datum angular
(src/fwd.cpp:92-100): cart_wgs84 FWD -> helmert INV -> cart INV.
"""

import numpy as np

from proj_4_spark.proj import compile_projstring

PS = ("+proj=latlong +ellps=intl "
      "+towgs84=-81.0703,-89.3603,-115.7526,0.48488,0.02436,0.41321,-0.540645")


def test_towgs84_golden():
    tr = compile_projstring(PS)
    x, y, z, _ = tr.transform_deg(np.array([16.82]), np.array([55.17]),
                                  np.array([61.0]))
    # 25 mm ~ 4e-7 deg at this latitude
    assert abs(x[0] - 16.8210462130) < 4e-7
    assert abs(y[0] - 55.1705688946) < 4e-7
    assert abs(z[0] - 29.0317) < 0.025


def test_towgs84_roundtrip():
    tr = compile_projstring(PS)
    lon = np.array([16.82, 2.0, -30.0])
    lat = np.array([55.17, 48.0, -20.0])
    h = np.array([61.0, 0.0, 100.0])
    x, y, z, _ = tr.transform_deg(lon, lat, h)
    lon2, lat2, h2, _ = tr.transform_deg(x, y, z, direction="inv")
    assert np.max(np.abs(lon2 - lon)) < 1e-9
    assert np.max(np.abs(lat2 - lat)) < 1e-9
    assert np.max(np.abs(h2 - h)) < 1e-4


def test_towgs84_three_param():
    """3-param towgs84 (pure translation)."""
    tr = compile_projstring("+proj=latlong +ellps=GRS80 +towgs84=100,0,0")
    x, y, z, _ = tr.transform_deg(np.array([0.0]), np.array([0.0]),
                                  np.array([0.0]))
    # at (0,0) the cartesian X axis is the local vertical: the INV
    # helmert subtracts the 100 m translation -> height drops by 100,
    # lon/lat unchanged
    assert abs(x[0]) < 1e-9 and abs(y[0]) < 1e-9
    assert abs(z[0] + 100.0) < 1e-6
