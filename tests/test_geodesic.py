"""Karney geodesic golden tests.

The 20-row hard-case table is transcribed verbatim from the reference's
geodesic test suite (/root/reference/src/tests/geodtest.c:43-126);
columns: lat1 lon1 azi1 lat2 lon2 azi2 s12 a12 m12 M12 M21 S12.
Assertions follow FIXTURES.md §2: inverse s12 to 1e-8 m relative,
azimuths to 1e-9 rad; Karney cross-checked against an independent
Vincenty implementation except near-antipodal rows.
"""

import numpy as np
import pytest

from proj_4_spark.kernels.geodesic import (
    Geodesic,
    direct,
    inverse,
    vincenty_inverse,
)

WGS84_A = 6378137.0
WGS84_F = 1 / 298.257223563

# geodtest.c:43-126 (first 8 columns used)
TESTCASES = np.array([
    [35.60777, -139.44815, 111.098748429560326, -11.17491, -69.95921, 129.289270889708762, 8935244.5604818305, 80.50729714281974],
    [55.52454, 106.05087, 22.020059880982801, 77.03196, 197.18234, 109.112041110671519, 4105086.1713924406, 36.892740690445894],
    [-21.97856, 142.59065, -32.44456876433189, 41.84138, 98.56635, -41.84359951440466, 8394328.894657671, 75.62930491011522],
    [-66.99028, 112.2363, 173.73491240878403, -12.70631, 285.90344, 2.512956620913668, 11150344.2312080241, 100.278634181155759],
    [-17.42761, 173.34268, -159.033557661192928, -15.84784, 5.93557, -20.787484651536988, 16076603.1631180673, 144.640108810286253],
    [32.84994, 48.28919, 150.492927788121982, -56.28556, 202.29132, 48.113449399816759, 16727068.9438164461, 150.565799985466607],
    [6.96833, 52.74123, 92.581585386317712, -7.39675, 206.17291, 90.721692165923907, 17102477.2496958388, 154.147366239113561],
    [-50.56724, -16.30485, -105.439679907590164, -33.56571, -94.97412, -47.348547835650331, 6455670.5118668696, 58.083719495371259],
    [-58.93002, -8.90775, 140.965397902500679, -8.91104, 133.13503, 19.255429433416599, 11756066.0219864627, 105.755691241406877],
    [-68.82867, -74.28391, 93.774347763114881, -50.63005, -8.36685, 34.65564085411343, 3956936.926063544, 35.572254987389284],
    [-10.62672, -32.0898, -86.426713286747751, 5.883, -134.31681, -80.473780971034875, 11470869.3864563009, 103.387395634504061],
    [-21.76221, 166.90563, 29.319421206936428, 48.72884, 213.97627, 43.508671946410168, 9098627.3986554915, 81.963476716121964],
    [-19.79938, -174.47484, 71.167275780171533, -11.99349, -154.35109, 65.589099775199228, 2319004.8601169389, 20.896611684802389],
    [-11.95887, -116.94513, 92.712619830452549, 4.57352, 7.16501, 78.64960934409585, 13834722.5801401374, 124.688684161089762],
    [-87.85331, 85.66836, -65.120313040242748, 66.48646, 16.09921, -4.888658719272296, 17286615.3147144645, 155.58592449699137],
    [1.74708, 128.32011, -101.584843631173858, -11.16617, 11.87109, -86.325793296437476, 12942901.1241347408, 116.650512484301857],
    [-25.72959, -144.90758, -153.647468693117198, -57.70581, -269.17879, -48.343983158876487, 9413446.7452453107, 84.664533838404295],
    [-41.22777, 122.32875, 14.285113402275739, -7.57291, 130.37946, 10.805303085187369, 3812686.035106021, 34.34330804743883],
    [11.01307, 138.25278, 79.43682622782374, 6.62726, 247.05981, 103.708090215522657, 11911190.819018408, 107.341669954114577],
    [-29.47124, 95.14681, -163.779130441688382, -27.46601, -69.15955, -15.909335945554969, 13487015.8381145492, 121.294026715742277],
])

RAD = np.pi / 180.0


@pytest.fixture(scope="module")
def g():
    return Geodesic.init(WGS84_A, WGS84_F)


def test_inverse_hard_cases(g):
    lat1, lon1, azi1e = TESTCASES[:, 0], TESTCASES[:, 1], TESTCASES[:, 2]
    lat2, lon2, azi2e = TESTCASES[:, 3], TESTCASES[:, 4], TESTCASES[:, 5]
    s12e, a12e = TESTCASES[:, 6], TESTCASES[:, 7]
    s12, azi1, azi2, a12 = inverse(g, lat1, lon1, lat2, lon2)
    np.testing.assert_allclose(s12, s12e, rtol=1e-8, atol=0)
    # azimuths to 1e-9 rad ~ 5.7e-8 deg (geodtest.c uses 1e-13 deg; we
    # allow the north-star bar)
    np.testing.assert_allclose(azi1 * RAD, azi1e * RAD, atol=1e-9, rtol=0)
    np.testing.assert_allclose(azi2 * RAD, azi2e * RAD, atol=1e-9, rtol=0)
    np.testing.assert_allclose(a12, a12e, atol=1e-10, rtol=0)


def test_direct_hard_cases(g):
    lat1, lon1, azi1 = TESTCASES[:, 0], TESTCASES[:, 1], TESTCASES[:, 2]
    lat2e, lon2e, azi2e = TESTCASES[:, 3], TESTCASES[:, 4], TESTCASES[:, 5]
    s12 = TESTCASES[:, 6]
    lat2, lon2, azi2 = direct(g, lat1, lon1, azi1, s12)
    np.testing.assert_allclose(lat2, lat2e, atol=1e-8, rtol=0)
    # lon2 in table may exceed 180; normalize both
    lon2n = (lon2e + 180) % 360 - 180
    np.testing.assert_allclose(lon2, lon2n, atol=1e-8, rtol=0)
    np.testing.assert_allclose(azi2, azi2e, atol=1e-8, rtol=0)


def test_karney_vs_vincenty(g):
    """Independent-oracle cross-check (FIXTURES.md §2): agreement to
    0.5 mm except near-antipodal rows, which Vincenty fails (NaN)."""
    rng = np.random.RandomState(42)
    lat1 = rng.uniform(-80, 80, 500)
    lon1 = rng.uniform(-180, 180, 500)
    lat2 = rng.uniform(-80, 80, 500)
    lon2 = rng.uniform(-180, 180, 500)
    s_k, _, _, _ = inverse(g, lat1, lon1, lat2, lon2)
    s_v = vincenty_inverse(lat1, lon1, lat2, lon2)
    ok = np.isfinite(s_v)
    assert ok.mean() > 0.95  # only near-antipodal rows may drop out
    np.testing.assert_allclose(s_k[ok], s_v[ok], atol=5e-4, rtol=0)


def test_karney_vs_vincenty_fixed_band(g):
    """The fixed-iteration Vincenty driving the geodesic_to_tokyo
    driver query agrees with Karney to <1e-4 m / <1e-8 deg azimuth on
    the non-antipodal band (haversine < 19,500 km) it is gated to."""
    from proj_4_spark.kernels.geodesic import vincenty_inverse_fixed

    rng = np.random.RandomState(7)
    lat1 = rng.uniform(-85, 85, 5000)
    lon1 = rng.uniform(-180, 180, 5000)
    lat2, lon2 = 35.6895, 139.6917
    R = 6371008.8
    hav = 2 * R * np.arcsin(np.sqrt(
        np.sin(np.radians(lat2 - lat1) / 2) ** 2
        + np.cos(np.radians(lat1)) * np.cos(np.radians(lat2))
        * np.sin(np.radians(lon2 - lon1) / 2) ** 2))
    m = hav < 19_500_000.0
    s_v, azi_v = vincenty_inverse_fixed(lat1[m], lon1[m], lat2, lon2)
    s_k, azi_k, _, _ = inverse(g, lat1[m], lon1[m],
                               np.full(m.sum(), lat2), np.full(m.sum(), lon2))
    np.testing.assert_allclose(s_v, s_k, atol=1e-4, rtol=0)
    np.testing.assert_allclose(azi_v, azi_k, atol=1e-8, rtol=0)


def test_inverse_special_points(g):
    """Equatorial / meridional / coincident / antipodal edge cases."""
    lat1 = np.array([0.0, 0.0, 20.0, 20.001, 0.0, 48.522876735459])
    lon1 = np.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    lat2 = np.array([0.0, 0.0, -20.0, 20.001, 0.5, -48.52287673545898293])
    lon2 = np.array([10.0, 179.5, 0.0, 0.0, 179.5, 179.599720456223079643])
    s12, azi1, azi2, _ = inverse(g, lat1, lon1, lat2, lon2)
    assert np.isfinite(s12).all()
    # equatorial 10 deg: s = a * lam12
    assert abs(s12[0] - WGS84_A * 10 * RAD) < 1e-6
    assert abs(azi1[0] - 90.0) < 1e-12
    # coincident -> 0
    assert s12[3] == 0.0
    # meridional through equator: due south
    assert abs(azi1[2] - 180.0) < 1e-9
    # half circumference scale sanity for the near-antipodal rows
    assert 1.9e7 < s12[1] < 2.1e7
    assert 1.9e7 < s12[5] < 2.1e7


def test_direct_inverse_consistency(g):
    rng = np.random.RandomState(7)
    lat1 = rng.uniform(-85, 85, 1000)
    lon1 = rng.uniform(-180, 180, 1000)
    azi1 = rng.uniform(-180, 180, 1000)
    s12 = rng.uniform(1.0, 1.9e7, 1000)
    lat2, lon2, _ = direct(g, lat1, lon1, azi1, s12)
    s12b, azi1b, _, _ = inverse(g, lat1, lon1, lat2, lon2)
    np.testing.assert_allclose(s12b, s12, rtol=1e-12, atol=1e-7)
