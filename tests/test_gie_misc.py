"""gie golden vectors for the long-tail projections.

Values transcribed from /root/reference/test/gie/builtins.gie
(tolerance 0.1 mm, the reference's own gate for these blocks).
"""

import numpy as np
import pytest

from proj_4_spark.proj import compile_projstring

# (projstring, lon, lat, exp_x, exp_y, tol_m, gie line)
CASES = [
    ("+proj=aea +ellps=GRS80 +lat_1=0 +lat_2=2", 2, 1,
     222571.608757106, 110653.326743030, 1e-4, "builtins.gie:36"),
    ("+proj=leac +ellps=GRS80 +lat_1=0 +lat_2=2", 2, 1,
     220685.140542979, 112983.500889396, 1e-4, "builtins.gie:3794"),
    ("+proj=leac +ellps=GRS80 +lat_1=0 +lat_2=2", 2, -1,
     224553.312279826, -108128.636744873, 1e-4, "builtins.gie:3799"),
    ("+proj=stere +ellps=GRS80", 2, 1,
     222644.854550117, 110610.883474174, 1e-4, "builtins.gie:6546"),
    ("+proj=stere +R=6400000", 2, 1,
     223407.810259507, 111737.938996443, 1e-4, "builtins.gie:6569"),
    ("+proj=stere +ellps=GRS80 +lat_0=90 +lat_ts=70", 20, 70,
     748315.3282, -2055979.4669, 1e-4, "builtins.gie:6593"),
    ("+proj=stere +ellps=GRS80 +lat_0=90 +lat_ts=70", 0, 90,
     0.0, 0.0, 1e-9, "builtins.gie:6596"),
    ("+proj=ups +ellps=GRS80", 2, 1,
     2433455.563438467, -10412543.301512826, 1e-4, "builtins.gie:7480"),
    ("+proj=ups +ellps=GRS80", 2, -1,
     2448749.118568199, -10850493.419804076, 1e-4, "builtins.gie:7485"),
    ("+proj=eqc +a=6400000", 2, 1,
     223402.144255274, 111701.072127637, 1e-4, "builtins.gie:1629"),
    ("+proj=cea +ellps=GRS80", 2, 1,
     222638.981586547, 110568.812396267, 1e-4, "builtins.gie:1008"),
    ("+proj=laea +ellps=GRS80", 2, 1,
     222602.471450095, 110589.827224410, 1e-4, "builtins.gie:3286"),
    ("+proj=sinu +ellps=GRS80", 2, 1,
     222605.299539466, 110574.388554153, 1e-4, "builtins.gie:6440"),
    ("+proj=moll +a=6400000", 2, 1,
     201113.698641813, 124066.283433860, 1e-4, "builtins.gie:4435"),
    ("+proj=gall +a=6400000", 2, 1,
     157969.171134520, 95345.249178386, 1e-4, "builtins.gie:1933"),
    ("+proj=mill +a=6400000", 2, 1,
     223402.144255274, 111704.701754394, 1e-4, "builtins.gie:4247"),
    ("+proj=eck4 +a=6400000", 2, 1,
     188646.389356416, 132268.540174065, 1e-4, "builtins.gie:1482"),
    ("+proj=robin +a=6400000", 2, 1,
     189588.423282508, 107318.530350703, 1e-4, "builtins.gie:6168"),
]


@pytest.mark.parametrize("ps,lon,lat,ex,ey,tol,src", CASES,
                         ids=[f"{c[0].split()[0][6:]}:{c[6]}" for c in CASES])
def test_gie_golden(ps, lon, lat, ex, ey, tol, src):
    tr = compile_projstring(ps)
    x, y, _, _ = tr.transform_deg(np.array([float(lon)]),
                                  np.array([float(lat)]))
    assert abs(x[0] - ex) < tol, f"{src}: x {x[0]!r} != {ex!r}"
    assert abs(y[0] - ey) < tol, f"{src}: y {y[0]!r} != {ey!r}"


# --- round 2 additions: eqdc, hammer, aitoff/wintri, nzmg -------------

R2_GOLDENS = [
    # builtins.gie:1659-1669
    ("+proj=eqdc +ellps=GRS80 +lat_1=0.5 +lat_2=2", 2, 1,
     222588.440269286, 110659.134907347),
    ("+proj=eqdc +ellps=GRS80 +lat_1=0.5 +lat_2=2", -2, -1,
     -222756.836702042, -110489.578087221),
    ("+proj=eqdc +R=6400000 +lat_1=0.5 +lat_2=2", 2, 1,
     223351.088175114, 111786.108747174),
    # builtins.gie:2426-2430
    ("+proj=hammer +a=6400000", 2, 1, 223373.788703241, 111703.907397767),
    # builtins.gie:457-463
    ("+proj=aitoff +R=6400000", 2, 1, 223379.458811696, 111706.742883853),
    ("+proj=aitoff +R=6400000", 2, -1, 223379.458811696, -111706.742883853),
    # builtins.gie:8099-8105
    ("+proj=wintri +a=6400000 +lat_1=0", 2, 1,
     223390.801533485, 111703.907505745),
]


@pytest.mark.parametrize("pstr,lon,lat,ex,ey", R2_GOLDENS)
def test_r2_gie_golden(pstr, lon, lat, ex, ey):
    import numpy as np

    from proj_4_spark.proj import compile_projstring

    tr = compile_projstring(pstr)
    x, y, _, _ = tr.transform_deg(np.array([float(lon)]),
                                  np.array([float(lat)]))
    assert abs(x[0] - ex) < 1e-4 and abs(y[0] - ey) < 1e-4, (x[0], y[0])


def test_nzmg_gie_golden_and_roundtrip():
    """builtins.gie:4863-4873 (the expectations are deep
    extrapolations at 1e9 m, so compare at 1e-6 relative) plus an
    in-domain NZ roundtrip through the complex Newton inverse."""
    import numpy as np

    from proj_4_spark.proj import compile_projstring

    tr = compile_projstring("+proj=nzmg +ellps=GRS80")
    x, y, _, _ = tr.transform_deg(np.array([2.0, -2.0]),
                                  np.array([1.0, -1.0]))
    exp = [(3352675144.747425100, -7043205391.100243600),
           (4466166927.369976000, -7502531736.628604900)]
    for i, (ex, ey) in enumerate(exp):
        assert abs(x[i] - ex) / abs(ex) < 1e-6
        assert abs(y[i] - ey) / abs(ey) < 1e-6
    rng = np.random.RandomState(4)
    lon = rng.uniform(166, 179, 300)
    lat = rng.uniform(-47, -34, 300)
    xx, yy, _, _ = tr.transform_deg(lon, lat)
    lo, la, _, _ = tr.transform_deg(xx, yy, direction="inv")
    assert np.nanmax(np.abs(lo - lon)) < 1e-8
    assert np.nanmax(np.abs(la - lat)) < 1e-8


def test_eqdc_invalid_args():
    from proj_4_spark.proj import compile_projstring

    with pytest.raises(ValueError):
        compile_projstring("+proj=eqdc +R=6400000 +lat_1=0 +lat_2=0")


R2B_GOLDENS = [
    # builtins.gie:853-884
    ("+proj=cass +ellps=GRS80", 2, 1, 222605.285776991, 110642.229253999),
    ("+proj=cass +R=6400000", 2, 1, 223368.105203484, 111769.145040586),
    # builtins.gie:5751-5781
    ("+proj=poly +ellps=GRS80", 2, 1, 222605.285770237, 110642.194561440),
    ("+proj=poly +ellps=GRS80", 2, -1, 222605.285770237, -110642.194561440),
    ("+proj=poly +R=6400000", 2, 1, 223368.105210219, 111769.110491225),
    # builtins.gie:667-698
    ("+proj=bonne +ellps=GRS80 +lat_1=0.5", 2, 1,
     222605.296097157, 55321.139565495),
    ("+proj=bonne +ellps=GRS80 +lat_1=0.5", 2, -1,
     222605.296099239, -165827.647799052),
    ("+proj=bonne +ellps=GRS80 +lat_1=-0.5", 2, 1,
     222605.2961, 165827.6478),
]


@pytest.mark.parametrize("pstr,lon,lat,ex,ey", R2B_GOLDENS)
def test_cass_poly_bonne_gie_golden(pstr, lon, lat, ex, ey):
    tr = compile_projstring(pstr)
    x, y, _, _ = tr.transform_deg(np.array([float(lon)]),
                                  np.array([float(lat)]))
    assert abs(x[0] - ex) < 1e-4 and abs(y[0] - ey) < 1e-4, (x[0], y[0])


CPB_ROUNDTRIPS = [
    ("+proj=cass +ellps=GRS80 +lon_0=10 +lat_0=52", (5, 15), (45, 60)),
    ("+proj=cass +R=6371000", (-40, 40), (-60, 60)),
    ("+proj=poly +ellps=GRS80", (-40, 40), (-60, 60)),
    ("+proj=poly +R=6371000", (-40, 40), (-60, 60)),
    ("+proj=bonne +ellps=GRS80 +lat_1=45", (-60, 60), (-60, 80)),
    ("+proj=bonne +R=6371000 +lat_1=45", (-60, 60), (-60, 80)),
    ("+proj=bonne +ellps=GRS80 +lat_1=-30", (-60, 60), (-80, 60)),
]


@pytest.mark.parametrize("pstr,lons,lats", CPB_ROUNDTRIPS)
def test_cass_poly_bonne_roundtrip(pstr, lons, lats):
    rng = np.random.RandomState(6)
    lon = rng.uniform(*lons, 300)
    lat = rng.uniform(*lats, 300)
    tr = compile_projstring(pstr)
    x, y, _, _ = tr.transform_deg(lon, lat)
    lo, la, _, _ = tr.transform_deg(x, y, direction="inv")
    assert np.nanmax(np.abs(lo - lon)) < 1e-9
    assert np.nanmax(np.abs(la - lat)) < 1e-9


def test_igh_gie_golden_and_roundtrip():
    """builtins.gie:2638-2646 + globe-wide roundtrip through the
    12-zone inverse with the validity gate."""
    tr = compile_projstring("+proj=igh +a=6400000")
    x, y, _, _ = tr.transform_deg(np.array([2.0, 2.0]),
                                  np.array([1.0, -1.0]))
    assert abs(x[0] - 223878.497456271) < 1e-4
    assert abs(y[0] - 111701.072127637) < 1e-4
    assert abs(x[1] - 223708.371313058) < 1e-4
    assert abs(y[1] + 111701.072127637) < 1e-4
    rng = np.random.RandomState(9)
    lon = rng.uniform(-179, 179, 2000)
    lat = rng.uniform(-85, 85, 2000)
    xx, yy, _, _ = tr.transform_deg(lon, lat)
    lo, la, _, _ = tr.transform_deg(xx, yy, direction="inv")
    assert np.nanmax(np.abs(lo - lon)) < 1e-6
    assert np.nanmax(np.abs(la - lat)) < 1e-6
    assert np.isnan(lo).mean() == 0.0


# --- Space Oblique Mercator family (som.cpp) --------------------------

SOM_GOLDENS = [
    # builtins.gie:4330-4338
    ("+proj=som +ellps=GRS80 +inc_angle=1.7157253262878522r "
     "+ps_rev=0.06866666666666667 +asc_lon=2.2298420007209447r",
     2, 1, 18556630.368369825, 9533394.675311271),
    ("+proj=som +ellps=GRS80 +inc_angle=1.7157253262878522r "
     "+ps_rev=0.06866666666666667 +asc_lon=2.2298420007209447r",
     2, -1, 19041866.006729737, 9707182.175323525),
    # builtins.gie:3905-3913
    ("+proj=lsat +ellps=GRS80 +lsat=1 +path=2", 2, 1,
     18241950.014558550, 9998256.839822935),
    ("+proj=lsat +ellps=GRS80 +lsat=1 +path=2", 2, -1,
     18746856.253319457, 10215761.669925211),
    ("+proj=lsat +ellps=GRS80 +lsat=1 +path=2", -2, 1,
     18565503.683633164, 9085039.146727053),
    # builtins.gie:4277-4285
    ("+proj=misrsom +ellps=GRS80 +path=1", 2, 1,
     18556630.368369825, 9533394.675311271),
    ("+proj=misrsom +ellps=GRS80 +path=1", -2, 1,
     18816810.130184799, 8647669.649802955),
]


@pytest.mark.parametrize("pstr,lon,lat,ex,ey", SOM_GOLDENS)
def test_som_gie_golden(pstr, lon, lat, ex, ey):
    tr = compile_projstring(pstr)
    x, y, _, _ = tr.transform_deg(np.array([float(lon)]),
                                  np.array([float(lat)]))
    assert abs(x[0] - ex) < 1e-4 and abs(y[0] - ey) < 1e-4, (x[0], y[0])


def test_som_roundtrip_within_reference_tolerance():
    """The som inverse converges to TOL=1e-7 rad (som.cpp:14); the
    roundtrip must sit inside that bound over the projectable domain."""
    tr = compile_projstring("+proj=lsat +ellps=GRS80 +lsat=1 +path=2")
    rng = np.random.RandomState(13)
    lon = rng.uniform(-180, 180, 400)
    lat = rng.uniform(-75, 75, 400)
    x, y, _, _ = tr.transform_deg(lon, lat)
    lo, la, _, _ = tr.transform_deg(x, y, direction="inv")
    dlon = np.abs((lo - lon + 180) % 360 - 180)
    assert np.nanmax(dlon) < np.degrees(1e-7) + 1e-9
    assert np.nanmax(np.abs(la - lat)) < 1e-9


@pytest.mark.parametrize("bad", [
    "+proj=lsat +ellps=GRS80 +lsat=7 +path=2",
    "+proj=lsat +ellps=GRS80 +lsat=1 +path=300",
    "+proj=misrsom +ellps=GRS80 +path=0",
    "+proj=som +ellps=GRS80 +inc_angle=200 +ps_rev=0.07",
])
def test_som_arg_errors(bad):
    with pytest.raises(ValueError):
        compile_projstring(bad)


# --- qsc (quadrilateralized spherical cube) ---------------------------

def test_qsc_gie_golden():
    """builtins.gie:6116-6126."""
    tr = compile_projstring("+proj=qsc +ellps=GRS80")
    x, y, _, _ = tr.transform_deg(np.array([2.0, -2.0]),
                                  np.array([1.0, -1.0]))
    assert abs(x[0] - 304638.450843852) < 1e-4
    assert abs(y[0] - 164123.870923794) < 1e-4
    assert abs(x[1] + 304638.450843852) < 1e-4
    assert abs(y[1] + 164123.870923794) < 1e-4


@pytest.mark.parametrize("pstr,lons,lats", [
    ("+proj=qsc +ellps=GRS80", (-40, 40), (-40, 40)),
    ("+proj=qsc +ellps=GRS80 +lon_0=90", (50, 130), (-40, 40)),
    ("+proj=qsc +ellps=GRS80 +lon_0=180", (140, 220), (-40, 40)),
    ("+proj=qsc +ellps=GRS80 +lon_0=-90", (-130, -50), (-40, 40)),
    ("+proj=qsc +ellps=GRS80 +lat_0=90", (-179, 179), (50, 89)),
    ("+proj=qsc +ellps=GRS80 +lat_0=-90", (-179, 179), (-89, -50)),
    ("+proj=qsc +R=6370997", (-40, 40), (-40, 40)),
])
def test_qsc_face_roundtrip(pstr, lons, lats):
    """All six cube faces + sphere, with the ellipsoid<->sphere
    latitude shift (qsc.cpp:296-307)."""
    rng = np.random.RandomState(19)
    lon = rng.uniform(*lons, 500)
    lat = rng.uniform(*lats, 500)
    tr = compile_projstring(pstr)
    x, y, _, _ = tr.transform_deg(lon, lat)
    lo, la, _, _ = tr.transform_deg(x, y, direction="inv")
    dlon = np.abs((lo - lon + 180) % 360 - 180)
    assert np.nanmax(dlon) < 1e-9
    assert np.nanmax(np.abs(la - lat)) < 1e-9


# --- HEALPix / rHEALPix -----------------------------------------------

HEALPIX_GOLDENS = [
    # builtins.gie:2490-2546, 2566-2574
    ("+proj=healpix +ellps=GRS80", 2, 1, 222390.103949239, 130406.588664482),
    ("+proj=healpix +ellps=GRS80", -2, -1, -222390.103949239,
     -130406.588664481),
    ("+proj=healpix +R=6400000", 2, 1, 223402.144255274, 131588.044441999),
    ("+proj=healpix +R=6400000 +lat_1=0.5 +lat_2=2 +rot_xy=42", 2, 1,
     254069.735470912856, -51696.237925639456),
    ("+proj=healpix +R=6400000 +lat_1=0.5 +lat_2=2 +rot_xy=42", 2, -1,
     77970.559536809917, -247274.186569161975),
    ("+proj=rhealpix +ellps=GRS80", 2, 1, 222390.103949239,
     130406.588664482),
]


@pytest.mark.parametrize("pstr,lon,lat,ex,ey", HEALPIX_GOLDENS)
def test_healpix_gie_golden(pstr, lon, lat, ex, ey):
    tr = compile_projstring(pstr)
    x, y, _, _ = tr.transform_deg(np.array([float(lon)]),
                                  np.array([float(lat)]))
    assert abs(x[0] - ex) < 1e-4 and abs(y[0] - ey) < 1e-4, (x[0], y[0])


@pytest.mark.parametrize("pstr,tol_lat", [
    ("+proj=healpix +ellps=GRS80", 1e-7),
    ("+proj=healpix +R=6371000 +rot_xy=30", 1e-9),
    ("+proj=rhealpix +ellps=GRS80 +north_square=1 +south_square=2", 1e-7),
    ("+proj=rhealpix +R=6371000", 1e-9),
])
def test_healpix_roundtrip(pstr, tol_lat):
    """Globe-wide incl. the interrupted polar caps and rHEALPix cap
    reassembly; the ellipsoidal inverse carries the shared authalic
    series truncation (~2e-8 deg, reference behavior)."""
    rng = np.random.RandomState(23)
    lon = rng.uniform(-179, 179, 2000)
    lat = rng.uniform(-89, 89, 2000)
    tr = compile_projstring(pstr)
    x, y, _, _ = tr.transform_deg(lon, lat)
    lo, la, _, _ = tr.transform_deg(x, y, direction="inv")
    dlon = np.abs((lo - lon + 180) % 360 - 180)
    assert np.nanmax(dlon) < 1e-9
    assert np.nanmax(np.abs(la - lat)) < tol_lat
    assert np.isnan(lo).mean() == 0.0


def test_rhealpix_invalid_square():
    with pytest.raises(ValueError):
        compile_projstring("+proj=rhealpix +ellps=GRS80 +north_square=5")
