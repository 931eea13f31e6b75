"""Long-tail spherical + simple-conic projections
(kernels/misc_sph.py): forward gie goldens transcribed from
/root/reference/test/gie/builtins.gie (tolerance 0.1 mm, the
reference's own gate) plus inverse roundtrips where the reference
ships an inverse."""

import numpy as np
import pytest

from proj_4_spark.proj import compile_projstring

GOLDENS = [
    ("+proj=apian +a=6400000", 2.0, 1.0, 223374.577355253, 111701.072127637),
    ("+proj=apian +a=6400000", 2.0, -1.0, 223374.577355253, -111701.072127637),
    ("+proj=august +a=6400000", 2.0, 1.0, 223404.978180972, 111722.340289763),
    ("+proj=august +a=6400000", 2.0, -1.0, 223404.978180972, -111722.340289763),
    ("+proj=bacon +a=6400000", 2.0, 1.0, 223334.132555965, 175450.725922666),
    ("+proj=bacon +a=6400000", 2.0, -1.0, 223334.132555965, -175450.725922666),
    ("+proj=boggs +a=6400000", 2.0, 1.0, 211949.700808182, 117720.998305411),
    ("+proj=boggs +a=6400000", 2.0, -1.0, 211949.700808182, -117720.998305411),
    ("+proj=cc +a=6400000", 2.0, 1.0, 223402.144255274, 111712.415540593),
    ("+proj=cc +a=6400000", 2.0, -1.0, 223402.144255274, -111712.415540593),
    ("+proj=collg +a=6400000 +lat_1=0.5 +lat_2=2", 2.0, 1.0, 249872.92157793, 99423.17478846),
    ("+proj=collg +a=6400000 +lat_1=0.5 +lat_2=2", 2.0, -1.0, 254272.532301245, -98559.307760743),
    ("+proj=comill +a=6400000", 2.0, 1.0, 223402.144255274, 110611.859089459),
    ("+proj=comill +a=6400000", 2.0, -1.0, 223402.144255274, -110611.859089459),
    ("+proj=crast +a=6400000", 2.0, 1.0, 218280.142056781, 114306.04560428),
    ("+proj=crast +a=6400000", 2.0, -1.0, 218280.142056781, -114306.04560428),
    ("+proj=denoy +a=6400000", 2.0, 1.0, 223377.422876954, 111701.072127637),
    ("+proj=denoy +a=6400000", 2.0, -1.0, 223377.422876954, -111701.072127637),
    ("+proj=euler +ellps=GRS80 +lat_1=0.5 +lat_2=2", 2.0, 1.0, 222597.634659108, 111404.240549919),
    ("+proj=euler +ellps=GRS80 +lat_1=0.5 +lat_2=2", 2.0, -1.0, 222767.165631876, -111234.676491018),
    ("+proj=fahey +a=6400000", 2.0, 1.0, 182993.344649124, 101603.193569884),
    ("+proj=fahey +a=6400000", 2.0, -1.0, 182993.344649124, -101603.193569884),
    ("+proj=fouc_s +a=6400000", 2.0, 1.0, 223402.144255274, 111695.401198614),
    ("+proj=fouc_s +a=6400000", 2.0, -1.0, 223402.144255274, -111695.401198614),
    ("+proj=gins8 +a=6400000", 2.0, 1.0, 194350.25093959, 111703.907635335),
    ("+proj=gins8 +a=6400000", 2.0, -1.0, 194350.25093959, -111703.907635335),
    ("+proj=hatano +a=6400000", 2.0, 1.0, 189878.878946528, 131409.802440626),
    ("+proj=hatano +a=6400000", 2.0, -1.0, 189881.081952445, -131409.142276074),
    ("+proj=larr +a=6400000", 2.0, 1.0, 223393.637624201, 111707.215961256),
    ("+proj=larr +a=6400000", 2.0, -1.0, 223393.637624201, -111707.215961256),
    ("+proj=lask +a=6400000", 2.0, 1.0, 217928.275907355, 112144.329220142),
    ("+proj=lask +a=6400000", 2.0, -1.0, 217928.275907355, -112144.329220142),
    ("+proj=loxim +a=6400000 +lat_1=0.5 +lat_2=2", 2.0, 1.0, 223382.295791339, 55850.536063819),
    ("+proj=loxim +a=6400000 +lat_1=0.5 +lat_2=2", 2.0, -1.0, 223393.637462243, -167551.608191456),
    ("+proj=murd1 +ellps=GRS80 +lat_1=0.5 +lat_2=2", 2.0, 1.0, 222600.813473554, 111404.244180546),
    ("+proj=murd1 +ellps=GRS80 +lat_1=0.5 +lat_2=2", 2.0, -1.0, 222770.349287864, -111234.672856675),
    ("+proj=murd2 +ellps=GRS80 +lat_1=0.5 +lat_2=2", 2.0, 1.0, 222588.09975123, 111426.140027412),
    ("+proj=murd2 +ellps=GRS80 +lat_1=0.5 +lat_2=2", 2.0, -1.0, 222757.726267018, -111341.431317505),
    ("+proj=murd3 +ellps=GRS80 +lat_1=0.5 +lat_2=2", 2.0, 1.0, 222600.814077577, 111404.246601372),
    ("+proj=murd3 +ellps=GRS80 +lat_1=0.5 +lat_2=2", 2.0, -1.0, 222770.354733899, -111234.670432178),
    ("+proj=natearth2 +a=6400000", 2.0, 1.0, 189255.172934731, 113022.495810907),
    ("+proj=natearth2 +a=6400000", 2.0, -1.0, 189255.172934731, -113022.495810907),
    ("+proj=nell +a=6400000", 2.0, 1.0, 223385.132504696, 111698.236447187),
    ("+proj=nell +a=6400000", 2.0, -1.0, 223385.132504696, -111698.236447187),
    ("+proj=nell_h +a=6400000", 2.0, 1.0, 223385.131640953, 111698.236533562),
    ("+proj=nell_h +a=6400000", 2.0, -1.0, 223385.131640953, -111698.236533562),
    ("+proj=nicol +a=6400000", 2.0, 1.0, 223374.56181414, 111732.553988545),
    ("+proj=nicol +a=6400000", 2.0, -1.0, 223374.56181414, -111732.553988545),
    ("+proj=ortel +a=6400000", 2.0, 1.0, 223374.577355253, 111701.072127637),
    ("+proj=ortel +a=6400000", 2.0, -1.0, 223374.577355253, -111701.072127637),
    ("+proj=patterson +a=6400000", 2.0, 1.0, 223402.144255274, 113354.25039778),
    ("+proj=patterson +a=6400000", 2.0, -1.0, 223402.144255274, -113354.25039778),
    ("+proj=pconic +ellps=GRS80 +lat_1=0.5 +lat_2=2", 2.0, 1.0, 222588.098841617, 111416.604770067),
    ("+proj=pconic +ellps=GRS80 +lat_1=0.5 +lat_2=2", 2.0, -1.0, 222757.71809109, -111331.88153108),
    ("+proj=tcc +a=6400000", 2.0, 1.0, 223458.844192458, 111769.145040586),
    ("+proj=tcc +a=6400000", 2.0, -1.0, 223458.844192458, -111769.145040586),
    ("+proj=times +ellps=sphere", 0.0, 0.0, 0.0, 0.0),
    ("+proj=times +ellps=sphere", 80.0, 70.0, 5785183.576067096, 7615452.066120422),
    ("+proj=tissot +ellps=GRS80 +lat_1=0.5 +lat_2=2", 2.0, 1.0, 222641.078699631, 54347.828487281),
    ("+proj=tissot +ellps=GRS80 +lat_1=0.5 +lat_2=2", 2.0, -1.0, 222810.614513941, -168291.088549939),
    ("+proj=urm5 +a=6400000 +n=0.5", 2.0, 1.0, 223393.638433964, 111696.818785117),
    ("+proj=urm5 +a=6400000 +n=0.5", 2.0, -1.0, 223393.638433964, -111696.818785117),
    ("+proj=vitk1 +ellps=GRS80 +lat_1=0.5 +lat_2=2", 2.0, 1.0, 222607.171211458, 111404.251442435),
    ("+proj=vitk1 +ellps=GRS80 +lat_1=0.5 +lat_2=2", 2.0, -1.0, 222776.716709598, -111234.665587445),
    ("+proj=wag7 +a=6400000", 2.0, 1.0, 198601.876957312, 125637.045714171),
    ("+proj=wag7 +a=6400000", 2.0, -1.0, 198601.876957312, -125637.045714171),
    ("+proj=wink1 +a=6400000", 2.0, 1.0, 223385.131640953, 111701.072127637),
    ("+proj=wink1 +a=6400000", 2.0, -1.0, 223385.131640953, -111701.072127637),
    ("+proj=wink2 +a=6400000 +lat_1=0.5", 2.0, 1.0, 223387.396433786, 124752.032797445),
    ("+proj=wink2 +a=6400000 +lat_1=0.5", 2.0, -1.0, 223387.396433786, -124752.032797445),
]


@pytest.mark.parametrize("pstr,lon,lat,ex,ey", GOLDENS)
def test_misc_sph_gie_golden(pstr, lon, lat, ex, ey):
    tr = compile_projstring(pstr)
    x, y, _, _ = tr.transform_deg(np.array([float(lon)]),
                                  np.array([float(lat)]))
    assert abs(x[0] - ex) < 1e-4 and abs(y[0] - ey) < 1e-4, (x[0], y[0])


# ops whose reference ships a closed-form or Newton inverse
INV_OPS = [
    "+proj=cc +a=6400000",
    "+proj=times +a=6400000",
    "+proj=patterson +a=6400000",
    "+proj=natearth2 +a=6400000",
    "+proj=comill +a=6400000",
    "+proj=collg +a=6400000",
    "+proj=crast +a=6400000",
    "+proj=fahey +a=6400000",
    "+proj=loxim +a=6400000 +lat_1=30",
    "+proj=nell +a=6400000",
    "+proj=nell_h +a=6400000",
    "+proj=wink1 +a=6400000 +lat_ts=50",
    "+proj=fouc_s +a=6400000 +n=0.5",
    "+proj=hatano +a=6400000",
    "+proj=euler +ellps=GRS80 +lat_1=20 +lat_2=60",
    "+proj=murd1 +ellps=GRS80 +lat_1=20 +lat_2=60",
    "+proj=murd2 +ellps=GRS80 +lat_1=20 +lat_2=60",
    "+proj=murd3 +ellps=GRS80 +lat_1=20 +lat_2=60",
    "+proj=pconic +ellps=GRS80 +lat_1=20 +lat_2=60 +lat_0=40",
    "+proj=tissot +ellps=GRS80 +lat_1=20 +lat_2=60",
    "+proj=vitk1 +ellps=GRS80 +lat_1=20 +lat_2=60",
]


@pytest.mark.parametrize("pstr", INV_OPS)
def test_misc_sph_roundtrip(pstr):
    rng = np.random.RandomState(31)
    lon = rng.uniform(-120, 120, 300)
    lat = rng.uniform(-80, 80, 300)
    if "pconic" in pstr or "murd2" in pstr:
        lat = rng.uniform(0, 75, 300)  # conic validity band
    tr = compile_projstring(pstr)
    x, y, _, _ = tr.transform_deg(lon, lat)
    lo, la, _, _ = tr.transform_deg(x, y, direction="inv")
    m = np.isfinite(lo)
    assert m.mean() > 0.95
    assert np.nanmax(np.abs(lo[m] - lon[m])) < 1e-6
    assert np.nanmax(np.abs(la[m] - lat[m])) < 1e-6


# --- batch 2: geos, goode, tcea/ocea, tobmerc, lagrng, vandg2-4,
#     tpeqd, airy (goldens from builtins.gie) --------------------------

GOLDENS2 = [
    ("+proj=airy +a=6400000", 2.0, 1.0, 189109.886908621, 94583.752387504),
    ("+proj=airy +a=6400000", 2.0, -1.0, 189109.886908621, -94583.752387504),
    ("+proj=geos +ellps=GRS80 +h=35785831", 2.0, 1.0, 222527.0703658, 110551.303413329),
    ("+proj=geos +ellps=GRS80 +h=35785831", 2.0, -1.0, 222527.0703658, -110551.303413329),
    ("+proj=goode +a=6400000", 2.0, 1.0, 223368.119026632, 111701.072127637),
    ("+proj=goode +a=6400000", 2.0, -1.0, 223368.119026632, -111701.072127637),
    ("+proj=lagrng +a=6400000 +W=2 +lat_1=0.5", 2.0, 1.0, 111703.375917226, 27929.831908033),
    ("+proj=lagrng +a=6400000 +W=2 +lat_1=0.5", 2.0, -1.0, 111699.122088816, -83784.178013358),
    ("+proj=ocea +a=6400000 +lat_1=0.5 +lat_2=2", 2.0, 1.0, 19994423.837934088, 223322.760576728),
    ("+proj=ocea +a=6400000 +lat_1=0.5 +lat_2=2", 2.0, -1.0, 20217962.128015257, 223322.760576729),
    ("+proj=tcea +a=6400000", 2.0, 1.0, 223322.760576727, 111769.145040586),
    ("+proj=tcea +a=6400000", 2.0, -1.0, 223322.760576727, -111769.145040586),
    ("+proj=tobmerc +ellps=sphere", 2.0, 1.0, 222322.01165633308, 111200.52003058406),
    ("+proj=tobmerc +ellps=sphere", 2.0, -1.0, 222322.01165633308, -111200.52003058446),
    ("+proj=tpeqd +ellps=GRS80 +lat_1=0.5 +lat_2=2", 2.0, 1.0, -27750.758831679, -222599.403691777),
    ("+proj=tpeqd +ellps=GRS80 +lat_1=0.5 +lat_2=2", 2.0, -1.0, -250434.937024036, -222655.938193266),
    ("+proj=vandg2 +a=6400000", 2.0, 1.0, 223395.247850437, 111718.491037226),
    ("+proj=vandg2 +a=6400000", 2.0, -1.0, 223395.247850437, -111718.491037226),
    ("+proj=vandg3 +a=6400000", 2.0, 1.0, 223395.249552831, 111704.519904421),
    ("+proj=vandg3 +a=6400000", 2.0, -1.0, 223395.249552831, -111704.519904421),
    ("+proj=vandg4 +R=6400000", 2.0, 1.0, 223374.577294355, 111701.195484154),
    ("+proj=vandg4 +R=6400000", 2.0, -1.0, 223374.577294355, -111701.195484154),
]


@pytest.mark.parametrize("pstr,lon,lat,ex,ey", GOLDENS2)
def test_misc_sph2_gie_golden(pstr, lon, lat, ex, ey):
    tr = compile_projstring(pstr)
    x, y, _, _ = tr.transform_deg(np.array([float(lon)]),
                                  np.array([float(lat)]))
    assert abs(x[0] - ex) < 1e-4 and abs(y[0] - ey) < 1e-4, (x[0], y[0])


INV_OPS2 = [
    ("+proj=geos +ellps=GRS80 +h=35785831", (-60, 60), (-60, 60)),
    ("+proj=geos +R=6371000 +h=35785831 +sweep=x", (-60, 60), (-60, 60)),
    ("+proj=goode +R=6371000", (-170, 170), (-85, 85)),
    ("+proj=tcea +R=6371000 +k_0=0.9", (-60, 60), (-80, 80)),
    ("+proj=ocea +R=6371000 +lat_1=30 +lat_2=50 +lon_1=-20 +lon_2=40",
     (-120, 120), (-60, 60)),
    ("+proj=ocea +R=6371000 +alpha=45 +lonc=10 +lat_0=40",
     (-120, 120), (-60, 60)),
    ("+proj=tobmerc +R=6371000", (-170, 170), (-80, 80)),
    ("+proj=tpeqd +R=6371000 +lat_1=30 +lon_1=-10 +lat_2=50 +lon_2=30",
     (-60, 80), (-50, 80)),
]


@pytest.mark.parametrize("pstr,lons,lats", INV_OPS2)
def test_misc_sph2_roundtrip(pstr, lons, lats):
    rng = np.random.RandomState(37)
    lon = rng.uniform(*lons, 400)
    lat = rng.uniform(*lats, 400)
    tr = compile_projstring(pstr)
    x, y, _, _ = tr.transform_deg(lon, lat)
    lo, la, _, _ = tr.transform_deg(x, y, direction="inv")
    m = np.isfinite(x.astype(float)) & np.isfinite(lo)
    dlon = np.abs((lo - lon + 180) % 360 - 180)
    assert m.mean() > 0.95
    assert np.nanmax(dlon[m]) < 1e-7
    assert np.nanmax(np.abs(la - lat)[m]) < 1e-7


def test_geos_behind_limb_nan():
    """geos visibility check: the far side of the Earth is invisible
    from the satellite."""
    tr = compile_projstring("+proj=geos +ellps=GRS80 +h=35785831")
    x, y, _, _ = tr.transform_deg(np.array([150.0]), np.array([0.0]))
    assert np.isnan(x[0]) and np.isnan(y[0])


# --- batch 3: Putnins / McBryde-Thomas families + oea ------------------

GOLDENS3 = [
    ("+proj=mbt_fps +a=6400000", 2.0, 1.0, 198798.17612985, 125512.017254531),
    ("+proj=mbt_fps +a=6400000", 2.0, -1.0, 198798.17612985, -125512.017254531),
    ("+proj=mbtfpp +a=6400000", 2.0, 1.0, 206804.78692982, 120649.762565793),
    ("+proj=mbtfpp +a=6400000", 2.0, -1.0, 206804.78692982, -120649.762565793),
    ("+proj=mbtfpq +a=6400000", 2.0, 1.0, 209391.854738393, 119161.040199055),
    ("+proj=mbtfpq +a=6400000", 2.0, -1.0, 209391.854738393, -119161.040199055),
    ("+proj=oea +a=6400000 +n=1 +m=2 +theta=3", 2.0, 1.0, 228926.872097864, 99870.488430076),
    ("+proj=oea +a=6400000 +n=1 +m=2 +theta=3", 2.0, -1.0, 217242.58403694, -123247.885607475),
    ("+proj=putp2 +a=6400000", 2.0, 1.0, 211638.039634339, 117895.03304338),
    ("+proj=putp2 +a=6400000", 2.0, -1.0, 211638.039634339, -117895.03304338),
    ("+proj=putp3 +a=6400000", 2.0, 1.0, 178227.115507794, 89124.560786088),
    ("+proj=putp3 +a=6400000", 2.0, -1.0, 178227.115507794, -89124.560786088),
    ("+proj=putp3p +a=6400000", 2.0, 1.0, 178238.118539985, 89124.560786088),
    ("+proj=putp3p +a=6400000", 2.0, -1.0, 178238.118539985, -89124.560786088),
    ("+proj=putp4p +a=6400000", 2.0, 1.0, 195241.477349386, 127796.782307926),
    ("+proj=putp4p +a=6400000", 2.0, -1.0, 195241.477349386, -127796.782307926),
    ("+proj=putp5 +a=6400000", 2.0, 1.0, 226367.213380562, 113204.568558475),
    ("+proj=putp5 +a=6400000", 2.0, -1.0, 226367.213380562, -113204.568558475),
    ("+proj=putp5p +a=6400000", 2.0, 1.0, 226388.175248756, 113204.568558475),
    ("+proj=putp5p +a=6400000", 2.0, -1.0, 226388.175248756, -113204.568558475),
    ("+proj=putp6 +a=6400000", 2.0, 1.0, 226369.395133403, 110218.523796521),
    ("+proj=putp6 +a=6400000", 2.0, -1.0, 226369.395133403, -110218.523796521),
    ("+proj=putp6p +a=6400000", 2.0, 1.0, 198034.195132195, 125989.475461323),
    ("+proj=putp6p +a=6400000", 2.0, -1.0, 198034.195132195, -125989.475461323),
    ("+proj=weren +a=6400000", 2.0, 1.0, 223378.515757634, 146214.093042288),
    ("+proj=weren +a=6400000", 2.0, -1.0, 223378.515757634, -146214.093042288),
]


@pytest.mark.parametrize("pstr,lon,lat,ex,ey", GOLDENS3)
def test_misc_sph3_gie_golden(pstr, lon, lat, ex, ey):
    tr = compile_projstring(pstr)
    x, y, _, _ = tr.transform_deg(np.array([float(lon)]),
                                  np.array([float(lat)]))
    assert abs(x[0] - ex) < 1e-4 and abs(y[0] - ey) < 1e-4, (x[0], y[0])


BATCH3_RT = ["+proj=putp2 +R=6371000", "+proj=putp3 +R=6371000",
             "+proj=putp3p +R=6371000", "+proj=putp4p +R=6371000",
             "+proj=weren +R=6371000", "+proj=putp5 +R=6371000",
             "+proj=putp5p +R=6371000", "+proj=putp6 +R=6371000",
             "+proj=putp6p +R=6371000", "+proj=mbt_fps +R=6371000",
             "+proj=mbtfpp +R=6371000", "+proj=mbtfpq +R=6371000"]


@pytest.mark.parametrize("pstr", BATCH3_RT)
def test_misc_sph3_roundtrip(pstr):
    rng = np.random.RandomState(41)
    lon = rng.uniform(-170, 170, 300)
    lat = rng.uniform(-80, 80, 300)
    tr = compile_projstring(pstr)
    x, y, _, _ = tr.transform_deg(lon, lat)
    lo, la, _, _ = tr.transform_deg(x, y, direction="inv")
    assert np.nanmax(np.abs(lo - lon)) < 1e-6
    assert np.nanmax(np.abs(la - lat)) < 1e-6


def test_oea_roundtrip_design_domain():
    """oea (oblated equal-area) is a continent-scale projection; the
    inverse is exact in the region around the center (the far field
    folds through the principal asin branch, as in the reference)."""
    tr = compile_projstring(
        "+proj=oea +R=6371000 +n=2 +m=1 +theta=30 +lat_0=40")
    rng = np.random.RandomState(41)
    lon = rng.uniform(-40, 40, 1000)
    lat = rng.uniform(10, 70, 1000)
    x, y, _, _ = tr.transform_deg(lon, lat)
    lo, la, _, _ = tr.transform_deg(x, y, direction="inv")
    assert np.nanmax(np.abs(lo - lon) + np.abs(la - lat)) < 1e-9


# --- batch 4: mod_ster family, lcca, ccon, rpoly, gstmerc --------------

GOLDENS4 = [
    ("+proj=alsk +ellps=clrk66", -160.0, 55.0, -513253.146950842, -968928.031867943),
    ("+proj=alsk +ellps=clrk66", -160.0, 70.0, -305001.133897637, 687494.464958651),
    ("+proj=gs48 +R=6370997", -119.0, 40.0, -1923908.446529346, 355874.658944479),
    ("+proj=gs48 +R=6370997", -70.0, 64.0, 1354020.375109298, 3040846.007866525),
    ("+proj=gs50 +ellps=clrk66", -160.0, 65.0, -1874628.537740233, 2660907.942291015),
    ("+proj=gs50 +ellps=clrk66", -130.0, 45.0, -771831.518853336, 48465.166491305),
    ("+proj=gstmerc +R=6400000", 2.0, 1.0, 223413.466406322, 111769.145040586),
    ("+proj=gstmerc +R=6400000", 2.0, -1.0, 223413.466406322, -111769.145040587),
    ("+proj=lcca +ellps=GRS80 +lat_0=1 +lat_1=0.5 +lat_2=2", 2.0, 1.0, 222605.285770237, 67.806007272),
    ("+proj=lcca +ellps=GRS80 +lat_0=1 +lat_1=0.5 +lat_2=2", 2.0, -1.0, 222740.037637937, -221125.539829602),
    ("+proj=lee_os +R=6400000", 2.0, 1.0, -25564478.952605054, 154490848.8286255),
    ("+proj=lee_os +R=6400000", 2.0, -1.0, 30115393.938574642, 125193997.43970197),
    ("+proj=mil_os +R=6400000", 2.0, 1.0, -1908527.949594205, -1726237.473061448),
    ("+proj=mil_os +R=6400000", 2.0, -1.0, -1916673.022918485, -1943133.888125523),
    ("+proj=rpoly +a=6400000", 2.0, 1.0, 223368.098302014, 111769.110486991),
    ("+proj=rpoly +a=6400000", 2.0, -1.0, 223368.098302014, -111769.110486991),
]


@pytest.mark.parametrize("pstr,lon,lat,ex,ey", GOLDENS4)
def test_misc_sph4_gie_golden(pstr, lon, lat, ex, ey):
    tr = compile_projstring(pstr)
    x, y, _, _ = tr.transform_deg(np.array([float(lon)]),
                                  np.array([float(lat)]))
    assert abs(x[0] - ex) < 1e-4 and abs(y[0] - ey) < 1e-4, (x[0], y[0])


BATCH4_RT = [
    ("+proj=mil_os +R=6378137", (-20, 60), (-20, 55)),
    ("+proj=lee_os +R=6378137", (165, 195), (-40, 20)),
    ("+proj=gs48 +R=6370997", (-125, -70), (25, 50)),
    ("+proj=alsk +ellps=clrk66", (-180, -130), (50, 72)),
    ("+proj=alsk +R=6370997", (-180, -130), (50, 72)),
    ("+proj=gs50 +ellps=clrk66", (-180, -65), (18, 72)),
    ("+proj=gs50 +R=6370997", (-180, -65), (18, 72)),
    ("+proj=lcca +ellps=GRS80 +lat_0=35", (-30, 30), (10, 60)),
    ("+proj=ccon +R=6371000 +lat_1=52", (-30, 30), (20, 80)),
    ("+proj=gstmerc +ellps=intl +lat_0=-21.116666667 "
     "+lon_0=55.53333333 +k_0=1", (50, 60), (-26, -16)),
]


@pytest.mark.parametrize("pstr,lons,lats", BATCH4_RT)
def test_misc_sph4_roundtrip(pstr, lons, lats):
    rng = np.random.RandomState(43)
    lon = rng.uniform(*lons, 300)
    lat = rng.uniform(*lats, 300)
    tr = compile_projstring(pstr)
    x, y, _, _ = tr.transform_deg(lon, lat)
    lo, la, _, _ = tr.transform_deg(x, y, direction="inv")
    dlon = np.abs((lo - lon + 180) % 360 - 180)
    assert np.nanmax(dlon) < 1e-7
    assert np.nanmax(np.abs(la - lat)) < 1e-7


# --- s2 cube-face projection + offset conversions ----------------------

S2_GOLDENS = [
    ("+proj=s2 +ellps=WGS84 +lat_0=0 +lon_0=0 +UVtoST=linear", 0.0, 0.0, 0.5, 0.5),
    ("+proj=s2 +ellps=WGS84 +lat_0=0 +lon_0=0 +UVtoST=linear", 0.0, 45.19242321598196, 0.5, 1.0),
    ("+proj=s2 +ellps=WGS84 +lat_0=0 +lon_0=0 +UVtoST=linear", 0.0, -45.19242321598196, 0.5, 0.0),
    ("+proj=s2 +ellps=WGS84 +lat_0=0 +lon_0=0 +UVtoST=linear", -45.0, 0.0, 0.0, 0.5),
    ("+proj=s2 +ellps=WGS84 +lat_0=0 +lon_0=0 +UVtoST=linear", 45.0, 0.0, 1.0, 0.5),
    ("+proj=s2 +ellps=WGS84 +lat_0=0 +lon_0=0 +UVtoST=linear", -45.0, -35.446011426401625, 0.0, 0.0),
    ("+proj=s2 +ellps=WGS84 +lat_0=0 +lon_0=0 +UVtoST=linear", 45.0, -35.446011426401625, 1.0, 0.0),
    ("+proj=s2 +ellps=WGS84 +lat_0=0 +lon_0=0 +UVtoST=linear", 45.0, 35.446011426401625, 1.0, 1.0),
]


@pytest.mark.parametrize("pstr,lon,lat,ex,ey", S2_GOLDENS)
def test_s2_projection_gie_golden(pstr, lon, lat, ex, ey):
    """s2.cpp (raw (s,t) output, PJ_IO_UNITS_PROJECTED)."""
    tr = compile_projstring(pstr)
    x, y, _, _ = tr.transform_deg(np.array([float(lon)]),
                                  np.array([float(lat)]))
    assert abs(x[0] - ex) < 1e-9 and abs(y[0] - ey) < 1e-9, (x[0], y[0])


@pytest.mark.parametrize("kind", ["linear", "quadratic", "tangent", "none"])
def test_s2_projection_roundtrip(kind):
    rng = np.random.RandomState(47)
    lon = rng.uniform(-40, 40, 500)
    lat = rng.uniform(-40, 40, 500)
    tr = compile_projstring(f"+proj=s2 +ellps=WGS84 +UVtoST={kind}")
    x, y, _, _ = tr.transform_deg(lon, lat)
    lo, la, _, _ = tr.transform_deg(x, y, direction="inv")
    assert np.nanmax(np.abs(lo - lon)) < 1e-9
    assert np.nanmax(np.abs(la - lat)) < 1e-9


def test_geogoffset_and_vertoffset_and_set():
    from proj_4_spark.proj import compile_projstring as C

    tr = C("+proj=geogoffset +ellps=GRS80 +dlon=3600 +dlat=-3600 +dh=10")
    lo, la, h, _ = tr.transform_deg(np.array([10.0]), np.array([50.0]),
                                    np.array([100.0]))
    assert abs(lo[0] - 11) < 1e-9 and abs(la[0] - 49) < 1e-9 \
        and abs(h[0] - 110) < 1e-9
    lo, la, h, _ = tr.transform_deg(lo, la, h, direction="inv")
    assert abs(lo[0] - 10) < 1e-9 and abs(h[0] - 100) < 1e-9

    tr = C("+proj=vertoffset +ellps=GRS80 +lat_0=46 +lon_0=13 "
           "+dh=11.0 +slope_lat=-0.3 +slope_lon=-0.1")
    lo, la, h, _ = tr.transform_deg(np.array([13.5]), np.array([46.5]),
                                    np.array([100.0]))
    assert abs(lo[0] - 13.5) < 1e-9  # lon/lat pass through
    assert h[0] != 100.0
    lo2, la2, h2, _ = tr.transform_deg(lo, la, h, direction="inv")
    assert abs(h2[0] - 100.0) < 1e-9

    tr = C("+proj=set +v_3=42")
    x, y, z, _ = tr.transform(np.array([1.0]), np.array([2.0]),
                              np.array([3.0]))
    assert (x[0], y[0], z[0]) == (1.0, 2.0, 42.0)


# --- Adams / Guyou / Peirce quincuncial family -------------------------

# sampled from the reference's dedicated gie files (guyou.gie,
# adams_*.gie, peirce_q.gie); those files quote expectations at
# centimeter precision, so compare at 6 mm
ADAMS_GOLDENS = [
    ("+proj=guyou +R=6370997", -89.3858632536, -85.7390309668, -671252.534, -11805089.168),
    ("+proj=guyou +R=6370997", -9.2490763384, -71.0229026677, -448842.813, -8910142.058),
    ("+proj=guyou +R=6370997", 70.3874078634, -56.919896657, 5230934.598, -9486837.736),
    ("+proj=guyou +R=6370997", -29.6345258809, -41.8794443052, -2831674.368, -5185997.953),
    ("+proj=guyou +R=6370997", 50.750905623, -27.8467488939, 5649446.347, -3807241.841),
    ("+proj=guyou +R=6370997", -49.8326118713, -12.2344952465, -5830239.587, -1625964.636),
    ("+proj=guyou +R=6370997", 30.3541137581, 0.7990141229, 3454411.853, 95128.412),
    ("+proj=guyou +R=6370997", -69.8245239316, 15.4247668791, -8603644.646, 2333402.982),
    ("+proj=guyou +R=6370997", 10.1908900667, 29.4473999043, 1055041.336, 3373090.24),
    ("+proj=guyou +R=6370997", -89.475732599, 43.2756199739, -11568961.17, 9589089.555),
    ("+proj=guyou +R=6370997", -9.1047501907, 59.4124031484, -649264.745, 7231297.403),
    ("+proj=guyou +R=6370997", 70.6228216997, 73.0662960367, 2561247.727, 10868246.628),
    ("+proj=adams_hemi +R=6370997", -89.9433443609, -87.0825895518, -2032451.307, -14670658.595),
    ("+proj=adams_hemi +R=6370997", -9.6128015323, -68.4874678083, -646826.577, -8904263.293),
    ("+proj=adams_hemi +R=6370997", 70.8357778632, -59.475124822, 5450054.504, -8962420.257),
    ("+proj=adams_hemi +R=6370997", -29.706584503, -42.3050919341, -2859905.278, -5199352.562),
    ("+proj=adams_hemi +R=6370997", 50.4426160267, -28.7604876417, 5473507.294, -3935831.832),
    ("+proj=adams_hemi +R=6370997", -49.2718060884, -12.0872143872, -5769460.92, -1657984.518),
    ("+proj=adams_hemi +R=6370997", 30.9157771281, 1.5084105801, 3524936.009, 181088.864),
    ("+proj=adams_hemi +R=6370997", -69.5919903841, 16.3857419518, -8573212.789, 2923178.6),
    ("+proj=adams_hemi +R=6370997", 10.4236001839, 31.4267077934, 1072418.207, 3612634.442),
    ("+proj=adams_hemi +R=6370997", -89.3631524858, 43.6013437171, -8456598.089, 8145902.918),
    ("+proj=adams_hemi +R=6370997", -9.9177724571, 59.095166226, -790135.18, 7330448.667),
    ("+proj=adams_hemi +R=6370997", 70.8431571594, 72.0862933562, 4145342.784, 10857384.689),
    ("+proj=adams_ws1 +R=6370997", -159.5146913398, -89.9552061084, -350717.162, -11748881.092),
    ("+proj=adams_ws1 +R=6370997", 0.8271647968, -69.2722085113, 38107.829, -5095338.557),
    ("+proj=adams_ws1 +R=6370997", 160.6088986258, -52.1795359483, 10009756.247, -4978006.469),
    ("+proj=adams_ws1 +R=6370997", -49.5480487278, -42.2232882391, -2682493.692, -2679394.683),
    ("+proj=adams_ws1 +R=6370997", 110.2074536086, -24.737125682, 6529985.921, -1741419.588),
    ("+proj=adams_ws1 +R=6370997", -99.9990872016, -15.4549241428, -5889334.034, -1034038.536),
    ("+proj=adams_ws1 +R=6370997", 60.7806464601, 1.9656672403, 3458637.676, 117050.207),
    ("+proj=adams_ws1 +R=6370997", -149.0300160729, 12.0779530345, -9393645.594, 925474.868),
    ("+proj=adams_ws1 +R=6370997", 10.8523072346, 31.6410734176, 591047.237, 1847096.134),
    ("+proj=adams_ws1 +R=6370997", 170.1397977064, 47.5954473956, 10925947.772, 4426508.24),
    ("+proj=adams_ws1 +R=6370997", -39.0306006434, 56.2379702434, -1998881.092, 3793906.979),
    ("+proj=adams_ws1 +R=6370997", 120.5528704261, 77.5805939292, 4968887.256, 8186300.038),
    ("+proj=adams_ws2 +R=6370997", -169.9316998581, -89.6983443874, -2757243.603, -13694037.516),
    ("+proj=adams_ws2 +R=6370997", 0.4315853824, -71.5575178388, 19979.237, -5441012.049),
    ("+proj=adams_ws2 +R=6370997", 170.5027767145, -51.5189598167, 9675637.514, -6026539.807),
    ("+proj=adams_ws2 +R=6370997", -29.1962960438, -42.8806359633, -1563179.016, -2646665.138),
    ("+proj=adams_ws2 +R=6370997", 140.5571385114, -23.627247594, 8905477.819, -2232473.683),
    ("+proj=adams_ws2 +R=6370997", -59.3174344116, -13.540030444, -3361462.25, -813740.055),
    ("+proj=adams_ws2 +R=6370997", 110.398614589, 5.0514461622, 6706729.32, 371990.508),
    ("+proj=adams_ws2 +R=6370997", -89.977306616, 16.3601816158, -5252963.299, 1091861.766),
    ("+proj=adams_ws2 +R=6370997", 80.554887202, 35.66988177, 4518398.282, 2388864.639),
    ("+proj=adams_ws2 +R=6370997", -119.3388991582, 43.6373394362, -6814813.949, 3556870.147),
    ("+proj=adams_ws2 +R=6370997", 50.1593218026, 61.5209991783, 2518306.294, 4378497.037),
    ("+proj=adams_ws2 +R=6370997", -149.063383649, 72.7063403889, -6827251.647, 7569191.962),
    ("+proj=peirce_q +R=6370997 +shape=square", -159.2003712209, -89.5537263306, -16684778.66, 16659858.26),
    ("+proj=peirce_q +R=6370997 +shape=square", -159.956389328, 71.5181717183, -1879442.18, 874815.08),
    ("+proj=peirce_q +R=6370997 +shape=diamond", -139.5485387788, -78.1437071317, -858427.3, 22617785.91),
    ("+proj=peirce_q +R=6370997 +shape=horizontal", -119.6070748182, -86.3003323104, 12170099.87, 203314.63),
    ("+proj=peirce_q +R=6370997 +shape=horizontal", -119.684493215, 73.8160145972, -13386255.49, 897126.81),
    ("+proj=peirce_q +R=6370997 +shape=horizontal +scrollx=0.75", -99.1733290138, -76.2249333909, 1519430.13, 245348.39),
    ("+proj=peirce_q +R=6370997 +shape=vertical", -79.2799350968, -83.869211803, -670454.3, 11939230.67),
    ("+proj=peirce_q +R=6370997 +shape=vertical", -79.758967297, 75.0775591038, -1642126.09, -12108950.91),
    ("+proj=peirce_q +R=6370997 +shape=vertical +scrolly=-0.25", -59.2065888779, -74.4787205556, -1491756.45, 888974.5),
    ("+proj=peirce_q +R=6370997 +shape=nhemisphere", -59.3247479059, 76.5851745566, -1288854.48, -764485.02),
    ("+proj=peirce_q +R=6370997 +shape=shemisphere", -39.4027491539, -73.669325879, -1160556.37, -1412792.72),
    ("+proj=peirce_q +shape=square", -135.0, -45.0, -16723842.30316008, -11424272.045841),
]


@pytest.mark.parametrize("pstr,lon,lat,ex,ey", ADAMS_GOLDENS)
def test_adams_family_gie_golden(pstr, lon, lat, ex, ey):
    tr = compile_projstring(pstr)
    x, y, _, _ = tr.transform_deg(np.array([float(lon)]),
                                  np.array([float(lat)]))
    assert abs(x[0] - ex) < 6e-3 and abs(y[0] - ey) < 6e-3, (x[0], y[0])


def test_adams_ws2_generic_inverse_roundtrip():
    """The reference only ships a Newton inverse for adams_ws2; our
    generic 2D Newton covers the mid-latitude domain."""
    tr = compile_projstring("+proj=adams_ws2 +R=6370997")
    rng = np.random.RandomState(53)
    lon = rng.uniform(-120, 120, 200)
    lat = rng.uniform(-60, 60, 200)
    x, y, _, _ = tr.transform_deg(lon, lat)
    lo, la, _, _ = tr.transform_deg(x, y, direction="inv")
    m = np.isfinite(lo)
    assert m.mean() > 0.9
    assert np.nanmax(np.abs(lo[m] - lon[m])) < 1e-6
    assert np.nanmax(np.abs(la[m] - lat[m])) < 1e-6


# --- interrupted variants: igh_o, imoll, imoll_o -----------------------

INTERRUPTED_GOLDENS = [
    ("+proj=igh_o +a=6400000", 2.0, 1.0, 223197.992883418, 111701.072127637),
    ("+proj=igh_o +a=6400000", 2.0, -1.0, 223708.371313058, -111701.072127637),
    ("+proj=igh_o +a=6400000", -2.0, 1.0, -223538.245169845, 111701.072127637),
    ("+proj=igh_o +a=6400000", -2.0, -1.0, -223027.866740205, -111701.072127637),
    ("+proj=igh_o +a=6400000", -140.0, 22.0, -15638150.097869191, 2457423.586808016),
    ("+proj=igh_o +a=6400000", 170.0, 70.0, 16560870.317293623, 7463176.386461447),
    ("+proj=imoll +a=6400000", 2.0, 1.0, -912080.2838111484, 124066.28343385954),
    ("+proj=imoll +a=6400000", 2.0, -1.0, -912174.7682896153, -124066.28343385954),
    ("+proj=imoll +a=6400000", -2.0, 1.0, -1314307.6810947747, 124066.28343385954),
    ("+proj=imoll +a=6400000", -2.0, -1.0, -1314402.165573242, -124066.28343385954),
    ("+proj=imoll +a=6400000", -39.99, 0.1, -5135117.070745013, 12406.8672748194),
    ("+proj=imoll +a=6400000", -40.01, 0.1, -5137140.677694758, 12406.8672748194),
    ("+proj=imoll_o +a=6400000", 2.0, 1.0, -1357849.196080366, 124066.28343385954),
    ("+proj=imoll_o +a=6400000", 2.0, -1.0, -1357565.7426449617, -124066.28343385954),
    ("+proj=imoll_o +a=6400000", -2.0, 1.0, -1760076.5933639924, 124066.28343385954),
    ("+proj=imoll_o +a=6400000", -2.0, -1.0, -1759793.1399285884, -124066.28343385954),
    ("+proj=imoll_o +a=6400000", -89.99, 0.1, -10608821.988700796, 12406.8672748194),
    ("+proj=imoll_o +a=6400000", -90.01, 0.1, -10610845.595650543, 12406.8672748194),
]


@pytest.mark.parametrize("pstr,lon,lat,ex,ey", INTERRUPTED_GOLDENS)
def test_interrupted_gie_golden(pstr, lon, lat, ex, ey):
    tr = compile_projstring(pstr)
    x, y, _, _ = tr.transform_deg(np.array([float(lon)]),
                                  np.array([float(lat)]))
    assert abs(x[0] - ex) < 1e-4 and abs(y[0] - ey) < 1e-4, (x[0], y[0])


@pytest.mark.parametrize("pstr", ["+proj=igh_o +a=6400000",
                                  "+proj=imoll +a=6400000",
                                  "+proj=imoll_o +a=6400000"])
def test_interrupted_roundtrip(pstr):
    """Globe-wide through the per-zone inverse with the seam-matched
    x offsets and validity gates."""
    rng = np.random.RandomState(59)
    lon = rng.uniform(-179, 179, 2000)
    lat = rng.uniform(-85, 85, 2000)
    tr = compile_projstring(pstr)
    x, y, _, _ = tr.transform_deg(lon, lat)
    lo, la, _, _ = tr.transform_deg(x, y, direction="inv")
    assert np.nanmax(np.abs(lo - lon)) < 1e-9
    assert np.nanmax(np.abs(la - lat)) < 1e-9
    assert np.isnan(lo).mean() == 0.0


# --- calcofi, col_urban, xyzgridshift ---------------------------------

def test_calcofi_gie_golden():
    """builtins.gie calcofi block: line/station units (no a scale)."""
    tr = compile_projstring("+proj=calcofi +ellps=GRS80")
    x, y, _, _ = tr.transform_deg(np.array([2.0, -2.0]),
                                  np.array([1.0, -1.0]))
    assert abs(x[0] - 508.44487215) < 1e-6
    assert abs(y[0] + 1171.764860418) < 1e-6
    assert abs(x[1] - 507.369719137) < 1e-6
    assert abs(y[1] + 1106.178201483) < 1e-6
    lo, la, _, _ = tr.transform_deg(np.array([200.0]), np.array([100.0]),
                                    direction="inv")
    assert abs(lo[0] + 110.363307925) < 1e-6
    assert abs(la[0] - 12.032056976) < 1e-6


def test_calcofi_roundtrip():
    tr = compile_projstring("+proj=calcofi +ellps=GRS80")
    rng = np.random.RandomState(61)
    lon = rng.uniform(-130, -110, 300)
    lat = rng.uniform(28, 40, 300)
    x, y, _, _ = tr.transform_deg(lon, lat)
    lo, la, _, _ = tr.transform_deg(x, y, direction="inv")
    assert np.nanmax(np.abs(lo - lon)) < 1e-9
    assert np.nanmax(np.abs(la - lat)) < 1e-9


def test_col_urban_bogota_roundtrip():
    """EPSG Colombia Urban (Bogota parameters); the reference inverse
    is the approximate EPSG GN 7-2 formula (~0.3 mm)."""
    tr = compile_projstring(
        "+proj=col_urban +ellps=GRS80 +lat_0=4.68048611111111 "
        "+lon_0=-74.1465916666667 +h_0=2550 "
        "+x_0=92334.879 +y_0=109320.965")
    rng = np.random.RandomState(67)
    lon = rng.uniform(-74.3, -74.0, 200)
    lat = rng.uniform(4.5, 4.9, 200)
    x, y, _, _ = tr.transform_deg(lon, lat)
    lo, la, _, _ = tr.transform_deg(x, y, direction="inv")
    assert np.nanmax(np.abs(lo - lon)) < 1e-8
    assert np.nanmax(np.abs(la - lat)) < 1e-8


def test_xyzgridshift_roundtrip():
    """cart-fused 3D grid shift with a synthetic (dx,dy,dz) grid:
    direct forward, iterative inverse (xyzgridshift.cpp)."""
    from proj_4_spark import proj as P
    from proj_4_spark.kernels.gridshift import Grid

    n = 41
    lonr = np.linspace(np.radians(-10), np.radians(30), n)
    latr = np.linspace(np.radians(35), np.radians(70), n)
    LO, LA = np.meshgrid(lonr, latr)
    vals = np.stack([2.0 + np.sin(LO), -1.5 + np.cos(LA),
                     0.5 + np.sin(LO + LA)], axis=-1)
    P.GRID_REGISTRY["test_xyz"] = Grid(
        lon0=float(lonr[0]), lat0=float(latr[0]),
        dlon=float(lonr[1] - lonr[0]), dlat=float(latr[1] - latr[0]),
        values=vals)
    tr = compile_projstring(
        "+proj=pipeline +step +proj=cart +ellps=GRS80 "
        "+step +proj=xyzgridshift +ellps=GRS80 +grids=test_xyz")
    rng = np.random.RandomState(71)
    lon = rng.uniform(-5, 25, 200)
    lat = rng.uniform(40, 65, 200)
    X, Y, Z, _ = tr.transform_deg(lon, lat, np.zeros(200))
    tr0 = compile_projstring("+proj=cart +ellps=GRS80")
    X0, _, _, _ = tr0.transform_deg(lon, lat, np.zeros(200))
    assert 1.0 < np.nanmin(X - X0) and np.nanmax(X - X0) < 3.0  # ~2+sin
    lo, la, h, _ = tr.transform_deg(X, Y, Z, direction="inv")
    assert np.nanmax(np.abs(lo - lon)) < 1e-10
    assert np.nanmax(np.abs(la - lat)) < 1e-10
    assert np.nanmax(np.abs(h)) < 1e-5


# --- labrd (Laborde Madagascar) + bipc (bipolar conic) -----------------

GOLDENS7 = [
    ("+proj=bipc +ellps=GRS80", 2.0, 1.0, 2452160.217725756, -14548450.759654747),
    ("+proj=bipc +ellps=GRS80", 2.0, -1.0, 2447915.213725341, -14763427.21279873),
    ("+proj=bipc +ellps=GRS80", -2.0, 1.0, 2021695.522934909, -14540413.695283702),
    ("+proj=bipc +ellps=GRS80", -2.0, -1.0, 2018090.503004699, -14755620.651414108),
    ("+proj=labrd +ellps=GRS80 +lon_0=0.5 +lat_0=2", 2.0, 1.0, 166973.166090228, -110536.912730266),
    ("+proj=labrd +ellps=GRS80 +lon_0=0.5 +lat_0=2", 2.0, -1.0, 166973.168287157, -331761.993650884),
    ("+proj=labrd +ellps=GRS80 +lon_0=0.5 +lat_0=2", -2.0, 1.0, -278345.500519976, -110469.032642032),
    ("+proj=labrd +ellps=GRS80 +lon_0=0.5 +lat_0=2", -2.0, -1.0, -278345.50418527, -331829.870790275),
]


@pytest.mark.parametrize("pstr,lon,lat,ex,ey", GOLDENS7)
def test_labrd_bipc_gie_golden(pstr, lon, lat, ex, ey):
    tr = compile_projstring(pstr)
    x, y, _, _ = tr.transform_deg(np.array([float(lon)]),
                                  np.array([float(lat)]))
    assert abs(x[0] - ex) < 1e-4 and abs(y[0] - ey) < 1e-4, (x[0], y[0])


def test_labrd_roundtrip():
    """Laborde over Madagascar; the reference inverse is a truncated
    series (~1e-7 deg)."""
    tr = compile_projstring("+proj=labrd +ellps=intl +lat_0=-18.9 "
                            "+lon_0=46.43722917 +azi=18.9 +k_0=0.9995")
    rng = np.random.RandomState(73)
    lon = rng.uniform(43, 51, 300)
    lat = rng.uniform(-26, -11, 300)
    x, y, _, _ = tr.transform_deg(lon, lat)
    lo, la, _, _ = tr.transform_deg(x, y, direction="inv")
    assert np.nanmax(np.abs(lo - lon)) < 1e-6
    assert np.nanmax(np.abs(la - lat)) < 1e-6


def test_bipc_partial_roundtrip():
    """The REFERENCE's bipc forward folds with pow(al, n)
    (bipc.cpp:92-96) while its inverse unfolds with pow(tan(al), n)
    (:146) — an inconsistency we mirror faithfully (the gie goldens
    above pin the forward).  Points outside the fold correction
    roundtrip exactly; the folded region carries the reference's own
    fwd/inv disagreement."""
    tr = compile_projstring("+proj=bipc +R=6370997")
    rng = np.random.RandomState(73)
    lon = rng.uniform(-110, -30, 2000)
    lat = rng.uniform(-50, 60, 2000)
    x, y, _, _ = tr.transform_deg(lon, lat)
    lo, la, _, _ = tr.transform_deg(x, y, direction="inv")
    err = np.abs(lo - lon) + np.abs(la - lat)
    assert np.mean(err < 1e-6) > 0.6
    assert np.nanmax(err) < 5.0


# --- imw_p + chamb -----------------------------------------------------

GOLDENS8 = [
    ("+proj=imw_p +ellps=GRS80 +lat_1=0.5 +lat_2=2", 2.0, 1.0, 222588.441139376, 55321.12865381),
    ("+proj=imw_p +ellps=GRS80 +lat_1=0.5 +lat_2=2", 2.0, -1.0, 222756.906377687, -165827.584288324),
    ("+proj=imw_p +ellps=GRS80 +lat_1=0.5 +lat_2=2", -2.0, 1.0, -222588.441139376, 55321.12865381),
    ("+proj=imw_p +ellps=GRS80 +lat_1=0.5 +lat_2=2", -2.0, -1.0, -222756.906377687, -165827.584288324),
    ("+proj=chamb +R=6400000 +lat_1=0.5 +lat_2=2", 2.0, 1.0, -27864.779586801, -223364.324593274),
    ("+proj=chamb +R=6400000 +lat_1=0.5 +lat_2=2", 2.0, -1.0, -251312.283053493, -223402.145526208),
    ("+proj=chamb +R=6400000 +lat_1=0.5 +lat_2=2", -2.0, 1.0, -27864.785649105, 223364.327328827),
    ("+proj=chamb +R=6400000 +lat_1=0.5 +lat_2=2", -2.0, -1.0, -251312.289116443, 223402.142197287),
]


@pytest.mark.parametrize("pstr,lon,lat,ex,ey", GOLDENS8)
def test_imw_p_chamb_gie_golden(pstr, lon, lat, ex, ey):
    tr = compile_projstring(pstr)
    x, y, _, _ = tr.transform_deg(np.array([float(lon)]),
                                  np.array([float(lat)]))
    assert abs(x[0] - ex) < 1e-4 and abs(y[0] - ey) < 1e-4, (x[0], y[0])


def test_imw_p_roundtrip():
    """IMW polyconic through the reference's alternating secant
    inverse (tol 1e-10 plane units ~ 1e-8 deg)."""
    tr = compile_projstring("+proj=imw_p +ellps=GRS80 +lat_1=30 +lat_2=60")
    rng = np.random.RandomState(79)
    lon = rng.uniform(-30, 30, 300)
    lat = rng.uniform(10, 75, 300)
    x, y, _, _ = tr.transform_deg(lon, lat)
    lo, la, _, _ = tr.transform_deg(x, y, direction="inv")
    assert np.nanmax(np.abs(lo - lon)) < 1e-7
    assert np.nanmax(np.abs(la - lat)) < 1e-7
    assert np.isnan(lo).mean() == 0.0


def test_chamb_control_point_exact():
    """Each control point maps to its precomputed plane position."""
    tr = compile_projstring("+proj=chamb +R=6400000 +lat_1=10 +lon_1=-20 "
                            "+lat_2=40 +lon_2=20 +lat_3=-10 +lon_3=40")
    x, y, _, _ = tr.transform_deg(np.array([-20.0, 20.0, 40.0]),
                                  np.array([10.0, 40.0, -10.0]))
    assert np.all(np.isfinite(x)) and np.all(np.isfinite(y))


# --- rouss, molobadekas, geocent, bertin1953 ---------------------------

GOLDENS10 = [
    ("+proj=rouss +ellps=GRS80", 2.0, 1.0, 222644.894131617, 110611.09186837),
    ("+proj=rouss +ellps=GRS80", 2.0, -1.0, 222644.894131617, -110611.09186837),
    ("+proj=rouss +ellps=GRS80", -2.0, 1.0, -222644.894131617, 110611.09186837),
    ("+proj=rouss +ellps=GRS80", -2.0, -1.0, -222644.894131617, -110611.09186837),
]


@pytest.mark.parametrize("pstr,lon,lat,ex,ey", GOLDENS10)
def test_rouss_gie_golden(pstr, lon, lat, ex, ey):
    tr = compile_projstring(pstr)
    x, y, _, _ = tr.transform_deg(np.array([float(lon)]),
                                  np.array([float(lat)]))
    assert abs(x[0] - ex) < 1e-4 and abs(y[0] - ey) < 1e-4, (x[0], y[0])


def test_rouss_roundtrip_near_center():
    """Roussilhe's fwd/inv are both truncated series; exact near the
    center (the projection's design domain)."""
    tr = compile_projstring("+proj=rouss +ellps=GRS80 +lat_0=45")
    rng = np.random.RandomState(83)
    lon = rng.uniform(-2, 2, 300)
    lat = rng.uniform(43, 47, 300)
    x, y, _, _ = tr.transform_deg(lon, lat)
    lo, la, _, _ = tr.transform_deg(x, y, direction="inv")
    assert np.nanmax(np.abs(lo - lon)) < 1e-7
    assert np.nanmax(np.abs(la - lat)) < 1e-7


def test_molobadekas_gie_fixture():
    """more_builtins.gie:464-471 (1 cm tolerance, roundtrip 1)."""
    tr = compile_projstring(
        "+proj=molobadekas +convention=coordinate_frame "
        "+x=-270.933 +y=115.599 +z=-360.226 +rx=-5.266 +ry=-1.238 "
        "+rz=2.381 +s=-5.109 +px=2464351.59 +py=-5783466.61 +pz=974809.81")
    X, Y, Z, _ = tr.transform(np.array([2550408.96]),
                              np.array([-5749912.26]),
                              np.array([1054891.11]))
    assert abs(X[0] - 2550138.45) < 0.01
    assert abs(Y[0] + 5749799.87) < 0.01
    assert abs(Z[0] - 1054530.82) < 0.01
    Xi, Yi, Zi, _ = tr.transform(X, Y, Z, direction="inv")
    assert abs(Xi[0] - 2550408.96) < 0.01


def test_bertin1953_gie_fixture():
    """more_builtins.gie:88-94."""
    tr = compile_projstring("+proj=bertin1953 +R=1")
    x, y, _, _ = tr.transform_deg(np.array([0.0, 16.5]),
                                  np.array([0.0, 42.0]))
    assert abs(x[0] + 0.260206554508) < 1e-9
    assert abs(y[0] + 0.685226058142) < 1e-9
    assert abs(x[1]) < 1e-9 and abs(y[1]) < 1e-9


def test_geocent_is_cart_alias():
    """+proj=geocent converts geodetic->geocentric exactly like cart
    (the effective cs2cs semantics of the geocent marker; the bare
    conversion in conversions/geocent.cpp is a unit-tag passthrough
    that the 4D API backs with the same cart machinery)."""
    tr = compile_projstring("+proj=geocent +ellps=GRS80")
    tr2 = compile_projstring("+proj=cart +ellps=GRS80")
    a = tr.transform_deg(np.array([10.0]), np.array([50.0]),
                         np.array([100.0]))
    b = tr2.transform_deg(np.array([10.0]), np.array([50.0]),
                          np.array([100.0]))
    for u, v in zip(a[:3], b[:3]):
        assert abs(u[0] - v[0]) < 1e-9


# --- spilhaus ----------------------------------------------------------

# sampled from the reference's spilhaus.gie (expectations quantized to
# ~meter grid corners -> 1 m tolerance)
SPILHAUS_GOLDENS = [
    ("+proj=spilhaus", -170.0, -80.0, 437478.9752, -2678050.3019),
    ("+proj=spilhaus", -121.0, -50.0, 861573.2313, -5086159.8537),
    ("+proj=spilhaus", -72.0, -20.0, -1486391.8298, -11562191.5568),
    ("+proj=spilhaus", -23.0, 10.0, -5706896.4172, 2337607.2418),
    ("+proj=spilhaus", 26.0, 40.0, -3067668.6963, 4947317.2297),
    ("+proj=spilhaus", 75.0, 70.0, -2680263.1124, 8214231.722),
    ("+proj=spilhaus", 173.0, -80.0, 497943.3567, -2503256.4284),
    ("+proj=spilhaus +k_0=1.4142135623730951", 84.55256518, -37.93882855, 1171875.0, 703125.0),
    ("+proj=spilhaus +k_0=1.4142135623730951", -83.61985956, -31.09509756, -1796875.0, -11796875.0),
    ("+proj=spilhaus +k_0=1.4142135623730951", -64.99929833, -30.00238885, -15390625.0, -15546875.0),
]


@pytest.mark.parametrize("pstr,lon,lat,ex,ey", SPILHAUS_GOLDENS)
def test_spilhaus_gie_golden(pstr, lon, lat, ex, ey):
    tr = compile_projstring(pstr)
    x, y, _, _ = tr.transform_deg(np.array([float(lon)]),
                                  np.array([float(lat)]))
    assert abs(x[0] - ex) < 1.0 and abs(y[0] - ey) < 1.0, (x[0], y[0])


def test_spilhaus_roundtrip():
    """World ocean map through adams_ws2's seeded Newton inverse; the
    reference's own seed is 'very rough, especially at high northings'
    so a small fraction near the square's corners/seams does not
    converge to the principal branch."""
    tr = compile_projstring("+proj=spilhaus +ellps=WGS84")
    rng = np.random.RandomState(89)
    lon = rng.uniform(-170, 170, 2000)
    lat = rng.uniform(-80, 80, 2000)
    x, y, _, _ = tr.transform_deg(lon, lat)
    lo, la, _, _ = tr.transform_deg(x, y, direction="inv")
    dlon = np.abs((lo - lon + 180) % 360 - 180)
    err = dlon + np.abs(la - lat)
    assert np.mean(err < 1e-6) > 0.9


def test_adams_ws2_seeded_inverse_globe():
    """The seeded Newton (adams.cpp adams_inverse) widens the
    generic-inverse domain to most of the globe."""
    tr = compile_projstring("+proj=adams_ws2 +R=6370997")
    rng = np.random.RandomState(97)
    lon = rng.uniform(-175, 175, 1000)
    lat = rng.uniform(-85, 85, 1000)
    x, y, _, _ = tr.transform_deg(lon, lat)
    lo, la, _, _ = tr.transform_deg(x, y, direction="inv")
    err = np.abs(lo - lon) + np.abs(la - lat)
    assert np.mean(err < 1e-6) > 0.8  # rough seed, per the reference


# --- sch (SAR spherical cross-track height) ----------------------------

def test_sch_cs2cs_fixtures():
    """test_cs2cs_various.yaml:907-934 forward + inverse points."""
    tr = compile_projstring("+proj=sch +ellps=WGS84 +plat_0=30.0 "
                            "+plon_0=45.0 +phdg_0=-12.0")
    lon = np.array([0.0, 45.0, 45.1, 44.9, 30.0])
    lat = np.array([0.0, 45.0, 44.9, 45.1, 45.0])
    x, y, z, _ = tr.transform_deg(lon, lat, np.zeros(5))
    exp = [(-1977112.0305592, 5551475.1418378, 6595.7256583),
           (1630035.5650122, -342353.6396475, 128.3445654),
           (1617547.4295637, -347855.9734973, 125.4645102),
           (1642526.7453121, -336878.8571851, 131.3265616),
           (1974596.2356203, 787409.8217445, 773.0028577)]
    for i, (ex, ey, ez) in enumerate(exp):
        assert abs(x[i] - ex) < 1e-3
        assert abs(y[i] - ey) < 1e-3
        assert abs(z[i] - ez) < 1e-3
    lo, la, h, _ = tr.transform_deg(np.array([0.0]), np.array([0.0]),
                                    np.array([2.0]), direction="inv")
    assert abs(lo[0] - 45) < 1e-6
    assert abs(la[0] - 30) < 1e-6
    assert abs(h[0] - 2) < 1e-6


def test_sch_roundtrip_with_height():
    tr = compile_projstring("+proj=sch +plat_0=30 +plon_0=-100 "
                            "+phdg_0=45 +ellps=WGS84")
    rng = np.random.RandomState(91)
    lon = rng.uniform(-110, -90, 300)
    lat = rng.uniform(20, 40, 300)
    h = rng.uniform(0, 10000, 300)
    x, y, z, _ = tr.transform_deg(lon, lat, h)
    lo, la, hh, _ = tr.transform_deg(x, y, z, direction="inv")
    assert np.nanmax(np.abs(lo - lon)) < 1e-9
    assert np.nanmax(np.abs(la - lat)) < 1e-9
    assert np.nanmax(np.abs(hh - h)) < 1e-5


def test_sch_missing_args():
    with pytest.raises(ValueError):
        compile_projstring("+proj=sch +ellps=WGS84 +plat_0=30")


# --- isea (Icosahedral Snyder Equal Area, plane mode) ------------------

ISEA_GOLDENS = [
    ("+proj=isea +a=6400000", 2.0, 1.0, -1097074.9481534758, 3442909.3097474533),
    ("+proj=isea +a=6400000", 2.0, -1.0, -1097074.948149705, 3233611.728292401),
    ("+proj=isea +a=6400000", -2.0, 1.0, -1575486.3537757862, 3442168.3427360635),
    ("+proj=isea +a=6400000", -2.0, -1.0, -1575486.3537720195, 3234352.69531021),
    ("+proj=isea +R=6371007.18091875", -168.75, 58.282525588539, -19186144.87084202, 3323137.7719445243),
    ("+proj=isea +R=6371007.18091875", 11.25, 58.282525588539, -15348915.896747919, 9969413.315350907),
    ("+proj=isea +R=6371007.18091875", -110.0, 54.0, -15321401.505530974, 3338358.8590940563),
    ("+proj=isea +R=6371007.18091875", -75.0, 45.0, -12774358.709073609, 4373188.646695702),
    ("+proj=isea +R=6371007.18091875", 2.0, 49.0, -642252.9393470988, 8796229.00914376),
    ("+proj=isea +R=6371007.18091875", 0.0, 0.0, -1331454.0746232667, 3323137.771634855),
    ("+proj=isea +R=6371007.18091875", 90.0, 0.0, 8564460.63910087, 593869.2974855418),
    ("+proj=isea +R=6371007.18091875", 0.0, 45.0, -837334.699958428, 8323409.759132192),
    ("+proj=isea +R=6371007.18091875 +orient=pole", -168.75, 58.282525588539, -16702163.549901897, 6386395.630649689),
    ("+proj=isea +R=6371007.18091875 +orient=pole", 11.25, 58.282525588539, 619648.6465317447, 6212947.536539182),
    ("+proj=isea +R=6371007.18091875 +orient=pole", -110.0, 54.0, -13285649.857057726, 6149501.348902118),
    ("+proj=isea +R=6371007.18091875 +orient=pole", -75.0, 45.0, -7921366.529368571, 4728387.055336074),
    ("+proj=isea +R=6371007.18091875 +orient=pole", 2.0, 49.0, 152616.43499930768, 5152048.791301283),
    ("+proj=isea +R=6371007.18091875 +orient=pole", 0.0, 0.0, 0.0, -195097.13364071414),
    ("+proj=isea +R=6371007.18091875 +orient=pole", 90.0, 0.0, 9593072.435467452, 0.0),
    ("+proj=isea +R=6371007.18091875 +orient=pole", 0.0, 45.0, 0.0, 4726854.7703394275),
]


@pytest.mark.parametrize("pstr,lon,lat,ex,ey", ISEA_GOLDENS)
def test_isea_gie_golden(pstr, lon, lat, ex, ey):
    tr = compile_projstring(pstr)
    x, y, _, _ = tr.transform_deg(np.array([float(lon)]),
                                  np.array([float(lat)]))
    assert abs(x[0] - ex) < 2.5e-4 and abs(y[0] - ey) < 2.5e-4, (x[0], y[0])


def test_isea_global_coverage():
    """Every point lands on exactly one icosahedron face."""
    tr = compile_projstring("+proj=isea +R=6371007.18091875")
    rng = np.random.RandomState(101)
    lon = rng.uniform(-180, 180, 5000)
    lat = rng.uniform(-89.9, 89.9, 5000)
    x, y, _, _ = tr.transform_deg(lon, lat)
    assert np.isnan(x).mean() == 0.0


# --- airocean (Fuller Dymaxion) ----------------------------------------

AIROCEAN_GOLDENS = [
    # builtins.gie:1187+ (+proj=airocean +ellps=GRS80, tol 0.1 mm)
    (23.0, 28.0, 13572113.73386754, 23493648.55327798),
    (71.0, 46.0, 9714915.991790695, 23488176.361173604),
    (147.0, 75.0, 7723484.49359606, 20087141.837650128),
    (-77.0, 61.0, 9679376.816000767, 16802749.593532257),
    (-26.0, 35.0, 15458567.83864155, 20091165.592037637),
    (29.0, -13.0, 15471813.400558881, 26802282.415074058),
    (71.0, -25.0, 9737210.823606653, 30219178.19260869),
    (97.0, 10.0, 7670302.042847798, 26816601.848991044),
    (169.0, 35.0, 3883710.702444233, 20135415.72144515),
    (-151.0, 13.0, 3859776.9744116343, 13387384.422000753),
    (-109.0, 24.0, 7674343.074326526, 13366009.083146008),
    (-84.0, -9.0, 9673007.441581018, 10144952.26955531),
    (-42.0, -4.0, 13562062.520622183, 10107761.706502315),
    (-11.0, -34.0, 13627060.52678455, 3383645.5697278716),
    (155.0, -35.0, 1873264.8705730252, 30211340.763352156),
    (-158.0, -28.0, 1871227.8450291778, 10115901.323020123),
    (-109.0, -46.0, 7708744.672461299, 6722251.06988263),
    (-36.0, -75.0, 9665810.798055789, 3381177.9821538515),
    (98.0, -49.0, 4806946.337586326, 33007546.454859577),
    (114.0, -72.0, 7708905.600709579, 1101689.019137724),
    (143.0, -9.0, 3219027.0687154396, 27948068.75709961),
    (123.0, 7.0, 5239165.493429321, 26821978.017945066),
    (147.0, 16.0, 2635947.740851659, 22373572.978527334),
]

AIROCEAN_INV_GOLDENS = [
    # builtins.gie direction inverse block
    (13600000.0, 23500000.0, 22.77346472511832, 27.745464601997153),
    (9700000.0, 23500000.0, 71.26673004703193, 45.89205035111361),
    (7700000.0, 20100000.0, 146.99339940860168, 74.69909794660227),
    (9700000.0, 16800000.0, -76.55528563752168, 60.90966578454296),
    (15500000.0, 20100000.0, -26.125789701735282, 34.531335035632864),
    (15500000.0, 26800000.0, 28.72566754254401, -13.176397846758185),
    (9700000.0, 30200000.0, 71.49135806675328, -24.84162689595362),
    (7700000.0, 26800000.0, 96.67476470896398, 10.214265110489109),
    (3900000.0, 20100000.0, 169.4467058181239, 35.245717462371594),
    (3900000.0, 13400000.0, -150.6222299120939, 13.304599775998279),
    (7700000.0, 13400000.0, -108.74281284723317, 24.422067806064522),
    (9700000.0, 10100000.0, -83.65325201216521, -9.486900253798344),
    (13600000.0, 10100000.0, -41.56143010477453, -4.013493146314863),
    (13600000.0, 3400000.0, -11.279582965366556, -34.27261608163502),
]

AIROCEAN_HORIZ_GOLDENS = [
    # builtins.gie:1289+ (+orient=horizontal +ellps=GRS80, tol 0.1 mm)
    (23.0, 28.0, 13391387.087562159, 13572113.73386754),
    (71.0, 46.0, 13396859.279666536, 9714915.991790695),
    (147.0, 75.0, 16797893.80319001, 7723484.49359606),
    (-77.0, 61.0, 20082286.04730788, 9679376.816000767),
    (-26.0, 35.0, 16793870.048802502, 15458567.83864155),
    (29.0, -13.0, 10082753.22576608, 15471813.400558881),
    (71.0, -25.0, 6665857.448231446, 9737210.823606653),
    (97.0, 10.0, 10068433.791849095, 7670302.042847798),
    (169.0, 35.0, 16749619.919394989, 3883710.702444233),
    (-151.0, 13.0, 23497651.218839385, 3859776.9744116343),
    (-109.0, 24.0, 23519026.557694133, 7674343.074326526),
    (-84.0, -9.0, 26740083.371284828, 9673007.441581018),
    (-42.0, -4.0, 26777273.934337825, 13562062.520622183),
    (-11.0, -34.0, 33501390.07111227, 13627060.52678455),
    (155.0, -35.0, 6673694.877487984, 1873264.8705730252),
    (-158.0, -28.0, 26769134.317820016, 1871227.8450291778),
    (-109.0, -46.0, 30162784.570957504, 7708744.672461299),
    (-36.0, -75.0, 33503857.658686288, 9665810.798055789),
    (98.0, -49.0, 3877489.1859805635, 4806946.337586326),
]


@pytest.mark.parametrize("lon,lat,ex,ey", AIROCEAN_GOLDENS)
def test_airocean_gie_golden(lon, lat, ex, ey):
    tr = compile_projstring("+proj=airocean +ellps=GRS80")
    x, y, _, _ = tr.transform_deg(np.array([lon]), np.array([lat]))
    assert abs(x[0] - ex) < 1e-4 and abs(y[0] - ey) < 1e-4, (x[0], y[0])


@pytest.mark.parametrize("x,y,elon,elat", AIROCEAN_INV_GOLDENS)
def test_airocean_gie_inverse(x, y, elon, elat):
    tr = compile_projstring("+proj=airocean +ellps=GRS80")
    lon, lat, _, _ = tr.transform_deg(np.array([x]), np.array([y]),
                                      direction="inv")
    assert abs(lon[0] - elon) < 1e-9 and abs(lat[0] - elat) < 1e-9


@pytest.mark.parametrize("lon,lat,ex,ey", AIROCEAN_HORIZ_GOLDENS)
def test_airocean_horizontal_golden(lon, lat, ex, ey):
    tr = compile_projstring("+proj=airocean +orient=horizontal +ellps=GRS80")
    x, y, _, _ = tr.transform_deg(np.array([lon]), np.array([lat]))
    assert abs(x[0] - ex) < 1e-4 and abs(y[0] - ey) < 1e-4, (x[0], y[0])


def test_airocean_roundtrip():
    tr = compile_projstring("+proj=airocean +ellps=GRS80")
    rng = np.random.RandomState(7)
    lon = rng.uniform(-179.5, 179.5, 2000)
    lat = rng.uniform(-89.5, 89.5, 2000)
    x, y, _, _ = tr.transform_deg(lon, lat)
    assert np.isnan(x).sum() == 0  # 23 faces tile the sphere
    rl, rp, _, _ = tr.transform_deg(x, y, direction="inv")
    dl = np.abs((rl - lon + 180.0) % 360.0 - 180.0)
    assert np.nanmax(dl) < 1e-9 and np.nanmax(np.abs(rp - lat)) < 1e-9


def test_airocean_sphere_and_orient_reject():
    tr = compile_projstring("+proj=airocean +R=6371000")
    x, y, _, _ = tr.transform_deg(np.array([23.0]), np.array([28.0]))
    assert np.isfinite(x[0]) and np.isfinite(y[0])
    with pytest.raises(ValueError):
        compile_projstring("+proj=airocean +orient=diagonal +ellps=GRS80")
