"""Registry completeness sweep: every PROJ_HEAD id from the
reference's src/pj_list.h:9-200 must compile and produce finite output
on at least part of a world grid (operations with restricted domains
— perspective, polar, bounded nets — are asserted against a lower
coverage floor).  Grid-backed transformations get synthetic registry
entries."""

import json

import numpy as np
import pytest

import proj_4_spark.proj as P
from proj_4_spark.proj import compile_projstring

R = "+R=6371000"
E = "+ellps=GRS80"

# params needed beyond the bare +proj=<id> (reference defaults or the
# op's required arguments)
PARAMS = {
    "aea": f"+lat_1=29.5 +lat_2=45.5 {E}",
    "bonne": f"+lat_1=60 {R}",
    "ccon": f"+lat_1=52 {R}",
    "chamb": f"+lat_1=22 +lon_1=0 +lat_2=22 +lon_2=45 +lat_3=22 +lon_3=22.5 {R}",
    "eqdc": f"+lat_1=55 +lat_2=60 {E}",
    "euler": f"+lat_1=67 +lat_2=75 {R}",
    "geos": f"+h=35785831 {E}",
    "gn_sinu": f"+m=2 +n=3 {R}",
    "imw_p": f"+lat_1=30 +lat_2=60 {E}",
    "labrd": f"+lon_0=46.437229 +lat_0=-18.9 {E}",
    "lcc": f"+lat_1=33 +lat_2=45 {E}",
    "lcca": f"+lat_0=35 {E}",
    "leac": f"+lat_1=45 {E}",
    # krovak forces Bessel internally but the framework's inverse 1/a
    # keeps the user ellipsoid (reference init.cpp:584 vs :791) — only
    # the canonical +ellps=bessel usage roundtrips
    "krovak": "+ellps=bessel",
    "mod_krovak": "+ellps=bessel",
    "lsat": f"+lsat=2 +path=2 {E}",
    "misrsom": f"+path=1 {E}",
    "murd1": f"+lat_1=30 +lat_2=50 {R}",
    "murd2": f"+lat_1=30 +lat_2=50 {R}",
    "murd3": f"+lat_1=30 +lat_2=50 {R}",
    "nsper": f"+h=3000000 {R}",
    "ob_tran": f"+o_proj=moll +o_lat_p=45 +o_lon_p=-90 +lon_0=-90 {R}",
    "ocea": f"+lat_1=30 +lat_2=50 +lon_1=0 +lon_2=60 {R}",
    "oea": f"+m=1 +n=2 {R}",
    "omerc": f"+lat_0=45 +alpha=30 {E}",
    "pconic": f"+lat_1=30 +lat_2=60 {R}",
    "sch": f"+plat_0=40 +plon_0=-75 +phdg_0=90 {E}",
    "som": f"+inc_angle=98.303820000243860022 "
           f"+ps_rev=0.06866666666666667 +asc_lon=64.412 {E}",
    "tissot": f"+lat_1=30 +lat_2=50 {R}",
    "tpeqd": f"+lat_1=30 +lon_1=-10 +lat_2=50 +lon_2=20 {R}",
    "tpers": f"+h=3000000 +tilt=10 +azi=20 {R}",
    "ups": f"{E}",
    "urmfps": f"+n=0.9 {R}",
    "urm5": f"+n=0.9 +q=0.8 +alpha=0.5 {R}",
    "utm": f"+zone=32 {E}",
    "vitk1": f"+lat_1=30 +lat_2=50 {R}",
    "col_urban": f"+lat_0=4.68 +lon_0=-74.15 +h_0=2550 {E}",
    "horner": "+ellps=intl "
              "+fwd_origin=0,0 +inv_origin=0,0 +deg=1 "
              "+fwd_u=0.0,0.0,1.0 +fwd_v=0.0,1.0,0.0 "
              "+inv_u=0.0,0.0,1.0 +inv_v=0.0,1.0,0.0",
    "molodensky": f"{E} +da=-251 +df=-1.41927e-05 +dx=84.87 +dy=96.49 "
                  "+dz=116.95 +abridged",
    "helmert": "+x=100 +y=200 +z=300",
    "molobadekas": "+x=100 +y=200 +z=300 +px=6378137 +py=0 +pz=0",
    "affine": "+xoff=10 +s11=1.0",
    "geogoffset": "+dlon=1 +dlat=1",
    "vertoffset": "+dh=10",
    "set": "+v_4=2010",
    "unitconvert": "+xy_in=deg +xy_out=rad",
    "topocentric": f"{E} +X_0=-3982059 +Y_0=3339129 +Z_0=-3693264",
    "peirce_q": f"+shape=square {E}",
}

# ops whose image covers only part of the globe (perspective views,
# polar caps, bounded nets, hemisphere folds): just require SOME
# finite output
PARTIAL = {
    "adams_hemi", "airy", "apian", "august", "bacon", "bipc", "calcofi",
    "ccon", "chamb", "col_urban", "euler", "geos", "gins8", "gnom",
    "gs48", "gs50", "alsk", "guyou", "imw_p", "labrd", "laea", "lagrng",
    "larr", "lask", "lee_os", "mil_os", "murd1", "murd2", "murd3",
    "nicol", "nsper", "nzmg", "ocea", "oea", "omerc", "ortel", "ortho",
    "pconic", "peirce_q", "sch", "stere", "sterea", "tissot", "tpers",
    "ups", "utm", "vitk1", "wink1", "lcc", "lcca", "leac", "aea",
    "eqdc", "bonne", "poly", "cass", "rpoly", "som", "lsat", "misrsom",
    "krovak", "mod_krovak", "adams_ws1", "adams_ws2", "spilhaus",
    "vandg2", "vandg3", "rouss", "gstmerc", "tpeqd",
}

GRID_OPS = {
    "hgridshift": "+grids=sweep_h",
    "vgridshift": "+grids=sweep_v",
    "gridshift": "+grids=sweep_uni",
    "deformation": "+grids=sweep_vel +dt=10",
    "xyzgridshift": "+grids=sweep_uni +grid_ref=output_crs",
    "tinshift": "+file=sweep_tin",
    "defmodel": "+model=sweep_model",
}

ALL_IDS = [
    "adams_hemi", "adams_ws1", "adams_ws2", "aea", "aeqd", "affine",
    "airy", "aitoff", "alsk", "apian", "august", "axisswap", "bacon",
    "bertin1953", "bipc", "boggs", "calcofi", "cart", "cass",
    "cc", "ccon", "cea", "chamb", "collg", "col_urban", "comill",
    "crast", "defmodel", "deformation", "denoy", "airocean", "eck1",
    "eck2", "eck3", "eck4", "eck5", "eck6", "eqearth", "eqc", "eqdc",
    "euler", "etmerc", "fahey", "fouc", "fouc_s", "gall", "geoc",
    "geocent", "geogoffset", "geos", "gins8", "gn_sinu", "gnom",
    "goode", "gridshift", "gs48", "gs50", "guyou", "hammer", "hatano",
    "healpix", "rhealpix", "helmert", "hgridshift", "horner", "igh",
    "igh_o", "imoll", "imoll_o", "imw_p", "isea", "kav5", "kav7",
    "krovak", "labrd", "laea", "lagrng", "larr", "lask", "lonlat",
    "latlon", "latlong", "longlat", "lcc", "lcca", "leac", "lee_os",
    "loxim", "lsat", "mbt_s", "mbt_fps", "mbtfpp", "mbtfpq", "mbtfps",
    "merc", "mil_os", "mill", "misrsom", "mod_krovak", "moll",
    "molobadekas", "molodensky", "murd1", "murd2", "murd3", "natearth",
    "natearth2", "nell", "nell_h", "nicol", "nsper", "nzmg", "noop",
    "ob_tran", "ocea", "oea", "omerc", "ortel", "ortho", "pconic",
    "patterson", "peirce_q", "poly", "putp1", "putp2", "putp3",
    "putp3p", "putp4p", "putp5", "putp5p", "putp6", "putp6p",
    "qua_aut", "qsc", "robin", "rouss", "rpoly", "s2", "sch", "set",
    "sinu", "som", "somerc", "spilhaus", "stere", "sterea", "gstmerc",
    "tcc", "tcea", "times", "tinshift", "tissot", "tmerc", "tobmerc",
    "topocentric", "tpeqd", "tpers", "unitconvert", "ups", "urm5",
    "urmfps", "utm", "vandg", "vandg2", "vandg3", "vandg4",
    "vertoffset", "vitk1", "vgridshift", "wag1", "wag2", "wag3",
    "wag4", "wag5", "wag6", "wag7", "webmerc", "weren", "wink1",
    "wink2", "wintri", "xyzgridshift",
]
# pipeline/push/pop are combinators, covered by test_pipeline_combinators
SKIP = {"pipeline", "push", "pop"}


@pytest.fixture(scope="module", autouse=True)
def _sweep_grids():
    from proj_4_spark.kernels.defmodel import DefGridSet, grid_from_bands
    from proj_4_spark.kernels.gridshift import Grid, Tin, synthetic_hgrid

    P.GRID_REGISTRY["sweep_h"] = synthetic_hgrid()
    P.GRID_REGISTRY["sweep_v"] = Grid(
        lon0=np.radians(-180.0), lat0=np.radians(-89.0),
        dlon=np.radians(10.0), dlat=np.radians(10.0),
        values=np.full((19, 37), 12.5))
    P.GRID_REGISTRY["sweep_uni"] = Grid(
        lon0=np.radians(-180.0), lat0=np.radians(-89.0),
        dlon=np.radians(10.0), dlat=np.radians(10.0),
        values=np.full((19, 37, 3), 1e-6))
    P.GRID_REGISTRY["sweep_vel"] = Grid(
        lon0=np.radians(-180.0), lat0=np.radians(-89.0),
        dlon=np.radians(10.0), dlat=np.radians(10.0),
        values=np.full((19, 37, 3), 2.0))  # mm/yr
    P.GRID_REGISTRY["sweep_tin"] = Tin(
        vertices=np.array([[-1e7, -1e7, 1.0, 2.0, 0.5],
                           [1e7, -1e7, 2.0, 1.0, 0.5],
                           [1e7, 1e7, 1.0, 1.0, 0.5],
                           [-1e7, 1e7, 2.0, 2.0, 0.5]]),
        triangles=np.array([[0, 1, 2], [0, 2, 3]]), has_z=True)
    e = np.full((3, 3), 0.5)
    P.GRID_REGISTRY["sweep_dm"] = DefGridSet(grids=(grid_from_bands(
        -180, -60, 180, 60, e_or_lon=e, n_or_lat=e, z=e),))
    P.DEFMODEL_REGISTRY["sweep_model"] = json.dumps({
        "file_type": "GeoTIFF", "format_version": "1.0",
        "source_crs": "EPSG:4959", "target_crs": "EPSG:7907",
        "definition_crs": "EPSG:4959",
        "extent": {"type": "bbox",
                   "parameters": {"bbox": [-180, -60, 180, 60]}},
        "time_extent": {"first": "1900-01-01T00:00:00Z",
                        "last": "2050-01-01T00:00:00Z"},
        "horizontal_offset_method": "addition",
        "horizontal_offset_unit": "metre",
        "vertical_offset_unit": "metre",
        "components": [{
            "displacement_type": "3d", "uncertainty_type": "none",
            "extent": {"type": "bbox",
                       "parameters": {"bbox": [-180, -60, 180, 60]}},
            "spatial_model": {"type": "GeoTIFF",
                              "interpolation_method": "bilinear",
                              "filename": "sweep_dm"},
            "time_function": {"type": "constant", "parameters": {}}}]})
    yield
    for k in ("sweep_h", "sweep_v", "sweep_uni", "sweep_vel",
              "sweep_tin", "sweep_dm"):
        P.GRID_REGISTRY.pop(k, None)
    P.DEFMODEL_REGISTRY.pop("sweep_model", None)


LON, LAT = np.meshgrid(np.linspace(-170, 170, 13),
                       np.linspace(-80, 80, 9))
LON, LAT = LON.ravel(), LAT.ravel()


@pytest.mark.parametrize("pid", [i for i in ALL_IDS if i not in SKIP])
def test_op_compiles_and_runs(pid):
    extra = GRID_OPS.get(pid) or PARAMS.get(pid) or R
    tr = compile_projstring(f"+proj={pid} {extra}")
    t = np.full_like(LON, 2018.0)
    x, y, z, _ = tr.transform_deg(LON, LAT, z=np.zeros_like(LON), t=t)
    finite = np.isfinite(x) & np.isfinite(y)
    floor = 1 if pid in PARTIAL else int(0.5 * LON.size)
    assert finite.sum() >= floor, \
        f"{pid}: only {finite.sum()}/{LON.size} finite"
    # NaN input must propagate as NaN, never raise
    xn, yn, _, _ = tr.transform_deg(np.array([np.nan]), np.array([0.0]),
                                    z=np.array([0.0]),
                                    t=np.array([2018.0]))
    assert not np.isfinite(xn[0])


def test_pipeline_combinators():
    tr = compile_projstring(
        "+proj=pipeline "
        "+step +proj=push +v_1 +v_2 "
        "+step +proj=webmerc +R=6371000 "
        "+step +proj=pop +v_1 +v_2")
    x, y, _, _ = tr.transform_deg(np.array([12.0]), np.array([55.0]))
    # pop restores the pushed angular values; the pipeline's output
    # edge is the last projection step's (meters), so they surface in
    # radians (pipeline.cpp unit wiring)
    assert abs(x[0] - np.radians(12.0)) < 1e-12
    assert abs(y[0] - np.radians(55.0)) < 1e-12


# Ops whose inverse (closed-form or generic Newton) round-trips every
# finite forward point of the world grid to <1e-6 deg.
ROUNDTRIP_FULL = [
    "aea", "aeqd", "affine", "aitoff", "axisswap", "boggs", "calcofi",
    "cart", "cass", "cc", "cea", "collg", "comill", "crast", "denoy",
    "airocean", "eck1", "eck2", "eck3", "eck4", "eck5", "eck6",
    "eqearth", "eqc", "eqdc", "euler", "etmerc", "fahey", "fouc",
    "fouc_s", "gall", "geoc", "geocent", "geogoffset", "geos", "gins8",
    "gn_sinu", "goode", "gridshift", "hammer", "hatano", "healpix",
    "rhealpix", "helmert", "hgridshift", "igh", "igh_o", "imoll",
    "imoll_o", "kav5", "kav7", "laea", "larr", "lask", "lonlat",
    "latlon", "latlong", "longlat", "lcc", "lcca", "leac", "loxim",
    "lsat", "mbt_s", "mbt_fps", "mbtfpp", "mbtfpq", "mbtfps", "merc",
    "mill", "misrsom", "moll", "molobadekas", "molodensky", "murd1",
    "murd3", "natearth", "natearth2", "nell", "nell_h", "nsper",
    "noop", "ob_tran", "ocea", "omerc", "ortho", "patterson", "putp1",
    "putp2", "putp3", "putp3p", "putp4p", "putp5", "putp5p", "putp6",
    "putp6p", "qua_aut", "qsc", "sch", "set", "sinu", "som", "stere",
    "sterea", "tcea", "times", "tissot", "tmerc", "tobmerc",
    "topocentric", "tpeqd", "tpers", "unitconvert", "ups", "urm5",
    "urmfps", "vandg", "vertoffset", "vitk1", "vgridshift", "wag1",
    "wag2", "wag3", "wag4", "wag5", "wag6", "wag7", "webmerc",
    "weren", "wink1", "wink2", "wintri", "xyzgridshift",
]

# Restricted-domain ops: fraction of finite forward points that must
# still round-trip (measured floor minus slack; the misses are points
# far outside the op's design domain — regional datums evaluated on a
# world grid, hemisphere folds, perspective horizons)
ROUNDTRIP_FLOOR = {
    "adams_hemi": 0.7, "adams_ws1": 0.5, "adams_ws2": 0.7, "airy": 0.9,
    "apian": 0.9, "august": 0.85, "bacon": 0.9, "bertin1953": 0.75,
    "bipc": 0.75, "ccon": 0.6, "chamb": 0.6, "deformation": 0.95,
    "gnom": 0.65, "gs48": 0.4, "guyou": 0.7, "isea": 0.75,
    "lagrng": 0.8, "lee_os": 0.9, "mil_os": 0.85, "murd2": 0.7,
    "nicol": 0.7, "oea": 0.7, "pconic": 0.7, "robin": 0.65,
    "rpoly": 0.6, "s2": 0.45, "somerc": 0.45, "spilhaus": 0.9,
    "gstmerc": 0.45, "tinshift": 0.45, "utm": 0.9, "vandg2": 0.8,
    "vandg3": 0.85, "vandg4": 0.75, "alsk": 0.2, "col_urban": 0.03,
    "gs50": 0.2, "imw_p": 0.15, "krovak": 0.3, "mod_krovak": 0.01,
    "nzmg": 0.01, "peirce_q": 0.2, "poly": 0.4, "rouss": 0.005,
    "tcc": 0.4, "labrd": 0.005, "horner": 0.005,
}


@pytest.mark.parametrize(
    "pid", ROUNDTRIP_FULL + sorted(ROUNDTRIP_FLOOR))
def test_op_roundtrip(pid):
    extra = GRID_OPS.get(pid) or PARAMS.get(pid) or R
    tr = compile_projstring(f"+proj={pid} {extra}")
    t = np.full_like(LON, 2018.0)
    x, y, z, _ = tr.transform_deg(LON, LAT, z=np.zeros_like(LON), t=t)
    fin = np.isfinite(x) & np.isfinite(y)
    rl, rp, _, _ = tr.transform_deg(x, y, z=z, t=t, direction="inv")
    dl = np.abs((rl - LON + 180.0) % 360.0 - 180.0)
    dp = np.abs(rp - LAT)
    good = fin & np.isfinite(rl) & (dl < 1e-6) & (dp < 1e-6)
    frac = good.sum() / max(int(fin.sum()), 1)
    floor = 0.999 if pid in ROUNDTRIP_FULL else ROUNDTRIP_FLOOR[pid]
    assert frac >= floor, f"{pid}: roundtrip frac {frac:.3f} < {floor}"
