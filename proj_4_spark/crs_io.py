"""WKT1 / WKT2 / PROJJSON CRS readers -> proj-strings.

The reference's proj_create accepts four definition forms — proj-string,
WKT (1 and 2), PROJJSON, and authority codes (src/create.cpp:206-303,
parsing in src/iso19111/io.cpp, grammar src/wkt2_grammar.y).  This
module is the 20%-effort version for the CRS shapes this engine's
curated registry models: GEOGCRS / PROJCRS / BOUNDCRS (WKT2),
GEOGCS / PROJCS (+TOWGS84) (WKT1), and their PROJJSON equivalents.
The full ISO-19111 object model (datum ensembles with per-member
accuracy, usage/extent, derived + compound CRS, engineering CRS) is
out of scope per SURVEY.md §1.3.

Method and parameter names are the EPSG names the reference defines in
src/proj_constants.h (EPSG_NAME_METHOD_* / EPSG_NAME_PARAMETER_*) plus
the WKT1/ESRI snake_case aliases from its projection mapping tables
(src/iso19111/operation/parammappings.cpp); the method->proj-string
expansions follow the same mapping PROJ exports via proj4_extension
(e.g. Polar Stereographic variant B -> +proj=stere +lat_ts, Hotine
variant A -> +proj=omerc +no_uoff).

Everything returns a plain proj-string so the existing pipeline
compiler (proj.py) stays the single entry for semantics; crs._resolve
dispatches here when the definition starts with a WKT keyword or '{'.
"""

from __future__ import annotations

import json
import math
import re

from .kernels.ellipsoid import ELLIPSOIDS

__all__ = ["parse_wkt", "wkt_to_projstring", "projjson_to_projstring",
           "is_wkt", "is_projjson"]


# --------------------------------------------------------------- parser

class WktNode:
    """One WKT node: NAME[arg, arg, ...]; args are str (quoted), float,
    bare keywords (str), or nested WktNode."""

    __slots__ = ("name", "args")

    def __init__(self, name: str, args: list):
        self.name = name.upper()
        self.args = args

    # -- convenience accessors ------------------------------------
    def children(self, *names: str) -> list["WktNode"]:
        up = {n.upper() for n in names}
        return [a for a in self.args if isinstance(a, WktNode)
                and a.name in up]

    def child(self, *names: str) -> "WktNode | None":
        c = self.children(*names)
        return c[0] if c else None

    def strings(self) -> list[str]:
        return [a for a in self.args if isinstance(a, str)]

    def numbers(self) -> list[float]:
        return [a for a in self.args if isinstance(a, float)]

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"{self.name}[{', '.join(map(repr, self.args))}]"


_TOKEN = re.compile(r"""
    \s*(?:
      "((?:[^"]|"")*)"          # quoted string ("" = escaped quote)
    | ([A-Za-z_][A-Za-z0-9_]*)  # identifier / bare keyword
    | ([-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?)  # number
    | ([\[\](),])               # structure
    )""", re.VERBOSE)


def _tokenize(s: str):
    pos, n = 0, len(s)
    while pos < n:
        m = _TOKEN.match(s, pos)
        if m is None:
            if s[pos:].strip() == "":
                return
            raise ValueError(f"WKT: cannot tokenize at {s[pos:pos+30]!r}")
        pos = m.end()
        if m.group(1) is not None:
            yield ("str", m.group(1).replace('""', '"'))
        elif m.group(2) is not None:
            yield ("ident", m.group(2))
        elif m.group(3) is not None:
            yield ("num", float(m.group(3)))
        else:
            yield ("punct", m.group(4))


def parse_wkt(s: str) -> WktNode:
    """Parse a WKT1/WKT2 string into a WktNode tree.  Both bracket
    styles ([] and ()) are accepted, as in the reference parser."""
    toks = list(_tokenize(s))
    node, pos = _parse_node(toks, 0)
    return node


def _parse_node(toks, i) -> tuple[WktNode, int]:
    kind, name = toks[i]
    if kind != "ident":
        raise ValueError(f"WKT: expected node name, got {toks[i]!r}")
    i += 1
    if i >= len(toks) or toks[i] != ("punct", "[") and toks[i] != ("punct", "("):
        # bare keyword (e.g. NORTH, east, order keywords)
        return WktNode(name, []), i
    close = "]" if toks[i] == ("punct", "[") else ")"
    i += 1
    args: list = []
    while True:
        kind, val = toks[i]
        if kind == "punct" and val == close:
            return WktNode(name, args), i + 1
        if kind == "punct" and val == ",":
            i += 1
            continue
        if kind == "str" or kind == "num":
            args.append(val)
            i += 1
        elif kind == "ident":
            if i + 1 < len(toks) and toks[i + 1] in (("punct", "["),
                                                     ("punct", "(")):
                sub, i = _parse_node(toks, i)
                args.append(sub)
            else:
                args.append(WktNode(val, []))
                i += 1
        else:
            raise ValueError(f"WKT: unexpected token {toks[i]!r}")


_WKT_ROOTS = ("GEOGCRS", "GEOGCS", "GEODCRS", "GEODETICCRS", "PROJCRS",
              "PROJCS", "PROJECTEDCRS", "BOUNDCRS")


def is_wkt(s: str) -> bool:
    head = s.lstrip()[:16].upper()
    return any(head.startswith(r) for r in _WKT_ROOTS)


def is_projjson(s: str) -> bool:
    return s.lstrip().startswith("{")


# ------------------------------------------------- ellipsoid resolution

def _ellps_param(a: float, rf: float) -> str:
    """Match (a, 1/f) against the named-ellipsoid registry, else emit
    explicit +a/+rf (+b for spheres), like the reference's
    lookup in ellipsoid::identify (src/iso19111/datum.cpp)."""
    for name, (ea, kind, v) in ELLIPSOIDS.items():
        erf = v if kind == "rf" else (ea / (ea - v) if ea != v else 0.0)
        if abs(ea - a) < 1e-4 and (
                (rf == 0.0 and erf == 0.0)
                or (erf != 0.0 and rf != 0.0 and abs(erf - rf) < 1e-7)):
            return f"+ellps={name}"
    if rf == 0.0:
        return f"+a={a:.9g} +b={a:.9g}"
    return f"+a={a:.9g} +rf={rf:.11g}"


# ----------------------------------------------------- name dictionaries

def _norm(name: str) -> str:
    """Case/punctuation-insensitive key: letters+digits only."""
    return re.sub(r"[^a-z0-9]", "", name.lower())


# EPSG method name (proj_constants.h EPSG_NAME_METHOD_*) and WKT1
# snake-case alias -> (proj id, extra fixed params, parameter-name role
# overrides).  Roles: lat_0 lon_0 k x_0 y_0 lat_1 lat_2 lat_ts lonc
# alpha gamma.
_METHODS: dict[str, tuple[str, str, dict[str, str]]] = {}


def _method(proj: str, extra: str = "", roles: dict[str, str] | None = None,
            *names: str) -> None:
    for n in names:
        _METHODS[_norm(n)] = (proj, extra, roles or {})


_method("tmerc", "", None,
        "Transverse Mercator", "Transverse_Mercator",
        "Gauss-Kruger", "Gauss_Kruger")
_method("lcc", "", {"latitudeofnaturalorigin": ("lat_1", "lat_0"),
                    "latitudeoforigin": ("lat_1", "lat_0"),
                    "scalefactoratnaturalorigin": "k_0",
                    "scalefactor": "k_0"},
        "Lambert Conic Conformal (1SP)", "Lambert_Conformal_Conic_1SP")
_method("lcc", "", None,
        "Lambert Conic Conformal (2SP)", "Lambert_Conformal_Conic_2SP",
        "Lambert_Conformal_Conic")
_method("merc", "", {"scalefactoratnaturalorigin": "k_0",
                     "scalefactor": "k_0"},
        "Mercator (variant A)", "Mercator_1SP")
_method("merc", "", {"latitudeof1ststandardparallel": "lat_ts",
                     "standardparallel1": "lat_ts"},
        "Mercator (variant B)", "Mercator_2SP")
_method("webmerc", "", None,
        "Popular Visualisation Pseudo Mercator",
        "Popular Visualisation Pseudo-Mercator", "Mercator_Auxiliary_Sphere")
_method("sterea", "", None,
        "Oblique Stereographic", "Oblique_Stereographic",
        "Double_Stereographic")
_method("stere", "", None, "Polar Stereographic (variant A)",
        "Polar_Stereographic", "Stereographic")
_method("stere", "", {"latitudeofstandardparallel": "lat_ts",
                      "standardparallel1": "lat_ts"},
        "Polar Stereographic (variant B)",
        "Polar_Stereographic_Variant_B")
_method("laea", "", {"latitudeofcenter": "lat_0",
                     "longitudeofcenter": "lon_0"},
        "Lambert Azimuthal Equal Area", "Lambert_Azimuthal_Equal_Area",
        "Lambert Azimuthal Equal Area (Spherical)")
_method("aea", "", {"latitudeofcenter": "lat_0",
                    "longitudeofcenter": "lon_0"},
        "Albers Equal Area", "Albers_Conic_Equal_Area", "Albers")
_method("aeqd", "", {"latitudeofcenter": "lat_0",
                     "longitudeofcenter": "lon_0"},
        "Azimuthal Equidistant", "Azimuthal_Equidistant",
        "Modified Azimuthal Equidistant")
_method("eqc", "", {"latitudeof1ststandardparallel": "lat_ts",
                    "standardparallel1": "lat_ts"},
        "Equidistant Cylindrical", "Equirectangular",
        "Equidistant Cylindrical (Spherical)")
_method("cea", "", {"latitudeof1ststandardparallel": "lat_ts",
                    "standardparallel1": "lat_ts"},
        "Lambert Cylindrical Equal Area", "Cylindrical_Equal_Area")
_method("cass", "", None, "Cassini-Soldner", "Cassini_Soldner", "Cassini")
_method("poly", "", None, "American Polyconic", "Polyconic")
_method("bonne", "", {"standardparallel1": "lat_1"}, "Bonne")
_method("eqdc", "", {"latitudeofcenter": "lat_0",
                     "longitudeofcenter": "lon_0"},
        "Equidistant Conic", "Equidistant_Conic")
_method("krovak", "", {"latitudeofprojectioncentre": "lat_0",
                       "longitudeoforigin": "lon_0",
                       "latitudeofpseudostandardparallel": "lat_1",
                       "scalefactoronpseudostandardparallel": "k_0",
                       "colatitudeofconeaxis": "alpha"},
        "Krovak")
_method("omerc", "+no_uoff", {"latitudeofprojectioncentre": "lat_0",
                              "latitudeofcenter": "lat_0",
                              "longitudeofprojectioncentre": "lonc",
                              "longitudeofcenter": "lonc",
                              "azimuthatprojectioncentre": "alpha",
                              "azimuthofinitialline": "alpha",
                              "anglefromrectifiedtoskewgrid": "gamma",
                              "rectifiedgridangle": "gamma",
                              "scalefactoratprojectioncentre": "k_0",
                              "scalefactoroninitialline": "k_0"},
        "Hotine Oblique Mercator (variant A)", "Hotine_Oblique_Mercator")
_method("omerc", "", {"latitudeofprojectioncentre": "lat_0",
                      "latitudeofcenter": "lat_0",
                      "longitudeofprojectioncentre": "lonc",
                      "longitudeofcenter": "lonc",
                      "azimuthatprojectioncentre": "alpha",
                      "azimuthofinitialline": "alpha",
                      "anglefromrectifiedtoskewgrid": "gamma",
                      "rectifiedgridangle": "gamma",
                      "scalefactoratprojectioncentre": "k_0",
                      "scalefactoroninitialline": "k_0",
                      "eastingatprojectioncentre": "x_0",
                      "northingatprojectioncentre": "y_0"},
        "Hotine Oblique Mercator (variant B)",
        "Hotine_Oblique_Mercator_Azimuth_Center")
_method("col_urban", "", {"projectionplaneoriginheight": "h_0"},
        "Colombia Urban", "Colombia_Urban")
_method("somerc", "", {"latitudeofprojectioncentre": "lat_0",
                       "longitudeofprojectioncentre": "lon_0"},
        "Swiss Oblique Mercator", "Swiss_Oblique_Cylindrical",
        "Hotine Oblique Mercator (variant B) Swiss")
_method("nzmg", "", None, "New Zealand Map Grid", "New_Zealand_Map_Grid")
_method("utm", "", None, "UTM")  # resolved via conversion name instead
# world / small-scale methods with only lat_0/lon_0/x_0/y_0
for _proj, _names in [
        ("moll", ("Mollweide",)), ("robin", ("Robinson",)),
        ("sinu", ("Sinusoidal",)), ("eqearth", ("Equal Earth",)),
        ("ortho", ("Orthographic",)), ("gnom", ("Gnomonic",)),
        ("vandg", ("Van der Grinten", "Van_der_Grinten_I")),
        ("eck4", ("Eckert IV", "Eckert_IV")),
        ("eck6", ("Eckert VI", "Eckert_VI")),
        ("mill", ("Miller Cylindrical", "Miller_Cylindrical")),
        ("goode", ("Goode Homolosine",)),
        ("igh", ("Interrupted Goode Homolosine",)),
        ("gall", ("Gall Stereographic",)),
        ("geos", ("Geostationary Satellite (Sweep X)",))]:
    _method(_proj, "", {"latitudeofcenter": "lat_0",
                        "longitudeofcenter": "lon_0"}, *_names)

# EPSG parameter name (proj_constants.h EPSG_NAME_PARAMETER_*) and WKT1
# alias -> default proj role
_PARAMS = {
    "latitudeofnaturalorigin": "lat_0", "latitudeoforigin": "lat_0",
    "longitudeofnaturalorigin": "lon_0", "centralmeridian": "lon_0",
    "scalefactoratnaturalorigin": "k_0", "scalefactor": "k_0",
    "falseeasting": "x_0", "falsenorthing": "y_0",
    "latitudeoffalseorigin": "lat_0", "longitudeoffalseorigin": "lon_0",
    "eastingatfalseorigin": "x_0", "northingatfalseorigin": "y_0",
    "latitudeof1ststandardparallel": "lat_1", "standardparallel1": "lat_1",
    "latitudeof2ndstandardparallel": "lat_2", "standardparallel2": "lat_2",
    "latitudeofstandardparallel": "lat_ts",
    "longitudeoforigin": "lon_0",
    "latitudeofcenter": "lat_0", "longitudeofcenter": "lon_0",
    "pseudostandardparallel1": "lat_1",
    "azimuth": "alpha", "rectifiedgridangle": "gamma",
    "longitudeofcenterofprojection": "lonc",
    "satelliteheight": "h",
}

_ANGULAR_ROLES = {"lat_0", "lon_0", "lat_1", "lat_2", "lat_ts", "lonc",
                  "alpha", "gamma"}

# Helmert parameter EPSG names (codes 8605-8611, 1040-1046 for the
# time-dependent set) -> towgs84 slot index
_HELMERT_SLOTS = {
    "xaxistranslation": 0, "yaxistranslation": 1, "zaxistranslation": 2,
    "xaxisrotation": 3, "yaxisrotation": 4, "zaxisrotation": 5,
    "scaledifference": 6,
}


# --------------------------------------------------------------- units


def _fmt_num(v: float) -> str:
    """Shortest round-trip float repr, integers without trailing .0."""
    s = repr(float(v))
    return s[:-2] if s.endswith(".0") else s

def _unit_to_deg_factor(node: WktNode | None) -> float:
    """Multiplier turning a parameter value into degrees.  WKT2
    ANGLEUNIT carries radians-per-unit; WKT1 UNIT on a GEOGCS too."""
    if node is None:
        return 1.0
    nums = node.numbers()
    if not nums:
        return 1.0
    fac = nums[0] * 180.0 / math.pi
    # snap to the exact well-known factors: WKT files carry the
    # radian-per-degree constant at finite precision and the reference
    # likewise identifies "degree" by epsilon comparison (io.cpp unit
    # identification), so 49 deg must stay exactly 49
    for exact in (1.0, 0.9, 1.0 / 3600.0, 180.0 / math.pi):
        if abs(fac - exact) < 1e-10 * exact:
            return exact
    return fac


def _find_unit(node: WktNode) -> WktNode | None:
    return node.child("ANGLEUNIT", "UNIT")


# ------------------------------------------------------------ WKT -> proj

def wkt_to_projstring(s: str) -> str:
    """Convert a WKT1/WKT2 CRS definition to its proj-string."""
    return _crs_to_projstring(parse_wkt(s))


def _crs_to_projstring(root: WktNode) -> str:
    if root.name in ("GEOGCRS", "GEOGCS", "GEODCRS", "GEODETICCRS"):
        return _geog_to_projstring(root)
    if root.name in ("PROJCRS", "PROJCS", "PROJECTEDCRS"):
        return _proj_to_projstring(root)
    if root.name == "BOUNDCRS":
        return _bound_to_projstring(root)
    raise ValueError(f"unsupported WKT root {root.name} (supported: "
                     f"{', '.join(_WKT_ROOTS)})")


def _datum_of(node: WktNode) -> WktNode:
    d = node.child("DATUM", "TRF", "GEODETICDATUM", "ENSEMBLE",
                   "DATUM_ENSEMBLE")
    if d is None:
        raise ValueError(f"{node.name}: no DATUM/ENSEMBLE found")
    return d


def _ellipsoid_str(node: WktNode) -> str:
    datum = _datum_of(node)
    ell = datum.child("ELLIPSOID", "SPHEROID")
    if ell is None:
        raise ValueError("no ELLIPSOID/SPHEROID in datum")
    nums = ell.numbers()
    if len(nums) < 2:
        raise ValueError("ELLIPSOID needs semi-major axis + inverse "
                         "flattening")
    a, rf = nums[0], nums[1]
    # LENGTHUNIT on the ellipsoid axis (non-metre axes exist, e.g.
    # Clarke's foot); scale a into metres
    lu = ell.child("LENGTHUNIT", "UNIT")
    if lu is not None and lu.numbers():
        a *= lu.numbers()[0]
    return _ellps_param(a, rf)


def _towgs84_of(node: WktNode) -> str:
    """WKT1 TOWGS84[...] — appears directly under the CRS or nested in
    its DATUM (both placements occur in the wild; the reference's WKT1
    grammar allows it inside DATUM)."""
    t = node.child("TOWGS84")
    if t is None:
        d = node.child("DATUM", "TRF", "GEODETICDATUM")
        t = d.child("TOWGS84") if d is not None else None
    if t is None:
        return ""
    vals = t.numbers()
    return " +towgs84=" + ",".join(f"{v:.10g}" for v in vals)


def _primem_of(node: WktNode, unit_fac: float) -> str:
    pm = node.child("PRIMEM")
    if pm is None or not pm.numbers():
        return ""
    v = pm.numbers()[0]
    u = _find_unit(pm)
    fac = _unit_to_deg_factor(u) if u is not None else unit_fac
    vdeg = v * fac
    if vdeg == 0.0:
        return ""
    return f" +pm={vdeg!r}"


def _geog_to_projstring(node: WktNode) -> str:
    unit_fac = _unit_to_deg_factor(_geog_angle_unit(node))
    out = "+proj=longlat " + _ellipsoid_str(node)
    out += _primem_of(node, unit_fac)
    out += _towgs84_of(node)
    return out


def _geog_angle_unit(node: WktNode) -> WktNode | None:
    # WKT1: UNIT directly under GEOGCS; WKT2: ANGLEUNIT under CS/AXIS
    # or directly under the CRS
    u = node.child("ANGLEUNIT", "UNIT")
    if u is not None:
        return u
    cs = node.child("CS")
    for ax in node.children("AXIS") + (cs.children("AXIS") if cs else []):
        u = ax.child("ANGLEUNIT", "UNIT")
        if u is not None:
            return u
    return None


def _linear_unit_str(node: WktNode) -> str:
    """+units=/+to_meter= for a projected CRS from its CS axes."""
    u = node.child("LENGTHUNIT", "UNIT")
    if u is None:
        cs = node.child("CS")
        for ax in node.children("AXIS") + (cs.children("AXIS") if cs else []):
            u = ax.child("LENGTHUNIT", "UNIT")
            if u is not None:
                break
    if u is None or not u.numbers():
        return ""
    fac = u.numbers()[0]
    if abs(fac - 1.0) < 1e-12:
        return ""
    names = u.strings()
    wk = {"foot": "ft", "us survey foot": "us-ft", "kilometre": "km"}
    unit = wk.get(names[0].lower()) if names else None
    if unit is not None:
        # only take the named alias when the registry factor agrees
        # with the WKT-carried one (e.g. the Sears 1922 foot is close
        # to but NOT the Indian foot — such units keep the exact
        # +to_meter)
        from .proj import UNITS

        if unit in UNITS and abs(UNITS[unit] - fac) < 1e-12 * fac:
            return f" +units={unit}"
    return f" +to_meter={fac!r}"


def _param_values(params, geog_fac: float) -> dict:
    """PARAMETER nodes -> {role: value-in-degrees/meters} using the
    default role mapping (used by the UTM canonical check)."""
    out: dict = {}
    for p in params:
        names, nums = p.strings(), p.numbers()
        if not names or not nums:
            continue
        role = _PARAMS.get(_norm(names[0]))
        if role is None or role in out:
            continue
        val = nums[0]
        if role in _ANGULAR_ROLES:
            u = _find_unit(p)
            val *= _unit_to_deg_factor(u) if u is not None else geog_fac
        else:
            u = p.child("LENGTHUNIT", "UNIT")
            if u is not None and u.numbers():
                val *= u.numbers()[0]
        out[role] = val
    return out


def _proj_to_projstring(node: WktNode) -> str:
    base = node.child("BASEGEOGCRS", "BASEGEODCRS", "GEOGCS")
    if base is None:
        raise ValueError("PROJCRS: no BASEGEOGCRS/GEOGCS")
    conv = node.child("CONVERSION")
    if conv is not None:                       # WKT2
        method_node = conv.child("METHOD", "PROJECTION")
        if method_node is None:
            raise ValueError("CONVERSION: no METHOD")
        method_name = method_node.strings()[0]
        params = conv.children("PARAMETER")
        conv_name = conv.strings()[0] if conv.strings() else ""
    else:                                      # WKT1
        proj_node = node.child("PROJECTION")
        if proj_node is None:
            raise ValueError("PROJCS: no CONVERSION/PROJECTION")
        method_name = proj_node.strings()[0]
        params = node.children("PARAMETER")
        conv_name = node.strings()[0] if node.strings() else ""

    # UTM shortcut: the conversion name carries the zone (io.cpp emits
    # "UTM zone 31N" for the canonical conversions) — taken ONLY when
    # the explicit parameters agree with the canonical UTM definition
    # (variant CRSs like "zE-N" zone-prefixed eastings reuse the name
    # with different false origins)
    m = re.search(r"UTM zone (\d+)([NS])", conv_name or "", re.I)
    ell = _ellipsoid_str(base)
    if m and _norm(method_name) in (_norm("Transverse Mercator"),):
        zone, hemi = int(m.group(1)), m.group(2).upper()
        got = _param_values(params,
                            _unit_to_deg_factor(_geog_angle_unit(base)))
        canonical = {"lat_0": 0.0, "lon_0": zone * 6.0 - 183.0,
                     "k_0": 0.9996, "x_0": 500000.0,
                     "y_0": 10000000.0 if hemi == "S" else 0.0}
        if all(abs(got.get(k, v) - v) < 1e-9
               for k, v in canonical.items()):
            s = f"+proj=utm +zone={zone}"
            if hemi == "S":
                s += " +south"
            return (s + " " + ell
                    + _primem_of(base,
                                 _unit_to_deg_factor(_geog_angle_unit(base)))
                    + _towgs84_of(base) + _towgs84_of(node))

    key = _norm(method_name)
    if key not in _METHODS:
        raise ValueError(f"unsupported projection method {method_name!r}")
    proj, extra, roles = _METHODS[key]

    geog_fac = _unit_to_deg_factor(_geog_angle_unit(base))
    parts = [f"+proj={proj}"]
    if extra:
        parts.append(extra)
    seen = set()
    for p in params:
        names, nums = p.strings(), p.numbers()
        if not names or not nums:
            continue
        pkey = _norm(names[0])
        role = roles.get(pkey, _PARAMS.get(pkey))
        if role is None:
            continue
        for r in (role if isinstance(role, tuple) else (role,)):
            if r in seen:
                continue
            seen.add(r)
            val = nums[0]
            if r in _ANGULAR_ROLES:
                u = _find_unit(p)
                fac = _unit_to_deg_factor(u) if u is not None else geog_fac
                val *= fac
            else:
                u = p.child("LENGTHUNIT", "UNIT")
                if u is not None and u.numbers():
                    val *= u.numbers()[0]
            parts.append(f"+{r}={_fmt_num(val)}")
    # polar stereographic variant B: lat_0 is +/-90 by the lat_ts sign
    if proj == "stere" and "lat_ts" in seen and "lat_0" not in seen:
        ts = float(next(p.split("=")[1] for p in parts
                        if p.startswith("+lat_ts=")))
        parts.append(f"+lat_0={90.0 if ts >= 0 else -90.0:.12g}")
    parts.append(ell)
    out = " ".join(parts)
    out += _primem_of(base, geog_fac)
    out += _linear_unit_str(node)
    out += _axis_of(node)
    out += _towgs84_of(base) + _towgs84_of(node)
    return out


_AXIS_DIR_CODE = {"east": "e", "west": "w", "north": "n", "south": "s",
                  "up": "u", "down": "d"}


def _axis_of(node: WktNode) -> str:
    """PROJCS/PROJCRS AXIS directions -> +axis=abc when they deviate
    from the east,north,up default (io.cpp axis import; WKT1 puts the
    AXIS nodes directly under PROJCS, WKT2 under/next to CS)."""
    cs = node.child("CS")
    axes = node.children("AXIS") + (cs.children("AXIS") if cs else [])
    codes = []
    for ax in axes:
        # the direction is a bare keyword (AXIS["Westing",WEST]) which
        # the tokenizer yields as a childless node, not a string
        low = [s.lower() for s in ax.strings()[1:]] + \
            [a.name.lower() for a in ax.args
             if isinstance(a, WktNode) and not a.args]
        code = next((_AXIS_DIR_CODE[d] for d in low
                     if d in _AXIS_DIR_CODE), None)
        if code is None:
            return ""  # unmodelled direction (geocentric X/Y/Z etc.)
        codes.append(code)
    s = "".join(codes)
    if not s or s in ("en", "enu"):
        return ""
    return " +axis=" + (s + "u" if len(s) == 2 else s)


def _bound_to_projstring(node: WktNode) -> str:
    src = node.child("SOURCECRS")
    tr = node.child("ABRIDGEDTRANSFORMATION")
    if src is None or not src.children(*_WKT_ROOTS):
        raise ValueError("BOUNDCRS: no SOURCECRS")
    inner = src.children(*_WKT_ROOTS)[0]
    base = _crs_to_projstring(inner)
    if tr is None:
        return base
    method = tr.child("METHOD")
    mname = _norm(method.strings()[0]) if method and method.strings() else ""
    slots = [0.0] * 7
    got_rot = False
    for p in tr.children("PARAMETER"):
        names, nums = p.strings(), p.numbers()
        if not names or not nums:
            continue
        k = _norm(names[0])
        if k in _HELMERT_SLOTS:
            i = _HELMERT_SLOTS[k]
            v = nums[0]
            if i == 6:
                # abridged transformations carry scale as a RATIO
                # (1 + ds); the reference converts to ppm
                # (io.cpp BoundCRS export)
                v = (v - 1.0) * 1e6
            if 3 <= i <= 5:
                got_rot = True
            slots[i] = v
    if "coordinateframe" in mname and got_rot:
        # towgs84 is position-vector convention; coordinate-frame
        # rotations flip sign (helmert.cpp convention handling)
        slots[3], slots[4], slots[5] = -slots[3], -slots[4], -slots[5]
    n = 7 if (got_rot or slots[6] != 0.0) else 3
    tow = ",".join(f"{v:.10g}" for v in slots[:n])
    # replace any towgs84 already on the source (BOUNDCRS wins)
    base = re.sub(r" \+towgs84=\S+", "", base)
    return base + " +towgs84=" + tow


# --------------------------------------------------------- PROJJSON -> proj

def projjson_to_projstring(obj) -> str:
    """Convert a PROJJSON dict (or JSON string) to a proj-string.
    Covers GeographicCRS / ProjectedCRS / BoundCRS, mirroring the WKT2
    shapes (schema: proj.org/schemas/v0.x/projjson.schema.json, reader
    src/iso19111/io.cpp JSONParser)."""
    if isinstance(obj, str):
        obj = json.loads(obj)
    t = obj.get("type", "")
    if t == "GeographicCRS":
        return _pj_geog(obj)
    if t == "ProjectedCRS":
        return _pj_proj(obj)
    if t == "BoundCRS":
        base = projjson_to_projstring(obj["source_crs"])
        tr = obj.get("transformation", {})
        slots = [0.0] * 7
        got_rot = False
        for p in tr.get("parameters", []):
            k = _norm(p.get("name", ""))
            if k in _HELMERT_SLOTS:
                i = _HELMERT_SLOTS[k]
                v = float(p.get("value", 0.0))
                unit = p.get("unit", "")
                uname = unit if isinstance(unit, str) \
                    else unit.get("name", "")
                if i == 6 and _norm(uname) == "unity":
                    v = (v - 1.0) * 1e6
                if 3 <= i <= 5:
                    got_rot = True
                slots[i] = v
        mname = _norm(tr.get("method", {}).get("name", ""))
        if "coordinateframe" in mname and got_rot:
            slots[3], slots[4], slots[5] = -slots[3], -slots[4], -slots[5]
        n = 7 if (got_rot or slots[6] != 0.0) else 3
        base = re.sub(r" \+towgs84=\S+", "", base)
        return base + " +towgs84=" + ",".join(f"{v:.10g}"
                                              for v in slots[:n])
    raise ValueError(f"unsupported PROJJSON type {t!r}")


def _pj_ellps(obj) -> str:
    datum = obj.get("datum") or obj.get("datum_ensemble") or {}
    ell = datum.get("ellipsoid", {})
    a = float(ell.get("semi_major_axis", 6378137.0))
    if "inverse_flattening" in ell:
        rf = float(ell["inverse_flattening"])
    elif "semi_minor_axis" in ell:
        b = float(ell["semi_minor_axis"])
        rf = a / (a - b) if a != b else 0.0
    else:
        rf = 0.0
    return _ellps_param(a, rf)


def _pj_geog(obj) -> str:
    return "+proj=longlat " + _pj_ellps(obj) + _pj_pm(obj)


def _pj_pm(obj) -> str:
    pm = obj.get("datum", {}).get("prime_meridian")
    if not pm:
        return ""
    v = pm.get("longitude", 0.0)
    if isinstance(v, dict):
        v = float(v.get("value", 0.0)) * float(
            v.get("unit", {}).get("conversion_factor", 1.0)) \
            * 180.0 / math.pi
    if float(v) == 0.0:
        return ""
    return f" +pm={float(v)!r}"


_PJ_UNIT_DEG = {"degree": 1.0, "grad": 0.9,
                "arc-second": 1.0 / 3600.0, "radian": 180.0 / math.pi}


def _pj_proj(obj) -> str:
    base = obj.get("base_crs", {})
    conv = obj.get("conversion", {})
    method_name = conv.get("method", {}).get("name", "")
    conv_name = conv.get("name", "")
    ell = _pj_ellps(base) + _pj_pm(base)
    m = re.search(r"UTM zone (\d+)([NS])", conv_name or "", re.I)
    if m and _norm(method_name) == _norm("Transverse Mercator"):
        zone, hemi = int(m.group(1)), m.group(2).upper()
        got = {}
        for p in conv.get("parameters", []):
            role = _PARAMS.get(_norm(p.get("name", "")))
            if role is not None and role not in got:
                got[role] = float(p.get("value", 0.0))
        canonical = {"lat_0": 0.0, "lon_0": zone * 6.0 - 183.0,
                     "k_0": 0.9996, "x_0": 500000.0,
                     "y_0": 10000000.0 if hemi == "S" else 0.0}
        if all(abs(got.get(k, v) - v) < 1e-9
               for k, v in canonical.items()):
            s = f"+proj=utm +zone={zone}"
            if hemi == "S":
                s += " +south"
            return s + " " + ell
    key = _norm(method_name)
    if key not in _METHODS:
        raise ValueError(f"unsupported projection method {method_name!r}")
    proj, extra, roles = _METHODS[key]
    parts = [f"+proj={proj}"]
    if extra:
        parts.append(extra)
    seen = set()
    for p in conv.get("parameters", []):
        pkey = _norm(p.get("name", ""))
        role = roles.get(pkey, _PARAMS.get(pkey))
        if role is None:
            continue
        for r in (role if isinstance(role, tuple) else (role,)):
            if r in seen:
                continue
            seen.add(r)
            val = float(p.get("value", 0.0))
            unit = p.get("unit", "degree")
            uname = unit if isinstance(unit, str) else unit.get("name", "")
            if r in _ANGULAR_ROLES:
                if _norm(uname) in ("grad",):
                    val *= 0.9
                elif _norm(uname) == "radian":
                    val *= 180.0 / math.pi
                elif isinstance(unit, dict) and "conversion_factor" in unit:
                    val *= float(unit["conversion_factor"]) * 180.0 / math.pi
            elif isinstance(unit, dict) and unit.get("type") == "LinearUnit":
                val *= float(unit.get("conversion_factor", 1.0))
            parts.append(f"+{r}={_fmt_num(val)}")
    if proj == "stere" and "lat_ts" in seen and "lat_0" not in seen:
        ts = float(next(p.split("=")[1] for p in parts
                        if p.startswith("+lat_ts=")))
        parts.append(f"+lat_0={90.0 if ts >= 0 else -90.0:.12g}")
    cs_axes = obj.get("coordinate_system", {}).get("axis", [])
    codes = [_AXIS_DIR_CODE.get(str(a.get("direction", "")).lower())
             for a in cs_axes]
    if codes and all(codes) and "".join(codes) not in ("en", "enu"):
        s = "".join(codes)
        parts.append("+axis=" + (s + "u" if len(s) == 2 else s))
    if cs_axes:
        au = cs_axes[0].get("unit", "metre")
        from .proj import UNITS

        aliases = {"foot": "ft", "us survey foot": "us-ft",
                   "kilometre": "km"}
        if isinstance(au, dict):
            fac = float(au.get("conversion_factor", 1.0))
            uname = str(au.get("name", "")).lower()
            if abs(fac - 1.0) > 1e-12:
                alias = aliases.get(uname)
                if alias and abs(UNITS[alias] - fac) < 1e-12 * fac:
                    parts.append(f"+units={alias}")
                else:
                    parts.append(f"+to_meter={fac!r}")
        elif str(au).lower() in aliases:
            parts.append(f"+units={aliases[str(au).lower()]}")
    parts.append(ell)
    return " ".join(parts)


# ------------------------------------------------------------ proj -> WKT2

_WKT_ELLPS_NAMES = {
    "WGS84": "WGS 84", "GRS80": "GRS 1980", "intl": "International 1924",
    "bessel": "Bessel 1841", "clrk66": "Clarke 1866",
    "clrk80ign": "Clarke 1880 (IGN)", "airy": "Airy 1830",
    "krass": "Krassowsky 1940",
}

_DEG_UNIT = 'ANGLEUNIT["degree",0.0174532925199433]'
_M_UNIT = 'LENGTHUNIT["metre",1]'


def _wkt_num(v: float) -> str:
    return _fmt_num(float(v))


def _pm_export(params: dict) -> tuple[str, float]:
    """(PRIMEM name, degrees east of Greenwich) for the CRS's +pm
    (export half of _primem_of; named meridians carry their catalog
    longitude, numeric ones an 'unknown' label)."""
    pm = str(params.get("pm", "greenwich")).lower()
    if pm == "greenwich":
        return "Greenwich", 0.0
    from .proj import PRIME_MERIDIANS

    if pm in PRIME_MERIDIANS:
        return pm.capitalize(), PRIME_MERIDIANS[pm]
    return "unknown", float(pm)


def _wkt2_ellipsoid(params: dict) -> str:
    # a custom +a/+rf (or +a/+b) ellipsoid must not be silently
    # replaced by the WGS84 default (GSK-2011, Xian-80, ... have no
    # proj ellps name)
    name = str(params.get("ellps", "" if "a" in params else "WGS84"))
    if name in ELLIPSOIDS:
        a, kind, v = ELLIPSOIDS[name]
        rf = v if kind == "rf" else (a / (a - v) if a != v else 0.0)
        wname = _WKT_ELLPS_NAMES.get(name, name)
    else:
        a = float(params.get("a", 6378137.0))
        if "rf" in params:
            rf = float(params["rf"])
        elif "b" in params:
            b = float(params["b"])
            rf = a / (a - b) if a != b else 0.0
        else:
            rf = 0.0
        wname = "unnamed"
    return (f'ELLIPSOID["{wname}",{_wkt_num(a)},{_wkt_num(rf)},'
            f'{_M_UNIT}]')


def _wkt2_basegeog(params: dict, name: str = "unknown") -> str:
    pmn, pmv = _pm_export(params)
    return (f'BASEGEOGCRS["{name}",DATUM["{name}",'
            f'{_wkt2_ellipsoid(params)}],'
            f'PRIMEM["{pmn}",{_wkt_num(pmv)},{_DEG_UNIT}]]')


def _p(name: str, value, unit: str) -> str:
    return f'PARAMETER["{name}",{_wkt_num(value)},{unit}]'


# proj id -> (EPSG method name, [(epsg param name, proj key, default,
# angular?)]); mirrors the export direction of the reference's
# parammappings (src/iso19111/operation/parammappings.cpp)
_EXPORT_METHODS = {
    "tmerc": ("Transverse Mercator", [
        ("Latitude of natural origin", "lat_0", 0.0, True),
        ("Longitude of natural origin", "lon_0", 0.0, True),
        ("Scale factor at natural origin", ("k", "k_0"), 1.0, False),
        ("False easting", "x_0", 0.0, False),
        ("False northing", "y_0", 0.0, False)]),
    "sterea": ("Oblique Stereographic", [
        ("Latitude of natural origin", "lat_0", 0.0, True),
        ("Longitude of natural origin", "lon_0", 0.0, True),
        ("Scale factor at natural origin", ("k", "k_0"), 1.0, False),
        ("False easting", "x_0", 0.0, False),
        ("False northing", "y_0", 0.0, False)]),
    "merc": ("Mercator (variant A)", [
        ("Longitude of natural origin", "lon_0", 0.0, True),
        ("Scale factor at natural origin", ("k", "k_0"), 1.0, False),
        ("False easting", "x_0", 0.0, False),
        ("False northing", "y_0", 0.0, False)]),
    "webmerc": ("Popular Visualisation Pseudo Mercator", [
        ("Latitude of natural origin", "lat_0", 0.0, True),
        ("Longitude of natural origin", "lon_0", 0.0, True),
        ("False easting", "x_0", 0.0, False),
        ("False northing", "y_0", 0.0, False)]),
    "lcc": ("Lambert Conic Conformal (2SP)", [
        ("Latitude of false origin", "lat_0", 0.0, True),
        ("Longitude of false origin", "lon_0", 0.0, True),
        ("Latitude of 1st standard parallel", "lat_1", 0.0, True),
        ("Latitude of 2nd standard parallel", "lat_2", 0.0, True),
        ("Easting at false origin", "x_0", 0.0, False),
        ("Northing at false origin", "y_0", 0.0, False)]),
    "laea": ("Lambert Azimuthal Equal Area", [
        ("Latitude of natural origin", "lat_0", 0.0, True),
        ("Longitude of natural origin", "lon_0", 0.0, True),
        ("False easting", "x_0", 0.0, False),
        ("False northing", "y_0", 0.0, False)]),
    "aea": ("Albers Equal Area", [
        ("Latitude of false origin", "lat_0", 0.0, True),
        ("Longitude of false origin", "lon_0", 0.0, True),
        ("Latitude of 1st standard parallel", "lat_1", 0.0, True),
        ("Latitude of 2nd standard parallel", "lat_2", 0.0, True),
        ("Easting at false origin", "x_0", 0.0, False),
        ("Northing at false origin", "y_0", 0.0, False)]),
    "stere": ("Polar Stereographic (variant B)", [
        ("Latitude of standard parallel", "lat_ts", 0.0, True),
        ("Longitude of origin", "lon_0", 0.0, True),
        ("False easting", "x_0", 0.0, False),
        ("False northing", "y_0", 0.0, False)]),
    "somerc": ("Swiss Oblique Mercator", [
        ("Latitude of projection centre", "lat_0", 0.0, True),
        ("Longitude of projection centre", "lon_0", 0.0, True),
        ("Scale factor at natural origin", ("k", "k_0"), 1.0, False),
        ("False easting", "x_0", 0.0, False),
        ("False northing", "y_0", 0.0, False)]),
    "robin": ("Robinson", [
        ("Longitude of natural origin", "lon_0", 0.0, True),
        ("False easting", "x_0", 0.0, False),
        ("False northing", "y_0", 0.0, False)]),
    "moll": ("Mollweide", [
        ("Longitude of natural origin", "lon_0", 0.0, True),
        ("False easting", "x_0", 0.0, False),
        ("False northing", "y_0", 0.0, False)]),
    "cass": ("Cassini-Soldner", [
        ("Latitude of natural origin", "lat_0", 0.0, True),
        ("Longitude of natural origin", "lon_0", 0.0, True),
        ("False easting", "x_0", 0.0, False),
        ("False northing", "y_0", 0.0, False)]),
    "krovak": ("Krovak", [
        ("Latitude of projection centre", "lat_0", 49.5, True),
        ("Longitude of origin", "lon_0", 24.833333333333332, True),
        ("Latitude of pseudo standard parallel", "lat_1", 78.5, True),
        ("Scale factor on pseudo standard parallel", ("k", "k_0"),
         0.9999, False),
        ("False easting", "x_0", 0.0, False),
        ("False northing", "y_0", 0.0, False)]),
    "poly": ("American Polyconic", [
        ("Latitude of natural origin", "lat_0", 0.0, True),
        ("Longitude of natural origin", "lon_0", 0.0, True),
        ("False easting", "x_0", 0.0, False),
        ("False northing", "y_0", 0.0, False)]),
    "cea": ("Lambert Cylindrical Equal Area", [
        ("Latitude of 1st standard parallel", "lat_ts", 0.0, True),
        ("Longitude of natural origin", "lon_0", 0.0, True),
        ("False easting", "x_0", 0.0, False),
        ("False northing", "y_0", 0.0, False)]),
    "eqc": ("Equidistant Cylindrical", [
        ("Latitude of 1st standard parallel", "lat_ts", 0.0, True),
        ("Longitude of natural origin", "lon_0", 0.0, True),
        ("False easting", "x_0", 0.0, False),
        ("False northing", "y_0", 0.0, False)]),
    "eqearth": ("Equal Earth", [
        ("Longitude of natural origin", "lon_0", 0.0, True),
        ("False easting", "x_0", 0.0, False),
        ("False northing", "y_0", 0.0, False)]),
    "col_urban": ("Colombia Urban", [
        ("Latitude of natural origin", "lat_0", 0.0, True),
        ("Longitude of natural origin", "lon_0", 0.0, True),
        ("False easting", "x_0", 0.0, False),
        ("False northing", "y_0", 0.0, False),
        ("Projection plane origin height", "h_0", 0.0, False)]),
}

# omerc export needs a variant split (A carries +no_uoff and false
# origins; B carries the projection-centre origins), shared by the
# WKT2 and PROJJSON writers
_OMERC_COMMON = [
    ("Latitude of projection centre", "lat_0", 0.0, True),
    ("Longitude of projection centre", "lonc", 0.0, True),
    ("Azimuth at projection centre", "alpha", 0.0, True),
    ("Angle from Rectified to Skew Grid", ("gamma", "alpha"), 0.0, True),
    ("Scale factor at projection centre", ("k", "k_0"), 1.0, False),
]


def _omerc_export(top: dict) -> tuple[str, list]:
    if "no_uoff" in top or "no_off" in top:
        return ("Hotine Oblique Mercator (variant A)", _OMERC_COMMON + [
            ("False easting", "x_0", 0.0, False),
            ("False northing", "y_0", 0.0, False)])
    return ("Hotine Oblique Mercator (variant B)", _OMERC_COMMON + [
        ("Easting at projection centre", "x_0", 0.0, False),
        ("Northing at projection centre", "y_0", 0.0, False)])


def projstring_to_wkt2(projstr: str, name: str = "unnamed") -> str:
    """Export a proj-string CRS definition as WKT2 (the proj_as_wkt /
    PJ_WKT2_2019 direction, src/c_api.cpp proj_as_wkt ->
    io.cpp exportToWKT) for the method subset the reader accepts.
    +towgs84 wraps the result in BOUNDCRS with the Position Vector
    abridged transformation, mirroring the reference's WKT2 BoundCRS
    export.  Roundtrip contract: wkt_to_projstring(projstring_to_wkt2
    (s)) compiles to the same transform as s."""
    from .proj import parse_projstring

    top = dict(parse_projstring(projstr)[0])
    tow = top.pop("towgs84", None)
    pid = top.get("proj")
    if pid in _ANGULAR_EXPORT:
        pmn, pmv = _pm_export(top)
        body = (f'GEOGCRS["{name}",DATUM["{name}",'
                f'{_wkt2_ellipsoid(top)}],'
                f'PRIMEM["{pmn}",{_wkt_num(pmv)},{_DEG_UNIT}],'
                f'CS[ellipsoidal,2],'
                f'AXIS["longitude",east,ORDER[1],{_DEG_UNIT}],'
                f'AXIS["latitude",north,ORDER[2],{_DEG_UNIT}]]')
    elif pid == "utm":
        zone = int(float(top.get("zone", 0)))
        south = "south" in top
        conv = f"UTM zone {zone}{'S' if south else 'N'}"
        lat0, lon0 = 0.0, zone * 6 - 183
        x0, y0 = 500000.0, 10000000.0 if south else 0.0
        body = (f'PROJCRS["{name}",{_wkt2_basegeog(top, name)},'
                f'CONVERSION["{conv}",'
                f'METHOD["Transverse Mercator",ID["EPSG",9807]],'
                + _p("Latitude of natural origin", lat0, _DEG_UNIT)
                + _p("Longitude of natural origin", lon0, _DEG_UNIT)
                + _p("Scale factor at natural origin", 0.9996,
                     'SCALEUNIT["unity",1]')
                + _p("False easting", x0, _M_UNIT)
                + _p("False northing", y0, _M_UNIT)
                + f'],{_wkt2_cart_cs(top)}]')
    elif pid == "merc" and "lat_ts" in top:
        # Mercator variant B (standard parallel instead of scale)
        body = (f'PROJCRS["{name}",{_wkt2_basegeog(top, name)},'
                f'CONVERSION["unnamed",METHOD["Mercator (variant B)"],'
                + _p("Latitude of 1st standard parallel",
                     float(top["lat_ts"]), _DEG_UNIT)
                + _p("Longitude of natural origin",
                     float(top.get("lon_0", 0.0)), _DEG_UNIT)
                + _p("False easting", float(top.get("x_0", 0.0)), _M_UNIT)
                + _p("False northing", float(top.get("y_0", 0.0)),
                     _M_UNIT)
                + f'],{_wkt2_cart_cs(top)}]')
    elif pid == "lcc" and "lat_2" not in top:
        # 1SP form: the reference exports lat_1 (== lat_0) + scale
        lat1 = float(top.get("lat_1", top.get("lat_0", 0.0)))
        if "lat_0" in top and "lat_1" in top \
                and float(top["lat_0"]) != float(top["lat_1"]):
            raise ValueError(
                "projstring_to_wkt2: lcc with lat_0 != lat_1 and no "
                "lat_2 has no EPSG method equivalent")
        k = float(top.get("k", top.get("k_0", 1.0)))
        body = (f'PROJCRS["{name}",{_wkt2_basegeog(top, name)},'
                f'CONVERSION["unnamed",'
                f'METHOD["Lambert Conic Conformal (1SP)"],'
                + _p("Latitude of natural origin", lat1, _DEG_UNIT)
                + _p("Longitude of natural origin",
                     float(top.get("lon_0", 0.0)), _DEG_UNIT)
                + _p("Scale factor at natural origin", k,
                     'SCALEUNIT["unity",1]')
                + _p("False easting", float(top.get("x_0", 0.0)), _M_UNIT)
                + _p("False northing", float(top.get("y_0", 0.0)),
                     _M_UNIT)
                + f'],{_wkt2_cart_cs(top)}]')
    elif pid == "stere" and "lat_ts" not in top:
        # Polar Stereographic variant A: scale at the pole (the UPS
        # parameterization) instead of a standard parallel
        lat0 = float(top.get("lat_0", 0.0))
        if abs(lat0) != 90.0:
            raise ValueError(
                "projstring_to_wkt2: only polar stere exportable")
        k = float(top.get("k", top.get("k_0", 1.0)))
        body = (f'PROJCRS["{name}",{_wkt2_basegeog(top, name)},'
                f'CONVERSION["unnamed",'
                f'METHOD["Polar Stereographic (variant A)"],'
                + _p("Latitude of natural origin", lat0, _DEG_UNIT)
                + _p("Longitude of natural origin",
                     float(top.get("lon_0", 0.0)), _DEG_UNIT)
                + _p("Scale factor at natural origin", k,
                     'SCALEUNIT["unity",1]')
                + _p("False easting", float(top.get("x_0", 0.0)), _M_UNIT)
                + _p("False northing", float(top.get("y_0", 0.0)),
                     _M_UNIT)
                + f'],{_wkt2_cart_cs(top)}]')
    elif pid in _EXPORT_METHODS or pid == "omerc":
        method, plist = (_omerc_export(top) if pid == "omerc"
                         else _EXPORT_METHODS[pid])
        if pid == "stere":
            lat0 = float(top.get("lat_0", 0.0))
            if abs(lat0) != 90.0:
                raise ValueError(
                    "projstring_to_wkt2: only polar stere exportable")
        parts = []
        for ename, keys, dflt, angular in plist:
            keys = (keys,) if isinstance(keys, str) else keys
            v = dflt
            for k in keys:
                if k in top:
                    v = float(top[k])
                    break
            unit = _DEG_UNIT if angular else (
                'SCALEUNIT["unity",1]' if "Scale" in ename else _M_UNIT)
            parts.append(_p(ename, v, unit))
        body = (f'PROJCRS["{name}",{_wkt2_basegeog(top, name)},'
                f'CONVERSION["unnamed",METHOD["{method}"],'
                + "".join(parts) + f'],{_wkt2_cart_cs(top)}]')
    else:
        raise ValueError(
            f"projstring_to_wkt2: +proj={pid} not in the export subset")
    if tow is None:
        return body
    vals = [float(v) for v in str(tow).split(",")]
    vals += [0.0] * (7 - len(vals))
    tr = (f'ABRIDGEDTRANSFORMATION["Transformation to WGS84",'
          f'METHOD["Position Vector transformation (geog2D domain)",'
          f'ID["EPSG",9606]],'
          + _p("X-axis translation", vals[0], "")
          + _p("Y-axis translation", vals[1], "")
          + _p("Z-axis translation", vals[2], "")
          + _p("X-axis rotation", vals[3], "")
          + _p("Y-axis rotation", vals[4], "")
          + _p("Z-axis rotation", vals[5], "")
          + _p("Scale difference", 1.0 + vals[6] * 1e-6, "") + "]")
    tr = tr.replace(",]", "]")
    wgs = ('GEOGCRS["WGS 84",DATUM["World Geodetic System 1984",'
           'ELLIPSOID["WGS 84",6378137,298.257223563,'
           + _M_UNIT + ']],PRIMEM["Greenwich",0,' + _DEG_UNIT + "]]")
    return (f"BOUNDCRS[SOURCECRS[{body}],TARGETCRS[{wgs}],{tr}]")


_ANGULAR_EXPORT = ("longlat", "latlong", "lonlat", "latlon")
_WKT2_CART_CS = ('CS[Cartesian,2],'
                 'AXIS["(E)",east,ORDER[1],LENGTHUNIT["metre",1]],'
                 'AXIS["(N)",north,ORDER[2],LENGTHUNIT["metre",1]]')


def _wkt_linear_unit(params: dict) -> tuple[str, float]:
    """(WKT unit name, metres-per-unit) for the CRS's +units/+to_meter
    (the export half of _linear_unit_str)."""
    u = str(params.get("units", ""))
    if u in ("", "m"):
        if "to_meter" in params:
            f = float(params["to_meter"])
            return ("unknown", f) if abs(f - 1.0) > 1e-12 else ("metre", 1.0)
        return "metre", 1.0
    names = {"ft": "foot", "us-ft": "US survey foot", "km": "kilometre"}
    from .proj import UNITS

    return names.get(u, u), float(UNITS.get(u, 1.0))


def _wkt2_cart_cs(params: dict) -> str:
    """Cartesian CS with the +axis directions (default east,north) and
    the CRS's linear unit on both axes."""
    ax = str(params.get("axis", "enu"))[:2]
    uname, ufac = _wkt_linear_unit(params)
    lu = f'LENGTHUNIT["{uname}",{_wkt_num(ufac)}]'
    if ax == "en" and uname == "metre":
        return _WKT2_CART_CS
    names = {"e": ("(E)", "east"), "w": ("(W)", "west"),
             "n": ("(N)", "north"), "s": ("(S)", "south")}
    a1, a2 = names.get(ax[0], ("(E)", "east")), \
        names.get(ax[1], ("(N)", "north"))
    return ('CS[Cartesian,2],'
            f'AXIS["{a1[0]}",{a1[1]},ORDER[1],{lu}],'
            f'AXIS["{a2[0]}",{a2[1]},ORDER[2],{lu}]')


# ------------------------------------------------------- proj -> WKT1

# proj id -> (GDAL PROJECTION name, [(WKT1 parameter, proj keys,
# default)]); the export half of the reader's _METHODS aliases
# (io.cpp WKT1 formatter / parammappings.cpp getWKT1...Mappings)
_WKT1_METHODS = {
    "tmerc": ("Transverse_Mercator", [
        ("latitude_of_origin", "lat_0", 0.0),
        ("central_meridian", "lon_0", 0.0),
        ("scale_factor", ("k", "k_0"), 1.0),
        ("false_easting", "x_0", 0.0),
        ("false_northing", "y_0", 0.0)]),
    "sterea": ("Oblique_Stereographic", [
        ("latitude_of_origin", "lat_0", 0.0),
        ("central_meridian", "lon_0", 0.0),
        ("scale_factor", ("k", "k_0"), 1.0),
        ("false_easting", "x_0", 0.0),
        ("false_northing", "y_0", 0.0)]),
    "somerc": ("Swiss_Oblique_Cylindrical", [
        ("latitude_of_center", "lat_0", 0.0),
        ("longitude_of_center", "lon_0", 0.0),
        ("scale_factor", ("k", "k_0"), 1.0),
        ("false_easting", "x_0", 0.0),
        ("false_northing", "y_0", 0.0)]),
    "webmerc": ("Popular_Visualisation_Pseudo_Mercator", [
        ("latitude_of_origin", "lat_0", 0.0),
        ("central_meridian", "lon_0", 0.0),
        ("false_easting", "x_0", 0.0),
        ("false_northing", "y_0", 0.0)]),
    "laea": ("Lambert_Azimuthal_Equal_Area", [
        ("latitude_of_center", "lat_0", 0.0),
        ("longitude_of_center", "lon_0", 0.0),
        ("false_easting", "x_0", 0.0),
        ("false_northing", "y_0", 0.0)]),
    "aea": ("Albers_Conic_Equal_Area", [
        ("standard_parallel_1", "lat_1", 0.0),
        ("standard_parallel_2", "lat_2", 0.0),
        ("latitude_of_center", "lat_0", 0.0),
        ("longitude_of_center", "lon_0", 0.0),
        ("false_easting", "x_0", 0.0),
        ("false_northing", "y_0", 0.0)]),
    "robin": ("Robinson", [
        ("longitude_of_center", "lon_0", 0.0),
        ("false_easting", "x_0", 0.0),
        ("false_northing", "y_0", 0.0)]),
    "moll": ("Mollweide", [
        ("central_meridian", "lon_0", 0.0),
        ("false_easting", "x_0", 0.0),
        ("false_northing", "y_0", 0.0)]),
    "cass": ("Cassini_Soldner", [
        ("latitude_of_origin", "lat_0", 0.0),
        ("central_meridian", "lon_0", 0.0),
        ("false_easting", "x_0", 0.0),
        ("false_northing", "y_0", 0.0)]),
    "krovak": ("Krovak", [
        ("latitude_of_center", "lat_0", 49.5),
        ("longitude_of_center", "lon_0", 24.833333333333332),
        ("pseudo_standard_parallel_1", "lat_1", 78.5),
        ("scale_factor", ("k", "k_0"), 0.9999),
        ("false_easting", "x_0", 0.0),
        ("false_northing", "y_0", 0.0)]),
    "poly": ("Polyconic", [
        ("latitude_of_origin", "lat_0", 0.0),
        ("central_meridian", "lon_0", 0.0),
        ("false_easting", "x_0", 0.0),
        ("false_northing", "y_0", 0.0)]),
    "cea": ("Cylindrical_Equal_Area", [
        ("standard_parallel_1", "lat_ts", 0.0),
        ("central_meridian", "lon_0", 0.0),
        ("false_easting", "x_0", 0.0),
        ("false_northing", "y_0", 0.0)]),
    "eqc": ("Equirectangular", [
        ("standard_parallel_1", "lat_ts", 0.0),
        ("central_meridian", "lon_0", 0.0),
        ("false_easting", "x_0", 0.0),
        ("false_northing", "y_0", 0.0)]),
    "eqearth": ("Equal_Earth", [
        ("central_meridian", "lon_0", 0.0),
        ("false_easting", "x_0", 0.0),
        ("false_northing", "y_0", 0.0)]),
    "col_urban": ("Colombia_Urban", [
        ("latitude_of_origin", "lat_0", 0.0),
        ("central_meridian", "lon_0", 0.0),
        ("false_easting", "x_0", 0.0),
        ("false_northing", "y_0", 0.0),
        ("projection_plane_origin_height", "h_0", 0.0)]),
}


def _wkt1_geogcs(params: dict, name: str, tow=None) -> str:
    ename = str(params.get("ellps", "" if "a" in params else "WGS84"))
    if ename in ELLIPSOIDS:
        a, kind, v = ELLIPSOIDS[ename]
        rf = v if kind == "rf" else (a / (a - v) if a != v else 0.0)
        wname = _WKT_ELLPS_NAMES.get(ename, ename)
    else:
        a = float(params.get("a", 6378137.0))
        if "rf" in params:
            rf = float(params["rf"])
        elif "b" in params:
            b = float(params["b"])
            rf = a / (a - b) if a != b else 0.0
        else:
            rf = 0.0
        wname = "unnamed"
    datum = f'SPHEROID["{wname}",{_wkt_num(a)},{_wkt_num(rf)}]'
    if tow is not None:
        vals = [float(v) for v in str(tow).split(",")]
        vals += [0.0] * (7 - len(vals))
        datum += ",TOWGS84[" + ",".join(_wkt_num(v) for v in vals) + "]"
    pmn, pmv = _pm_export(params)
    return (f'GEOGCS["{name}",DATUM["{name}",{datum}],'
            f'PRIMEM["{pmn}",{_wkt_num(pmv)}],'
            f'UNIT["degree",0.0174532925199433]]')


def projstring_to_wkt1(projstr: str, name: str = "unnamed") -> str:
    """Export a proj-string CRS as WKT1_GDAL (the proj_as_wkt /
    PJ_WKT1_GDAL direction, src/iso19111/io.cpp WKT1 formatter):
    GEOGCS for angular CRSs, PROJCS[GEOGCS,PROJECTION,PARAMETER...,
    UNIT] for the projected method subset, +towgs84 as a DATUM-level
    TOWGS84[].  Roundtrip contract: wkt_to_projstring(
    projstring_to_wkt1(s)) compiles to the same transform as s."""
    from .proj import parse_projstring

    top = dict(parse_projstring(projstr)[0])
    tow = top.pop("towgs84", None)
    pid = top.get("proj")
    if pid in _ANGULAR_EXPORT:
        return _wkt1_geogcs(top, name, tow)
    geog = _wkt1_geogcs(top, name, tow)
    if pid == "utm":
        zone = int(float(top.get("zone", 0)))
        south = "south" in top
        method = "Transverse_Mercator"
        plist = [("latitude_of_origin", 0.0),
                 ("central_meridian", zone * 6 - 183),
                 ("scale_factor", 0.9996),
                 ("false_easting", 500000.0),
                 ("false_northing", 10000000.0 if south else 0.0)]
        name = name if name != "unnamed" else \
            f"UTM zone {zone}{'S' if south else 'N'}"
    elif pid == "merc" and "lat_ts" in top:
        method = "Mercator_2SP"
        plist = [("standard_parallel_1", float(top["lat_ts"])),
                 ("central_meridian", float(top.get("lon_0", 0.0))),
                 ("false_easting", float(top.get("x_0", 0.0))),
                 ("false_northing", float(top.get("y_0", 0.0)))]
    elif pid == "merc":
        method = "Mercator_1SP"
        plist = [("central_meridian", float(top.get("lon_0", 0.0))),
                 ("scale_factor",
                  float(top.get("k", top.get("k_0", 1.0)))),
                 ("false_easting", float(top.get("x_0", 0.0))),
                 ("false_northing", float(top.get("y_0", 0.0)))]
    elif pid == "lcc" and "lat_2" in top:
        method = "Lambert_Conformal_Conic_2SP"
        plist = [("standard_parallel_1", float(top.get("lat_1", 0.0))),
                 ("standard_parallel_2", float(top.get("lat_2", 0.0))),
                 ("latitude_of_origin", float(top.get("lat_0", 0.0))),
                 ("central_meridian", float(top.get("lon_0", 0.0))),
                 ("false_easting", float(top.get("x_0", 0.0))),
                 ("false_northing", float(top.get("y_0", 0.0)))]
    elif pid == "lcc":
        lat1 = float(top.get("lat_1", top.get("lat_0", 0.0)))
        if "lat_0" in top and "lat_1" in top \
                and float(top["lat_0"]) != float(top["lat_1"]):
            raise ValueError(
                "projstring_to_wkt1: lcc with lat_0 != lat_1 and no "
                "lat_2 has no WKT1 method equivalent")
        method = "Lambert_Conformal_Conic_1SP"
        plist = [("latitude_of_origin", lat1),
                 ("central_meridian", float(top.get("lon_0", 0.0))),
                 ("scale_factor",
                  float(top.get("k", top.get("k_0", 1.0)))),
                 ("false_easting", float(top.get("x_0", 0.0))),
                 ("false_northing", float(top.get("y_0", 0.0)))]
    elif pid == "stere" and "lat_ts" in top:
        # variant B: the reader infers lat_0 = +-90 from the
        # standard parallel's sign (crs_io.py _proj_to_projstring)
        method = "Polar_Stereographic_Variant_B"
        plist = [("standard_parallel_1", float(top["lat_ts"])),
                 ("central_meridian", float(top.get("lon_0", 0.0))),
                 ("false_easting", float(top.get("x_0", 0.0))),
                 ("false_northing", float(top.get("y_0", 0.0)))]
    elif pid == "stere":
        lat0 = float(top.get("lat_0", 0.0))
        if abs(lat0) != 90.0:
            raise ValueError(
                "projstring_to_wkt1: only polar stere exportable")
        method = "Polar_Stereographic"
        plist = [("latitude_of_origin", lat0),
                 ("central_meridian", float(top.get("lon_0", 0.0))),
                 ("scale_factor",
                  float(top.get("k", top.get("k_0", 1.0)))),
                 ("false_easting", float(top.get("x_0", 0.0))),
                 ("false_northing", float(top.get("y_0", 0.0)))]
    elif pid == "omerc":
        method = ("Hotine_Oblique_Mercator"
                  if ("no_uoff" in top or "no_off" in top)
                  else "Hotine_Oblique_Mercator_Azimuth_Center")
        spec = [("latitude_of_center", "lat_0", 0.0),
                ("longitude_of_center", "lonc", 0.0),
                ("azimuth", "alpha", 0.0),
                ("rectified_grid_angle", ("gamma", "alpha"), 0.0),
                ("scale_factor", ("k", "k_0"), 1.0),
                ("false_easting", "x_0", 0.0),
                ("false_northing", "y_0", 0.0)]
        plist = []
        for wname_, keys, dflt in spec:
            keys = (keys,) if isinstance(keys, str) else keys
            v = dflt
            for k in keys:
                if k in top:
                    v = float(top[k])
                    break
            plist.append((wname_, v))
    elif pid in _WKT1_METHODS:
        method, spec = _WKT1_METHODS[pid]
        plist = []
        for wname_, keys, dflt in spec:
            keys = (keys,) if isinstance(keys, str) else keys
            v = dflt
            for k in keys:
                if k in top:
                    v = float(top[k])
                    break
            plist.append((wname_, v))
    else:
        raise ValueError(
            f"projstring_to_wkt1: +proj={pid} not in the export subset")
    params = "".join(f'PARAMETER["{n}",{_wkt_num(v)}],' for n, v in plist)
    axes = ""
    ax = str(top.get("axis", "enu"))
    if ax[:2] not in ("en",):
        names = {"e": ("Easting", "EAST"), "w": ("Westing", "WEST"),
                 "n": ("Northing", "NORTH"), "s": ("Southing", "SOUTH"),
                 "u": ("Up", "UP"), "d": ("Down", "DOWN")}
        axes = "".join(f',AXIS["{names[c][0]}",{names[c][1]}]'
                       for c in ax[:2])
    uname, ufac = _wkt_linear_unit(top)
    return (f'PROJCS["{name}",{geog},PROJECTION["{method}"],'
            f'{params}UNIT["{uname}",{_wkt_num(ufac)}]{axes}]')


# ------------------------------------------------------- proj -> PROJJSON

_PJJ_SCHEMA = "https://proj.org/schemas/v0.7/projjson.schema.json"

_PJJ_CART_CS = {
    "subtype": "Cartesian",
    "axis": [
        {"name": "Easting", "abbreviation": "E",
         "direction": "east", "unit": "metre"},
        {"name": "Northing", "abbreviation": "N",
         "direction": "north", "unit": "metre"},
    ],
}

def _pjj_cart_cs(params: dict) -> dict:
    """Cartesian CS dict carrying the +axis directions (default
    east,north) and the CRS's linear unit."""
    ax = str(params.get("axis", "enu"))[:2]
    uname, ufac = _wkt_linear_unit(params)
    if ax == "en" and uname == "metre":
        return _PJJ_CART_CS
    unit = "metre" if uname == "metre" else {
        "type": "LinearUnit", "name": uname, "conversion_factor": ufac}
    names = {"e": ("Easting", "E", "east"), "w": ("Westing", "W", "west"),
             "n": ("Northing", "N", "north"),
             "s": ("Southing", "S", "south")}
    return {
        "subtype": "Cartesian",
        "axis": [
            {"name": names[c][0], "abbreviation": names[c][1],
             "direction": names[c][2], "unit": unit}
            for c in ax
        ],
    }


_PJJ_SCALE_UNITY = {"type": "ScaleUnit", "name": "unity",
                    "conversion_factor": 1.0}
_PJJ_PPM = {"type": "ScaleUnit", "name": "parts per million",
            "conversion_factor": 1e-6}


def _pjj_ellipsoid(params: dict) -> dict:
    # a custom +a/+rf (or +a/+b) ellipsoid must not be silently
    # replaced by the WGS84 default (GSK-2011, Xian-80, ... have no
    # proj ellps name)
    name = str(params.get("ellps", "" if "a" in params else "WGS84"))
    if name in ELLIPSOIDS:
        a, kind, v = ELLIPSOIDS[name]
        rf = v if kind == "rf" else (a / (a - v) if a != v else 0.0)
        wname = _WKT_ELLPS_NAMES.get(name, name)
    else:
        a = float(params.get("a", 6378137.0))
        if "rf" in params:
            rf = float(params["rf"])
        elif "b" in params:
            b = float(params["b"])
            rf = a / (a - b) if a != b else 0.0
        else:
            rf = 0.0
        wname = "unnamed"
    out = {"name": wname, "semi_major_axis": a}
    if rf:
        out["inverse_flattening"] = rf
    else:
        out["radius"] = a
    return out


def _pjj_geog(params: dict, name: str) -> dict:
    datum = {"type": "GeodeticReferenceFrame", "name": name,
             "ellipsoid": _pjj_ellipsoid(params)}
    pmn, pmv = _pm_export(params)
    if pmv != 0.0:
        datum["prime_meridian"] = {"name": pmn, "longitude": pmv}
    return {
        "type": "GeographicCRS", "name": name,
        "datum": datum,
        "coordinate_system": {
            "subtype": "ellipsoidal",
            "axis": [
                {"name": "Longitude", "abbreviation": "lon",
                 "direction": "east", "unit": "degree"},
                {"name": "Latitude", "abbreviation": "lat",
                 "direction": "north", "unit": "degree"},
            ],
        },
    }


def _pjj_p(name: str, value, unit) -> dict:
    return {"name": name, "value": float(value), "unit": unit}


def projstring_to_projjson(projstr: str, name: str = "unnamed") -> dict:
    """Export a proj-string CRS definition as a PROJJSON dict (the
    proj_as_projjson direction: src/proj_json_streaming_writer.cpp
    provides the writer machinery, src/iso19111/io.cpp exportToJSON
    the CRS shapes) for the same method subset as the WKT2 writer.
    +towgs84 wraps the result in a BoundCRS with a Position Vector
    transformation (translations metre, rotations arc-second, scale
    ppm).  Roundtrip contract (tests/test_projjson_writer.py):
    projjson_to_projstring(projstring_to_projjson(s)) compiles to the
    same transform as s for every registry code without +axis."""
    from .proj import parse_projstring

    top = dict(parse_projstring(projstr)[0])
    tow = top.pop("towgs84", None)
    pid = top.get("proj")

    def projected(conv_name: str, method: str, params: list) -> dict:
        return {
            "type": "ProjectedCRS", "name": name,
            "base_crs": _pjj_geog(top, name),
            "conversion": {
                "name": conv_name,
                "method": {"name": method},
                "parameters": [_pjj_p(*p) for p in params],
            },
            "coordinate_system": _pjj_cart_cs(top),
        }

    if pid in _ANGULAR_EXPORT:
        body = _pjj_geog(top, name)
    elif pid == "utm":
        zone = int(float(top.get("zone", 0)))
        south = "south" in top
        body = projected(
            f"UTM zone {zone}{'S' if south else 'N'}",
            "Transverse Mercator",
            [("Latitude of natural origin", 0.0, "degree"),
             ("Longitude of natural origin", zone * 6 - 183, "degree"),
             ("Scale factor at natural origin", 0.9996, _PJJ_SCALE_UNITY),
             ("False easting", 500000.0, "metre"),
             ("False northing", 10000000.0 if south else 0.0, "metre")])
    elif pid == "merc" and "lat_ts" in top:
        body = projected(
            "unnamed", "Mercator (variant B)",
            [("Latitude of 1st standard parallel",
              float(top["lat_ts"]), "degree"),
             ("Longitude of natural origin",
              float(top.get("lon_0", 0.0)), "degree"),
             ("False easting", float(top.get("x_0", 0.0)), "metre"),
             ("False northing", float(top.get("y_0", 0.0)), "metre")])
    elif pid == "lcc" and "lat_2" not in top:
        lat1 = float(top.get("lat_1", top.get("lat_0", 0.0)))
        if "lat_0" in top and "lat_1" in top \
                and float(top["lat_0"]) != float(top["lat_1"]):
            raise ValueError(
                "projstring_to_projjson: lcc with lat_0 != lat_1 and "
                "no lat_2 has no EPSG method equivalent")
        k = float(top.get("k", top.get("k_0", 1.0)))
        body = projected(
            "unnamed", "Lambert Conic Conformal (1SP)",
            [("Latitude of natural origin", lat1, "degree"),
             ("Longitude of natural origin",
              float(top.get("lon_0", 0.0)), "degree"),
             ("Scale factor at natural origin", k, _PJJ_SCALE_UNITY),
             ("False easting", float(top.get("x_0", 0.0)), "metre"),
             ("False northing", float(top.get("y_0", 0.0)), "metre")])
    elif pid == "stere" and "lat_ts" not in top:
        lat0 = float(top.get("lat_0", 0.0))
        if abs(lat0) != 90.0:
            raise ValueError(
                "projstring_to_projjson: only polar stere exportable")
        k = float(top.get("k", top.get("k_0", 1.0)))
        body = projected(
            "unnamed", "Polar Stereographic (variant A)",
            [("Latitude of natural origin", lat0, "degree"),
             ("Longitude of natural origin",
              float(top.get("lon_0", 0.0)), "degree"),
             ("Scale factor at natural origin", k, _PJJ_SCALE_UNITY),
             ("False easting", float(top.get("x_0", 0.0)), "metre"),
             ("False northing", float(top.get("y_0", 0.0)), "metre")])
    elif pid in _EXPORT_METHODS or pid == "omerc":
        method, plist = (_omerc_export(top) if pid == "omerc"
                         else _EXPORT_METHODS[pid])
        if pid == "stere":
            lat0 = float(top.get("lat_0", 0.0))
            if abs(lat0) != 90.0:
                raise ValueError(
                    "projstring_to_projjson: only polar stere "
                    "exportable")
        params = []
        for ename, keys, dflt, angular in plist:
            keys = (keys,) if isinstance(keys, str) else keys
            v = dflt
            for k in keys:
                if k in top:
                    v = float(top[k])
                    break
            unit = "degree" if angular else (
                _PJJ_SCALE_UNITY if "Scale" in ename else "metre")
            params.append((ename, v, unit))
        body = projected("unnamed", method, params)
    else:
        raise ValueError(
            f"projstring_to_projjson: +proj={pid} not in the export "
            "subset")
    body["$schema"] = _PJJ_SCHEMA
    if tow is None:
        return body
    vals = [float(v) for v in str(tow).split(",")]
    vals += [0.0] * (7 - len(vals))
    return {
        "$schema": _PJJ_SCHEMA,
        "type": "BoundCRS",
        "source_crs": body,
        "target_crs": _pjj_geog({"ellps": "WGS84"}, "WGS 84"),
        "transformation": {
            "name": "Transformation to WGS84",
            "method": {
                "name": "Position Vector transformation (geog2D domain)"},
            "parameters": [
                _pjj_p("X-axis translation", vals[0], "metre"),
                _pjj_p("Y-axis translation", vals[1], "metre"),
                _pjj_p("Z-axis translation", vals[2], "metre"),
                _pjj_p("X-axis rotation", vals[3], "arc-second"),
                _pjj_p("Y-axis rotation", vals[4], "arc-second"),
                _pjj_p("Z-axis rotation", vals[5], "arc-second"),
                _pjj_p("Scale difference", vals[6], _PJJ_PPM),
            ],
        },
    }
