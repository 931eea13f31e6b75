"""One-off builder for proj_4_spark/epsg_data.py.

Reads the PUBLIC EPSG dataset as shipped in the reference's registry
sources (/root/reference/data/sql/*.sql — the same published EPSG data
proj.db is built from) and emits the generated projected-CRS registry,
restricted to definitions this engine fully supports end-to-end (see
the emitted module docstring).  Every emitted entry is validated here
by compile + forward + inverse roundtrip before it is written.

This is a BUILD tool: the runtime package never reads the reference.

Usage: python scripts/generate_epsg_data.py [--dry-run]
"""

from __future__ import annotations

import collections
import re
import sys

sys.path.insert(0, ".")

D = "/root/reference/data/sql/"
FT_US = 1200.0 / 3937.0

# ---------------------------------------------------------------- parse


def _read(fname: str) -> str:
    with open(D + fname) as f:
        return f.read()


def parse_tables():
    axes = collections.defaultdict(list)
    for m in re.finditer(
            r"INSERT INTO \"axis\" VALUES\('EPSG','\d+','[^']*','[^']*',"
            r"'([^']*)','EPSG','(\d+)',(\d+),'EPSG','(\d+)'\);",
            _read("axis.sql")):
        direction, cs, order, uom = m.groups()
        axes[cs].append((int(order), direction, uom))
    for cs in axes:
        axes[cs] = [(d, u) for _, d, u in sorted(axes[cs])]

    geo = {}
    for m in re.finditer(
            r"INSERT INTO \"geodetic_crs\" VALUES\('EPSG','(\d+)',"
            r"'([^']*)',(?:NULL|'[^']*'),'([^']*)','EPSG','(\d+)',"
            r"'EPSG','(\d+)',NULL,(\d)\);".replace("','EPSG'", "','EPSG'"),
            _read("geodetic_crs.sql")):
        code, name, kind, cs, datum, dep = m.groups()
        geo[code] = (name, kind, datum, dep)

    datum_ell = {}
    for m in re.finditer(
            r"INSERT INTO \"geodetic_datum\" VALUES\('EPSG','(\d+)',"
            r"'([^']*)',(?:NULL|'[^']*'),'EPSG','(\d+)','EPSG','(\d+)',",
            _read("geodetic_datum.sql")):
        code, name, ell, pm = m.groups()
        datum_ell[code] = (name, ell, pm)

    ens = {}
    for m in re.finditer(
            r"INSERT INTO \"geodetic_datum_ensemble_member\" VALUES\("
            r"'EPSG','(\d+)','EPSG','(\d+)',(\d+)\);",
            _read("geodetic_datum_ensemble_member.sql")):
        e, member, _seq = m.groups()
        ens.setdefault(e, member)

    ells = {}
    for m in re.finditer(
            r"INSERT INTO \"ellipsoid\" VALUES\('EPSG','(\d+)','([^']*)',"
            r"(?:NULL|'[^']*'),'[^']*','[^']*',([0-9.eE+-]+),'EPSG',"
            r"'(\d+)',(NULL|[0-9.eE+-]+),(NULL|[0-9.eE+-]+),\d\);",
            _read("ellipsoid.sql")):
        code, name, a, _uom, rf, b = m.groups()
        ells[code] = (name, float(a),
                      None if rf == "NULL" else float(rf),
                      None if b == "NULL" else float(b))

    conv = {}
    for m in re.finditer(
            r"INSERT INTO \"conversion\" VALUES\('EPSG','(\d+)','([^']*)',"
            r"(?:NULL|'(?:[^']|'')*'),'EPSG','(\d+)','[^']*',(.*?),(\d)\);\n",
            _read("conversion.sql")):
        code, _name, method, rest, _dep = m.groups()
        params = {}
        for pm in re.finditer(
                r"'EPSG','(\d+)','(?:[^']|'')*',([0-9.eE+-]+),"
                r"'EPSG','(\d+)'", rest):
            pcode, val, uom = pm.groups()
            params[pcode] = (val, uom)
        conv[code] = (method, params)

    proj_rows = re.findall(
        r"INSERT INTO \"projected_crs\" VALUES\('EPSG','(\d+)','([^']*)',"
        r"(?:NULL|'(?:[^']|'')*'),'EPSG','(\d+)','EPSG','(\d+)','EPSG',"
        r"'(\d+)',(?:NULL|'(?:[^']|'')*'),(\d)\);",
        _read("projected_crs.sql"))
    return axes, geo, datum_ell, ens, ells, conv, proj_rows


# ------------------------------------------------------ unit conversion


def ang_deg(val: str, uom: str) -> float:
    if uom == "9102":
        return float(val)
    if uom == "9110":  # sexagesimal DMS D.MMSSsss — decode digit-exactly
        s = val
        neg = s.startswith("-")
        if neg:
            s = s[1:]
        d, frac = (s.split(".") + [""])[:2]
        frac = frac + "0000000000"
        out = (int(d) + int(frac[0:2]) / 60.0
               + float(frac[2:4] + "." + frac[4:]) / 3600.0)
        return -out if neg else out
    if uom == "9105":  # grad
        return float(val) * 0.9
    raise KeyError("angular uom " + uom)


def lin_m(val: str, uom: str) -> float:
    if uom == "9001":
        return float(val)
    if uom == "9003":
        return float(val) * FT_US
    if uom == "9002":
        return float(val) * 0.3048
    raise KeyError("linear uom " + uom)


def sc(val: str, uom: str) -> float:
    if uom == "9201":
        return float(val)
    raise KeyError("scale uom " + uom)


def fmt(v: float) -> str:
    s = repr(float(v))
    return s[:-2] if s.endswith(".0") else s


# ------------------------------------------------------- method table

_ANG = ("lat_0", "lon_0", "lat_1", "lat_2", "lat_ts", "lonc",
        "alpha", "gamma")


def simple(pid, roles, extra="", optional=()):
    def build(p):
        parts = [f"+proj={pid}"]
        if extra:
            parts.append(extra)
        for pcode, role in roles:
            if pcode not in p:
                if role in ("k", "k_0") or pcode in optional:
                    continue
                parts.append(f"+{role}=0")
                continue
            val, uom = p[pcode]
            if role in _ANG:
                parts.append(f"+{role}={fmt(ang_deg(val, uom))}")
            elif role in ("k", "k_0"):
                parts.append(f"+{role}={fmt(sc(val, uom))}")
            else:
                parts.append(f"+{role}={fmt(lin_m(val, uom))}")
        return " ".join(parts)
    return build


def lcc1sp(p):
    lat = fmt(ang_deg(*p["8801"]))
    return (f"+proj=lcc +lat_1={lat} +lat_0={lat} "
            f"+lon_0={fmt(ang_deg(*p['8802']))} "
            f"+k_0={fmt(sc(*p['8805']))} "
            f"+x_0={fmt(lin_m(*p['8806']))} +y_0={fmt(lin_m(*p['8807']))}")


def merc_a(p):
    if "8801" in p and ang_deg(*p["8801"]) != 0.0:
        raise KeyError("merc A lat_0 != 0")
    return (f"+proj=merc +lon_0={fmt(ang_deg(*p['8802']))} "
            f"+k={fmt(sc(*p['8805']))} "
            f"+x_0={fmt(lin_m(*p['8806']))} +y_0={fmt(lin_m(*p['8807']))}")


def polar_b(p):
    ts = ang_deg(*p["8832"])
    lat0 = 90.0 if ts >= 0 else -90.0
    return (f"+proj=stere +lat_0={fmt(lat0)} +lat_ts={fmt(ts)} "
            f"+lon_0={fmt(ang_deg(*p['8833']))} "
            f"+x_0={fmt(lin_m(*p['8806']))} +y_0={fmt(lin_m(*p['8807']))}")


METHODS = {
    "9807": simple("tmerc", [("8801", "lat_0"), ("8802", "lon_0"),
                             ("8805", "k"), ("8806", "x_0"),
                             ("8807", "y_0")]),
    # TM South Orientated: westing/southing handled via the cs axes
    "9808": simple("tmerc", [("8801", "lat_0"), ("8802", "lon_0"),
                             ("8805", "k"), ("8806", "x_0"),
                             ("8807", "y_0")], extra="+axis=wsu"),
    "9801": lcc1sp,
    "9802": simple("lcc", [("8821", "lat_0"), ("8822", "lon_0"),
                           ("8823", "lat_1"), ("8824", "lat_2"),
                           ("8826", "x_0"), ("8827", "y_0")]),
    "9804": merc_a,
    "9805": simple("merc", [("8823", "lat_ts"), ("8802", "lon_0"),
                            ("8806", "x_0"), ("8807", "y_0")]),
    "1024": simple("webmerc", [("8801", "lat_0"), ("8802", "lon_0"),
                               ("8806", "x_0"), ("8807", "y_0")]),
    "9809": simple("sterea", [("8801", "lat_0"), ("8802", "lon_0"),
                              ("8805", "k"), ("8806", "x_0"),
                              ("8807", "y_0")]),
    "9810": simple("stere", [("8801", "lat_0"), ("8802", "lon_0"),
                             ("8805", "k"), ("8806", "x_0"),
                             ("8807", "y_0")]),
    "9829": polar_b,
    "9820": simple("laea", [("8801", "lat_0"), ("8802", "lon_0"),
                            ("8806", "x_0"), ("8807", "y_0")]),
    "9822": simple("aea", [("8821", "lat_0"), ("8822", "lon_0"),
                           ("8823", "lat_1"), ("8824", "lat_2"),
                           ("8826", "x_0"), ("8827", "y_0")]),
    "9806": simple("cass", [("8801", "lat_0"), ("8802", "lon_0"),
                            ("8806", "x_0"), ("8807", "y_0")]),
    "9818": simple("poly", [("8801", "lat_0"), ("8802", "lon_0"),
                            ("8806", "x_0"), ("8807", "y_0")]),
    "9835": simple("cea", [("8823", "lat_ts"), ("8802", "lon_0"),
                           ("8806", "x_0"), ("8807", "y_0")]),
    "1028": simple("eqc", [("8823", "lat_ts"), ("8802", "lon_0"),
                           ("8806", "x_0"), ("8807", "y_0")]),
    "1029": simple("eqc", [("8823", "lat_ts"), ("8802", "lon_0"),
                           ("8806", "x_0"), ("8807", "y_0")]),
    "1078": simple("eqearth", [("8802", "lon_0"), ("8806", "x_0"),
                               ("8807", "y_0")]),
    "9812": simple("omerc", [("8811", "lat_0"), ("8812", "lonc"),
                             ("8813", "alpha"), ("8814", "gamma"),
                             ("8815", "k"), ("8806", "x_0"),
                             ("8807", "y_0")],
                   extra="+no_uoff", optional=("8814",)),
    "9815": simple("omerc", [("8811", "lat_0"), ("8812", "lonc"),
                             ("8813", "alpha"), ("8814", "gamma"),
                             ("8815", "k"), ("8816", "x_0"),
                             ("8817", "y_0")], optional=("8814",)),
    "1052": simple("col_urban", [("8801", "lat_0"), ("8802", "lon_0"),
                                 ("8806", "x_0"), ("8807", "y_0"),
                                 ("1039", "h_0")], optional=("1039",)),
    # Krovak: the cone colatitude (1036) and pseudo-SP latitude (8818)
    # are the fixed S-JTSK constants baked into the kernel
    # (kernels/natgrid.py); North-Orientated (1041) is the plain
    # kernel output (negative E-N), classic south-west (9819) mirrors
    # the reference's +czech via +axis=wsu
    "1041": simple("krovak", [("8811", "lat_0"), ("8833", "lon_0"),
                              ("8819", "k_0"), ("8806", "x_0"),
                              ("8807", "y_0")]),
    "9819": simple("krovak", [("8811", "lat_0"), ("8833", "lon_0"),
                              ("8819", "k_0"), ("8806", "x_0"),
                              ("8807", "y_0")], extra="+axis=wsu"),
}

# ------------------------------------------------- geodetic base policy

# Curated standard published proj4 WGS84 bridges (datums.cpp where the
# reference ships one, classic cs2cs values otherwise).
BRIDGES = {
    "4267": "+towgs84=-8,160,176",
    "4230": "+towgs84=-87,-98,-121",
    "4277": "+towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489",
    "4314": "+towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7",
    "4312": "+towgs84=577.326,90.129,463.919,5.137,1.474,5.297,2.4232",
    "4284": "+towgs84=23.92,-141.27,-80.9,0,0.35,0.82,-0.12",
    "4322": "+towgs84=0,0,4.5,0,0,0.554,0.2263",
    "4324": "+towgs84=0,0,1.9,0,0,0.814,-0.38",
    "4272": "+towgs84=59.47,-5.04,187.44,0.47,-0.1,1.024,-4.5993",
    "4275": "+towgs84=-168,-60,320",
    "4237": "+towgs84=52.17,-71.82,-14.9",
    "4289": "+towgs84=565.417,50.3319,465.552,"
            "-0.398957,0.343988,-1.8774,4.0725",
    "4149": "+towgs84=674.374,15.056,405.346",
    "4150": "+towgs84=674.374,15.056,405.346",
    "4121": "+towgs84=-199.87,74.79,246.62",       # GGRS87 (datums.cpp:44)
    "4156": "+towgs84=589,76,480",                 # S-JTSK (classic epsg registry)
}

# Non-Greenwich bases: geog -> (+pm name, full ellps+bridge string)
PM_BASES = {
    "4807": ("paris", "+ellps=clrk80ign +towgs84=-168,-60,320"),
    "4805": ("ferro", "+ellps=bessel "
             "+towgs84=577.326,90.129,463.919,5.137,1.474,5.297,2.4232"),
    "4818": ("ferro", "+ellps=bessel +towgs84=589,76,480"),  # S-JTSK (Ferro)
}

# ITRF/ETRS/WGS-aligned frames: identity to WGS84 at proj4 accuracy.
# Hand-curated core list + every remaining GRS80/WGS84/CGCS2000
# Greenwich frame except the shifted classics below (those are modern
# ITRF realizations by construction).
NOBRIDGE_CORE = {
    "4326", "4258", "4269", "6318", "4152", "4759", "4617", "8232",
    "8237", "8240", "8246", "8249", "4283", "7844", "4167", "4674",
    "4170", "4686", "4612", "6668", "4171", "4619", "4148", "4490",
    "4661", "4747", "4765", "7912", "9000", "9755", "8353", "4075",
    "4081", "9990", "4214", "4555", "4610", "7683", "4178", "4179",
    "4683", "4756", "4742", "4762", "4783", "9248", "8685", "4023",
    "9140",
}
# GRS80-family frames that are NOT ITRF-aligned and have no published
# standard bridge — excluded rather than silently zero-shifted
SHIFTED_CLASSICS = {"4141", "4319", "4750", "4693"}

OUR_ELLPS = {
    (6378137.0, 298.257223563): "WGS84",
    (6378137.0, 298.257222101): "GRS80",
    (6378206.4, 294.978698213898): "clrk66",
    (6378388.0, 297.0): "intl",
    (6378245.0, 298.3): "krass",
    (6377563.396, 299.3249646): "airy",
    (6377397.155, 299.1528128): "bessel",
    (6378135.0, 298.26): "WGS72",
    (6378160.0, 298.25): "aust_SA",
    (6378160.0, 298.247167427): "GRS67",
    (6378249.2, 293.4660212936269): "clrk80ign",
}

MODERN_ELLS = {"7019", "7030", "1024"}  # GRS80, WGS84, CGCS2000


def main() -> int:
    axes, geo, datum_ell, ens, ells, conv, proj_rows = parse_tables()

    def datum_of(geog):
        g = geo.get(geog)
        if g is None or g[3] != "0" or g[1] != "geographic 2D":
            return None, None
        d = g[2]
        if d not in datum_ell and d in ens:
            d = ens[d]
        return g, datum_ell.get(d)

    def ell_base(de):
        e = ells.get(de[1])
        if e is None:
            return None
        _name, a, rf, b = e
        if rf is None and b is not None:
            rf = a / (a - b) if a != b else 0.0
        for (ka, krf), v in OUR_ELLPS.items():
            if abs(a - ka) < 1e-6 and rf and abs(rf - krf) < 1e-6:
                return f"+ellps={v}"
        return f"+a={fmt(a)} +rf={fmt(rf)}"

    def base_string(geog):
        if geog in PM_BASES:
            pmname, rest = PM_BASES[geog]
            return f"{rest} +pm={pmname}"
        g, de = datum_of(geog)
        if de is None or de[2] != "8901":
            return None
        base = ell_base(de)
        if base is None:
            return None
        if geog in BRIDGES:
            return base + " " + BRIDGES[geog]
        if geog in NOBRIDGE_CORE:
            return base
        if de[1] in MODERN_ELLS and geog not in SHIFTED_CLASSICS:
            return base  # modern ITRF-aligned frame
        return None

    out, skipped = {}, collections.Counter()
    for code, _name, cs, geog, cv, dep in proj_rows:
        if dep != "0":
            skipped["deprecated"] += 1
            continue
        ax = axes.get(cs)
        if not ax or len(ax) != 2:
            skipped["cs-shape"] += 1
            continue
        dirs = tuple(d for d, u in ax)
        uoms = {u for d, u in ax}
        if uoms == {"9001"}:
            unit = ""
        elif uoms == {"9003"}:
            unit = " +units=us-ft"
        elif uoms == {"9002"}:
            unit = " +units=ft"
        else:
            skipped["cs-unit"] += 1
            continue
        if set(dirs) == {"east", "north"}:
            axis = ""
        elif dirs == ("west", "south"):
            axis = " +axis=wsu"
        elif dirs == ("south", "west") and conv.get(cv, ("", {}))[0] \
                == "9819":
            axis = ""  # classic Krovak: the method itself adds +axis=wsu
        else:
            skipped["cs-dirs"] += 1
            continue
        c = conv.get(cv)
        if c is None:
            skipped["no-conversion"] += 1
            continue
        method, params = c
        b = METHODS.get(method)
        if b is None:
            skipped["method-" + method] += 1
            continue
        es = base_string(geog)
        if es is None:
            skipped["base-geog"] += 1
            continue
        try:
            ps = b(params)
            if method in ("9808", "9819"):
                ps = ps.replace(" +axis=wsu", "") + " +axis=wsu"
        except KeyError as e:
            skipped["param-" + str(e)[:24]] += 1
            continue
        s = f"{ps}{unit}{axis} {es}"
        # the Swiss azimuth-90 Hotine-B degenerate case -> somerc
        if ("+proj=omerc" in s and "+alpha=90 " in s + " "
                and "+gamma=90 " in s + " " and "+no_uoff" not in s):
            d = dict(p.split("=", 1) for p in s.split() if "=" in p)
            tail = s.split(" +y_0=")[1].split(" ", 1)[1]
            s = (f"+proj=somerc +lat_0={d['+lat_0']} +lon_0={d['+lonc']} "
                 f"+k_0={d.get('+k', '1')} +x_0={d['+x_0']} "
                 f"+y_0={d['+y_0']} {tail}")
        toks, seen, o2 = s.split(), set(), []
        for t in toks:
            if t in seen and t.startswith("+axis"):
                continue
            seen.add(t)
            o2.append(t)
        out[int(code)] = " ".join(o2)

    # geographic-2D bases for every datum the projected entries use
    used_geogs = set()
    for code, _name, cs, geog, cv, dep in proj_rows:
        if dep == "0":
            used_geogs.add(geog)
    for geog in sorted(used_geogs, key=int):
        bs = base_string(geog)
        if bs is None or int(geog) in out:
            continue
        out.setdefault(int(geog), f"+proj=longlat {bs}")

    print(f"GENERATED {len(out)}")
    for k, v in skipped.most_common(12):
        print("skip", k, v)

    # ------------------------------------------------ validate in-engine
    import numpy as np

    from proj_4_spark.proj import compile_projstring

    bad = []
    for code, ps in sorted(out.items()):
        try:
            tr = compile_projstring(ps)
            d = dict(p.split("=", 1) for p in ps.split() if "=" in p)
            lon = np.array([float(d.get("+lonc", d.get("+lon_0", 0.0)))
                            + 1.5])
            lat0 = float(d.get("+lat_0") or d.get("+lat_1")
                         or d.get("+lat_ts") or 20.0) or 15.0
            lat = np.array([min(max(lat0, -80.0), 80.0)])
            x, y = tr.transform_deg(lon, lat)[:2]
            if not (np.isfinite(x[0]) and np.isfinite(y[0])):
                bad.append((code, "nonfinite fwd"))
                continue
            ti = compile_projstring("+proj=pipeline +step +inv " + ps)
            if ps.startswith("+proj=longlat"):
                x, y = np.radians(x), np.radians(y)
            lo2, la2 = ti.transform(x, y)[:2]
            err = (abs((np.degrees(lo2[0]) - lon[0] + 180) % 360 - 180)
                   + abs(np.degrees(la2[0]) - lat[0]))
            if err > 2e-7:
                bad.append((code, f"roundtrip {err:.2e}"))
        except Exception as e:  # noqa: BLE001 — collect, report, fail
            bad.append((code, str(e)[:70]))
    for b in bad[:20]:
        print("BAD", b, out[b[0]][:90])
    if bad:
        print(f"{len(bad)} entries failed validation — NOT writing")
        return 1

    if "--dry-run" in sys.argv:
        return 0

    hdr = '''"""Generated EPSG projected-CRS registry (data, not code).

Parameter VALUES are transcribed from the EPSG dataset as shipped in
the reference's public registry sources (/root/reference/data/sql/
projected_crs.sql, conversion.sql, geodetic_crs.sql, geodetic_datum.sql,
ellipsoid.sql, axis.sql — the same published EPSG data proj.db is built
from; permitted data transcription, like the gie goldens and the NKG
table).  Regenerate with scripts/generate_epsg_data.py, which also
validates every entry by compile + forward + inverse roundtrip.

The generator restricts entries to what this engine fully supports
end-to-end (the WKT1/WKT2/PROJJSON writers cover every method here):

- methods: Transverse Mercator (9807, + south-orientated 9808),
  Lambert Conic Conformal 1SP/2SP (9801/9802), Mercator A/B
  (9804/9805), Popular Visualisation Pseudo Mercator (1024), Oblique
  Stereographic (9809), Polar Stereographic A/B (9810/9829), LAEA
  (9820), Albers (9822), Cassini-Soldner (9806), American Polyconic
  (9818), Lambert Cylindrical Equal Area (9835), Equidistant
  Cylindrical (1028/1029), Equal Earth (1078), Hotine Oblique
  Mercator A/B (9812/9815; the azimuth-90 Swiss degenerate case maps
  to somerc like the reference), Colombia Urban (1052)
- coordinate systems: east/north axes in metre, US survey foot
  (-> +units=us-ft, false origins converted to metres) or
  international foot (-> +units=ft), plus west/south metre
  (-> +axis=wsu); other directions/units skipped
- base geographic CRSs: ellipsoid resolved through the datum/ensemble
  tables; the WGS84 Helmert bridge (+towgs84) is a curated table of
  the standard published proj4 bridges; modern ITRF/ETRS/WGS-aligned
  GRS80/WGS84/CGCS2000 frames carry none (identity at proj4
  accuracy); GRS80-era classics with real offsets but no published
  bridge are excluded rather than silently zero-shifted; the NTF
  (Paris) and MGI (Ferro) families ride +pm=
- the geographic-2D bases of every included datum are registered too
  (+proj=longlat), so crs_to_crs plans by EPSG code on both sides
- deprecated CRSs skipped; EPSG sexagesimal-DMS literals (uom 9110)
  decoded digit-exactly

Every entry below was verified at build time: compile + forward +
inverse roundtrip < 2e-7 deg at a point near the projection origin.
"""

EPSG_GENERATED: dict[int, str] = {
'''
    with open("proj_4_spark/epsg_data.py", "w") as f:
        f.write(hdr)
        for code in sorted(out):
            f.write(f'    {code}: "{out[code]}",\n')
        f.write("}\n")
    print(f"wrote proj_4_spark/epsg_data.py with {len(out)} entries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
