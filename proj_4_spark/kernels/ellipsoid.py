"""Ellipsoid parameter derivation.

Reimplements the constant derivation of PROJ's ``pj_calc_ellipsoid_params``
(/root/reference/src/ell_set.cpp) as a frozen dataclass: given (a, es)
derive the full constant pack an operation needs.  The catalog mirrors a
subset of /root/reference/src/ellps.cpp.
"""

from __future__ import annotations

import math
from dataclasses import dataclass


# id -> (a, rf_or_b) ; rf given as ("rf", value) or ("b", value)
# subset of /root/reference/src/ellps.cpp
ELLIPSOIDS: dict[str, tuple[float, str, float]] = {
    "WGS84": (6378137.0, "rf", 298.257223563),
    "GRS80": (6378137.0, "rf", 298.257222101),
    "WGS72": (6378135.0, "rf", 298.26),
    "WGS66": (6378145.0, "rf", 298.25),
    "WGS60": (6378165.0, "rf", 298.3),
    "intl": (6378388.0, "rf", 297.0),
    "bessel": (6377397.155, "rf", 299.1528128),
    "clrk66": (6378206.4, "b", 6356583.8),
    "clrk80": (6378249.145, "rf", 293.4663),
    "clrk80ign": (6378249.2, "rf", 293.4660212936269),
    "airy": (6377563.396, "rf", 299.3249646),
    "mod_airy": (6377340.189, "b", 6356034.446),
    "krass": (6378245.0, "rf", 298.3),
    "evrst30": (6377276.345, "rf", 300.8017),
    "GRS67": (6378160.0, "rf", 298.2471674270),
    "aust_SA": (6378160.0, "rf", 298.25),
    "helmert": (6378200.0, "rf", 298.3),
    "sphere": (6370997.0, "b", 6370997.0),
}


@dataclass(frozen=True)
class Ellipsoid:
    """The 18-constant pack of /root/reference/src/proj_internal.h:536-567."""

    a: float  # semimajor axis
    es: float  # first eccentricity squared

    # derived
    e: float = 0.0
    b: float = 0.0
    f: float = 0.0
    n: float = 0.0  # third flattening
    one_es: float = 0.0
    rone_es: float = 0.0
    ra: float = 0.0  # 1/a
    e2s: float = 0.0  # second eccentricity squared es/(1-es)
    e2: float = 0.0

    @staticmethod
    def from_a_es(a: float, es: float) -> "Ellipsoid":
        one_es = 1.0 - es
        f = 1.0 - math.sqrt(one_es)
        b = a * (1.0 - f)
        n = f / (2.0 - f)
        e2s = es / one_es if one_es != 0 else float("inf")
        return Ellipsoid(
            a=a,
            es=es,
            e=math.sqrt(es),
            b=b,
            f=f,
            n=n,
            one_es=one_es,
            rone_es=1.0 / one_es if one_es != 0 else float("inf"),
            ra=1.0 / a,
            e2s=e2s,
            e2=math.sqrt(e2s) if e2s >= 0 else float("nan"),
        )

    @staticmethod
    def from_name(name: str) -> "Ellipsoid":
        a, kind, v = ELLIPSOIDS[name]
        if kind == "rf":
            f = 1.0 / v
            es = 2.0 * f - f * f
        else:  # b
            f = (a - v) / a
            es = 2.0 * f - f * f
        return Ellipsoid.from_a_es(a, es)

    @staticmethod
    def from_params(params: dict) -> "Ellipsoid":
        """Resolve ellipsoid from proj-string params.

        Precedence mirrors /root/reference/src/ell_set.cpp (entry
        ``pj_ellipsoid``): explicit a + shape param beats +ellps;
        +R forces a sphere; the default appended when no ellipsoid
        information is given is GRS80
        (/root/reference/src/init.cpp:319-362).
        """
        if "R" in params:
            a = float(params["R"])
            return Ellipsoid.from_a_es(a, 0.0)
        if "a" in params:
            a = float(params["a"])
            if "es" in params:
                es = float(params["es"])
            elif "e" in params:
                e = float(params["e"])
                es = e * e
            elif "rf" in params:
                f = 1.0 / float(params["rf"])
                es = 2 * f - f * f
            elif "f" in params:
                f = float(params["f"])
                es = 2 * f - f * f
            elif "b" in params:
                b = float(params["b"])
                f = (a - b) / a
                es = 2 * f - f * f
            elif "ellps" in params:
                # +a resizes the named ellipsoid but keeps its SHAPE
                # (ell_set.cpp: size params override after +ellps)
                es = Ellipsoid.from_name(str(params["ellps"])).es
            else:
                es = 0.0  # a alone -> sphere of radius a
            ell = Ellipsoid.from_a_es(a, es)
        else:
            name = params.get("ellps", "GRS80")
            ell = Ellipsoid.from_name(name)
            # an explicit shape parameter reshapes the named ellipsoid
            # around its semimajor axis (ell_set.cpp: +ellps sets the
            # size, then es/e/rf/f/b override the shape)
            a = ell.a
            if "es" in params:
                ell = Ellipsoid.from_a_es(a, float(params["es"]))
            elif "e" in params:
                e = float(params["e"])
                ell = Ellipsoid.from_a_es(a, e * e)
            elif "rf" in params:
                f = 1.0 / float(params["rf"])
                ell = Ellipsoid.from_a_es(a, 2 * f - f * f)
            elif "f" in params:
                f = float(params["f"])
                ell = Ellipsoid.from_a_es(a, 2 * f - f * f)
            elif "b" in params:
                b = float(params["b"])
                f = (a - b) / a
                ell = Ellipsoid.from_a_es(a, 2 * f - f * f)
        return _spherify(ell, params)


_SIXTH = 1.0 / 6.0
_RA4 = 17.0 / 360.0
_RA6 = 67.0 / 3024.0
_RV4 = 5.0 / 72.0
_RV6 = 55.0 / 1296.0


def _spherify(ell: Ellipsoid, params: dict) -> Ellipsoid:
    """Spherification flags R_A/R_V/R_a/R_g/R_h/R_lat_a=phi/
    R_lat_g=phi/R_C (src/ell_set.cpp:356-453 ellps_spherification):
    replace the ellipsoid with the equivalent sphere (same area /
    volume / mean radius / conformal radius at phi0)."""
    import numpy as _np

    a, b, es = ell.a, ell.b, ell.es
    if "R_A" in params:
        a *= 1.0 - es * (_SIXTH + es * (_RA4 + es * _RA6))
    elif "R_V" in params:
        a *= 1.0 - es * (_SIXTH + es * (_RV4 + es * _RV6))
    elif "R_a" in params:
        a = (a + b) / 2.0
    elif "R_g" in params:
        a = float(_np.sqrt(a * b))
    elif "R_h" in params:
        if a + b == 0:
            raise ValueError("R_h: a + b == 0")
        a = 2.0 * a * b / (a + b)
    elif "R_lat_a" in params or "R_lat_g" in params:
        key = "R_lat_a" if "R_lat_a" in params else "R_lat_g"
        phi = float(params[key]) * _np.pi / 180.0
        if abs(phi) > _np.pi / 2:
            raise ValueError(f"{key}: |lat| should be <= 90")
        t = _np.sin(phi)
        t = 1.0 - es * t * t
        if t == 0.0:
            raise ValueError(f"{key}: invalid eccentricity")
        if key == "R_lat_a":
            a *= (1.0 - es + t) / (2.0 * t * float(_np.sqrt(t)))
        else:
            a *= float(_np.sqrt(1.0 - es)) / t
    elif "R_C" in params:
        # conformal-sphere radius "at phi0" (IOGP 373-7-2 §1.1) — but
        # the reference runs spherification BEFORE lat_0 is parsed
        # (pj_ellipsoid at init.cpp:566-586, phi0 at :647-676), so
        # P->phi0 is still 0 and R_C always yields a·sqrt(1-es) = b;
        # builtins.gie's merc +R_C +lat_0=45 block pins this behavior
        a *= float(_np.sqrt(1.0 - es))
    else:
        return ell
    if a <= 0:
        raise ValueError("spherification: invalid major axis")
    return Ellipsoid.from_a_es(a, 0.0)
