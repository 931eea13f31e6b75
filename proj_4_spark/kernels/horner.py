"""Horner polynomial datum transforms (Danish gen_pol).

Vectorized NumPy re-derivation of
/root/reference/src/transformations/horner.cpp:
- double real 2D Horner scheme:    :155-181 (backwards summation)
- single real Horner:              :183-194
- complex Horner:                  :196-215
- real forward/inverse:            :232-288
- real iterative inverse:          :290-345 (2x2 Jacobian fixed point)
- complex forward/inverse:         :363-398
- complex iterative inverse:       :400-460

Coefficient array layout is identical to gen_pol (and to the +fwd_u=
... proj-string encoding).  Operates on projected/projected channels.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def n_real_coefs(order: int) -> int:
    return (order + 1) * (order + 2) // 2


def n_complex_coefs(order: int) -> int:
    return 2 * order + 2


@dataclass(frozen=True)
class HornerConsts:
    order: int
    range: float
    tolerance: float
    complex_poly: bool
    uneg: bool
    vneg: bool
    fwd_origin: tuple  # (u, v)
    inv_origin: tuple
    fwd_u: np.ndarray | None
    fwd_v: np.ndarray | None
    inv_u: np.ndarray | None
    inv_v: np.ndarray | None
    fwd_c: np.ndarray | None
    inv_c: np.ndarray | None
    has_inv: bool


def _floats(s) -> np.ndarray:
    return np.array([float(v) for v in str(s).split(",")], dtype=np.float64)


def _pair(s) -> tuple:
    v = _floats(s)
    if len(v) != 2:
        raise ValueError("horner: origin needs exactly 2 values")
    return (float(v[0]), float(v[1]))


def setup(params: dict) -> HornerConsts:
    """horner.cpp horner_reassemble/parse (+deg, +range, +tolerance,
    +fwd_origin/+inv_origin, +fwd_u/v | +fwd_c, +inv_u/v | +inv_c,
    +uneg/+vneg)."""
    if "deg" not in params:
        raise ValueError("horner: missing +deg")
    order = int(params["deg"])
    if not (0 < order <= 40):
        raise ValueError("horner: invalid +deg")
    complex_poly = "fwd_c" in params
    rng = float(params.get("range", 500000.0))
    tol = float(params.get("tolerance", 0.001))
    fwd_origin = _pair(params["fwd_origin"]) if "fwd_origin" in params \
        else (0.0, 0.0)
    inv_origin = _pair(params["inv_origin"]) if "inv_origin" in params \
        else (0.0, 0.0)
    fwd_u = fwd_v = inv_u = inv_v = fwd_c = inv_c = None
    if complex_poly:
        n = n_complex_coefs(order)
        fwd_c = _floats(params["fwd_c"])
        if len(fwd_c) != n:
            raise ValueError("horner: fwd_c needs %d coefficients" % n)
        has_inv = "inv_c" in params
        if has_inv:
            inv_c = _floats(params["inv_c"])
            if len(inv_c) != n:
                raise ValueError("horner: inv_c needs %d coefficients" % n)
    else:
        n = n_real_coefs(order)
        for key in ("fwd_u", "fwd_v"):
            if key not in params:
                raise ValueError(f"horner: missing +{key}")
        fwd_u = _floats(params["fwd_u"])
        fwd_v = _floats(params["fwd_v"])
        if len(fwd_u) != n or len(fwd_v) != n:
            raise ValueError("horner: fwd_u/v need %d coefficients" % n)
        has_inv = "inv_u" in params and "inv_v" in params
        if has_inv:
            inv_u = _floats(params["inv_u"])
            inv_v = _floats(params["inv_v"])
            if len(inv_u) != n or len(inv_v) != n:
                raise ValueError("horner: inv_u/v need %d coefficients" % n)
    return HornerConsts(order=order, range=rng, tolerance=tol,
                        complex_poly=complex_poly,
                        uneg="uneg" in params, vneg="vneg" in params,
                        fwd_origin=fwd_origin, inv_origin=inv_origin,
                        fwd_u=fwd_u, fwd_v=fwd_v, inv_u=inv_u, inv_v=inv_v,
                        fwd_c=fwd_c, inv_c=inv_c, has_inv=has_inv)


def double_real_horner_eval(order: int, cx, cy, e, n, order_offset: int = 0):
    """horner.cpp:155-181: backwards double Horner scheme."""
    sz = n_real_coefs(order)
    icx = icy = sz
    icy -= 1
    N = np.full_like(e, cy[icy])
    icx -= 1
    E = np.full_like(e, cx[icx])
    for r in range(order, order_offset, -1):
        icy -= 1
        u = np.full_like(e, cy[icy])
        icx -= 1
        v = np.full_like(e, cx[icx])
        for _c in range(order, r - 1, -1):
            icy -= 1
            u = n * u + cy[icy]
            icx -= 1
            v = e * v + cx[icx]
        N = e * N + u
        E = n * E + v
    return E, N


def single_real_horner_eval(order: int, cx, x, order_offset: int = 0):
    """horner.cpp:183-194."""
    i = order + 1
    i -= 1
    u = np.full_like(x, cx[i])
    for _r in range(order, order_offset, -1):
        i -= 1
        u = x * u + cx[i]
    return u


def complex_horner_eval(order: int, c, e, n, order_offset: int = 0):
    """horner.cpp:196-215: coefficients (Cn0+i*Ce0, Cn1+i*Ce1, ...)."""
    sz = n_complex_coefs(order)
    cbeg = order_offset * 2
    idx = sz
    idx -= 1
    E = np.full_like(e, c[idx])
    idx -= 1
    N = np.full_like(e, c[idx])
    while idx > cbeg:
        idx -= 1
        w = n * E + e * N + c[idx]
        idx -= 1
        N = n * N - e * E + c[idx]
        E = w
    return E, N


def _range_mask(C: HornerConsts, e, n):
    return (np.abs(n) <= C.range) & (np.abs(e) <= C.range)


def fwd(u, v, C: HornerConsts):
    e = u - C.fwd_origin[0]
    n = v - C.fwd_origin[1]
    if C.complex_poly:
        if C.uneg:
            e = -e
        if C.vneg:
            n = -n
        E, N = complex_horner_eval(C.order, C.fwd_c, e, n)
    else:
        E, N = double_real_horner_eval(C.order, C.fwd_u, C.fwd_v, e, n)
    ok = _range_mask(C, u - C.fwd_origin[0], v - C.fwd_origin[1])
    return np.where(ok, E, np.nan), np.where(ok, N, np.nan)


def inv(u, v, C: HornerConsts, max_iter: int = 32):
    if C.has_inv:
        e = u - C.inv_origin[0]
        n = v - C.inv_origin[1]
        if C.complex_poly:
            if C.uneg:
                e = -e
            if C.vneg:
                n = -n
            E, N = complex_horner_eval(C.order, C.inv_c, e, n)
        else:
            E, N = double_real_horner_eval(C.order, C.inv_u, C.inv_v, e, n)
        ok = _range_mask(C, e, n)
        return np.where(ok, E, np.nan), np.where(ok, N, np.nan)
    # iterative inverse on the forward polynomial
    ok = _range_mask(C, u, v)
    if C.complex_poly:
        # horner.cpp:400-460 complex Newton-like fixed point
        dN = v - C.fwd_c[0]
        dE = u - C.fwd_c[1]
        x0 = np.zeros_like(u)
        y0 = np.zeros_like(u)  # (y0 = N part, x0 = E part)
        for _ in range(max_iter):
            # derivative-free fixed point mirroring the reference:
            # evaluate the order>=1 part at (x0, y0)
            E1, N1 = complex_horner_eval(C.order, C.fwd_c, x0, y0, 1)
            # w = dZ / (first-order complex coefficient estimate)
            denom = N1 * N1 + E1 * E1
            with np.errstate(invalid="ignore", divide="ignore"):
                y = (dN * N1 + dE * E1) / denom
                x = (dE * N1 - dN * E1) / denom
            done = (np.abs(x - x0) < C.tolerance) & \
                   (np.abs(y - y0) < C.tolerance)
            x0, y0 = x, y
            if done.all():
                break
        u_out = x0 + C.fwd_origin[0]
        v_out = y0 + C.fwd_origin[1]
        if C.uneg:
            u_out = -u_out
        if C.vneg:
            v_out = -v_out
        return np.where(ok, u_out, np.nan), np.where(ok, v_out, np.nan)
    # real iterative inverse (horner.cpp:290-345)
    de = u - C.fwd_u[0]
    dn = v - C.fwd_v[0]
    x0 = np.zeros_like(u)
    y0 = np.zeros_like(u)
    for _ in range(max_iter):
        Mbc_u, Mbc_v = double_real_horner_eval(C.order, C.fwd_u, C.fwd_v,
                                               x0, y0, 1)
        Mb, Mc = Mbc_u, Mbc_v
        Ma = single_real_horner_eval(C.order, C.fwd_u, x0, 1)
        Md = single_real_horner_eval(C.order, C.fwd_v, y0, 1)
        with np.errstate(invalid="ignore", divide="ignore"):
            idet = 1.0 / (Ma * Md - Mb * Mc)
            x = idet * (Md * de - Mb * dn)
            y = idet * (Ma * dn - Mc * de)
        done = (np.abs(x - x0) < C.tolerance) & (np.abs(y - y0) < C.tolerance)
        x0, y0 = x, y
        if done.all():
            break
    u_out = x0 + C.fwd_origin[0]
    v_out = y0 + C.fwd_origin[1]
    return np.where(ok, u_out, np.nan), np.where(ok, v_out, np.nan)
