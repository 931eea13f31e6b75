"""Helmert transform: 3/4/7/14-parameter similarity transform on
cartesian coordinates.

Re-derivation of /root/reference/src/transformations/helmert.cpp:
- parameter epoch propagation: update_parameters :102-158
- rotation matrix (exact + small-angle, both conventions):
  build_rot_matrix :161-321
- 2D 4-param path :324-359, 3D path :362-436, 4D dispatch :438-463
- setup/param parsing :480-700 (rx/ry/rz in arc seconds, s in ppm)

The per-batch math is a single (3x3) @ (3,N) matrix product in NumPy;
time-dependent (14-param) transforms recompute R per distinct epoch.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .common import ARCSEC_TO_RAD


@dataclass(frozen=True)
class HelmertConsts:
    xyz0: tuple  # translations at epoch (m)
    opk0: tuple  # rotations at epoch (rad)
    scale0: float  # ppm
    dxyz: tuple
    dopk: tuple
    dscale: float
    t_epoch: float
    theta0: float  # 2D rotation (rad)
    dtheta: float
    exact: bool
    is_position_vector: bool
    fourparam: bool
    no_rotation: bool


def setup(params: dict) -> HelmertConsts:
    def g(key, default=0.0):
        return float(params.get(key, default))

    xyz0 = (g("x"), g("y"), g("z"))
    opk0 = (
        g("rx") * ARCSEC_TO_RAD,
        g("ry") * ARCSEC_TO_RAD,
        g("rz") * ARCSEC_TO_RAD,
    )
    scale0 = g("s")
    theta0 = g("theta") * ARCSEC_TO_RAD
    fourparam = "theta" in params
    if fourparam and "s" not in params:
        scale0 = 1.0
    dxyz = (g("dx"), g("dy"), g("dz"))
    dopk = (
        g("drx") * ARCSEC_TO_RAD,
        g("dry") * ARCSEC_TO_RAD,
        g("drz") * ARCSEC_TO_RAD,
    )
    no_rotation = all(v == 0 for v in opk0) and all(v == 0 for v in dopk)
    convention = params.get("convention")
    if not no_rotation and convention not in ("position_vector", "coordinate_frame"):
        raise ValueError("helmert: missing/invalid 'convention' argument")
    return HelmertConsts(
        xyz0=xyz0,
        opk0=opk0,
        scale0=scale0,
        dxyz=dxyz,
        dopk=dopk,
        dscale=g("ds"),
        t_epoch=g("t_epoch"),
        theta0=theta0,
        dtheta=g("dtheta") * ARCSEC_TO_RAD,
        exact="exact" in params,
        is_position_vector=(convention == "position_vector"),
        fourparam=fourparam,
        no_rotation=no_rotation,
    )


def _params_at(C: HelmertConsts, t_obs: float):
    dt = t_obs - C.t_epoch
    xyz = tuple(C.xyz0[i] + C.dxyz[i] * dt for i in range(3))
    opk = tuple(C.opk0[i] + C.dopk[i] * dt for i in range(3))
    scale = C.scale0 + C.dscale * dt
    theta = C.theta0 + C.dtheta * dt
    return xyz, opk, scale, theta


def _rot_matrix(C: HelmertConsts, opk) -> np.ndarray:
    f, t, p = opk
    if C.exact:
        cf, sf = np.cos(f), np.sin(f)
        ct, st = np.cos(t), np.sin(t)
        cp, sp = np.cos(p), np.sin(p)
        R = np.array(
            [
                [ct * cp, cf * sp + sf * st * cp, sf * sp - cf * st * cp],
                [-ct * sp, cf * cp - sf * st * sp, sf * cp + cf * st * sp],
                [st, -sf * ct, cf * ct],
            ]
        )
    else:
        R = np.array([[1.0, p, -t], [-p, 1.0, f], [t, -f, 1.0]])
    if C.is_position_vector:
        R = R.T
    return R


def fwd(X, Y, Z, C: HelmertConsts, t=None):
    """3D/4D forward. t: per-point epoch array or None (uses t_epoch)."""
    X = np.asarray(X, dtype=np.float64)
    if C.no_rotation and C.scale0 == 0 and C.dscale == 0:
        return X + C.xyz0[0], Y + C.xyz0[1], Z + C.xyz0[2]
    epochs = [None] if t is None else np.unique(np.asarray(t, dtype=np.float64))
    outX = np.empty_like(X)
    outY = np.empty_like(X)
    outZ = np.empty_like(X)
    for ep in np.atleast_1d(epochs):
        t_obs = C.t_epoch if (ep is None or not np.isfinite(ep)) else float(ep)
        m = slice(None) if t is None else (np.asarray(t) == ep)
        xyz, opk, scale_ppm, _ = _params_at(C, t_obs)
        R = _rot_matrix(C, opk)
        scale = 1.0 + scale_ppm * 1e-6
        x, y, z = X[m], Y[m], Z[m]
        outX[m] = scale * (R[0, 0] * x + R[0, 1] * y + R[0, 2] * z) + xyz[0]
        outY[m] = scale * (R[1, 0] * x + R[1, 1] * y + R[1, 2] * z) + xyz[1]
        outZ[m] = scale * (R[2, 0] * x + R[2, 1] * y + R[2, 2] * z) + xyz[2]
    return outX, outY, outZ


def inv(X, Y, Z, C: HelmertConsts, t=None):
    """3D/4D reverse (transpose multiplication); helmert.cpp:402-436."""
    X = np.asarray(X, dtype=np.float64)
    if C.no_rotation and C.scale0 == 0 and C.dscale == 0:
        return X - C.xyz0[0], Y - C.xyz0[1], Z - C.xyz0[2]
    epochs = [None] if t is None else np.unique(np.asarray(t, dtype=np.float64))
    outX = np.empty_like(X)
    outY = np.empty_like(X)
    outZ = np.empty_like(X)
    for ep in np.atleast_1d(epochs):
        t_obs = C.t_epoch if (ep is None or not np.isfinite(ep)) else float(ep)
        m = slice(None) if t is None else (np.asarray(t) == ep)
        xyz, opk, scale_ppm, _ = _params_at(C, t_obs)
        R = _rot_matrix(C, opk)
        scale = 1.0 + scale_ppm * 1e-6
        x = (X[m] - xyz[0]) / scale
        y = (Y[m] - xyz[1]) / scale
        z = (Z[m] - xyz[2]) / scale
        outX[m] = R[0, 0] * x + R[1, 0] * y + R[2, 0] * z
        outY[m] = R[0, 1] * x + R[1, 1] * y + R[2, 1] * z
        outZ[m] = R[0, 2] * x + R[1, 2] * y + R[2, 2] * z
    return outX, outY, outZ
