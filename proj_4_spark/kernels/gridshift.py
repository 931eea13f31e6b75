"""Grid-based datum shifts (hgridshift / vgridshift / gridshift).

Re-derivation of the reference's grid application machinery:
- bilinear 4-corner sampling: /root/reference/src/grids.cpp:3322-3393
- iterative inverse (fixed-point on the forward shift, <= 10
  iterations, tolerance 1e-12): src/grids.cpp:3400-3450
- vertical grid: direct offset add/subtract (src/grids.cpp:200-310)

Grids are small NumPy arrays broadcast to executors (the reference
lazily loads + LRU-caches grid tiles; a broadcast variable is the
Spark-native equivalent).  The grid layout matches PROJ/NTv2
conventions: row-major, origin (lon0, lat0), spacing (dlon, dlat),
values in radians offsets (dlam, dphi) for horizontal grids, meters
for vertical grids.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

MAX_ITER = 10
TOL = 1e-12


@dataclass(frozen=True)
class Grid:
    lon0: float  # west edge, radians
    lat0: float  # south edge, radians
    dlon: float
    dlat: float
    # (height, width [, 2]) arrays
    values: np.ndarray
    # file-declared default interpolation (GeoTIFF
    # interpolation_method; grids.cpp:344-382)
    interp: str = "bilinear"
    # grid georeferenced in a PROJECTED CRS (gridshift.cpp projected
    # grids: extents/offsets in metres, no angular wrap)
    projected: bool = False
    # NTv2/CTable2 store the longitude band west-positive; parsers
    # negate it at load so hgridshift applies east-positive values
    # directly.  Raw-value consumers (deformation's legacy +xy_grids
    # velocities, grids.cpp:3572 compensateNTConvention=false) must
    # undo that negation, so record it here.
    nt_lam_negated: bool = False


def _is_global_lon(grid: Grid) -> bool:
    """True when the grid's columns tile the full 360° circle (node 0
    repeats one step past the last column) — sampling then wraps in
    longitude like the reference's fullWorldExtent handling."""
    if grid.projected:
        return False
    w = grid.values.shape[1]
    return abs(w * grid.dlon - 2.0 * np.pi) < 1e-9


def _bilinear(grid: Grid, lam, phi):
    """4-corner weighted sample; grids.cpp:3322-3393 semantics
    (clamped to the grid edge; full-world grids wrap in longitude)."""
    g = grid.values
    h, w = g.shape[:2]
    fx = (lam - grid.lon0) / grid.dlon
    fy = (phi - grid.lat0) / grid.dlat
    if _is_global_lon(grid):
        fx = np.mod(fx, w)
        ix = np.floor(fx).astype(np.int64) % w
        ix1 = (ix + 1) % w
    else:
        ix = np.clip(np.floor(fx).astype(np.int64), 0, w - 2)
        ix1 = ix + 1
    iy = np.clip(np.floor(fy).astype(np.int64), 0, h - 2)
    tx = fx - np.floor(fx) if _is_global_lon(grid) else fx - ix
    ty = fy - iy
    v00 = g[iy, ix]
    v10 = g[iy, ix1]
    v01 = g[iy + 1, ix]
    v11 = g[iy + 1, ix1]
    if g.ndim == 3:
        tx = tx[..., None]
        ty = ty[..., None]
    w00 = (1 - tx) * (1 - ty)
    w10 = tx * (1 - ty)
    w01 = (1 - tx) * ty
    w11 = tx * ty
    out = w00 * v00 + w10 * v10 + w01 * v01 + w11 * v11
    if np.isnan(g).any():
        # nodata corners are excluded and the remaining weights
        # renormalized (the reference's GTiffGrid nodata handling)
        tot = np.zeros_like(out)
        acc = np.zeros_like(out)
        for wk, vk in ((w00, v00), (w10, v10), (w01, v01), (w11, v11)):
            ok = ~np.isnan(vk)
            acc = np.where(ok, acc + wk * vk, acc)
            tot = np.where(ok, tot + wk * np.ones_like(vk), tot)
        with np.errstate(invalid="ignore", divide="ignore"):
            renorm = acc / tot
        out = np.where(np.isnan(out) & (tot > 0), renorm, out)
    return out


def _biquadratic(grid: Grid, lam, phi):
    """3x3-window quadratic sample — the reference's port of NOAA's
    qterp() (transformations/gridshift.cpp:474-540, after NOAA TM NOS
    NGS 0084): the window shifts one cell left/down when the fraction
    is before the half-pixel (or the base index touches the east/north
    edge), then a parabola through f(0), f(1), f(2) is evaluated along
    x for each of the 3 rows and once more along y."""
    g = grid.values
    h, w = g.shape[:2]
    if h < 3 or w < 3:
        return _bilinear(grid, lam, phi)
    fx = (lam - grid.lon0) / grid.dlon
    fy = (phi - grid.lat0) / grid.dlat
    ix = np.clip(np.floor(fx).astype(np.int64), 0, w - 2)
    iy = np.clip(np.floor(fy).astype(np.int64), 0, h - 2)
    tx = fx - ix
    ty = fy - iy
    sx = ((tx <= 0.5) & (ix > 0)) | (ix + 2 == w)
    ix = np.where(sx, ix - 1, ix)
    tx = np.where(sx, tx + 1.0, tx)
    sy = ((ty <= 0.5) & (iy > 0)) | (iy + 2 == h)
    iy = np.where(sy, iy - 1, iy)
    ty = np.where(sy, ty + 1.0, ty)
    if g.ndim == 3:
        tx = tx[..., None]
        ty = ty[..., None]

    def qterp(x, f0, f1, f2):
        df0 = f1 - f0
        d2f0 = (f2 - f1) - df0
        return f0 + x * df0 + 0.5 * x * (x - 1.0) * d2f0

    r0 = qterp(tx, g[iy, ix], g[iy, ix + 1], g[iy, ix + 2])
    r1 = qterp(tx, g[iy + 1, ix], g[iy + 1, ix + 1], g[iy + 1, ix + 2])
    r2 = qterp(tx, g[iy + 2, ix], g[iy + 2, ix + 1], g[iy + 2, ix + 2])
    return qterp(ty, r0, r1, r2)


def wrap_lam(grid: Grid, lam):
    """Normalize query longitudes into the grid's own frame: grids may
    be georeferenced across the antimeridian (0..360-style origins —
    the reference normalizes lookups the same way,
    grids.cpp ExtentAndRes + pj_find_grid longitude adjustment).  A
    ±2π shift is adopted only when it lands the point inside the
    grid's longitude span; ordinary outside points are unchanged.
    Projected-CRS grids never wrap."""
    if grid.projected:
        return np.asarray(lam, dtype=np.float64)
    h, w = grid.values.shape[:2]
    lon_max = grid.lon0 + (w - 1) * grid.dlon
    lam = np.asarray(lam, dtype=np.float64)
    two_pi = 2.0 * np.pi
    up = (lam < grid.lon0) & (lam + two_pi <= lon_max + 1e-9)
    dn = (lam > lon_max) & (lam - two_pi >= grid.lon0 - 1e-9)
    return lam + two_pi * up - two_pi * dn


def sample(grid: Grid, lam, phi, interp: str | None = None):
    """Interpolated grid sample with method dispatch (None = the
    grid's own file-declared default)."""
    interp = interp or grid.interp
    lam = wrap_lam(grid, lam)
    if interp == "biquadratic":
        return _biquadratic(grid, lam, phi)
    return _bilinear(grid, lam, phi)


def in_grid(grid: Grid, lam, phi):
    h, w = grid.values.shape[:2]
    in_phi = ((phi >= grid.lat0)
              & (phi <= grid.lat0 + (h - 1) * grid.dlat))
    if _is_global_lon(grid):
        return in_phi & np.isfinite(np.asarray(lam, dtype=np.float64))
    lam = wrap_lam(grid, lam)
    return (in_phi & (lam >= grid.lon0)
            & (lam <= grid.lon0 + (w - 1) * grid.dlon))


def hgrid_fwd(grid: Grid, lam, phi, interp: str = "bilinear"):
    """Apply horizontal shift: out = in + interp(in)."""
    d = sample(grid, lam, phi, interp)
    m = in_grid(grid, lam, phi)
    dl = np.where(m, d[..., 0], 0.0)
    dp = np.where(m, d[..., 1], 0.0)
    return lam + dl, phi + dp


def hgrid_inv(grid: Grid, lam, phi, interp: str = "bilinear"):
    """Iterative inverse (grids.cpp:3400-3450): fixed-point solve
    out + interp(out) = in, <= MAX_ITER, tol 1e-12 rad."""
    cl = lam.copy()
    cp = phi.copy()
    active = np.ones(lam.shape, dtype=bool)
    for _ in range(MAX_ITER):
        if not active.any():
            break
        fl, fp = hgrid_fwd(grid, cl[active], cp[active], interp)
        rl = fl - lam[active]
        rp = fp - phi[active]
        cl[active] -= rl
        cp[active] -= rp
        done = (np.abs(rl) < TOL) & (np.abs(rp) < TOL)
        idx = np.flatnonzero(active)
        active[idx[done]] = False
    return cl, cp


def hgrid_sample(g, lam, phi):
    """Raw (dlam, dphi) radian shift values + containment over a Grid
    or GridSet (used by the legacy deformation +xy_grids path)."""
    if isinstance(g, GridSet):
        sel = _select(g, lam, phi)
        dl = np.zeros(np.shape(lam))
        dp = np.zeros(np.shape(lam))
        for k, gg in enumerate(g.grids):
            mk = sel == k
            if mk.any():
                dlk, dpk, _ = hgrid_sample(gg, lam[mk], phi[mk])
                dl[mk] = dlk
                dp[mk] = dpk
        return dl, dp, sel >= 0
    d = sample(g, lam, phi)
    # reference deformation samples the grid RAW (grids.cpp:3543-3572
    # pj_hgrid_value -> compensateNTConvention=false): velocity grids
    # in NTv2/CTable2 containers store the east component verbatim, so
    # undo the parser's west-positive->east-positive negation
    dl = -d[..., 0] if g.nt_lam_negated else d[..., 0]
    return dl, d[..., 1], in_grid(g, lam, phi)


def vgrid_sample(g, lam, phi):
    """Sampled grid value + containment mask over a Grid or
    (recursively, with the set's own selection policy) a GridSet."""
    if isinstance(g, GridSet):
        sel = _select(g, lam, phi)
        u = np.zeros(np.shape(lam))
        for k, gg in enumerate(g.grids):
            mk = sel == k
            if mk.any():
                uk, _ = vgrid_sample(gg, lam[mk], phi[mk])
                u[mk] = uk
        return u, sel >= 0
    return sample(g, lam, phi), in_grid(g, lam, phi)


def vgrid_apply(grid, lam, phi, z, forward: bool = True,
                mult: float = -1.0):
    """Vertical shift: z + multiplier·sample on fwd.  The historical
    default multiplier is -1 (vgridshift.cpp:206-209: geometric ->
    orthometric SUBTRACTS the undulation); GeoTIFF-era grids pass
    +multiplier explicitly."""
    u, m = vgrid_sample(grid, lam, phi)
    u = np.where(m, u, np.nan)  # outside every grid -> domain error
    # (vgridshift errors rather than passing through; grids.cpp
    # read_vgrid_value returns nodata outside)
    return z + mult * u if forward else z - mult * u


@dataclass(frozen=True)
class GridSet:
    """Multi-grid selection.  policy="finest": per-point pick of the
    finest grid containing the point (NTv2 parent + children — the
    reference walks parent->child extents, grids.cpp:2332-2380;
    children are always finer refinements of their parent).
    policy="first": FIRST listed member containing the point wins —
    the +nadgrids list semantics (the reference iterates the list in
    order and stops at the first containing FILE, then selects the
    finest subgrid within it).  Members may themselves be GridSets
    (a multi-subgrid NTv2 file inside an ordered list), which keep
    their own inner policy."""
    grids: tuple  # tuple[Grid | GridSet, ...]
    policy: str = "finest"


def in_any(g, lam, phi):
    """in_grid over a Grid or (recursively) a GridSet."""
    if isinstance(g, GridSet):
        m = np.zeros(np.shape(lam), dtype=bool)
        for member in g.grids:
            m |= in_any(member, lam, phi)
        return m
    return in_grid(g, lam, phi)


def _finest_cell(g) -> float:
    if isinstance(g, GridSet):
        return min(_finest_cell(m) for m in g.grids)
    return abs(g.dlon * g.dlat)


def _select(gs: GridSet, lam, phi):
    """Index of the selected member per point (-1 if none)."""
    best = np.full(np.shape(lam), -1, dtype=np.int64)
    if gs.policy == "first":
        for k, g in enumerate(gs.grids):
            m = in_any(g, lam, phi) & (best == -1)
            best = np.where(m, k, best)
        return best
    best_area = np.full(np.shape(lam), np.inf)
    for k, g in enumerate(gs.grids):
        m = in_any(g, lam, phi)
        cell = _finest_cell(g)
        take = m & (cell < best_area)
        best = np.where(take, k, best)
        best_area = np.where(take, cell, best_area)
    return best


def hgridset_fwd(gs: GridSet, lam, phi):
    """hgrid_fwd over a GridSet: out-of-all-grids points pass through
    unshifted (matching the single-grid zero-shift semantics); nested
    GridSet members recurse with their own selection policy."""
    sel = _select(gs, lam, phi)
    out_l = np.array(lam, dtype=np.float64, copy=True)
    out_p = np.array(phi, dtype=np.float64, copy=True)
    for k, g in enumerate(gs.grids):
        m = sel == k
        if m.any():
            if isinstance(g, GridSet):
                fl, fp = hgridset_fwd(g, lam[m], phi[m])
            else:
                fl, fp = hgrid_fwd(g, lam[m], phi[m])
            out_l[m] = fl
            out_p[m] = fp
    return out_l, out_p


def hgridset_inv(gs: GridSet, lam, phi):
    """Iterative inverse with the same fixed-point scheme as
    hgrid_inv, re-selecting the grid each step (grids.cpp:3400-3450)."""
    cl = np.array(lam, dtype=np.float64, copy=True)
    cp = np.array(phi, dtype=np.float64, copy=True)
    for _ in range(MAX_ITER):
        fl, fp = hgridset_fwd(gs, cl, cp)
        rl = fl - lam
        rp = fp - phi
        cl -= rl
        cp -= rp
        if np.all(np.isnan(rl) | (np.abs(rl) < TOL) & (np.abs(rp) < TOL)):
            break
    return cl, cp


def synthetic_hgrid(n: int = 61, amp: float = 1e-5,
                    lon_lo: float = -10.0, lon_hi: float = 30.0,
                    lat_lo: float = 35.0, lat_hi: float = 70.0) -> Grid:
    """Deterministic smooth test grid (default Europe-ish extent,
    radians): the correction field is C1-smooth so the fixed-point
    inverse converges quadratically.  The extent is parameterizable so
    multi-region candidate tests can carve disjoint regional grids from
    the same analytic field."""
    lon = np.linspace(np.radians(lon_lo), np.radians(lon_hi), n)
    lat = np.linspace(np.radians(lat_lo), np.radians(lat_hi), n)
    LO, LA = np.meshgrid(lon, lat)
    dl = amp * np.sin(3 * LO) * np.cos(2 * LA)
    dp = amp * np.cos(2 * LO) * np.sin(3 * LA)
    return Grid(lon0=float(lon[0]), lat0=float(lat[0]),
                dlon=float(lon[1] - lon[0]), dlat=float(lat[1] - lat[0]),
                values=np.stack([dl, dp], axis=-1))


@dataclass(frozen=True)
class Tin:
    """Triangulated irregular network (transformations/tinshift.cpp
    JSON model): per-vertex source coords + target coords / offsets.

    vertices: (n, >=4) array [src_x, src_y, tgt_x, tgt_y[, dz]]
    triangles: (m, 3) int indices into vertices
    """
    vertices: np.ndarray
    triangles: np.ndarray
    has_z: bool
    # outside-hull handling (tinshift_impl.hpp:96-112, format 1.1):
    # none | nearest_side | nearest_centroid
    fallback: str = "none"


def _tin_bary(tin: Tin, k, x, y):
    """Barycentric weights of (x, y) in triangle k (may be negative —
    the fallback path EXTRAPOLATES the nearest triangle's plane)."""
    V, T = tin.vertices, tin.triangles
    i0, i1, i2 = T[k, 0], T[k, 1], T[k, 2]
    x0, y0 = V[i0, 0], V[i0, 1]
    x1, y1 = V[i1, 0], V[i1, 1]
    x2, y2 = V[i2, 0], V[i2, 1]
    den = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
    a = ((y1 - y2) * (x - x2) + (x2 - x1) * (y - y2)) / den
    b = ((y2 - y0) * (x - x2) + (x0 - x2) * (y - y2)) / den
    return a, b, 1.0 - a - b


def _seg_d2(x, y, x1, y1, x2, y2):
    """Squared point-segment distance (tinshift_impl.hpp
    distance_point_segment)."""
    dx, dy = x2 - x1, y2 - y1
    den = dx * dx + dy * dy
    if den == 0.0:
        return (x - x1) ** 2 + (y - y1) ** 2
    t = np.clip(((x - x1) * dx + (y - y1) * dy) / den, 0.0, 1.0)
    return (x - x1 - t * dx) ** 2 + (y - y1 - t * dy) ** 2


def _tin_fallback(tin: Tin, x, y):
    """Nearest triangle per the file's fallback strategy
    (tinshift_impl.hpp:496-570): per-side distance for nearest_side,
    centroid distance for nearest_centroid; evaluation then uses that
    triangle's (extrapolated) barycentric weights."""
    V, T = tin.vertices, tin.triangles
    best = np.full(x.shape, np.inf)
    kbest = np.zeros(x.shape, dtype=np.int64)
    for k in range(len(T)):
        i0, i1, i2 = T[k]
        x0, y0 = V[i0, 0], V[i0, 1]
        x1, y1 = V[i1, 0], V[i1, 1]
        x2, y2 = V[i2, 0], V[i2, 1]
        if tin.fallback == "nearest_side":
            d2 = np.minimum(
                _seg_d2(x, y, x0, y0, x1, y1),
                np.minimum(_seg_d2(x, y, x1, y1, x2, y2),
                           _seg_d2(x, y, x2, y2, x0, y0)))
        else:
            cx = (x0 + x1 + x2) / 3.0
            cy = (y0 + y1 + y2) / 3.0
            d2 = (x - cx) ** 2 + (y - cy) ** 2
        take = d2 < best
        best = np.where(take, d2, best)
        kbest = np.where(take, k, kbest)
    a, b, c = _tin_bary(tin, kbest, x, y)
    return kbest, a, b, c


def tin_locate(tin: Tin, x, y):
    """Vectorized point-in-triangle search with barycentric weights:
    returns (tri_index or -1, w0, w1, w2).  Loops over triangles with
    masks — m is small (model meshes), n is the point axis."""
    V = tin.vertices
    T = tin.triangles
    idx = np.full(x.shape, -1, dtype=np.int64)
    w0 = np.zeros_like(x)
    w1 = np.zeros_like(x)
    w2 = np.zeros_like(x)
    todo = np.ones(x.shape, dtype=bool)
    for k in range(len(T)):
        if not todo.any():
            break
        i0, i1, i2 = T[k]
        x0, y0 = V[i0, 0], V[i0, 1]
        x1, y1 = V[i1, 0], V[i1, 1]
        x2, y2 = V[i2, 0], V[i2, 1]
        den = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
        if den == 0:
            continue
        a = ((y1 - y2) * (x - x2) + (x2 - x1) * (y - y2)) / den
        b = ((y2 - y0) * (x - x2) + (x0 - x2) * (y - y2)) / den
        c = 1.0 - a - b
        inside = todo & (a >= -1e-12) & (b >= -1e-12) & (c >= -1e-12)
        idx = np.where(inside, k, idx)
        w0 = np.where(inside, a, w0)
        w1 = np.where(inside, b, w1)
        w2 = np.where(inside, c, w2)
        todo = todo & ~inside
    return idx, w0, w1, w2


def tin_fwd(tin: Tin, x, y, z):
    """Barycentric interpolation of the per-vertex target coords
    (tinshift.cpp evaluation)."""
    idx, a, b, c = tin_locate(tin, x, y)
    T = tin.triangles
    V = tin.vertices
    ki = np.maximum(idx, 0)
    i0, i1, i2 = T[ki, 0], T[ki, 1], T[ki, 2]
    xo = a * V[i0, 2] + b * V[i1, 2] + c * V[i2, 2]
    yo = a * V[i0, 3] + b * V[i1, 3] + c * V[i2, 3]
    if tin.has_z:
        zo = z + a * V[i0, 4] + b * V[i1, 4] + c * V[i2, 4]
    else:
        zo = z
    bad = idx < 0
    if tin.fallback != "none" and bad.any():
        kf, a, b, c = _tin_fallback(tin, x[bad], y[bad])
        i0, i1, i2 = T[kf, 0], T[kf, 1], T[kf, 2]
        xo[bad] = a * V[i0, 2] + b * V[i1, 2] + c * V[i2, 2]
        yo[bad] = a * V[i0, 3] + b * V[i1, 3] + c * V[i2, 3]
        if tin.has_z:
            zo[bad] = z[bad] + (a * V[i0, 4] + b * V[i1, 4]
                                + c * V[i2, 4])
        bad = np.zeros_like(bad)
    return (np.where(bad, np.nan, xo), np.where(bad, np.nan, yo),
            np.where(bad, np.nan, zo))


def tin_inv(tin: Tin, x, y, z):
    """Inverse: the same barycentric search over the TARGET-coordinate
    triangles (tinshift.cpp reverse)."""
    inv_tin = Tin(vertices=np.column_stack([
        tin.vertices[:, 2], tin.vertices[:, 3],
        tin.vertices[:, 0], tin.vertices[:, 1],
        -tin.vertices[:, 4] if tin.has_z else np.zeros(len(tin.vertices)),
    ]), triangles=tin.triangles, has_z=tin.has_z,
        fallback=tin.fallback)
    return tin_fwd(inv_tin, x, y, z)


@dataclass(frozen=True)
class UnifiedGrid:
    """One unified-gridshift component (transformations/gridshift.cpp):
    an optional horizontal grid (values (h, w, 2) east-positive
    radians, or (h, w, 3) with an ellipsoidal-height-offset channel in
    meters) plus an optional separate vertical grid (values (h, w)
    meters) — the GeoTIFF layout where HORIZONTAL_OFFSET and
    ELLIPSOIDAL_HEIGHT_OFFSET live in different IFDs.  interp is the
    file-declared default interpolation_method.  hgrid may be a
    GridSet (a multi-subgrid NTv2 file used as one gridshift
    component), which keeps its finest-subgrid selection."""
    hgrid: Grid | GridSet | None
    vgrid: Grid | None
    interp: str = "bilinear"
    # 3-channel geocentric (dX,dY,dZ metres) component, the
    # GEOCENTRIC_TRANSLATION GeoTIFF type consumed by xyzgridshift
    geocentric: Grid | None = None
    # constant additive (x, y) offset for projected-CRS grids
    # (gridshift.cpp m_offsetX/m_offsetY)
    offset_xy: tuple = (0.0, 0.0)

    def extent_grid(self):
        g = self.hgrid if self.hgrid is not None else self.vgrid
        if g is None:
            raise ValueError("UnifiedGrid with no component grids")
        return g


def unified_fwd(entries, lam, phi, z, no_z: bool = False,
                interp: str | None = None, include_offset: bool = True):
    """Forward unified grid shift over an ORDERED list of UnifiedGrid
    entries: per point, the first entry whose extent contains it wins
    (gridshift.cpp grid iteration); horizontal shift then height
    offset (z + dz, sampled at the SOURCE position), both with the
    entry's interpolation unless overridden."""
    out_l = np.array(lam, dtype=np.float64, copy=True)
    out_p = np.array(phi, dtype=np.float64, copy=True)
    out_z = np.array(z, dtype=np.float64, copy=True)
    remaining = np.ones(np.shape(lam), dtype=bool)
    for ug in entries:
        eg = ug.extent_grid()
        m = remaining & in_any(eg, lam, phi)
        if not m.any():
            continue
        remaining &= ~m
        method = interp or ug.interp
        la, ph = lam[m], phi[m]
        offx, offy = ug.offset_xy if include_offset else (0.0, 0.0)
        if isinstance(ug.hgrid, GridSet):
            sl, sp = hgridset_fwd(ug.hgrid, la, ph)
            out_l[m] = sl + offx
            out_p[m] = sp + offy
        elif ug.hgrid is not None:
            sl, sp = hgrid_fwd(ug.hgrid, la, ph, method)
            out_l[m] = sl + offx
            out_p[m] = sp + offy
        if no_z:
            continue
        if isinstance(ug.hgrid, Grid) and ug.hgrid.values.ndim == 3 \
                and ug.hgrid.values.shape[2] >= 3:
            dz = sample(ug.hgrid, la, ph, method)[..., 2]
            out_z[m] = out_z[m] + np.where(in_grid(ug.hgrid, la, ph),
                                           dz, 0.0)
        elif ug.vgrid is not None:
            dz = sample(ug.vgrid, la, ph, method)
            out_z[m] = out_z[m] + np.where(in_grid(ug.vgrid, la, ph),
                                           dz, 0.0)
    # points outside EVERY component: domain error, not passthrough
    # (gridshift.cpp sets PROJ_ERR_COORD_TRANSFM_OUTSIDE_GRID)
    out_l[remaining] = np.nan
    out_p[remaining] = np.nan
    out_z[remaining] = np.nan
    return out_l, out_p, out_z


def unified_inv(entries, lam, phi, z, no_z: bool = False,
                interp: str | None = None):
    """Inverse of unified_fwd, mirroring gridshift.cpp:645-705: the
    first approximation is the NCAT single step guess = in -
    shift(in); with BIQUADRATIC interpolation that approximation IS
    the answer (NOAA's Transformer.java does no reverse iteration, and
    fixed-point iteration can fail to converge at cell/half-cell
    window boundaries — the gie sanfrancisco case), while bilinear
    points run the usual fixed-point iteration.  The height offset is
    subtracted using the same (final) shift sample."""
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    # the op-level constant offset is subtracted BEFORE the iteration
    # (gridshift.cpp:860-870 pj_gridshift_reverse_3d)
    for ug in entries:
        if ug.offset_xy != (0.0, 0.0):
            lam = lam - ug.offset_xy[0]
            phi = phi - ug.offset_xy[1]
            break
    sl, sp, zshift = _unified_shift(entries, lam, phi, no_z=no_z,
                                    interp=interp)
    cl = lam - sl
    cp = phi - sp
    it = _entry_is_bilinear(entries, lam, phi, interp)
    if it.any():
        for _ in range(MAX_ITER):
            dl, dp, dz = _unified_shift(entries, cl[it], cp[it],
                                        no_z=no_z, interp=interp)
            rl = cl[it] + dl - lam[it]
            rp = cp[it] + dp - phi[it]
            cl[it] = cl[it] - rl
            cp[it] = cp[it] - rp
            zshift[it] = dz
            if np.all(np.isnan(rl) | ((np.abs(rl) < TOL)
                                      & (np.abs(rp) < TOL))):
                break
    return cl, cp, np.array(z, dtype=np.float64, copy=True) - zshift


def _unified_shift(entries, lam, phi, no_z, interp):
    """(dlam, dphi, dz) of the first containing entry per point."""
    fl, fp, fz = unified_fwd(entries, lam, phi, np.zeros(np.shape(lam)),
                             no_z=no_z, interp=interp,
                             include_offset=False)
    return fl - lam, fp - phi, fz


def _entry_is_bilinear(entries, lam, phi, interp):
    """True where the winning entry's effective method is bilinear."""
    out = np.zeros(np.shape(lam), dtype=bool)
    remaining = np.ones(np.shape(lam), dtype=bool)
    for ug in entries:
        m = remaining & in_any(ug.extent_grid(), lam, phi)
        if m.any():
            out[m] = (interp or ug.interp) == "bilinear" \
                or isinstance(ug.hgrid, GridSet)
            remaining &= ~m
    return out


def null_grid(vertical: bool = False) -> Grid:
    """The reference's literal 'null' grid (grids.cpp:1613-1621 /
    :2659-2667): world-covering, zero shift everywhere."""
    shape = (2, 2) if vertical else (2, 2, 2)
    return Grid(lon0=-np.pi, lat0=-np.pi / 2.0, dlon=2.0 * np.pi,
                dlat=np.pi, values=np.zeros(shape))


def synthetic_velgrid(n: int = 41) -> Grid:
    """Deterministic ENU velocity grid (mm/yr bands [ve, vn, vu]) over
    an NZ-ish extent, analytic node values so the deformation oracle
    (transformations/deformation.cpp semantics) can rebuild every node
    in closed-form SQL."""
    lon = np.linspace(np.radians(165.0), np.radians(180.0), n)
    lat = np.linspace(np.radians(-48.0), np.radians(-34.0), n)
    LO, LA = np.meshgrid(lon, lat)
    ve = 20.0 * np.sin(2 * LO) * np.cos(3 * LA)
    vn = 15.0 * np.cos(3 * LO) * np.sin(2 * LA)
    vu = 5.0 * np.sin(LO + LA)
    return Grid(lon0=float(lon[0]), lat0=float(lat[0]),
                dlon=float(lon[1] - lon[0]), dlat=float(lat[1] - lat[0]),
                values=np.stack([ve, vn, vu], axis=-1))


def tin_from_json(text: str) -> Tin:
    """Parse a triangulation_file JSON into a Tin (the reference's
    schema reader, transformations/tinshift_impl.hpp:96-340):
    horizontal components carry target_x/target_y columns; vertical
    components carry offset_z or (target_z - source_z); a
    vertical-only model keeps the horizontal identity (source coords
    reproduce exactly under barycentric interpolation)."""
    import json as _json

    j = _json.loads(text)
    if j.get("file_type") != "triangulation_file":
        raise ValueError("tinshift: not a triangulation_file")
    comps = j.get("transformed_components", [])
    horiz = "horizontal" in comps
    vert = "vertical" in comps
    idx = {c: i for i, c in enumerate(j["vertices_columns"])}
    tidx = {c: i for i, c in enumerate(j["triangles_columns"])}
    V = np.asarray(j["vertices"], dtype=np.float64)
    sx, sy = V[:, idx["source_x"]], V[:, idx["source_y"]]
    if horiz:
        tx, ty = V[:, idx["target_x"]], V[:, idx["target_y"]]
    else:
        tx, ty = sx, sy
    if vert:
        if "offset_z" in idx:
            dz = V[:, idx["offset_z"]]
        else:
            dz = V[:, idx["target_z"]] - V[:, idx["source_z"]]
    else:
        dz = np.zeros(len(V))
    T = np.asarray(j["triangles"], dtype=np.int64)
    T = T[:, [tidx["idx_vertex1"], tidx["idx_vertex2"],
              tidx["idx_vertex3"]]]
    fallback = "none"
    if "fallback_strategy" in j:
        if str(j.get("format_version")) != "1.1":
            raise ValueError(
                "tinshift: fallback_strategy needs format_version 1.1")
        fallback = str(j["fallback_strategy"])
        if fallback not in ("none", "nearest_side", "nearest_centroid"):
            raise ValueError(
                f"tinshift: invalid fallback_strategy {fallback!r}")
    return Tin(vertices=np.column_stack([sx, sy, tx, ty, dz]),
               triangles=T, has_z=vert, fallback=fallback)


def synthetic_tin() -> Tin:
    """Four-triangle fan over the [0,10]^2 square (center vertex) with
    distinct per-vertex target coords + dz — a minimal but non-affine
    tinshift model (transformations/tinshift.cpp)."""
    vertices = np.array([
        [0.0, 0.0, 0.5, 0.3, 0.2],
        [10.0, 0.0, 10.3, -0.2, 0.5],
        [10.0, 10.0, 10.1, 10.4, -0.3],
        [0.0, 10.0, -0.2, 10.2, 0.1],
        [5.0, 5.0, 5.25, 5.1, 0.05],
    ])
    triangles = np.array([[0, 1, 4], [1, 2, 4], [2, 3, 4], [3, 0, 4]])
    return Tin(vertices=vertices, triangles=triangles, has_z=True)
