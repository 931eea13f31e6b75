"""JSON deformation-model driver (PROJ +proj=defmodel).

Vectorized NumPy re-derivation of
/root/reference/src/transformations/defmodel_impl.hpp:
- ISO8601ToDecimalYear                 :225-251
- time functions (constant/velocity/step/reverse_step/piecewise/
  exponential)                         :621-711
- MasterFile / Component / extent JSON parsing + validation
                                       :344-618
- Evaluator.forward: extent + epoch gating, per-component bilinear or
  geocentric-bilinear grid sampling scaled by the time factor, final
  addition or geocentric application   :724-1219
- Evaluator.inverse: 10-step fixed-point iteration  :1222-1262

Grids are in-memory `DefGrid` rasters (the reference reads GeoTIFF;
this container has no raster codec, so models register grid arrays
under their `filename` key in a grids dict — same role as the
reference's EvaluatorIface::open).  Horizontal bands hold radian
offsets for degree-unit models and metres for metre-unit models
(mirroring getLongLatOffset/getEastingNorthingOffset); z bands hold
metres.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field

import numpy as np

DEG2RAD = np.pi / 180.0
TWO_PI = 2.0 * np.pi

_MONTH_TABLE = (
    (31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31),
    (31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31),
)


class ParsingException(ValueError):
    pass


class EvaluatorException(ValueError):
    pass


def iso8601_to_decimal_year(dt: str) -> float:
    """defmodel_impl.hpp:225-251 (leap seconds intentionally omitted)."""
    try:
        if len(dt) != 20 or dt[4] != "-" or dt[7] != "-" or dt[10] != "T" \
                or dt[13] != ":" or dt[16] != ":" or dt[19] != "Z":
            raise ValueError
        year, month, day = int(dt[0:4]), int(dt[5:7]), int(dt[8:10])
        hour, minute, sec = int(dt[11:13]), int(dt[14:16]), int(dt[17:19])
    except ValueError:
        raise ParsingException(
            "Wrong formatting / invalid date-time for " + dt)
    if year < 1582 or not (1 <= month <= 12) or not (1 <= day <= 31) \
            or not (0 <= hour < 24) or not (0 <= minute < 60) \
            or not (0 <= sec < 61):
        raise ParsingException(
            "Wrong formatting / invalid date-time for " + dt)
    leap = 1 if ((year % 4 == 0 and year % 100 != 0) or year % 400 == 0) \
        else 0
    day_in_year = day - 1
    for m in range(1, month):
        day_in_year += _MONTH_TABLE[leap][m - 1]
    if day > _MONTH_TABLE[leap][month - 1]:
        raise ParsingException(
            "Wrong formatting / invalid date-time for " + dt)
    return year + (day_in_year * 86400 + hour * 3600 + minute * 60 + sec) \
        / (86400.0 * (366 if leap else 365))


# --- JSON access helpers (getReqString/getOptString/... semantics) -----

def _get_string(j, key, optional):
    if key not in j:
        if optional:
            return ""
        raise ParsingException(f'Missing "{key}" key')
    v = j[key]
    if not isinstance(v, str):
        raise ParsingException(f'The value of "{key}" should be a string')
    return v


def _get_double(j, key, optional):
    if key not in j:
        if optional:
            return float("nan")
        raise ParsingException(f'Missing "{key}" key')
    v = j[key]
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        raise ParsingException(f'The value of "{key}" should be a number')
    return float(v)


def _get_object(j, key):
    if key not in j:
        raise ParsingException(f'Missing "{key}" key')
    v = j[key]
    if not isinstance(v, dict):
        raise ParsingException(f'The value of "{key}" should be a object')
    return v


def _get_array(j, key):
    if key not in j:
        raise ParsingException(f'Missing "{key}" key')
    v = j[key]
    if not isinstance(v, list):
        raise ParsingException(f'The value of "{key}" should be a array')
    return v


# --- time functions ----------------------------------------------------

@dataclass(frozen=True)
class ConstantTF:
    def evaluate_at(self, dt):
        return np.ones_like(np.asarray(dt, dtype=np.float64))


@dataclass(frozen=True)
class VelocityTF:
    reference_epoch: float

    def evaluate_at(self, dt):
        return np.asarray(dt, dtype=np.float64) - self.reference_epoch


@dataclass(frozen=True)
class StepTF:
    step_epoch: float

    def evaluate_at(self, dt):
        return np.where(np.asarray(dt, dtype=np.float64) < self.step_epoch,
                        0.0, 1.0)


@dataclass(frozen=True)
class ReverseStepTF:
    step_epoch: float

    def evaluate_at(self, dt):
        return np.where(np.asarray(dt, dtype=np.float64) < self.step_epoch,
                        -1.0, 0.0)


@dataclass(frozen=True)
class PiecewiseTF:
    before_first: str
    after_last: str
    epochs: tuple
    factors: tuple

    def evaluate_at(self, dt):
        """defmodel_impl.hpp:647-692 (first-match segment scan; equal
        consecutive epochs give a jump taken from the later entry)."""
        dt = np.asarray(dt, dtype=np.float64)
        if len(self.epochs) == 0:
            return np.zeros_like(dt)
        e, f = self.epochs, self.factors
        n = len(e)
        out = np.empty_like(dt)
        done = np.zeros(dt.shape, dtype=bool)
        before = dt < e[0]
        if self.before_first == "zero":
            out = np.where(before, 0.0, out)
        elif self.before_first == "constant" or n == 1:
            out = np.where(before, f[0], out)
        else:
            if e[0] == e[1]:
                out = np.where(before, f[0], out)
            else:
                v = (f[0] * (e[1] - dt) + f[1] * (dt - e[0])) / (e[1] - e[0])
                out = np.where(before, v, out)
        done |= before
        for i in range(1, n):
            seg = ~done & (dt < e[i])
            if seg.any():
                v = (f[i - 1] * (e[i] - dt) + f[i] * (dt - e[i - 1])) \
                    / (e[i] - e[i - 1])
                out = np.where(seg, v, out)
                done |= seg
        after = ~done
        if self.after_last == "zero":
            out = np.where(after, 0.0, out)
        elif self.after_last == "constant" or n == 1:
            out = np.where(after, f[-1], out)
        else:
            if e[-2] == e[-1]:
                out = np.where(after, f[-1], out)
            else:
                v = (f[-2] * (e[-1] - dt) + f[-1] * (dt - e[-2])) \
                    / (e[-1] - e[-2])
                out = np.where(after, v, out)
        return out


@dataclass(frozen=True)
class ExponentialTF:
    reference_epoch: float
    end_epoch: float | None
    relaxation_constant: float
    before_scale_factor: float
    initial_scale_factor: float
    final_scale_factor: float

    def evaluate_at(self, dt):
        dt = np.asarray(dt, dtype=np.float64)
        t0 = self.reference_epoch
        dteff = dt if self.end_epoch is None else np.minimum(dt,
                                                             self.end_epoch)
        val = self.initial_scale_factor + \
            (self.final_scale_factor - self.initial_scale_factor) * \
            (1.0 - np.exp(-(dteff - t0) / self.relaxation_constant))
        return np.where(dt < t0, self.before_scale_factor, val)


# --- model structure ---------------------------------------------------

@dataclass(frozen=True)
class SpatialExtent:
    minx: float
    miny: float
    maxx: float
    maxy: float

    @staticmethod
    def parse(j) -> "SpatialExtent":
        if _get_string(j, "type", False) != "bbox":
            raise ParsingException("unsupported type of extent")
        bbox = _get_array(_get_object(j, "parameters"), "bbox")
        if len(bbox) != 4 or any(
                isinstance(v, bool) or not isinstance(v, (int, float))
                for v in bbox):
            raise ParsingException(
                "bbox is not an array of 4 numeric elements")
        return SpatialExtent(*(float(v) for v in bbox))

    def normalized(self, is_geographic: bool):
        if is_geographic:
            return (self.minx * DEG2RAD, self.miny * DEG2RAD,
                    self.maxx * DEG2RAD, self.maxy * DEG2RAD)
        return (self.minx, self.miny, self.maxx, self.maxy)


_DISPLACEMENT_TYPES = ("none", "horizontal", "vertical", "3d")


@dataclass(frozen=True)
class Component:
    description: str
    extent: SpatialExtent
    displacement_type: str
    uncertainty_type: str
    filename: str
    interpolation_method: str
    time_function: object

    @staticmethod
    def parse(j) -> "Component":
        if not isinstance(j, dict):
            raise ParsingException("component is not an object")
        desc = _get_string(j, "description", True)
        extent = SpatialExtent.parse(_get_object(j, "extent"))
        dtype = _get_string(j, "displacement_type", False)
        if dtype not in _DISPLACEMENT_TYPES:
            raise ParsingException("Unsupported value for displacement_type")
        utype = _get_string(j, "uncertainty_type", False)
        sm = _get_object(j, "spatial_model")
        _get_string(sm, "type", False)
        interp = _get_string(sm, "interpolation_method", False)
        if interp not in ("bilinear", "geocentric_bilinear"):
            raise ParsingException(
                "Unsupported value for interpolation_method")
        filename = _get_string(sm, "filename", False)
        tfj = _get_object(j, "time_function")
        tftype = _get_string(tfj, "type", False)
        par = {} if tftype == "constant" \
            else _get_object(tfj, "parameters")
        if tftype == "constant":
            tf = ConstantTF()
        elif tftype == "velocity":
            tf = VelocityTF(iso8601_to_decimal_year(
                _get_string(par, "reference_epoch", False)))
        elif tftype == "step":
            tf = StepTF(iso8601_to_decimal_year(
                _get_string(par, "step_epoch", False)))
        elif tftype == "reverse_step":
            tf = ReverseStepTF(iso8601_to_decimal_year(
                _get_string(par, "step_epoch", False)))
        elif tftype == "piecewise":
            bf = _get_string(par, "before_first", False)
            if bf not in ("zero", "constant", "linear"):
                raise ParsingException("Unsupported value for before_first")
            al = _get_string(par, "after_last", False)
            if al not in ("zero", "constant", "linear"):
                raise ParsingException("Unsupported value for afterLast")
            model = _get_array(par, "model")
            epochs, factors = [], []
            for elt in model:
                if not isinstance(elt, dict):
                    raise ParsingException(
                        "model[] element is not an object")
                epochs.append(iso8601_to_decimal_year(
                    _get_string(elt, "epoch", False)))
                factors.append(_get_double(elt, "scale_factor", False))
            tf = PiecewiseTF(bf, al, tuple(epochs), tuple(factors))
        elif tftype == "exponential":
            end = _get_string(par, "end_epoch", True)
            relax = _get_double(par, "relaxation_constant", False)
            if relax <= 0.0:
                raise ParsingException(
                    "Invalid value for relaxation_constant")
            tf = ExponentialTF(
                iso8601_to_decimal_year(
                    _get_string(par, "reference_epoch", False)),
                iso8601_to_decimal_year(end) if end else None,
                relax,
                _get_double(par, "before_scale_factor", False),
                _get_double(par, "initial_scale_factor", False),
                _get_double(par, "final_scale_factor", False))
        else:
            raise ParsingException(
                "Unsupported type of time function: " + tftype)
        return Component(desc, extent, dtype, utype, filename, interp, tf)


@dataclass(frozen=True)
class MasterFile:
    file_type: str
    format_version: str
    source_crs: str
    target_crs: str
    definition_crs: str
    horizontal_offset_unit: str
    vertical_offset_unit: str
    horizontal_offset_method: str
    extent: SpatialExtent
    time_first: float
    time_last: float
    components: tuple

    @staticmethod
    def parse(text: str) -> "MasterFile":
        """defmodel_impl.hpp:344-473 validation rules."""
        try:
            j = json.loads(text)
        except Exception as e:  # noqa: BLE001 - mirror ParsingException
            raise ParsingException(str(e))
        if not isinstance(j, dict):
            raise ParsingException("Not an object")
        file_type = _get_string(j, "file_type", False)
        format_version = _get_string(j, "format_version", False)
        if "authority" in j and not isinstance(j["authority"], dict):
            raise ParsingException("authority is not a object")
        if "links" in j:
            if not isinstance(j["links"], list):
                raise ParsingException("links is not an array")
            for lk in j["links"]:
                if not isinstance(lk, dict):
                    raise ParsingException("links[] item is not an object")
        source_crs = _get_string(j, "source_crs", False)
        target_crs = _get_string(j, "target_crs", False)
        definition_crs = _get_string(j, "definition_crs", False)
        if source_crs != definition_crs:
            raise ParsingException(
                "source_crs != definition_crs not currently supported")
        hunit = _get_string(j, "horizontal_offset_unit", True)
        if hunit and hunit not in ("metre", "degree"):
            raise ParsingException(
                "Unsupported value for horizontal_offset_unit")
        vunit = _get_string(j, "vertical_offset_unit", True)
        if vunit and vunit != "metre":
            raise ParsingException(
                "Unsupported value for vertical_offset_unit")
        hmethod = _get_string(j, "horizontal_offset_method", True)
        if hmethod and hmethod not in ("addition", "geocentric"):
            raise ParsingException(
                "Unsupported value for horizontal_offset_method")
        extent = SpatialExtent.parse(_get_object(j, "extent"))
        jt = _get_object(j, "time_extent")
        t_first = iso8601_to_decimal_year(_get_string(jt, "first", False))
        t_last = iso8601_to_decimal_year(_get_string(jt, "last", False))
        comps = []
        for jc in _get_array(j, "components"):
            comp = Component.parse(jc)
            comps.append(comp)
            if comp.displacement_type in ("horizontal", "3d"):
                if not hunit:
                    raise ParsingException(
                        "horizontal_offset_unit should be defined as there "
                        "is a component with displacement_type = "
                        "horizontal/3d")
                if not hmethod:
                    raise ParsingException(
                        "horizontal_offset_method should be defined as "
                        "there is a component with displacement_type = "
                        "horizontal/3d")
            if comp.displacement_type in ("vertical", "3d") and not vunit:
                raise ParsingException(
                    "vertical_offset_unit should be defined as there is a "
                    "component with displacement_type = vertical/3d")
            if hunit == "degree" and comp.interpolation_method != "bilinear":
                raise ParsingException(
                    "horizontal_offset_unit = degree can only be used with "
                    "interpolation_method = bilinear")
        if hunit == "degree" and hmethod != "addition":
            raise ParsingException(
                "horizontal_offset_unit = degree can only be used with "
                "horizontal_offset_method = addition")
        return MasterFile(file_type, format_version, source_crs, target_crs,
                          definition_crs, hunit, vunit, hmethod, extent,
                          t_first, t_last, tuple(comps))


# --- grids -------------------------------------------------------------

@dataclass(frozen=True)
class DefGrid:
    """One raster of the spatial model.  For geographic models minx/
    miny/resx/resy are radians.  Horizontal bands: radian offsets
    (degree-unit models) or metres east/north (metre-unit models);
    z band metres."""
    minx: float
    miny: float
    resx: float
    resy: float
    # (height, width) each; any may be None when the band is absent
    e_or_lon: np.ndarray | None = None
    n_or_lat: np.ndarray | None = None
    z: np.ndarray | None = None

    @property
    def width(self) -> int:
        b = self.e_or_lon if self.e_or_lon is not None else self.z
        return int(b.shape[1])

    @property
    def height(self) -> int:
        b = self.e_or_lon if self.e_or_lon is not None else self.z
        return int(b.shape[0])


@dataclass(frozen=True)
class DefGridSet:
    """gridAt picks the first grid whose extent contains the point
    (the reference picks the most-refined subgrid; order the list
    finest-first for the same behavior)."""
    grids: tuple

    def grid_index_at(self, x, y):
        idx = np.full(np.shape(x), -1, dtype=np.int64)
        for i, g in enumerate(self.grids):
            inx = (x >= g.minx - 1e-12) & \
                (x <= g.minx + g.resx * (g.width - 1) + 1e-12)
            iny = (y >= g.miny - 1e-12) & \
                (y <= g.miny + g.resy * (g.height - 1) + 1e-12)
            idx = np.where((idx < 0) & inx & iny, i, idx)
        return idx


# --- evaluator ---------------------------------------------------------

def _delta_en_to_longlat(cosphi, de, dn, a, b, es):
    """DeltaEastingNorthingToLongLat (defmodel_impl.hpp:713-722)."""
    one_minu_x = es * (1.0 - cosphi * cosphi)
    X = 1.0 - one_minu_x
    sqrt_x = np.sqrt(X)
    dlam = de * sqrt_x / (a * cosphi)
    dphi = dn * a * sqrt_x * X / (b * b)
    return dlam, dphi


def _geographic_to_geocentric(lam, phi, h, a, es):
    sp, cp = np.sin(phi), np.cos(phi)
    n = a / np.sqrt(1.0 - es * sp * sp)
    return ((n + h) * cp * np.cos(lam), (n + h) * cp * np.sin(lam),
            (n * (1.0 - es) + h) * sp)


def _geocentric_to_geographic(X, Y, Z, a, es, iterations=8):
    lam = np.arctan2(Y, X)
    p = np.hypot(X, Y)
    phi = np.arctan2(Z, p * (1.0 - es))
    for _ in range(iterations):
        sp = np.sin(phi)
        n = a / np.sqrt(1.0 - es * sp * sp)
        h = p / np.cos(phi) - n
        phi = np.arctan2(Z, p * (1.0 - es * n / (n + h)))
    sp = np.sin(phi)
    n = a / np.sqrt(1.0 - es * sp * sp)
    h = p / np.cos(phi) - n
    return lam, phi, h


def _bbox_check(x, y, for_inverse, minx, miny, maxx, maxy, eps, margin):
    """bboxCheck (defmodel_impl.hpp:784-819): returns (ok, x, y) with
    edge clamping only during inverse iteration."""
    inside = (x >= minx - eps) & (x <= maxx + eps) & \
        (y >= miny - eps) & (y <= maxy + eps)
    if not for_inverse:
        return inside, x, y
    x_lo = (x > minx - margin) & (x < minx)
    x_hi = (x < maxx + margin) & (x > maxx)
    x_ok = ((x >= minx - eps) & (x <= maxx + eps)) | x_lo | x_hi
    xn = np.where(x_lo, minx, np.where(x_hi, maxx, x))
    y_lo = (y > miny - margin) & (y < miny)
    y_hi = (y < maxy + margin) & (y > maxy)
    y_ok = ((y >= miny - eps) & (y <= maxy + eps)) | y_lo | y_hi
    yn = np.where(y_lo, miny, np.where(y_hi, maxy, y))
    return x_ok & y_ok, xn, yn


@dataclass
class Evaluator:
    model: MasterFile
    grids: dict  # filename -> DefGridSet
    a: float
    b: float
    is_geographic: bool = True
    es: float = field(init=False)

    def __post_init__(self):
        self.es = 1.0 - (self.b * self.b) / (self.a * self.a)
        m = self.model
        if not self.is_geographic and m.horizontal_offset_unit == "degree":
            raise EvaluatorException(
                "definition_crs = projected CRS and horizontal_offset_unit "
                "= degree are incompatible")
        if not self.is_geographic and \
                m.horizontal_offset_method == "geocentric":
            raise EvaluatorException(
                "definition_crs = projected CRS and "
                "horizontal_offset_method = geocentric are incompatible")
        if not self.is_geographic:
            for comp in m.components:
                if comp.interpolation_method != "bilinear":
                    raise EvaluatorException(
                        "definition_crs = projected CRS and "
                        "interpolation_method = geocentric_bilinear are "
                        "incompatible")

    # -- forward (defmodel_impl.hpp:822-1219), vectorized over points
    def forward(self, x, y, z, t, for_inverse=False):
        x = np.asarray(x, dtype=np.float64).copy()
        y = np.asarray(y, dtype=np.float64)
        z = np.asarray(z, dtype=np.float64)
        t = np.broadcast_to(np.asarray(t, dtype=np.float64), x.shape)
        geo = self.is_geographic
        eps = 1e-10 if geo else 1e-5
        m = self.model
        minx, miny, maxx, maxy = m.extent.normalized(geo)
        if geo:
            n_lo = np.maximum(np.ceil((minx - eps - x) / TWO_PI), 0.0)
            x = x + n_lo * TWO_PI
            n_hi = np.maximum(np.ceil((x - maxx - eps) / TWO_PI), 0.0)
            x = x - n_hi * TWO_PI
        margin = 0.1 * DEG2RAD if geo else 10000.0
        # xq/yq are the (possibly edge-clamped) SAMPLING coords; the
        # output base keeps the caller's coordinates — clamping must
        # not leak into x_out during the inverse iteration
        # (defmodel_impl.hpp bboxCheck only redirects the grid lookup)
        ok, xq, yq = _bbox_check(x, y, for_inverse, minx, miny, maxx,
                                 maxy, eps, margin)
        ok = ok & (t >= m.time_first) & (t <= m.time_last)

        hdeg = m.horizontal_offset_unit == "degree"
        dlam = np.zeros_like(x)
        dphi = np.zeros_like(x)
        de = np.zeros_like(x)
        dn = np.zeros_like(x)
        dz = np.zeros_like(x)

        for comp in m.components:
            if comp.displacement_type == "none":
                continue
            cminx, cminy, cmaxx, cmaxy = comp.extent.normalized(geo)
            cok, xg, yg = _bbox_check(xq, yq, for_inverse, cminx, cminy,
                                      cmaxx, cmaxy, eps, 0.0)
            use = ok & cok
            if not use.any():
                continue
            xg = np.clip(xg, cminx, cmaxx)
            yg = np.clip(yg, cminy, cmaxy)
            tfactor = comp.time_function.evaluate_at(t)
            use = use & (tfactor != 0.0)
            if not use.any():
                continue
            gset = self.grids.get(comp.filename)
            if gset is None:
                raise EvaluatorException(
                    f"cannot open {comp.filename}")
            gidx = gset.grid_index_at(xg, yg)
            use = use & (gidx >= 0)
            for gi, grid in enumerate(gset.grids):
                sel = use & (gidx == gi)
                if not sel.any():
                    continue
                if grid.width < 2 or grid.height < 2:
                    ok = ok & ~sel
                    continue
                ix_d = (xg - grid.minx) / grid.resx
                iy_d = (yg - grid.miny) / grid.resy
                inb = (ix_d >= -eps) & (iy_d >= -eps) & \
                    (ix_d + 1 < grid.width + eps) & \
                    (iy_d + 1 < grid.height + eps)
                sel = sel & inb
                if not sel.any():
                    continue
                ix_s = np.where(np.isfinite(ix_d), ix_d, 0.0)
                iy_s = np.where(np.isfinite(iy_d), iy_d, 0.0)
                ix0 = np.minimum(ix_s.astype(np.int64), grid.width - 2)
                iy0 = np.minimum(iy_s.astype(np.int64), grid.height - 2)
                ix0 = np.clip(ix0, 0, grid.width - 2)
                iy0 = np.clip(iy0, 0, grid.height - 2)
                fx = ix_d - ix0
                fy = iy_d - iy0
                m00 = (1.0 - fx) * (1.0 - fy)
                m10 = fx * (1.0 - fy)
                m01 = (1.0 - fx) * fy
                m11 = fx * fy

                def corners(band):
                    return (band[iy0, ix0], band[iy0, ix0 + 1],
                            band[iy0 + 1, ix0], band[iy0 + 1, ix0 + 1])

                tf = tfactor if np.ndim(tfactor) == 0 else tfactor
                if comp.displacement_type in ("vertical", "3d"):
                    z00, z10, z01, z11 = corners(grid.z)
                    dz_i = z00 * m00 + z01 * m01 + z10 * m10 + z11 * m11
                    dz = np.where(sel, dz + tf * dz_i, dz)
                if comp.displacement_type in ("horizontal", "3d"):
                    e00, e10, e01, e11 = corners(grid.e_or_lon)
                    n00, n10, n01, n11 = corners(grid.n_or_lat)
                    if hdeg or comp.interpolation_method == "bilinear":
                        de_i = e00 * m00 + e01 * m01 + e10 * m10 + e11 * m11
                        dn_i = n00 * m00 + n01 * m01 + n10 * m10 + n11 * m11
                        if hdeg:
                            dlam = np.where(sel, dlam + tf * de_i, dlam)
                            dphi = np.where(sel, dphi + tf * dn_i, dphi)
                        else:
                            de = np.where(sel, de + tf * de_i, de)
                            dn = np.where(sel, dn + tf * dn_i, dn)
                    else:  # geocentric_bilinear (GridEx, :100-170)
                        shx = math.sin(grid.resx / 2.0)
                        chx = math.cos(grid.resx / 2.0)
                        y0g = grid.miny + iy0 * grid.resy
                        sp0 = np.sin(y0g)
                        cp0 = np.cos(y0g)
                        sp1 = sp0 * math.cos(grid.resy) + \
                            cp0 * math.sin(grid.resy)
                        cp1 = cp0 * math.cos(grid.resy) - \
                            sp0 * math.sin(grid.resy)

                        def en_to_xyz(e_, n_, sl, cl, sp, cp):
                            nsp = n_ * sp
                            return (-e_ * sl - nsp * cl,
                                    e_ * cl - nsp * sl, n_ * cp)

                        X00, Y00, Z00 = en_to_xyz(e00, n00, -shx, chx,
                                                  sp0, cp0)
                        X01, Y01, Z01 = en_to_xyz(e01, n01, -shx, chx,
                                                  sp1, cp1)
                        X10, Y10, Z10 = en_to_xyz(e10, n10, shx, chx,
                                                  sp0, cp0)
                        X11, Y11, Z11 = en_to_xyz(e11, n11, shx, chx,
                                                  sp1, cp1)
                        dX = m00 * X00 + m01 * X01 + m10 * X10 + m11 * X11
                        dY = m00 * Y00 + m01 * Y01 + m10 * Y10 + m11 * Y11
                        dZ = m00 * Z00 + m01 * Z01 + m10 * Z10 + m11 * Z11
                        sinphi = np.sin(y)
                        cosphi = np.cos(y)
                        lam_c = (fx - 0.5) * grid.resx
                        if grid.resx < DEG2RAD:  # small-angle approx
                            sinlam = lam_c * (1.0 - (1.0 / 6) * lam_c
                                              * lam_c)
                            coslam = 1.0 - 0.5 * lam_c * lam_c
                        else:
                            sinlam = np.sin(lam_c)
                            coslam = np.cos(lam_c)
                        de_i = -dX * sinlam + dY * coslam
                        dn_i = (-dX * coslam - dY * sinlam) * sinphi \
                            + dZ * cosphi
                        de = np.where(sel, de + tf * de_i, de)
                        dn = np.where(sel, dn + tf * dn_i, dn)
                # NaN band values poison the sums -> error for the point
                # (reference returns false when valueAt fails)

        if hdeg:
            x_out = x + dlam
            y_out = y + dphi
        elif m.horizontal_offset_method == "addition" and \
                not self.is_geographic:
            x_out = x + de
            y_out = y + dn
        elif m.horizontal_offset_method == "addition" or \
                not m.horizontal_offset_method:
            dl, dp = _delta_en_to_longlat(np.cos(y), de, dn, self.a,
                                          self.b, self.es)
            x_out = x + dl
            y_out = y + dp
        else:  # geocentric
            sinphi = np.sin(y)
            cosphi = np.cos(y)
            sinlam = np.sin(x)
            coslam = np.cos(x)
            dnsinphi = dn * sinphi
            dX = -de * sinlam - dnsinphi * coslam
            dY = de * coslam - dnsinphi * sinlam
            dZ = dn * cosphi
            X, Y, Z = _geographic_to_geocentric(x, y, np.zeros_like(x),
                                                self.a, self.es)
            x_out, y_out, _ = _geocentric_to_geographic(
                X + dX, Y + dY, Z + dZ, self.a, self.es)
        z_out = z + dz
        bad = ~ok | np.isnan(x_out) | np.isnan(y_out)
        return (np.where(bad, np.nan, x_out), np.where(bad, np.nan, y_out),
                np.where(bad, np.nan, z_out))

    # -- inverse (defmodel_impl.hpp:1222-1262): fixed-point iteration
    def inverse(self, x, y, z, t):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        z = np.asarray(z, dtype=np.float64)
        x_out, y_out, z_out = x.copy(), y.copy(), z.copy()
        eps_h, eps_v = 1e-12, 1e-3
        converged = np.zeros(x.shape, dtype=bool)
        for _ in range(10):
            xn, yn, zn = self.forward(x_out, y_out, z_out, t,
                                      for_inverse=True)
            dx = xn - x
            dy = yn - y
            dzv = zn - z
            x_out = x_out - np.where(converged, 0.0, dx)
            y_out = y_out - np.where(converged, 0.0, dy)
            z_out = z_out - np.where(converged, 0.0, dzv)
            step_ok = (np.maximum(np.abs(dx), np.abs(dy)) < eps_h) & \
                (np.abs(dzv) < eps_v)
            converged = converged | step_ok | np.isnan(dx)
            if converged.all():
                break
        bad = ~converged | np.isnan(x_out)
        return (np.where(bad, np.nan, x_out), np.where(bad, np.nan, y_out),
                np.where(bad, np.nan, z_out))


def grid_from_bands(minx_deg, miny_deg, resx_deg, resy_deg,
                    e_or_lon=None, n_or_lat=None, z=None,
                    geographic=True) -> DefGrid:
    """Convenience constructor: degree-addressed raster -> radians."""
    s = DEG2RAD if geographic else 1.0
    return DefGrid(minx=minx_deg * s, miny=miny_deg * s, resx=resx_deg * s,
                   resy=resy_deg * s,
                   e_or_lon=None if e_or_lon is None
                   else np.asarray(e_or_lon, dtype=np.float64),
                   n_or_lat=None if n_or_lat is None
                   else np.asarray(n_or_lat, dtype=np.float64),
                   z=None if z is None
                   else np.asarray(z, dtype=np.float64))
