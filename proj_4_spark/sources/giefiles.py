"""gie-format golden-fixture runner.

Parses the reference's regression-test DSL (format documented at
src/apps/gie.cpp:1-80; verb table :151-167) and evaluates every
accept/expect pair and roundtrip against this engine's compiled
pipelines, so the full public corpus (test/gie/*.gie, thousands of
golden points) sweeps in pytest instead of hand-transcribed subsets.

Semantics mirrored from the reference runner:

- verbs: operation / accept / expect / roundtrip / direction /
  tolerance / ignore / require_grid / skip (+ banner-class no-ops)
  (gie.cpp:151-167); `operation` resets direction=forward,
  tolerance=0.5 mm, ignore (gie.cpp:602-640).
- tolerance units km/m/dm/cm/mm/um/nm and rad/deg via the GRS80
  equator factor (strtod_scaled, gie.cpp:494-537).
- coordinates: up to 4 whitespace-separated values, underscores as
  thousands separators, DMS forms, HUGE_VAL (parse_coord,
  gie.cpp:729-790); unspecified components are 0.
- angular edges: degrees in fixtures <-> radians at the pipeline edge
  for the lon/lat channels only (torad_coord/todeg_coord,
  gie.cpp:700-727 — default axis "enut" converts v[0], v[1]).
- comparison: computed components beyond the expectation's dimension
  count are masked to 0 (gie.cpp:1046-1050); angular output compares
  by geodesic distance + dz on the operation's ellipsoid
  (proj_lpz_dist), projected output by euclidean 3D distance
  (gie.cpp:1065-1072); NaN==NaN passes.
- expect failure [errno ...]: the pair passes when the operation
  fails to construct or the point transforms to NaN/HUGE_VAL
  (gie.cpp:960-1014; errno identity is not modelled — any failure
  matches).
- roundtrip n tol: half-step out, n-1 full out-and-back steps, half
  step home; drift measured with the input-side metric
  (proj_roundtrip, src/trans.cpp:588-626).
"""

from __future__ import annotations

import math
import os
import re
from dataclasses import dataclass, field

import numpy as np

DEG_TO_RAD = math.pi / 180.0
GRS80_DEG = 111319.4908  # deg->m at the GRS80 equator (gie.cpp:499)

_VERBS = {
    "operation", "accept", "expect", "roundtrip", "direction",
    "tolerance", "ignore", "require_grid", "skip", "banner", "echo",
    "verbose", "use_proj4_init_rules", "crs_src", "crs_dst",
}
_NOOP_VERBS = {"banner", "echo", "verbose", "use_proj4_init_rules"}

_TOL_UNITS = {
    "km": 1000.0, "m": 1.0, "dm": 0.1, "cm": 0.01, "mm": 1e-3,
    "um": 1e-6, "nm": 1e-9,
}

_DMS_TOKEN = re.compile(
    r"^([+-]?)(\d+(?:\.\d+)?)[dD°]"
    r"(?:(\d+(?:\.\d+)?)(?:'(\d+(?:\.\d+)?)\"?)?'?)?"
    r"([NSEWnsew])?$")


def parse_value(tok: str) -> float | None:
    """One coordinate token: plain float with optional '_' thousands
    separators, HUGE_VAL, or DMS (55d30'N, -81d00'00.000)."""
    if tok.startswith("HUGE_VAL"):
        return float("inf")
    tok = tok.replace("_", "")
    try:
        return float(tok)
    except ValueError:
        pass
    m = _DMS_TOKEN.match(tok)
    if m is None:
        return None
    sign, deg, mins, secs, hemi = m.groups()
    val = (float(deg) + (float(mins) if mins else 0.0) / 60.0
           + (float(secs) if secs else 0.0) / 3600.0)
    if sign == "-":
        val = -val
    if hemi and hemi.upper() in "SW":
        val = -val
    return val


def parse_coord(args: str) -> tuple[tuple[float, ...], int] | None:
    """Up to 4 leading numeric columns -> ((x,y,z,t), dims); trailing
    non-numeric columns are ignored; <2 dims is a parse error."""
    vals: list[float] = []
    for tok in args.split():
        if len(vals) == 4:
            break
        v = parse_value(tok)
        if v is None:
            break
        vals.append(v)
    if len(vals) < 2:
        return None
    dims = len(vals)
    while len(vals) < 4:
        vals.append(0.0)
    return tuple(vals), dims


def parse_tolerance(args: str) -> float:
    """'0.5 mm' / '10 um' / '1cm' / '1e-9 rad' -> metres
    (gie.cpp:494-537; the unit may be glued to the number)."""
    m = re.match(r"\s*([+-]?[0-9._]*\.?[0-9_]+(?:[eE][+-]?\d+)?)"
                 r"\s*([a-z]*)", args)
    if m and m.group(2):
        args = f"{m.group(1)} {m.group(2)}"
    cols = args.split()
    try:
        v = float(cols[0].replace("_", ""))
    except (ValueError, IndexError):
        return 0.0005
    unit = cols[1] if len(cols) > 1 else "m"
    if unit in _TOL_UNITS:
        return v * _TOL_UNITS[unit]
    if unit == "rad":
        return GRS80_DEG * (v / DEG_TO_RAD)
    if unit == "deg":
        return GRS80_DEG * v
    return v


@dataclass
class GieCheck:
    kind: str                 # "expect" | "roundtrip"
    file: str
    lineno: int
    operation: str
    direction: str            # "fwd" | "inv"
    tolerance: float          # metres
    accept: tuple[float, ...] | None
    accept_dims: int
    expect: tuple[float, ...] | None = None
    expect_dims: int = 0
    expect_failure: bool = False
    ignore: bool = False
    require_grid: str | None = None
    ntrips: int = 0
    rt_tol: float = 0.0
    crs_pair: tuple[str, str] | None = None


def _is_decorative(line: str) -> bool:
    """>=5 identical leading chars (gie.cpp:1325-1333)."""
    if len(line) < 5:
        return False
    c = line[0]
    return not c.isalnum() and line[:5] == c * 5


def _command_lines(path: str):
    """Yield (lineno, verb, args) with continuation lines folded in —
    the unified non-strict/strict record reader (gie.cpp:1380-1546):
    a non-verb, non-decorative line continues the previous command; a
    trailing backslash continues explicitly."""
    cur: list | None = None
    cont = False
    with open(path, errors="replace") as f:
        text = f.read()
    # tagged files: only the material INSIDE <gie>/<gie-strict> blocks
    # is executed (gie.cpp:1406-1420 skips to the opening tag; trailing
    # commentary after </gie-strict> — e.g. DHDN_ETRS89.gie's
    # "not implemented yet" accept/expect notes — must not run)
    tagged = "<gie>" in text or "<gie-strict>" in text
    inside = not tagged
    for i, raw in enumerate(text.splitlines(), 1):
        line = raw.strip()
        # inline comments are stripped BEFORE continuation folding
        # ('+step +proj=latlon \\ # dummy step' keeps folding the op,
        # gie.cpp comment handling)
        if "#" in line:
            line = line.split("#", 1)[0].strip()
        if line in ("<gie>", "<gie-strict>"):
            inside = True
        elif line in ("</gie>", "</gie-strict>"):
            inside = False
        if (not inside or line in ("<gie>", "<gie-strict>")
                or not line or line.startswith("#")
                or _is_decorative(line)):
            if cur is not None and not cont:
                yield cur
                cur = None
            continue
        word = line.split(None, 1)[0]
        if word in _VERBS and not cont:
            if cur is not None:
                yield cur
            rest = line[len(word):].strip()
            cont = rest.endswith("\\")
            if cont:
                rest = rest[:-1].strip()
            cur = [i, word, rest]
        elif cur is not None:
            seg = line
            cont = seg.endswith("\\")
            if cont:
                seg = seg[:-1].strip()
            cur[2] = (cur[2] + " " + seg).strip()
        # else: stray line before any verb — ignore
    if cur is not None:
        yield cur


def parse_gie(path: str) -> list[GieCheck]:
    checks: list[GieCheck] = []
    op = ""
    crs_src = crs_dst = ""
    direction = "fwd"
    tol = 0.0005
    ignore = False
    req_grid: str | None = None
    accept: tuple[float, ...] | None = None
    accept_dims = 0
    fname = os.path.basename(path)

    def reset_block():
        nonlocal direction, tol, ignore, req_grid, accept, accept_dims
        direction, tol, ignore = "fwd", 0.0005, False
        req_grid, accept, accept_dims = None, None, 0

    for lineno, verb, args in _command_lines(path):
        if verb in _NOOP_VERBS:
            continue
        if verb == "skip":
            break  # rest of file skipped (gie.cpp T.skip)
        if verb == "operation":
            op = args
            crs_src = crs_dst = ""
            reset_block()
        elif verb == "crs_src":
            crs_src = args
            if crs_dst:
                op = ""
                reset_block()
        elif verb == "crs_dst":
            crs_dst = args
            if crs_src:
                op = ""
                reset_block()
        elif verb == "direction":
            d = args.strip().lower()[:1]
            direction = "inv" if d in ("i", "r") else "fwd"
        elif verb == "tolerance":
            tol = parse_tolerance(args)
        elif verb == "ignore":
            ignore = True
        elif verb == "require_grid":
            req_grid = args.split()[0] if args.split() else ""
        elif verb == "accept":
            pc = parse_coord(args)
            if pc is not None:
                accept, accept_dims = pc
        elif verb == "roundtrip":
            cols = args.split()
            ntrips, rt_tol = 100, tol
            if cols:
                try:
                    ntrips = int(float(cols[0].replace("_", "")))
                except ValueError:
                    ntrips = 100
                if len(cols) > 1:
                    rt_tol = parse_tolerance(" ".join(cols[1:]))
            if accept is not None and (op or (crs_src and crs_dst)):
                checks.append(GieCheck(
                    "roundtrip", fname, lineno, op, direction, tol,
                    accept, accept_dims, ignore=ignore,
                    require_grid=req_grid, ntrips=ntrips, rt_tol=rt_tol,
                    crs_pair=(crs_src, crs_dst) if crs_src and crs_dst
                    else None))
        elif verb == "expect":
            if not op and not (crs_src and crs_dst):
                continue
            c = GieCheck("expect", fname, lineno, op, direction, tol,
                         accept, accept_dims, ignore=ignore,
                         require_grid=req_grid,
                         crs_pair=(crs_src, crs_dst)
                         if crs_src and crs_dst else None)
            if args.startswith("failure"):
                c.expect_failure = True
                checks.append(c)
            else:
                pc = parse_coord(args)
                if pc is None:
                    continue
                c.expect, c.expect_dims = pc
                if accept is not None:
                    checks.append(c)
    return checks


# ---------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------

_FIXTURE_REF = re.compile(r"(?:grids|file|model)=([^\s]+)")


class GieRunner:
    """Evaluates GieChecks against proj_4_spark.proj pipelines.

    ``fixture_dirs``: directories searched for grid/TIN/deformation-
    model files named in +grids=/+file=/+model=/require_grid — found
    files are parsed with the real binary/JSON readers
    (sources.gridfiles / kernels.gridshift.tin_from_json /
    kernels.defmodel.MasterFile) and installed in the registries, the
    cluster analogue of the reference's data-dir lookup."""

    def __init__(self, fixture_dirs: tuple[str, ...] = ()):
        self._cache: dict[str, tuple] = {}
        self.fixture_dirs = tuple(fixture_dirs)
        self._fixture_tried: set[str] = set()

    # the reference's test build stages downsampled grids under the
    # production names (data/CMakeLists.txt:89-90 configure_file)
    _ALIASES = {
        "egm96_15.gtx": "tests/egm96_15_downsampled.gtx",
        "ntv2_0.gsb": "tests/ntv2_0_downsampled.gsb",
    }

    def _register_fixture(self, name: str, as_defmodel_grid=False) -> bool:
        from ..proj import DEFMODEL_REGISTRY, GRID_REGISTRY

        base = name.lstrip("@")
        if not base or base == "null":
            return False
        if base in GRID_REGISTRY or base in DEFMODEL_REGISTRY:
            return True
        key = ("D" if as_defmodel_grid else "G") + base
        if key in self._fixture_tried:
            return False
        self._fixture_tried.add(key)
        for d in self.fixture_dirs:
            p = os.path.join(d, base)
            if not os.path.isfile(p) and base in self._ALIASES:
                p = os.path.join(d, self._ALIASES[base])
            if not os.path.isfile(p):
                continue
            try:
                with open(p, "rb") as f:
                    data = f.read()
                if base.endswith(".json"):
                    import json as _json

                    text = data.decode("utf-8")
                    ft = _json.loads(text).get("file_type", "")
                    if ft == "triangulation_file":
                        from ..kernels.gridshift import tin_from_json

                        GRID_REGISTRY[base] = tin_from_json(text)
                    else:
                        from ..kernels.defmodel import MasterFile

                        DEFMODEL_REGISTRY[base] = text
                        for comp in MasterFile.parse(text).components:
                            self._register_fixture(
                                comp.filename, as_defmodel_grid=True)
                elif as_defmodel_grid:
                    from .gridfiles import defmodel_gridset_from_geotiff

                    GRID_REGISTRY[base] = defmodel_gridset_from_geotiff(data)
                else:
                    from .gridfiles import register_grid_file

                    register_grid_file(base, data)
                return True
            except Exception:  # noqa: BLE001 — unparseable layout -> skip
                return False
        return False

    def _ensure_fixtures(self, operation: str):
        if not self.fixture_dirs:
            return
        for ref in _FIXTURE_REF.findall(operation):
            for nm in ref.split(","):
                self._register_fixture(nm)
        # +init=FILE:KEY resolves against the reference data dir the
        # same way grids do (init.cpp:112-230 data-dir lookup)
        for m in re.finditer(r"init=([A-Za-z0-9_.]+):", operation):
            fname = m.group(1)
            if fname.lower() == "epsg":
                continue
            from ..proj import INIT_REGISTRY

            if fname in INIT_REGISTRY:
                continue
            for d in self.fixture_dirs:
                p = os.path.join(d, fname)
                if os.path.isfile(p):
                    from .initfiles import register_init_file

                    try:
                        with open(p, errors="replace") as f:
                            register_init_file(fname, f.read())
                    except Exception:  # noqa: BLE001
                        pass
                    break
        # +datum=NAME may expand to a nadgrids list (datums.cpp) —
        # resolve those grids too so e.g. datum=potsdam finds
        # BETA2007.gsb the way the reference's data-dir lookup does
        for m in re.finditer(r"datum=(\w+)", operation):
            from ..proj import DATUMS

            d = DATUMS.get(m.group(1))
            if d and "nadgrids" in d:
                for nm in str(d["nadgrids"]).split(","):
                    self._register_fixture(nm)

    def _compile(self, c: GieCheck):
        key = c.operation if c.crs_pair is None else "\x00".join(c.crs_pair)
        if key in self._cache:
            return self._cache[key]
        try:
            if c.crs_pair is not None:
                from ..crs import crs_to_crs

                tr = crs_to_crs(*c.crs_pair)
            else:
                from ..proj import compile_projstring

                tr = compile_projstring(c.operation)
            res = (tr, None)
        except Exception as e:  # noqa: BLE001 — failure is a result here
            res = (None, e)
        self._cache[key] = res
        return res

    @staticmethod
    def _metric_ellipsoid(tr):
        for op in tr.ops:
            ell = getattr(op, "ell", None)
            if ell is not None and getattr(ell, "a", 0):
                return ell.a, ell.f
        return 6378137.0, 1 / 298.257223563

    def _lpz_dist(self, tr, a, b) -> float:
        """proj_lpz_dist: geodesic distance between radian lon/lats
        plus dz in quadrature (src/dist.cpp:41-83)."""
        from ..kernels.geodesic import Geodesic, inverse

        ae, fe = self._metric_ellipsoid(tr)
        g = Geodesic.init(ae, fe)
        r = inverse(g,
                    np.array([a[1] / DEG_TO_RAD]),
                    np.array([a[0] / DEG_TO_RAD]),
                    np.array([b[1] / DEG_TO_RAD]),
                    np.array([b[0] / DEG_TO_RAD]))
        s12 = float(r[0][0])
        return math.hypot(s12, a[2] - b[2])

    def _trans(self, tr, c: GieCheck, coord, direction):
        in_ang = tr.angular_input(direction)
        x = np.array([coord[0]])
        y = np.array([coord[1]])
        z = np.array([coord[2]])
        t = np.array([coord[3]])
        if in_ang:
            x = x * DEG_TO_RAD
            y = y * DEG_TO_RAD
        xo, yo, zo, to = tr.transform(x, y, z, t, direction)
        return float(xo[0]), float(yo[0]), float(zo[0]), float(to[0])

    def run(self, c: GieCheck) -> tuple[str, str]:
        """-> (status, detail); status in {'ok', 'fail', 'skip'}."""
        if c.require_grid is not None:
            from ..proj import GRID_REGISTRY

            self._register_fixture(c.require_grid)
            if c.require_grid.lstrip("@") not in GRID_REGISTRY:
                return "skip", f"missing grid {c.require_grid}"
        if c.operation.startswith("urn:ogc:def:coordinateOperation:NKG"):
            # URN resolution itself is in scope (sources/nkg_ops.py);
            # the NKG velocity grids ship with proj-data, not the
            # source tree, so evaluation is gated on their presence
            from ..proj import GRID_REGISTRY
            from .nkg_ops import required_grids

            try:
                grids = required_grids(c.operation.strip())
            except KeyError:
                return "fail", f"unresolvable URN {c.operation}"
            missing = []
            for g in grids:
                self._register_fixture(g)
                if g not in GRID_REGISTRY:
                    missing.append(g)
            if missing:
                return ("skip", "URN resolved; velocity grid(s) "
                        f"{sorted(set(missing))} ship with proj-data, "
                        "not the source tree")
        self._ensure_fixtures(c.operation)
        tr, err = self._compile(c)
        if err is not None:
            if c.expect_failure:
                return "ok", ""
            if c.ignore:
                return "skip", f"compile: {err}"
            return "fail", f"compile: {err}"
        if c.kind == "roundtrip":
            return self._run_roundtrip(tr, c)
        return self._run_expect(tr, c)

    def _run_expect(self, tr, c: GieCheck) -> tuple[str, str]:
        try:
            out = self._trans(tr, c, c.accept, c.direction)
        except Exception as e:  # noqa: BLE001
            if c.expect_failure:
                return "ok", ""
            if c.ignore:
                return "skip", f"transform: {e}"
            return "fail", f"transform raised: {e}"
        bad = any(not math.isfinite(v) for v in out[:3])
        if c.expect_failure:
            return ("ok", "") if bad else (
                "fail", f"expected failure, got {out[:2]}")
        if bad and not all(math.isfinite(v) for v in c.expect[:2]):
            return "ok", ""  # NaN expected, NaN got
        out = list(out)
        if c.expect_dims < 4:
            out[3] = 0.0
        if c.expect_dims < 3:
            out[2] = 0.0
        out_ang = tr.angular_output(c.direction)
        if out_ang:
            exp = (c.expect[0] * DEG_TO_RAD, c.expect[1] * DEG_TO_RAD,
                   c.expect[2], c.expect[3])
            if all(math.isnan(v) for v in out[:2]) \
                    and all(math.isnan(v) for v in exp[:2]):
                d = 0.0
            else:
                try:
                    d = self._lpz_dist(tr, exp, out)
                except Exception:  # noqa: BLE001 — fall back to chord
                    d = GRS80_DEG * math.hypot(
                        (out[0] - exp[0]) / DEG_TO_RAD,
                        (out[1] - exp[1]) / DEG_TO_RAD)
        else:
            exp = c.expect
            d = math.sqrt((out[0] - exp[0]) ** 2 + (out[1] - exp[1]) ** 2
                          + (out[2] - exp[2]) ** 2)
        if not (d <= c.tolerance):
            return "fail", (f"deviation {d:.6g} m > tol {c.tolerance:g} m "
                            f"(got {out[:c.expect_dims]}, "
                            f"expected {c.expect[:c.expect_dims]})")
        return "ok", ""

    def _run_roundtrip(self, tr, c: GieCheck) -> tuple[str, str]:
        opp = "inv" if c.direction == "fwd" else "fwd"
        in_ang = tr.angular_input(c.direction)
        org = list(c.accept)
        if in_ang:
            org[0] *= DEG_TO_RAD
            org[1] *= DEG_TO_RAD
        x = np.array([org[0]])
        y = np.array([org[1]])
        z = np.array([org[2]])
        t = np.array([org[3]])
        try:
            x, y, z, t = tr.transform(x, y, z, t, c.direction)
            for _ in range(c.ntrips - 1):
                x, y, z, t = tr.transform(x, y, z, t, opp)
                x, y, z, t = tr.transform(x, y, z, t, c.direction)
            x, y, z, t = tr.transform(x, y, z, t, opp)
        except Exception as e:  # noqa: BLE001
            return "fail", f"roundtrip raised: {e}"
        end = (float(x[0]), float(y[0]), float(z[0]), float(t[0]))
        if all(math.isnan(v) for v in org[:2]) \
                and all(math.isnan(v) for v in end[:2]):
            return "ok", ""  # NaN in, NaN out (gie NaN==NaN)
        if in_ang:
            try:
                d = self._lpz_dist(tr, org, end)
            except Exception:  # noqa: BLE001
                d = GRS80_DEG * math.hypot(
                    (end[0] - org[0]) / DEG_TO_RAD,
                    (end[1] - org[1]) / DEG_TO_RAD)
        else:
            d = math.sqrt(sum((e - o) ** 2 for e, o in
                              zip(end[:3], org[:3])))
        if not (d <= c.rt_tol):
            return "fail", f"roundtrip drift {d:.6g} m > {c.rt_tol:g} m"
        return "ok", ""


@dataclass
class SweepResult:
    ok: int = 0
    failed: int = 0
    skipped: int = 0
    failures: list = field(default_factory=list)


def sweep(path: str, skip_ops: dict[str, str] | None = None,
          fixture_dirs: tuple[str, ...] = ()) -> SweepResult:
    """Run every check in a gie file.  ``skip_ops`` maps an operation
    substring -> reason; matching checks are counted as skipped."""
    runner = GieRunner(fixture_dirs=fixture_dirs)
    res = SweepResult()
    for c in parse_gie(path):
        reason = None
        for pat, why in (skip_ops or {}).items():
            if pat in c.operation:
                reason = why
                break
        if reason is not None:
            res.skipped += 1
            continue
        status, detail = runner.run(c)
        if status == "ok":
            res.ok += 1
        elif status == "skip":
            res.skipped += 1
        else:
            res.failed += 1
            res.failures.append((c.file, c.lineno, c.operation,
                                 c.direction, detail))
    return res
