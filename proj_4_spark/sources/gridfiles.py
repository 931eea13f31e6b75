"""Binary grid-file parsers: GTX (vertical) and NTv2/.gsb (horizontal).

Pure-NumPy byte parsers for the two classic PROJ grid formats, so real
grid files can ship to executors as parquet ``binary`` columns (or any
bytes source) and land in ``GRID_REGISTRY`` without codec
dependencies.  Format layout re-derived from the reference readers:

- GTX: ``src/grids.cpp:243-310`` (GTXVerticalShiftGrid::open) — 40-byte
  big-endian header ``yorigin, xorigin, ystep, xstep`` (float64) +
  ``rows, columns`` (int32), then ``rows*columns`` big-endian float32
  values, row-major with row 0 at the south edge.  Nodata is the
  official ``-88.8888`` sentinel or any |value| > 1000 m
  (``src/grids.cpp:356-362``).
- NTv2: ``src/grids.cpp:2180-2330`` (NTv2GridSet::open) — an 11x16-byte
  overview record (``NUM_OREC``...), then per subfile an 11x16-byte
  header (``SUB_NAME``, ``PARENT``, extents in arc-seconds with the
  WEST-POSITIVE longitude convention, ``GS_COUNT``) followed by
  ``gs_count`` records of 4 float32 (lat shift, lon shift, lat err,
  lon err) in arc-seconds, rows south to north, columns EAST TO WEST.
  Endianness is auto-detected from the NUM_OREC value
  (``src/grids.cpp:2213``).

Both parsers return :class:`~proj_4_spark.kernels.gridshift.Grid`
(radians extents; horizontal values in east-positive radians, vertical
in meters) so they plug straight into the existing bilinear sampler
and iterative inverse.
"""

from __future__ import annotations

import struct

import numpy as np

from ..kernels.gridshift import Grid, GridSet

DEG_TO_RAD = np.pi / 180.0
SEC_TO_RAD = DEG_TO_RAD / 3600.0
GTX_NODATA = np.float32(-88.8888)


def parse_gtx(data: bytes) -> Grid:
    """Parse GTX bytes into a vertical-shift ``Grid`` (meters, NaN for
    nodata cells).  Header validation mirrors grids.cpp:277-283."""
    if len(data) < 40:
        raise ValueError("gtx: truncated header (<40 bytes)")
    yorigin, xorigin, ystep, xstep = struct.unpack(">4d", data[:32])
    rows, columns = struct.unpack(">2i", data[32:40])
    if columns <= 0 or rows <= 0 or not (-360 <= xorigin <= 360) \
            or not (-90 <= yorigin <= 90):
        raise ValueError("gtx: header has invalid extents")
    # 0-360 grids are shifted into -180..180 when possible
    # (grids.cpp:288-296)
    if xorigin >= 180.0:
        xorigin -= 360.0
    n = rows * columns
    if len(data) < 40 + 4 * n:
        raise ValueError("gtx: truncated data section")
    vals = np.frombuffer(data, dtype=">f4", count=n, offset=40)
    vals = vals.astype(np.float32).reshape(rows, columns)
    nodata = (vals == GTX_NODATA) | (np.abs(vals) > 1000.0)
    out = vals.astype(np.float64)
    out[nodata] = np.nan
    return Grid(lon0=xorigin * DEG_TO_RAD, lat0=yorigin * DEG_TO_RAD,
                dlon=xstep * DEG_TO_RAD, dlat=ystep * DEG_TO_RAD,
                values=out)


def write_gtx(lat0_deg: float, lon0_deg: float, dlat_deg: float,
              dlon_deg: float, values: np.ndarray) -> bytes:
    """Inverse of :func:`parse_gtx` — serialize a (rows, cols) float
    array to GTX bytes (row 0 = south).  Used to synthesize
    deterministic fixtures; NaN is written as the nodata sentinel."""
    v = np.asarray(values, dtype=np.float64)
    if v.ndim != 2:
        raise ValueError("write_gtx: values must be 2-D")
    v32 = v.astype(np.float32)
    v32[np.isnan(v32)] = GTX_NODATA
    rows, columns = v32.shape
    head = struct.pack(">4d2i", lat0_deg, lon0_deg, dlat_deg, dlon_deg,
                       rows, columns)
    return head + v32.astype(">f4").tobytes()


def _ntv2_double(rec: bytes, le: bool) -> float:
    return struct.unpack("<d" if le else ">d", rec)[0]


def parse_ntv2(data: bytes):
    """Parse NTv2 (.gsb) bytes into a list of ``(name, parent, Grid)``
    tuples, one per subfile.  Values become east-positive radian
    (dlam, dphi) pairs with columns re-ordered west->east
    (grids.cpp:2152-2177: NTv2 stores east->west, west-positive)."""
    if len(data) < 11 * 16:
        raise ValueError("ntv2: truncated overview header")
    if data[:8] != b"NUM_OREC":
        raise ValueError("ntv2: missing NUM_OREC magic")
    # NUM_OREC is always 11; read as little-endian to detect byte order
    # (grids.cpp:2213)
    le = struct.unpack("<i", data[8:12])[0] == 11
    num_subfiles = struct.unpack("<i" if le else ">i",
                                 data[8 + 32:8 + 36])[0]
    gs_type = data[56:63]
    if gs_type != b"SECONDS":
        raise ValueError("ntv2: only GS_TYPE=SECONDS is supported")
    pos = 11 * 16
    out = []
    for _ in range(num_subfiles):
        hdr = data[pos:pos + 11 * 16]
        if len(hdr) < 11 * 16 or hdr[:8] != b"SUB_NAME":
            raise ValueError("ntv2: bad subfile header")
        name = hdr[8:16].decode("ascii", "replace").strip()
        parent = hdr[24:32].decode("ascii", "replace").strip()
        base = 8 + 16 * 4
        south = _ntv2_double(hdr[base:base + 8], le) * SEC_TO_RAD
        north = _ntv2_double(hdr[base + 16:base + 24], le) * SEC_TO_RAD
        # stored west-positive: east = -E_LONG, west = -W_LONG
        east = -_ntv2_double(hdr[base + 32:base + 40], le) * SEC_TO_RAD
        west = -_ntv2_double(hdr[base + 48:base + 56], le) * SEC_TO_RAD
        res_y = _ntv2_double(hdr[base + 64:base + 72], le) * SEC_TO_RAD
        res_x = _ntv2_double(hdr[base + 80:base + 88], le) * SEC_TO_RAD
        gs_count = struct.unpack("<i" if le else ">i",
                                 hdr[8 + 16 * 10:8 + 16 * 10 + 4])[0]
        if not (west < east and south < north and res_x > 1e-10
                and res_y > 1e-10):
            raise ValueError("ntv2: inconsistent georeferencing")
        columns = int(abs((east - west) / res_x + 0.5)) + 1
        rows = int(abs((north - south) / res_y + 0.5)) + 1
        if gs_count != rows * columns:
            raise ValueError(
                f"ntv2: GS_COUNT({gs_count}) != {rows}x{columns}")
        pos += 11 * 16
        need = gs_count * 16
        raw = np.frombuffer(data, dtype="<f4" if le else ">f4",
                            count=gs_count * 4, offset=pos)
        pos += need
        rec = raw.astype(np.float32).reshape(rows, columns, 4)
        # lat shift, lon shift in seconds; flip columns east->west ->
        # west->east; negate lon (west-positive -> east-positive,
        # the compensateNTConvention path of grids.cpp:2171-2175)
        dphi = rec[:, ::-1, 0].astype(np.float64) * SEC_TO_RAD
        dlam = -rec[:, ::-1, 1].astype(np.float64) * SEC_TO_RAD
        g = Grid(lon0=west, lat0=south, dlon=res_x, dlat=res_y,
                 values=np.stack([dlam, dphi], axis=-1))
        out.append((name, parent, g))
    return out


def load_grid_bytes(name: str, data: bytes):
    """Parse grid bytes by format sniffing and return the registry
    value: an NTv2 file with one subfile (or a GTX file) yields a
    single ``Grid``; a multi-subfile NTv2 yields a ``GridSet`` with
    finest-grid-wins point selection."""
    if data[:8] == b"NUM_OREC":
        grids = parse_ntv2(data)
        if len(grids) == 1:
            return grids[0][2]
        return GridSet(grids=tuple(g for _, _, g in grids))
    if data[:9] == CTABLE2_MAGIC:
        return parse_ctable2(data)
    if data[:6] == NTV1_MAGIC:
        return parse_ntv1(data)
    if name.lower().endswith(".gtx") or len(data) >= 40:
        return parse_gtx(data)
    raise ValueError(f"unrecognized grid format for '{name}'")


def register_grid_file(name: str, data: bytes):
    """Parse ``data`` and install it in ``GRID_REGISTRY[name]`` so
    ``+proj=[hv]gridshift +grids=<name>`` resolves it."""
    from ..proj import GRID_REGISTRY

    g = load_grid_bytes(name, data)
    GRID_REGISTRY[name] = g
    return g


def synthetic_geoid_gtx_bytes() -> bytes:
    """Deterministic synthetic geoid as REAL GTX bytes (31x41 nodes
    over lon [-30, 50], lat [20, 70], undulation 30*sin(2*lam)*
    cos(3*phi) m) — the byte payload driven through :func:`parse_gtx`
    by the ``vgridshift_gtx`` driver query."""
    lon = np.linspace(-30.0, 50.0, 41)
    lat = np.linspace(20.0, 70.0, 31)
    LO, LA = np.meshgrid(np.radians(lon), np.radians(lat))
    und = 30.0 * np.sin(2.0 * LO) * np.cos(3.0 * LA)
    return write_gtx(20.0, -30.0, float(lat[1] - lat[0]),
                     float(lon[1] - lon[0]), und)


CTABLE2_MAGIC = b"CTABLE V2"


def parse_ctable2(data: bytes) -> Grid:
    """Parse CTable2 bytes (the reference's third native grid format,
    ``src/grids.cpp:1974-2051`` CTable2Grid::open/valueAt): 160-byte
    header with the magic at offset 0, little-endian ``west, south,
    resX, resY`` float64 **in radians** at offset 96, ``width,
    height`` int32 at 128; data from offset 160 as height*width
    little-endian float32 pairs (lonShift, latShift), lonShift stored
    WEST-POSITIVE (grids.cpp:2049 "west longitude positive
    convention"), rows south->north."""
    if len(data) < 160 or data[:9] != CTABLE2_MAGIC:
        raise ValueError("ctable2: missing 'CTABLE V2' magic")
    west, south, res_x, res_y = struct.unpack("<4d", data[96:128])
    width, height = struct.unpack("<2i", data[128:136])
    if width <= 0 or height <= 0 or not (
            abs(west) <= 4 * np.pi and abs(south) <= np.pi + 1e-5
            and res_x > 1e-10 and res_y > 1e-10):
        raise ValueError("ctable2: inconsistent georeferencing")
    n = width * height
    if len(data) < 160 + 8 * n:
        raise ValueError("ctable2: truncated data section")
    raw = np.frombuffer(data, dtype="<f4", count=2 * n, offset=160)
    rec = raw.astype(np.float64).reshape(height, width, 2)
    dlam = -rec[:, :, 0]   # west-positive -> east-positive
    dphi = rec[:, :, 1]
    return Grid(lon0=west, lat0=south, dlon=res_x, dlat=res_y,
                values=np.stack([dlam, dphi], axis=-1))


def write_ctable2(west_rad: float, south_rad: float, res_x_rad: float,
                  res_y_rad: float, dlam: np.ndarray,
                  dphi: np.ndarray, description: str = "synthetic") -> bytes:
    """Inverse of :func:`parse_ctable2` (east-positive inputs in
    radians; stored west-positive like the on-disk format)."""
    dlam = np.asarray(dlam, dtype=np.float64)
    dphi = np.asarray(dphi, dtype=np.float64)
    if dlam.shape != dphi.shape or dlam.ndim != 2:
        raise ValueError("write_ctable2: dlam/dphi must be same-shape 2-D")
    height, width = dlam.shape
    head = bytearray(160)
    head[:9] = CTABLE2_MAGIC
    head[16:16 + min(80, len(description))] = \
        description.encode("ascii", "replace")[:80]
    head[96:128] = struct.pack("<4d", west_rad, south_rad,
                               res_x_rad, res_y_rad)
    head[128:136] = struct.pack("<2i", width, height)
    rec = np.empty((height, width, 2), dtype="<f4")
    rec[:, :, 0] = -dlam
    rec[:, :, 1] = dphi
    return bytes(head) + rec.tobytes()


NTV1_MAGIC = b"HEADER"


def parse_ntv1(data: bytes) -> Grid:
    """Parse NTv1 bytes (``src/grids.cpp`` NTv1Grid::open/valueAt):
    192-byte big-endian header — int32 record count (must be 12) at
    offset 8; float64 degrees at 24 (south), 40 (north), 56 (east,
    west-positive), 72 (west, west-positive), 88 (resY), 104 (resX) —
    then float64 pairs (latShift, lonShift) in arc-seconds from offset
    192, rows south->north, columns EAST TO WEST, lonShift
    west-positive."""
    if len(data) < 192 or data[:6] != NTV1_MAGIC:
        raise ValueError("ntv1: missing HEADER magic")
    if struct.unpack(">i", data[8:12])[0] != 12:
        raise ValueError("ntv1: wrong record count, corrupt?")
    south = struct.unpack(">d", data[24:32])[0] * DEG_TO_RAD
    north = struct.unpack(">d", data[40:48])[0] * DEG_TO_RAD
    east = -struct.unpack(">d", data[56:64])[0] * DEG_TO_RAD
    west = -struct.unpack(">d", data[72:80])[0] * DEG_TO_RAD
    res_y = struct.unpack(">d", data[88:96])[0] * DEG_TO_RAD
    res_x = struct.unpack(">d", data[104:112])[0] * DEG_TO_RAD
    if not (west < east and south < north and res_x > 1e-10
            and res_y > 1e-10):
        raise ValueError("ntv1: inconsistent georeferencing")
    columns = int(abs((east - west) / res_x + 0.5)) + 1
    rows = int(abs((north - south) / res_y + 0.5)) + 1
    n = rows * columns
    if len(data) < 192 + 16 * n:
        raise ValueError("ntv1: truncated data section")
    raw = np.frombuffer(data, dtype=">f8", count=2 * n, offset=192)
    rec = raw.astype(np.float64).reshape(rows, columns, 2)
    dphi = rec[:, ::-1, 0] * SEC_TO_RAD
    dlam = -rec[:, ::-1, 1] * SEC_TO_RAD
    return Grid(lon0=west, lat0=south, dlon=res_x, dlat=res_y,
                values=np.stack([dlam, dphi], axis=-1))
