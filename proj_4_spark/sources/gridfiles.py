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
                 values=np.stack([dlam, dphi], axis=-1),
                 nt_lam_negated=True)
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
    if data[:2] in (b"II", b"MM"):
        entries = geotiff_unified(data)
        return entries[0] if len(entries) == 1 else tuple(entries)
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
                values=np.stack([dlam, dphi], axis=-1),
                nt_lam_negated=True)


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
                values=np.stack([dlam, dphi], axis=-1),
                nt_lam_negated=True)


def synthetic_ctable2_pair() -> tuple[bytes, bytes]:
    """Two deterministic CTable2 byte payloads for the ordered
    +nadgrids list: a FINE grid over lon [-10, 30] lat [35, 60]
    (field amp*sin(2λ)cos(3φ) / amp*cos(3λ)sin(2φ), amp = 8e-6 rad)
    and a COARSE grid over lon [-30, 50] lat [20, 70] (field
    amp*cos(λ)sin(φ) / amp*sin(λ)cos(φ), amp = 1.5e-5 rad).  Points in
    both extents must resolve through the FINE grid (first listed)."""
    lon_f = np.radians(np.linspace(-10.0, 30.0, 33))
    lat_f = np.radians(np.linspace(35.0, 60.0, 26))
    LO, LA = np.meshgrid(lon_f, lat_f)
    fine = write_ctable2(
        float(lon_f[0]), float(lat_f[0]),
        float(lon_f[1] - lon_f[0]), float(lat_f[1] - lat_f[0]),
        8e-6 * np.sin(2.0 * LO) * np.cos(3.0 * LA),
        8e-6 * np.cos(3.0 * LO) * np.sin(2.0 * LA), "fine synthetic")
    lon_c = np.radians(np.linspace(-30.0, 50.0, 21))
    lat_c = np.radians(np.linspace(20.0, 70.0, 26))
    LO, LA = np.meshgrid(lon_c, lat_c)
    coarse = write_ctable2(
        float(lon_c[0]), float(lat_c[0]),
        float(lon_c[1] - lon_c[0]), float(lat_c[1] - lat_c[0]),
        1.5e-5 * np.cos(LO) * np.sin(LA),
        1.5e-5 * np.sin(LO) * np.cos(LA), "coarse synthetic")
    return fine, coarse


# ------------------------------------------------------------- GeoTIFF

_TIFF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2,
                   9: 4, 10: 8, 11: 4, 12: 8, 13: 4, 16: 8, 17: 8,
                   18: 8}
_TIFF_TYPE_FMT = {3: "H", 4: "I", 8: "h", 9: "i", 11: "f", 12: "d",
                  13: "I", 16: "Q", 17: "q", 18: "Q"}


def _tiff_values(data: bytes, bo: str, typ: int, cnt: int, raw: bytes,
                 inline: int = 4):
    size = _TIFF_TYPE_SIZE[typ] * cnt
    buf = raw[:inline] if size <= inline else None
    if buf is None:
        off = struct.unpack(bo + ("Q" if inline == 8 else "I"),
                            raw[:inline])[0]
        buf = data[off:off + size]
    if typ == 2:
        return buf.split(b"\0", 1)[0].decode("ascii", "replace")
    fmt = _TIFF_TYPE_FMT.get(typ)
    if fmt is None:
        return buf
    return list(struct.unpack(bo + str(cnt) + fmt, buf[:size]))


def _parse_gdal_meta(xml: str):
    """<Item name="..." [sample="n"]>value</Item> -> {(name, sample)}"""
    import re as _re

    out = {}
    for m in _re.finditer(
            r'<Item\s+name="([^"]+)"(?:\s+sample="(\d+)")?[^>]*>'
            r'([^<]*)</Item>', xml):
        out[(m.group(1),
             int(m.group(2)) if m.group(2) is not None else None)] = \
            m.group(3).strip()
    return out


def parse_geotiff(data: bytes):
    """Parse a (Geo)TIFF grid file into a list of per-IFD dicts
    ``{"type", "grid", "interp", "name", "parent"}``.

    Re-derivation of the reference's GTiff grid reader
    (``src/grids.cpp:439-1030`` GTiffDataset/GTiffGrid +
    ``:2520-2650`` channel identification): classic TIFF, both byte
    orders, strip or tile organization, float32 samples, compression
    none or DEFLATE (zlib), pixel-interleaved;
    georeferencing from ModelPixelScale (33550) + ModelTiepoint
    (33922); channel semantics, units, sign convention, default
    interpolation and grid hierarchy from the GDAL_METADATA XML
    (42112).  TIFF rows run north->south and are flipped to the
    south-first Grid layout; longitude offsets default arc-second
    east-positive (``positive_value`` west negates, UNITTYPE
    overrides, grids.cpp:2590-2640)."""
    if data[:2] not in (b"II", b"MM"):
        raise ValueError("geotiff: not a TIFF byte stream")
    bo = "<" if data[:2] == b"II" else ">"
    magic = struct.unpack(bo + "H", data[2:4])[0]
    if magic == 42:                                   # classic TIFF
        big = False
        first_off = struct.unpack(bo + "I", data[4:8])[0]
    elif magic == 43:                                 # BigTIFF
        big = True
        if struct.unpack(bo + "H", data[4:6])[0] != 8:
            raise ValueError("geotiff: bad BigTIFF offset size")
        first_off = struct.unpack(bo + "Q", data[8:16])[0]
    else:
        raise ValueError("geotiff: bad magic")
    out = []
    off = first_off
    while off:
        if big:
            n = struct.unpack(bo + "Q", data[off:off + 8])[0]
            ent0, esz = off + 8, 20
        else:
            n = struct.unpack(bo + "H", data[off:off + 2])[0]
            ent0, esz = off + 2, 12
        tags = {}
        for i in range(int(n)):
            e = ent0 + i * esz
            if big:
                tag, typ = struct.unpack(bo + "HH", data[e:e + 4])
                cnt = struct.unpack(bo + "Q", data[e + 4:e + 12])[0]
                raw = data[e + 12:e + 20]
            else:
                tag, typ, cnt = struct.unpack(bo + "HHI", data[e:e + 8])
                raw = data[e + 8:e + 12]
            tags[tag] = (typ, int(cnt), raw)
        nxt = ent0 + int(n) * esz
        off = struct.unpack(bo + ("Q" if big else "I"),
                            data[nxt:nxt + (8 if big else 4)])[0]

        def tv(tag, default=None):
            if tag not in tags:
                return default
            typ, cnt, raw = tags[tag]
            return _tiff_values(data, bo, typ, cnt, raw,
                                inline=8 if big else 4)

        subfile = int(tv(254, [0])[0])
        if subfile & 1:
            continue  # reduced-resolution overview IFD: full-res only
        w = int(tv(256)[0])
        h = int(tv(257)[0])
        spp = int(tv(277, [1])[0])
        comp = int(tv(259, [1])[0])
        planar = int(tv(284, [1])[0])
        predictor = int(tv(317, [1])[0])
        bits = tv(258, [32])
        sfmt = tv(339, [3] * spp)
        if len(set(bits)) != 1 or len(set(sfmt)) != 1:
            raise ValueError("geotiff: mixed sample types")
        kind = {1: "u", 2: "i", 3: "f"}.get(int(sfmt[0]))
        if kind is None or int(bits[0]) not in (16, 32, 64) \
                or (kind == "f" and int(bits[0]) == 16):
            raise ValueError(
                f"geotiff: samples fmt={sfmt[0]} bits={bits[0]} "
                "not supported")
        bysz = int(bits[0]) // 8
        dt = np.dtype(bo + kind + str(bysz))
        if planar not in (1, 2):
            raise ValueError(f"geotiff: planar config {planar}")
        if predictor not in (1, 2, 3):
            raise ValueError("geotiff: predictors not supported")
        if comp not in (1, 8, 32946):
            raise ValueError(f"geotiff: compression {comp} not supported")

        def decomp(b: bytes) -> bytes:
            if comp == 1:
                return b
            import zlib
            return zlib.decompress(b)

        def decode(raw: bytes, nrow: int, ncol: int,
                   spp: int = spp) -> np.ndarray:
            """One strip/tile -> (nrow, ncol, spp) float64, predictor
            applied (TIFF 6.0 §14 horizontal; TechNote 3 floating
            point: per-row byte-plane split + byte differencing)."""
            if predictor == 3:
                b = np.frombuffer(raw, np.uint8).reshape(
                    nrow, ncol * spp * bysz).copy()
                np.cumsum(b, axis=1, dtype=np.uint8, out=b)
                # byte planes are stored MSB-first per row
                planes = b.reshape(nrow, bysz, ncol * spp)
                be = np.ascontiguousarray(
                    planes.transpose(0, 2, 1)).tobytes()
                a = np.frombuffer(be, ">" + kind + str(bysz))
            else:
                a = np.frombuffer(raw, dt, count=nrow * ncol * spp)
                if predictor == 2:
                    a = np.cumsum(
                        a.reshape(nrow, ncol, spp), axis=1,
                        dtype=dt).ravel()
            return a.reshape(nrow, ncol, spp).astype(np.float64)

        # with planar=2 (separate planes) each strip/tile holds ONE
        # sample plane; blocks for plane 0 come first, then plane 1...
        bspp = 1 if planar == 2 else spp
        arr = np.empty((h, w, spp), dtype=np.float64)
        if 322 in tags:                                   # tiled
            tw, th = int(tv(322)[0]), int(tv(323)[0])
            toffs, tcnts = tv(324), tv(325)
            tiles_x = (w + tw - 1) // tw
            tiles_y = (h + th - 1) // th
            per_plane = tiles_x * tiles_y
            for k in range(len(toffs)):
                raw = decomp(data[toffs[k]:toffs[k] + tcnts[k]])
                tile = decode(raw, th, tw, bspp)
                plane, kk = divmod(k, per_plane) if planar == 2 \
                    else (None, k)
                ty0 = (kk // tiles_x) * th
                tx0 = (kk % tiles_x) * tw
                blk = tile[:min(th, h - ty0), :min(tw, w - tx0)]
                if planar == 2:
                    arr[ty0:ty0 + blk.shape[0], tx0:tx0 + blk.shape[1],
                        plane] = blk[:, :, 0]
                else:
                    arr[ty0:ty0 + blk.shape[0],
                        tx0:tx0 + blk.shape[1]] = blk
        else:                                             # strips
            rps = int(tv(278, [h])[0])
            soffs, scnts = tv(273), tv(279)
            strips_per_plane = (h + rps - 1) // rps
            planes = [[] for _ in range(spp if planar == 2 else 1)]
            for k in range(len(soffs)):
                raw = decomp(data[soffs[k]:soffs[k] + scnts[k]])
                plane, kk = divmod(k, strips_per_plane) if planar == 2 \
                    else (0, k)
                nrow = min(rps, h - kk * rps)
                planes[plane].append(decode(raw, nrow, w, bspp).reshape(-1))
            if planar == 2:
                for p_i, chunks in enumerate(planes):
                    arr[:, :, p_i] = np.concatenate(chunks).reshape(h, w)
            else:
                arr = np.concatenate(planes[0]).reshape(h, w, spp)

        scale = tv(33550)
        tie = tv(33922)
        xform = tv(34264)
        if xform is not None and scale is None:
            # ModelTransformation matrix: axis-aligned cases only
            # (grids.cpp uses the same restriction for grids)
            a, b_, _, d = (float(xform[0]), float(xform[1]),
                           xform[2], float(xform[3]))
            e_, f_, _, hh = (float(xform[4]), float(xform[5]),
                             xform[6], float(xform[7]))
            if b_ != 0.0 or e_ != 0.0:
                raise ValueError("geotiff: rotated grids not supported")
            dlon, dlat_signed = a, f_
            lon_ul, lat_ul = d, hh
        elif scale is not None and tie is not None:
            dlon = float(scale[0])
            dlat_signed = -float(scale[1])  # north-up rows by default
            lon_ul, lat_ul = float(tie[3]), float(tie[4])
        else:
            raise ValueError("geotiff: missing georeferencing tags")
        # GTRasterTypeGeoKey (GeoKeyDirectory 34735, key 1025):
        # PixelIsArea(1) anchors the tiepoint at the CELL CORNER —
        # node centers sit half a pixel inside (grids.cpp:713-724)
        gk = tv(34735)
        raster_type = 2  # PixelIsPoint unless stated
        model_type = 2   # geographic unless stated (GTModelTypeGeoKey)
        if gk:
            for ki in range(4, len(gk) - 3, 4):
                if int(gk[ki]) == 1025:
                    raster_type = int(gk[ki + 3])
                elif int(gk[ki]) == 1024:
                    model_type = int(gk[ki + 3])
        if raster_type == 1:
            lon_ul += dlon / 2.0
            lat_ul += dlat_signed / 2.0
        if dlat_signed < 0.0:                             # north-up file
            dlat = -dlat_signed
            lat0 = lat_ul - (h - 1) * dlat
            vals = arr[::-1]                              # south-first
        else:                                             # bottom-up file
            dlat = dlat_signed
            lat0 = lat_ul
            vals = arr

        nodata = tv(42113)
        if isinstance(nodata, str) and nodata.strip():
            # float32-encoded grids store an f32-rounded nodata value
            nd = float(nodata)
            mask = (vals == nd) | (vals == float(np.float32(nd)))
            vals = np.where(mask, np.nan, vals)

        meta = _parse_gdal_meta(tv(42112, "") or "")
        gtype = meta.get(("TYPE", None), "")
        interp = meta.get(("interpolation_method", None), "bilinear")
        name = meta.get(("grid_name", None), "")
        parent = meta.get(("parent_grid_name", None), "")
        desc = {v: s for (k, s), v in meta.items()
                if k == "DESCRIPTION"}
        # integer-encoded grids carry per-sample SCALE/OFFSET
        # (grids.cpp GTiffGrid::readAs... applies value*scale+offset)
        for s_i in range(spp):
            sc = float(meta.get(("SCALE", s_i), 1.0))
            of = float(meta.get(("OFFSET", s_i), 0.0))
            if sc != 1.0 or of != 0.0:
                vals[:, :, s_i] = vals[:, :, s_i] * sc + of
        if not gtype and desc:
            # no TYPE item: infer from channel descriptions, the
            # reference's channel-identification path
            dn = set(desc)
            if dn & {"geoid_undulation", "vertical_offset",
                     "ellipsoidal_height_offset"} \
                    and not (dn & {"latitude_offset"}):
                gtype = "VERTICAL_OFFSET_GEOGRAPHIC_TO_VERTICAL"

        def unit_factor(sample, default):
            u = meta.get(("UNITTYPE", sample), default)
            if u in ("arc-second", "arc-seconds per year"):
                return SEC_TO_RAD
            if u in ("degree", "degrees per year"):
                return DEG_TO_RAD
            if u == "radian":
                return 1.0
            if u in ("metre", "metres per year", "unity",
                     "millimetres per year"):
                return 1.0
            raise ValueError(f"geotiff: unsupported UNITTYPE {u!r}")

        if not gtype:
            gtype = ("HORIZONTAL_OFFSET" if spp >= 2
                     else "VERTICAL_OFFSET_GEOGRAPHIC_TO_VERTICAL")
        if gtype in ("DEFORMATION_MODEL", "VELOCITY"):
            # deformation-model component raster (grids.cpp:2520-2650
            # channel identification; bands named east_offset/
            # north_offset/vertical_offset or *_velocity); units per
            # band UNITTYPE so degree-unit models come out in radians,
            # metre models in metres — the DefGrid convention
            bands = {nm: vals[:, :, i] * unit_factor(i, "metre")
                     for nm, i in desc.items()}
            out.append({
                "type": gtype, "interp": interp,
                "name": name, "parent": parent,
                "bands": bands,
                "geo": (lon_ul, lat0, dlon, dlat),
                "projected": model_type == 1,
            })
            continue
        if gtype == "HORIZONTAL_OFFSET" and "easting_offset" in desc:
            # grid georeferenced in a PROJECTED CRS: channels are
            # metre offsets, georeferencing stays in metres; a
            # constant_offset is kept SEPARATE (gridshift.cpp
            # m_offsetX/Y — added after the sampled shift on fwd,
            # subtracted before the inverse iteration)
            i_e = desc.get("easting_offset", 0)
            i_n = desc.get("northing_offset", 1)
            gvals = np.stack([vals[:, :, i_e], vals[:, :, i_n]], axis=-1)
            out.append({
                "type": gtype, "interp": interp,
                "name": name, "parent": parent,
                "offset_xy": (float(meta.get(("constant_offset", i_e),
                                             0.0)),
                              float(meta.get(("constant_offset", i_n),
                                             0.0))),
                "grid": Grid(lon0=lon_ul, lat0=lat0, dlon=dlon,
                             dlat=dlat, values=gvals, interp=interp,
                             projected=True),
            })
            continue
        if gtype in ("HORIZONTAL_OFFSET", "GEOGRAPHIC_3D_OFFSET"):
            i_lat = desc.get("latitude_offset", 0)
            i_lon = desc.get("longitude_offset", 1)
            dphi = vals[:, :, i_lat] * unit_factor(i_lat, "arc-second")
            dlam = vals[:, :, i_lon] * unit_factor(i_lon, "arc-second")
            if meta.get(("positive_value", i_lon), "east") == "west":
                dlam = -dlam
            chans = [dlam, dphi]
            if gtype == "GEOGRAPHIC_3D_OFFSET":
                i_z = desc.get("ellipsoidal_height_offset", 2)
                chans.append(vals[:, :, i_z] * unit_factor(i_z, "metre"))
            gvals = np.stack(chans, axis=-1)
        elif gtype == "GEOCENTRIC_TRANSLATION":
            ch = [desc.get("x_translation", 0),
                  desc.get("y_translation", 1),
                  desc.get("z_translation", 2)]
            gvals = np.stack(
                [vals[:, :, i] * unit_factor(i, "metre") for i in ch],
                axis=-1)
        elif gtype in ("ELLIPSOIDAL_HEIGHT_OFFSET",
                       "VERTICAL_OFFSET_GEOGRAPHIC_TO_VERTICAL",
                       "VERTICAL_OFFSET_VERTICAL_TO_VERTICAL"):
            i_z = next((desc[k] for k in ("ellipsoidal_height_offset",
                                          "geoid_undulation",
                                          "vertical_offset")
                        if k in desc), 0)
            gvals = vals[:, :, i_z] * unit_factor(i_z, "metre")
        else:
            raise ValueError(f"geotiff: unsupported grid TYPE {gtype!r}")

        out.append({
            "type": gtype,
            "interp": interp,
            "name": name, "parent": parent,
            "grid": Grid(lon0=lon_ul * DEG_TO_RAD, lat0=lat0 * DEG_TO_RAD,
                         dlon=dlon * DEG_TO_RAD, dlat=dlat * DEG_TO_RAD,
                         values=gvals, interp=interp),
        })
    return out


def defmodel_gridset_from_geotiff(data: bytes):
    """DEFORMATION_MODEL GeoTIFF -> kernels.defmodel.DefGridSet (the
    registry value +proj=defmodel component lookups expect)."""
    from ..kernels import defmodel as k_dm

    grids = []
    for e in parse_geotiff(data):
        bands = e.get("bands")
        if bands is None:
            continue
        lon_ul, lat0, dlon, dlat = e["geo"]
        # projected-CRS model grids keep metre georeferencing
        # (defmodel_impl.hpp: positions in the definition CRS verbatim)
        fac = 1.0 if e.get("projected") else DEG_TO_RAD

        def band(*names):
            for nm in names:
                if nm in bands:
                    return bands[nm]
            return None

        grids.append(k_dm.DefGrid(
            minx=lon_ul * fac, miny=lat0 * fac,
            resx=dlon * fac, resy=dlat * fac,
            e_or_lon=band("east_offset", "east_velocity"),
            n_or_lat=band("north_offset", "north_velocity"),
            z=band("vertical_offset", "vertical_velocity",
                   "up_offset", "up_velocity")))
    if not grids:
        raise ValueError("geotiff: no DEFORMATION_MODEL IFDs")
    return k_dm.DefGridSet(grids=tuple(grids))


def geotiff_unified(data: bytes):
    """Compose parse_geotiff IFDs into UnifiedGrid entries: a
    HORIZONTAL_OFFSET IFD pairs with the file's
    ELLIPSOIDAL_HEIGHT_OFFSET IFD (the NADCON5 split layout,
    gridshift.cpp auxiliary_data handling); GEOGRAPHIC_3D_OFFSET IFDs
    stand alone."""
    from ..kernels.gridshift import UnifiedGrid

    entries = parse_geotiff(data)
    vgrids = [e for e in entries if e["type"] == "ELLIPSOIDAL_HEIGHT_OFFSET"]
    # multiple horizontal IFDs in ONE file are a parent/subgrid
    # hierarchy: finest containing subgrid wins (grids.cpp:2332-2380)
    hor = [e for e in entries if e["type"] == "HORIZONTAL_OFFSET"]
    if len(hor) > 1:
        v = vgrids[0]["grid"] if vgrids else None
        hset = GridSet(grids=tuple(e["grid"] for e in hor),
                       policy="finest")
        rest = [e for e in entries if e["type"] not in
                ("HORIZONTAL_OFFSET", "ELLIPSOIDAL_HEIGHT_OFFSET")]
        out = [UnifiedGrid(hgrid=hset, vgrid=v, interp=hor[0]["interp"])]
        entries = rest
    else:
        out = []
    for e in entries:
        if e["type"] in ("HORIZONTAL_OFFSET",):
            v = vgrids[0]["grid"] if vgrids else None
            out.append(UnifiedGrid(hgrid=e["grid"], vgrid=v,
                                   interp=e["interp"],
                                   offset_xy=e.get("offset_xy",
                                                   (0.0, 0.0))))
        elif e["type"] == "GEOGRAPHIC_3D_OFFSET":
            out.append(UnifiedGrid(hgrid=e["grid"], vgrid=None,
                                   interp=e["interp"]))
        elif e["type"] == "ELLIPSOIDAL_HEIGHT_OFFSET":
            continue
        elif e["type"] in ("VELOCITY", "DEFORMATION_MODEL") \
                and "bands" in e:
            b = e["bands"]
            try:
                enu = np.stack([b["east_velocity"], b["north_velocity"],
                                b["up_velocity"]], axis=-1)
            except KeyError:
                continue
            lon_ul, lat0, dlon, dlat = e["geo"]
            out.append(Grid(lon0=lon_ul * DEG_TO_RAD,
                            lat0=lat0 * DEG_TO_RAD,
                            dlon=dlon * DEG_TO_RAD,
                            dlat=dlat * DEG_TO_RAD,
                            values=enu, interp=e["interp"]))
        elif e["type"] == "GEOCENTRIC_TRANSLATION":
            out.append(UnifiedGrid(hgrid=None, vgrid=None,
                                   interp=e["interp"],
                                   geocentric=e["grid"]))
        else:
            out.append(UnifiedGrid(hgrid=None, vgrid=e["grid"],
                                   interp=e["interp"]))
    if not out and vgrids:
        out = [UnifiedGrid(hgrid=None, vgrid=v["grid"],
                           interp=v["interp"]) for v in vgrids]
    return out


def write_geotiff_3d(lon0_deg: float, lat0_deg: float, dlon_deg: float,
                     dlat_deg: float, dlat_sec: np.ndarray,
                     dlon_sec: np.ndarray, dz_m: np.ndarray,
                     interp: str = "biquadratic") -> bytes:
    """Serialize a GEOGRAPHIC_3D_OFFSET grid to minimal GeoTIFF bytes
    readable by :func:`parse_geotiff` (and by the reference's GTiff
    reader): little-endian classic TIFF, one uncompressed strip,
    float32 pixel-interleaved samples (latitude_offset arc-sec,
    longitude_offset arc-sec east-positive, ellipsoidal_height_offset
    m), ModelPixelScale/ModelTiepoint georeferencing and the
    GDAL_METADATA channel description block.  Row 0 is NORTH (TIFF
    order); inputs are south-first like Grid and flipped here."""
    dphi = np.asarray(dlat_sec, dtype="<f4")
    dlam = np.asarray(dlon_sec, dtype="<f4")
    dz = np.asarray(dz_m, dtype="<f4")
    if not (dphi.shape == dlam.shape == dz.shape) or dphi.ndim != 2:
        raise ValueError("write_geotiff_3d: channels must be same-shape 2-D")
    h, w = dphi.shape
    lat_ul = lat0_deg + (h - 1) * dlat_deg
    pix = np.stack([dphi[::-1], dlam[::-1], dz[::-1]], axis=-1)
    data = pix.astype("<f4").tobytes()
    meta = ("<GDALMetadata>\n"
            f"  <Item name=\"interpolation_method\">{interp}</Item>\n"
            "  <Item name=\"TYPE\">GEOGRAPHIC_3D_OFFSET</Item>\n"
            "  <Item name=\"DESCRIPTION\" sample=\"0\" "
            "role=\"description\">latitude_offset</Item>\n"
            "  <Item name=\"positive_value\" sample=\"1\">east</Item>\n"
            "  <Item name=\"DESCRIPTION\" sample=\"1\" "
            "role=\"description\">longitude_offset</Item>\n"
            "  <Item name=\"DESCRIPTION\" sample=\"2\" "
            "role=\"description\">ellipsoidal_height_offset</Item>\n"
            "</GDALMetadata>\n\0").encode("ascii")

    entries = []          # (tag, type, count, value_or_payload)
    payload = []          # deferred payloads: (index_in_entries, bytes)

    def add(tag, typ, cnt, val=None, blob=None):
        entries.append([tag, typ, cnt, val, blob])

    add(256, 3, 1, w)
    add(257, 3, 1, h)
    add(258, 3, 3, blob=struct.pack("<3H", 32, 32, 32))
    add(259, 3, 1, 1)
    add(262, 3, 1, 1)
    add(273, 4, 1, None, b"STRIP")       # patched below
    add(277, 3, 1, 3)
    add(278, 3, 1, h)
    add(279, 4, 1, len(data))
    add(284, 3, 1, 1)
    add(339, 3, 3, blob=struct.pack("<3H", 3, 3, 3))
    add(33550, 12, 3, blob=struct.pack("<3d", dlon_deg, dlat_deg, 0.0))
    add(33922, 12, 6, blob=struct.pack("<6d", 0.0, 0.0, 0.0,
                                       lon0_deg, lat_ul, 0.0))
    add(42112, 2, len(meta), blob=meta)

    n = len(entries)
    ifd_off = 8
    ifd_size = 2 + n * 12 + 4
    ext_off = ifd_off + ifd_size
    ext = bytearray()
    for e in entries:
        tag, typ, cnt, val, blob = e
        if blob == b"STRIP":
            continue
        if blob is not None and len(blob) > 4:
            e[3] = ext_off + len(ext)
            ext += blob
            e[4] = None
        elif blob is not None:
            e[3] = int.from_bytes(blob.ljust(4, b"\0")[:4], "little")
            e[4] = None
    strip_off = ext_off + len(ext)
    for e in entries:
        if e[4] == b"STRIP":
            e[3] = strip_off
            e[4] = None
    out = bytearray(b"II*\0")
    out += struct.pack("<I", ifd_off)
    out += struct.pack("<H", n)
    for tag, typ, cnt, val, _ in sorted(entries):
        out += struct.pack("<HHI", tag, typ, cnt)
        out += struct.pack("<I", val)
    out += struct.pack("<I", 0)          # no next IFD
    out += ext
    out += data
    return bytes(out)
