"""Classic PROJ init-file parser (+init=FILE:KEY resolution).

The reference resolves ``+init=nad27:3901`` against the init files it
ships in its data dir (``nad27``, ``nad83``, ``world``, ``ITRF2014``,
...; reader ``src/init.cpp:112-230``).  Here file CONTENT is
registered by name into :data:`proj_4_spark.proj.INIT_REGISTRY` — on a
Spark deployment the text ships as a broadcast/parquet column exactly
like the binary grids.

File format: ``<KEY>`` starts an entry; its parameters run (possibly
over several lines, ``#`` comments stripped) until the ``<>``
terminator or the next ``<KEY>``.  DMS parameter values
(``lat_1=34d58``) are converted to decimal degrees at parse time.
"""

from __future__ import annotations

import re

from ..proj import INIT_REGISTRY, _maybe_dms

_ENTRY = re.compile(r"<([^<>]*)>")


def parse_init_text(text: str) -> dict[str, dict]:
    """Init-file text -> {key: param dict}."""
    # strip comments first
    lines = [ln.split("#", 1)[0] for ln in text.splitlines()]
    body = "\n".join(lines)
    out: dict[str, dict] = {}
    pos = 0
    key = None
    buf: list[str] = []

    def flush():
        if key is None:
            return
        params: dict = {}
        for tok in " ".join(buf).split():
            t = tok.lstrip("+")
            if not t or t == "no_defs":
                continue
            if "=" in t:
                k, v = t.split("=", 1)
                params.setdefault(k, _maybe_dms(v))
            else:
                params.setdefault(t, True)
        out[key] = params

    for m in _ENTRY.finditer(body):
        if key is not None:
            # close the open entry at the '<>' terminator or at the
            # next '<KEY>' (the ITRF files omit terminators)
            buf.append(body[pos:m.start()])
            flush()
        key, buf = None, []
        name = m.group(1).strip()
        if name and name != "metadata":
            key = name
        pos = m.end()
    if key is not None:
        buf.append(body[pos:])
        flush()
    return out


def register_init_file(name: str, text: str) -> dict[str, dict]:
    """Parse and install an init file so ``+init=<name>:<key>``
    resolves through the proj-string compiler."""
    entries = parse_init_text(text)
    INIT_REGISTRY[name] = entries
    return entries


# Published IGN ITRF2014 transformation parameters (subset) in the
# reference's init-file syntax — source table:
# http://itrf.ign.fr/doc_ITRF/Transfo-ITRF2014_ITRFs.txt (public
# geodetic constants; same provenance note as the reference's
# data/ITRF2014 header).  mm/yr values converted to m/yr.
ITRF2014_SUBSET = """
<metadata> +version=1.0.0 +origin=Transfo-ITRF2014_ITRFs.txt

<ITRF2008> +proj=helmert +x=0.0016 +y=0.0019 +z=0.0024 +s=-0.00002
  +dz=-0.0001 +ds=0.00003 +t_epoch=2010.0 +convention=position_vector

<ITRF2000> +proj=helmert +x=0.0007 +y=0.0012 +z=-0.0261 +s=0.00212
  +dx=0.0001 +dy=0.0001 +dz=-0.0019 +ds=0.00011 +t_epoch=2010.0
  +convention=position_vector

<ITRF97> +proj=helmert +x=0.0074 +y=-0.0005 +z=-0.0628 +s=0.0038
  +rz=0.00026 +dx=0.0001 +dy=-0.0005 +dz=-0.0033 +ds=0.00012
  +drz=0.00002 +t_epoch=2010.0 +convention=position_vector
"""
