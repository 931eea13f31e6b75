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
