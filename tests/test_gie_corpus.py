"""Sweep the reference's FULL public gie corpus (test/gie/*.gie,
~6,800 accept/expect pairs + roundtrips) through the engine via the
gie-DSL runner (sources/giefiles.py).

Golden VALUES come from the reference's public test corpus (permitted
transcription source); the runner itself re-derives the gie semantics
from src/apps/gie.cpp (cited in the module docstring).

Per-file policy: ``SKIP_OPS`` names operation substrings consciously
out of scope (with reason); ``MAX_FAIL`` is the ratchet for files
whose remaining mismatches are being worked down — tighten, never
loosen.  ``MIN_OK`` floors guard against skiplist rot and parser
regressions silently dropping checks.
"""

from __future__ import annotations

import os

import pytest

from proj_4_spark.sources.giefiles import sweep

GIE_DIR = "/root/reference/test/gie"
FIXTURE_DIRS = ("/root/reference/data", "/root/reference/data/tests")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GIE_DIR), reason="reference gie corpus not present")

# operation-substring -> reason, applied per file
_SKIP_COMMON: dict[str, str] = {}

# file -> (min_ok, max_fail, skip_ops)
FILES: dict[str, tuple[int, int, dict[str, str]]] = {
    "builtins.gie": (2504, 0, {}),
    "more_builtins.gie": (182, 0, {}),
    "4D-API_cs2cs-style.gie": (78, 0, {}),
    "DHDN_ETRS89.gie": (60, 0, {}),
    "GDA.gie": (3, 0, {}),
    "adams_hemi.gie": (700, 0, {}),
    "adams_ws1.gie": (700, 0, {}),
    # the 1 allowed fail is line 2175: the reference *expects failure*
    # (its seeded Newton diverges at the lam=+-pi seam,
    # adams.cpp:296-317) while the analytic fold inverse here
    # legitimately recovers the preimage (misc_sph.py adams_ws2_inv) —
    # a strict improvement the gie `expect failure` directive cannot
    # express
    "adams_ws2.gie": (721, 1, {}),
    "axisswap.gie": (27, 0, {}),
    "defmodel.gie": (34, 0, {}),
    "deformation.gie": (43, 0, {}),
    "ellipsoid.gie": (36, 0, {}),
    "geotiff_grids.gie": (50, 0, {}),
    "gridshift.gie": (59, 0, {}),
    "guyou.gie": (700, 0, {}),
    # URN resolution is implemented (sources/nkg_ops.py; every pair's
    # operation compiles — see tests/test_nkg_urns.py) but the NKG
    # velocity grids (eur_nkg_*.tif) ship with proj-data, not the
    # source tree, so the runner skips evaluation with that reason
    "nkg.gie": (0, 0, {}),
    "peirce_q.gie": (592, 0, {}),
    "spilhaus.gie": (133, 0, {}),
    "tinshift.gie": (15, 0, {}),
    "unitconvert.gie": (16, 0, {}),
}


@pytest.mark.parametrize("fname", sorted(FILES))
def test_gie_file(fname):
    min_ok, max_fail, skips = FILES[fname]
    skips = {**_SKIP_COMMON, **skips}
    res = sweep(os.path.join(GIE_DIR, fname), skip_ops=skips,
                fixture_dirs=FIXTURE_DIRS)
    msg = "\n".join(
        f"{f[0]}:{f[1]} [{f[3]}] {f[2][:80]} -> {f[4][:140]}"
        for f in res.failures[:20])
    assert res.failed <= max_fail, (
        f"{fname}: {res.failed} failures (allowed {max_fail}); first:\n{msg}")
    assert res.ok >= min_ok, (
        f"{fname}: only {res.ok} pairs passed (floor {min_ok})")


def test_corpus_totals():
    """Aggregate ratchet across the whole corpus."""
    tot_ok = tot_fail = 0
    for fname, (_, _, skips) in FILES.items():
        res = sweep(os.path.join(GIE_DIR, fname),
                    skip_ops={**_SKIP_COMMON, **skips},
                    fixture_dirs=FIXTURE_DIRS)
        tot_ok += res.ok
        tot_fail += res.failed
    assert tot_ok >= 6669
    assert tot_fail <= 1
