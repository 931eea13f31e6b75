"""NKG (Nordic Geodetic Commission) coordinate-operation registry.

Curated URN -> pipeline resolution for the
``urn:ogc:def:coordinateOperation:NKG::*`` names the reference resolves
through proj.db (data/sql/nkg.sql; upstream source
https://github.com/NordicGeodesy/NordicTransformations, NKG 1.0.w).
Parameter VALUES are transcribed from the reference's published
registry data (permitted data transcription, like gie goldens); the
resolution logic is original.

Each concatenated operation expands to a ``+proj=pipeline`` of
geocentric steps: EPSG time-dependent frame helmerts (ITRF->ETRF,
helmert_transformation.sql:2002,2076), static NKG alignment helmerts,
and ``+proj=deformation``/``+proj=xyzgridshift`` steps over the NKG
velocity grids.  The velocity grids themselves (eur_nkg_*.tif,
no_kv_*.tif) ship with proj-data, not with the source tree, so
resolution works everywhere but evaluation needs the grids registered
in GRID_REGISTRY (gie corpus: skipped-with-reason when absent).
"""

from __future__ import annotations

URN_PREFIX = "urn:ogc:def:coordinateOperation:NKG::"

# EPSG time-dependent position-vector helmerts referenced as steps
# (helmert_transformation.sql; mm/mas/ppb converted to m/arcsec/ppm)
_EPSG_STEP_OPS = {
    # ITRF2000 -> ETRF2000 (2), parameters at epoch 2000.0
    "EPSG:7941": ("+proj=helmert +x=0.054 +y=0.051 +z=-0.048"
                  " +rx=0.000891 +ry=0.00539 +rz=-0.008712 +s=0"
                  " +dx=0 +dy=0 +dz=0"
                  " +drx=0.000081 +dry=0.00049 +drz=-0.000792 +ds=0"
                  " +t_epoch=2000.0 +convention=position_vector"),
    # ITRF2014 -> ETRF2014 (1), parameters at epoch 1989.0
    "EPSG:8366": ("+proj=helmert +x=0 +y=0 +z=0"
                  " +rx=0 +ry=0 +rz=0 +s=0 +dx=0 +dy=0 +dz=0"
                  " +drx=0.000085 +dry=0.000531 +drz=-0.00077 +ds=0"
                  " +t_epoch=1989.0 +convention=position_vector"),
}

# NKG static alignment helmerts + PROJString steps (nkg.sql)
NKG_STEP_OPS = {
    "P1_2008_DK": (
        "+proj=helmert +x=0.03863 +y=0.147 +z=0.02776 +rx=0.00617753 +ry=5.064e-05 +rz=4.729e-05 +s=-0.009420 +convention=position_vector"),
    "P1_2008_EE": (
        "+proj=helmert +x=0.12194 +y=0.02225 +z=-0.03541 +rx=0.00227196 +ry=-0.00323934 +rz=0.00247008 +s=-0.005626 +convention=position_vector"),
    "P1_2008_FI": (
        "+proj=helmert +x=0.07251 +y=-0.13019 +z=-0.11323 +rx=-0.00157399 +ry=-0.00308833 +rz=0.00410332 +s=0.013012 +convention=position_vector"),
    "P1_2008_LT": (
        "+proj=helmert +x=0.05692 +y=0.115495 +z=-0.00078 +rx=0.00314291 +ry=-0.00147975 +rz=-0.00134758 +s=-0.006182 +convention=position_vector"),
    "P1_2008_LV": (
        "+proj=helmert +x=0.41812 +y=-0.78105 +z=-0.01335 +rx=-0.0216436 +ry=-0.0115184 +rz=0.01719911 +s=0.000757 +convention=position_vector"),
    "P1_2008_NO": (
        "+proj=helmert +x=-0.13116 +y=-0.02817 +z=0.02036 +rx=-0.00038674 +ry=0.00408947 +rz=0.00103588 +s=0.006569 +convention=position_vector"),
    "P1_2008_SE": (
        "+proj=helmert +x=-0.01642 +y=-0.00064 +z=-0.0305 +rx=0.00187431 +ry=0.00046382 +rz=0.00228487 +s=0.001861 +convention=position_vector"),
    "PAR_2020_DK": (
        "+proj=helmert +x=0.66818 +y=0.04453 +z=-0.45049 +rx=0.00312883 +ry=-0.02373423 +rz=0.00442969 +s=-0.003136 +convention=position_vector"),
    "PAR_2020_EE": (
        "+proj=helmert +x=-0.05027 +y=-0.11595 +z=0.03012 +rx=-0.00310814 +ry=0.00457237 +rz=0.00472406 +s=0.003191 +convention=position_vector"),
    "PAR_2020_FI": (
        "+proj=helmert +x=0.15651 +y=-0.10993 +z=-0.10935 +rx=-0.00312861 +ry=-0.00378935 +rz=0.00403512 +s=0.00529 +convention=position_vector"),
    "PAR_2020_LT": (
        "+proj=helmert +x=0.36749 +y=0.14351 +z=-0.18472 +rx=0.0047914 +ry=-0.01027566 +rz=0.00276102 +s=-0.003684 +convention=position_vector"),
    "PAR_2020_LV": (
        "+proj=helmert +x=0.09745 +y=-0.69388 +z=0.52901 +rx=-0.0192069 +ry=0.01043272 +rz=0.02327169 +s=-0.049663 +convention=position_vector"),
    "PAR_2020_NO": (
        "+proj=helmert +x=-0.05172 +y=0.13747 +z=-0.01648 +rx=0.00268452 +ry=0.00329165 +rz=-0.00116569 +s=0.002583 +convention=position_vector"),
    "PAR_2020_SE": (
        "+proj=helmert +x=0.03054 +y=0.04606 +z=-0.07944 +rx=0.00141958 +ry=0.00015132 +rz=0.00150337 +s=0.003002 +convention=position_vector"),
    "DK_2020_INTRAPLATE": (
        "+proj=deformation +dt=15.829 +grids=eur_nkg_nkgrf17vel.tif"),
    "EE_2020_INTRAPLATE": (
        "+proj=deformation +dt=-2.44 +grids=eur_nkg_nkgrf17vel.tif"),
    "ETRF2000_2000_TO_ETRF_2000_2003": (
        "+proj=deformation +dt=3.75 +grids=eur_nkg_nkgrf03vel_realigned.tif"),
    "ETRF89_2000_TO_ETRF89_1992": (
        "+proj=deformation +dt=-7.25 +grids=eur_nkg_nkgrf03vel_realigned.tif"),
    "ETRF92_2000_TO_ETRF92_1994": (
        "+proj=deformation +dt=-5.296 +grids=eur_nkg_nkgrf03vel_realigned.tif"),
    "ETRF93_2000_TO_ETRF93_1995": (
        "+proj=deformation +dt=-5 +grids=eur_nkg_nkgrf03vel_realigned.tif"),
    "ETRF96_2000_TO_ETRF96_1997": (
        "+proj=deformation +dt=-3.0 +grids=eur_nkg_nkgrf03vel_realigned.tif"),
    "ETRF96_2000_TO_ETRF96_1997_56": (
        "+proj=deformation +dt=-2.44 +grids=eur_nkg_nkgrf03vel_realigned.tif"),
    "ETRF96_2000_TO_ETRF96_1997_EUREF-FIN": (
        "+proj=deformation +dt=-3.0 +grids=eur_nkg_nkgrf03vel_realigned.tif"),
    "ETRF97_2000_TO_ETRF97_1999": (
        "+proj=deformation +dt=-0.5 +grids=eur_nkg_nkgrf03vel_realigned.tif"),
    "FI_2020_INTRAPLATE": (
        "+proj=deformation +dt=-3 +grids=eur_nkg_nkgrf17vel.tif"),
    "FI_2020_INTRAPLATE_EUREF-FIN": (
        "+proj=deformation +dt=-3 +grids=eur_nkg_nkgrf17vel.tif"),
    "LT_2020_INTRAPLATE": (
        "+proj=deformation +dt=3.75 +grids=eur_nkg_nkgrf17vel.tif"),
    "LV_2020_INTRAPLATE": (
        "+proj=deformation +dt=-7.25 +grids=eur_nkg_nkgrf17vel.tif"),
    "NKG_ETRF00_TO_ETRF2000": (
        "+proj=deformation +t_epoch=2000.0 +grids=eur_nkg_nkgrf03vel_realigned.tif"),
    "NKG_ETRF14_ETRF93_2000": (
        "+proj=xyzgridshift +grids=no_kv_NKGETRF14_EPSG7922_2000.tif"),
    "NKG_ETRF14_TO_ETRF2014": (
        "+proj=deformation +t_epoch=2000.0 +grids=eur_nkg_nkgrf17vel.tif"),
    "NO_2020_INTRAPLATE": (
        "+proj=deformation +dt=-5 +grids=eur_nkg_nkgrf17vel.tif"),
    "SE_2020_INTRAPLATE": (
        "+proj=deformation +dt=-0.5 +grids=eur_nkg_nkgrf17vel.tif"),
}
NKG_STEP_OPS.update(_EPSG_STEP_OPS)

# concatenated operations: URN tail -> ordered (step, direction)
NKG_CONCAT = {
    "ETRF00_TO_DK": [
        ("P1_2008_DK", "forward"),
        ("ETRF92_2000_TO_ETRF92_1994", "forward"),
    ],
    "ETRF00_TO_EE": [
        ("P1_2008_EE", "forward"),
        ("ETRF96_2000_TO_ETRF96_1997_56", "forward"),
    ],
    "ETRF00_TO_EUREF-FIN": [
        ("P1_2008_FI", "forward"),
        ("ETRF96_2000_TO_ETRF96_1997_EUREF-FIN", "forward"),
    ],
    "ETRF00_TO_FI": [
        ("P1_2008_FI", "forward"),
        ("ETRF96_2000_TO_ETRF96_1997", "forward"),
    ],
    "ETRF00_TO_LT": [
        ("P1_2008_LT", "forward"),
        ("ETRF2000_2000_TO_ETRF_2000_2003", "forward"),
    ],
    "ETRF00_TO_LV": [
        ("P1_2008_LV", "forward"),
        ("ETRF89_2000_TO_ETRF89_1992", "forward"),
    ],
    "ETRF00_TO_NO": [
        ("P1_2008_NO", "forward"),
        ("ETRF93_2000_TO_ETRF93_1995", "forward"),
    ],
    "ETRF00_TO_SE": [
        ("P1_2008_SE", "forward"),
        ("ETRF97_2000_TO_ETRF97_1999", "forward"),
    ],
    "ETRF14_TO_DK": [
        ("PAR_2020_DK", "forward"),
        ("DK_2020_INTRAPLATE", "forward"),
    ],
    "ETRF14_TO_EE": [
        ("PAR_2020_EE", "forward"),
        ("EE_2020_INTRAPLATE", "forward"),
    ],
    "ETRF14_TO_FI": [
        ("PAR_2020_FI", "forward"),
        ("FI_2020_INTRAPLATE", "forward"),
    ],
    "ETRF14_TO_FI_EUREF-FIN": [
        ("PAR_2020_FI", "forward"),
        ("FI_2020_INTRAPLATE_EUREF-FIN", "forward"),
    ],
    "ETRF14_TO_LT": [
        ("PAR_2020_LT", "forward"),
        ("LT_2020_INTRAPLATE", "forward"),
    ],
    "ETRF14_TO_LV": [
        ("PAR_2020_LV", "forward"),
        ("LV_2020_INTRAPLATE", "forward"),
    ],
    "ETRF14_TO_NO": [
        ("PAR_2020_NO", "forward"),
        ("NO_2020_INTRAPLATE", "forward"),
    ],
    "ETRF14_TO_SE": [
        ("PAR_2020_SE", "forward"),
        ("SE_2020_INTRAPLATE", "forward"),
    ],
    "ITRF2000_TO_DK": [
        ("EPSG:7941", "forward"),
        ("NKG_ETRF00_TO_ETRF2000", "reverse"),
        ("P1_2008_DK", "forward"),
        ("ETRF92_2000_TO_ETRF92_1994", "forward"),
    ],
    "ITRF2000_TO_EE": [
        ("EPSG:7941", "forward"),
        ("NKG_ETRF00_TO_ETRF2000", "reverse"),
        ("P1_2008_EE", "forward"),
        ("ETRF96_2000_TO_ETRF96_1997_56", "forward"),
    ],
    "ITRF2000_TO_FI": [
        ("EPSG:7941", "forward"),
        ("NKG_ETRF00_TO_ETRF2000", "reverse"),
        ("P1_2008_FI", "forward"),
        ("ETRF96_2000_TO_ETRF96_1997", "forward"),
    ],
    "ITRF2000_TO_FI_EUREF-FIN": [
        ("EPSG:7941", "forward"),
        ("NKG_ETRF00_TO_ETRF2000", "reverse"),
        ("P1_2008_FI", "forward"),
        ("ETRF96_2000_TO_ETRF96_1997_EUREF-FIN", "forward"),
    ],
    "ITRF2000_TO_LT": [
        ("EPSG:7941", "forward"),
        ("NKG_ETRF00_TO_ETRF2000", "reverse"),
        ("P1_2008_LT", "forward"),
        ("ETRF2000_2000_TO_ETRF_2000_2003", "forward"),
    ],
    "ITRF2000_TO_LV": [
        ("EPSG:7941", "forward"),
        ("NKG_ETRF00_TO_ETRF2000", "reverse"),
        ("P1_2008_LV", "forward"),
        ("ETRF89_2000_TO_ETRF89_1992", "forward"),
    ],
    "ITRF2000_TO_NKG_ETRF00": [
        ("EPSG:7941", "forward"),
        ("NKG_ETRF00_TO_ETRF2000", "reverse"),
    ],
    "ITRF2000_TO_NO": [
        ("EPSG:7941", "forward"),
        ("NKG_ETRF00_TO_ETRF2000", "reverse"),
        ("P1_2008_NO", "forward"),
        ("ETRF93_2000_TO_ETRF93_1995", "forward"),
    ],
    "ITRF2000_TO_SE": [
        ("EPSG:7941", "forward"),
        ("NKG_ETRF00_TO_ETRF2000", "reverse"),
        ("P1_2008_SE", "forward"),
        ("ETRF97_2000_TO_ETRF97_1999", "forward"),
    ],
    "ITRF2014_TO_DK": [
        ("EPSG:8366", "forward"),
        ("NKG_ETRF14_TO_ETRF2014", "reverse"),
        ("PAR_2020_DK", "forward"),
        ("DK_2020_INTRAPLATE", "forward"),
    ],
    "ITRF2014_TO_EE": [
        ("EPSG:8366", "forward"),
        ("NKG_ETRF14_TO_ETRF2014", "reverse"),
        ("PAR_2020_EE", "forward"),
        ("EE_2020_INTRAPLATE", "forward"),
    ],
    "ITRF2014_TO_FI": [
        ("EPSG:8366", "forward"),
        ("NKG_ETRF14_TO_ETRF2014", "reverse"),
        ("PAR_2020_FI", "forward"),
        ("FI_2020_INTRAPLATE", "forward"),
    ],
    "ITRF2014_TO_FI_EUREF-FIN": [
        ("EPSG:8366", "forward"),
        ("NKG_ETRF14_TO_ETRF2014", "reverse"),
        ("PAR_2020_FI", "forward"),
        ("FI_2020_INTRAPLATE_EUREF-FIN", "forward"),
    ],
    "ITRF2014_TO_LT": [
        ("EPSG:8366", "forward"),
        ("NKG_ETRF14_TO_ETRF2014", "reverse"),
        ("PAR_2020_LT", "forward"),
        ("LT_2020_INTRAPLATE", "forward"),
    ],
    "ITRF2014_TO_LV": [
        ("EPSG:8366", "forward"),
        ("NKG_ETRF14_TO_ETRF2014", "reverse"),
        ("PAR_2020_LV", "forward"),
        ("LV_2020_INTRAPLATE", "forward"),
    ],
    "ITRF2014_TO_NKG_ETRF14": [
        ("EPSG:8366", "forward"),
        ("NKG_ETRF14_TO_ETRF2014", "reverse"),
    ],
    "ITRF2014_TO_NO": [
        ("EPSG:8366", "forward"),
        ("NKG_ETRF14_TO_ETRF2014", "reverse"),
        ("NKG_ETRF14_ETRF93_2000", "forward"),
        ("NO_2020_INTRAPLATE", "forward"),
    ],
    "ITRF2014_TO_SE": [
        ("EPSG:8366", "forward"),
        ("NKG_ETRF14_TO_ETRF2014", "reverse"),
        ("PAR_2020_SE", "forward"),
        ("SE_2020_INTRAPLATE", "forward"),
    ],
}


def resolve_nkg_urn(urn: str) -> str:
    """Expand an NKG coordinate-operation URN into a +proj=pipeline
    string (concatenated_operation_step walk, reverse steps get
    +inv).  Raises KeyError for unknown names."""
    if not urn.startswith(URN_PREFIX):
        raise KeyError(urn)
    code = urn[len(URN_PREFIX):]
    parts = ["+proj=pipeline"]
    for step, direction in NKG_CONCAT[code]:
        ps = NKG_STEP_OPS[step]
        inv = "+inv " if direction == "reverse" else ""
        parts.append("+step " + inv + ps)
    return " ".join(parts)


def required_grids(urn: str) -> list[str]:
    """Grid filenames the resolved pipeline samples (for presence
    gating before evaluation)."""
    import re as _re

    return _re.findall(r"\+grids=([\w.]+)", resolve_nkg_urn(urn))
