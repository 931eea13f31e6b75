"""Web-page table handling: schema, synthesis, coordinate mining.

The engine's input contract (BASELINE.json input_hint) is an Iceberg
table `(url string, warc_ts timestamp, html binary, text string,
lang string)`.  Two hard rules implemented here:

- **`text` is never rewritten** — every transformation projects it
  through untouched (byte-identical per url); derived columns ride
  alongside.
- **no per-row Python** — the coordinate miner is a vectorized
  pandas-str regex over Arrow batches.

`synthesize_pages` builds a deterministic pages table from the driver
documents table (or `spark.range`) with 0-3 embedded coordinate
mentions per FIXTURES.md §1.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .coords import lonlat_sql

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")

# "lat, lon" decimal-degree mentions, e.g. "48.858844, 2.294351"
COORD_RE = r"(-?\d{1,2}\.\d{1,8}),\s*(-?\d{1,3}\.\d{1,8})"


def synthesize_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> pages with the input_hint shape; the deterministic
    (lon,lat) of sources/coords.py is embedded into the text as a
    'located at <lat>, <lon>' mention so the regex miner has real work.
    The ORIGINAL text bytes are preserved in `html`-wrapped form and
    the mention is appended (the driver documents table has no
    coordinates of its own)."""
    lon, lat = lonlat_sql("doc_id")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # fixed %.6f formatting: never scientific notation, always >= 1
    # decimal digit, and reproducible in DuckDB via printf('%.6f', x)
    txt = F.concat(F.col("text"), F.lit(" located at "),
                   F.format_string("%.6f", F.expr(lat)), F.lit(", "),
                   F.format_string("%.6f", F.expr(lon)))
    return d.select(
        F.concat(F.lit("https://host"), (F.col("doc_id") % 10000)
                 .cast("string"), F.lit(".example/"),
                 F.md5(F.col("doc_id").cast("string"))).alias("url"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=(F.col("doc_id") % 31536000))).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body>"), txt,
                          F.lit("</body></html>")), "UTF-8").alias("html"),
        txt.alias("text"),
        F.col("lang"),
        F.col("doc_id"),
    )


def mine_coords(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Extract every 'lat, lon' mention: (url, mention_idx, lon, lat).

    Vectorized pandas `str.extractall` over Arrow batches inside
    mapInPandas — no per-row Python.  Out-of-range pairs are dropped
    (lat in [-90,90], lon in [-180,180])."""
    cols = [c for c in pages.columns if c != text_col]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in pages.schema.fields if f.name != text_col
    ) + ", mention_idx int, lat double, lon double"

    def _mine(batches):
        for pdf in batches:
            ex = pdf[text_col].str.extractall(COORD_RE)
            if len(ex) == 0:
                continue
            ex.columns = ["lat", "lon"]
            ex = ex.astype({"lat": "float64", "lon": "float64"})
            ex = ex.reset_index()
            ex.rename(columns={"level_0": "_row", "match": "mention_idx"},
                      inplace=True)
            ok = (ex.lat.abs() <= 90.0) & (ex.lon.abs() <= 180.0)
            ex = ex[ok]
            base = pdf[cols].reset_index(drop=True)
            out = base.iloc[ex["_row"].to_numpy()].reset_index(drop=True)
            out["mention_idx"] = ex["mention_idx"].to_numpy().astype("int32")
            out["lat"] = ex["lat"].to_numpy()
            out["lon"] = ex["lon"].to_numpy()
            yield out

    return pages.mapInPandas(_mine, schema)


# DMS mentions: 48°51'24.5"N 2°21'03"E — ASCII d/'/" and the unicode
# °/′/″ marks both accepted, hemisphere letter mandatory (the same
# forms proj_dmstor parses, src/dmstor.cpp:18-84)
DMS_RE = ("(\\d{1,2})[°d](\\d{1,2})['′](\\d{1,2}(?:\\.\\d+)?)[\"″]([NS])"
          "[,;\\s]+"
          "(\\d{1,3})[°d](\\d{1,2})['′](\\d{1,2}(?:\\.\\d+)?)[\"″]([EW])")


def mine_coords_dms(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Extract every DMS 'lat lon' mention: (…, mention_idx, lat, lon)
    in signed decimal degrees (deg + min/60 + sec/3600, S/W negative).

    Same vectorized extractall-over-Arrow-batches shape as
    mine_coords; out-of-range pairs dropped."""
    cols = [c for c in pages.columns if c != text_col]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in pages.schema.fields if f.name != text_col
    ) + ", mention_idx int, lat double, lon double"

    def _mine(batches):
        for pdf in batches:
            ex = pdf[text_col].str.extractall(DMS_RE)
            if len(ex) == 0:
                continue
            ex.columns = ["latd", "latm", "lats", "lath",
                          "lond", "lonm", "lons", "lonh"]
            lat = (ex.latd.astype("float64")
                   + ex.latm.astype("float64") / 60.0
                   + ex.lats.astype("float64") / 3600.0)
            lat = np.where(ex.lath.to_numpy() == "S", -lat, lat)
            lon = (ex.lond.astype("float64")
                   + ex.lonm.astype("float64") / 60.0
                   + ex.lons.astype("float64") / 3600.0)
            lon = np.where(ex.lonh.to_numpy() == "W", -lon, lon)
            ex = ex.reset_index()
            ex.rename(columns={"level_0": "_row", "match": "mention_idx"},
                      inplace=True)
            ok = (np.abs(lat) <= 90.0) & (np.abs(lon) <= 180.0)
            base = pdf[cols].reset_index(drop=True)
            out = base.iloc[ex["_row"].to_numpy()[ok]].reset_index(drop=True)
            out["mention_idx"] = ex["mention_idx"].to_numpy()[ok].astype("int32")
            out["lat"] = lat[ok]
            out["lon"] = lon[ok]
            yield out

    return pages.mapInPandas(_mine, schema)
