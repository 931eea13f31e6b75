"""Pages table: synthesis, regex mining, text-invariance."""

from pyspark.sql import functions as F

from proj_4_spark.sources.pages import mine_coords, synthesize_pages
from proj_4_spark.sources.coords import lonlat_numpy


def test_pages_schema(spark, sf_dir):
    p = synthesize_pages(spark, sf_dir)
    kinds = dict((f.name, f.dataType.simpleString()) for f in p.schema.fields)
    assert kinds["url"] == "string"
    assert kinds["warc_ts"] == "timestamp"
    assert kinds["html"] == "binary"
    assert kinds["text"] == "string"
    assert kinds["lang"] == "string"


def test_mine_coords_recovers_embedded(spark, sf_dir):
    p = synthesize_pages(spark, sf_dir)
    mined = mine_coords(p).select("doc_id", "mention_idx", "lon", "lat")
    rows = mined.collect()
    by_doc = {r["doc_id"]: (r["lon"], r["lat"]) for r in rows}
    # every doc embeds exactly one mention; mined values = embedded
    # (rounded-to-6) coords
    n = p.count()
    assert len(rows) == n
    ids = sorted(by_doc)
    lon, lat = lonlat_numpy(ids)
    import numpy as np

    got_lon = np.array([by_doc[i][0] for i in ids])
    got_lat = np.array([by_doc[i][1] for i in ids])
    assert np.allclose(got_lon, np.round(lon, 6), atol=1e-9)
    assert np.allclose(got_lat, np.round(lat, 6), atol=1e-9)


def test_text_never_rewritten(spark, sf_dir):
    """The per-row invariant: mining/joins project `text` through
    byte-identical."""
    p = synthesize_pages(spark, sf_dir)
    mined = mine_coords(p)  # text not in output; join back on url
    joined = mined.join(p.select("url", "text"), "url")
    # text survives the round trip byte-identically
    orig = {r["url"]: r["text"] for r in p.select("url", "text").collect()}
    for r in joined.select("url", "text").collect():
        assert r["text"] == orig[r["url"]]


def test_mine_coords_dms_unicode_and_ascii(spark):
    from proj_4_spark.sources.pages import mine_coords_dms

    rows = [
        ("u1", 'Eiffel: 48°51′24.5″N 2°21′03″E fin'),
        ("u2", "Sydney 33d52'04\"S, 151d12'36\"E opera"),
        ("u3", "no coordinates here"),
        ("u4", 'two: 10°30\'00"N 20°00\'00"E and 5°06\'07.2"S 3°02\'01"W'),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    out = {(r["url"], r["mention_idx"]): (r["lat"], r["lon"])
           for r in mine_coords_dms(df).collect()}
    assert abs(out[("u1", 0)][0] - (48 + 51 / 60 + 24.5 / 3600)) < 1e-12
    assert abs(out[("u1", 0)][1] - (2 + 21 / 60 + 3 / 3600)) < 1e-12
    assert abs(out[("u2", 0)][0] + (33 + 52 / 60 + 4 / 3600)) < 1e-12
    assert abs(out[("u2", 0)][1] - (151 + 12 / 60 + 36 / 3600)) < 1e-12
    assert ("u3", 0) not in out
    assert abs(out[("u4", 1)][0] + (5 + 6 / 60 + 7.2 / 3600)) < 1e-12
    assert abs(out[("u4", 1)][1] + (3 + 2 / 60 + 1 / 3600)) < 1e-12
    assert len(out) == 4
