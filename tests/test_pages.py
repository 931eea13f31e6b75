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
