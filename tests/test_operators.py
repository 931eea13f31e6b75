"""Unit tests for engine operators: salting, checkpoint/resume,
streaming batch-parity, multimodal plumbing, knn variants."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from proj_4_spark.plans.checkpoint import CheckpointedPipeline
from proj_4_spark.plans.salting import salted_agg, salted_join_hot, top_hot_keys
from proj_4_spark.sources.coords import coords_df
from proj_4_spark.functions.geo import s2_cell_udf


def test_salted_agg_matches_plain(spark, sf_dir):
    df = coords_df(spark, sf_dir)
    cell = s2_cell_udf(6)(F.col("lon"), F.col("lat")).alias("cell")
    pts = df.select("doc_id", cell)
    plain = {(r["cell"]): r["n"] for r in
             pts.groupBy("cell").agg(F.count("*").alias("n")).collect()}
    salted = {(r["cell"]): r["n"] for r in
              salted_agg(pts, ["cell"], "doc_id", n_salt=8).collect()}
    assert plain == salted


def test_top_hot_keys_finds_zipf_head(spark, sf_dir):
    df = coords_df(spark, sf_dir)
    cell = s2_cell_udf(6)(F.col("lon"), F.col("lat")).alias("cell")
    pts = df.select("doc_id", cell)
    hot = top_hot_keys(pts, "cell", top_n=5, min_share=0.05)
    assert len(hot) >= 1  # the Tokyo CBD cell holds ~26% of points


def test_salted_join_matches_plain(spark, sf_dir):
    df = coords_df(spark, sf_dir)
    cell = s2_cell_udf(6)(F.col("lon"), F.col("lat")).alias("cell")
    pts = df.select("doc_id", cell)
    dims = pts.groupBy("cell").agg(F.count("*").alias("cell_n"))
    hot = top_hot_keys(pts, "cell", top_n=3, min_share=0.05)
    plain = (pts.join(dims, "cell").select("doc_id", "cell_n")
                .orderBy("doc_id").collect())
    salted = (salted_join_hot(pts, dims, "cell", hot, "doc_id", n_salt=8)
              .select("doc_id", "cell_n").orderBy("doc_id").collect())
    assert plain == salted


def test_checkpoint_resume(spark, sf_dir, tmp_path):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return coords_df(spark, sf_dir).limit(50)

    cp = CheckpointedPipeline(spark, str(tmp_path / "ckpt"))
    a = cp.stage("coords50", build)
    assert a.count() == 50 and calls["n"] == 1
    b = cp.stage("coords50", build)  # resume: no recompute
    assert b.count() == 50 and calls["n"] == 1
    m = cp.metrics()
    assert m and m[0]["stage"] == "coords50" and m[0]["rows"] == 50


def test_streaming_matches_batch(spark, sf_dir, tmp_path):
    from proj_4_spark.streaming.events import run_to_memory
    from proj_4_spark import queries as Q

    import shutil

    events_dir = tmp_path / "events"
    events_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", events_dir / "part-0.parquet")
    spark.conf.set("spark.sql.streaming.checkpointLocation",
                   str(tmp_path / "sck"))
    stream = run_to_memory(spark, str(events_dir), name="t_hourly")
    batch = Q.queries()["events_hourly"](spark, sf_dir)
    s = {tuple(r) for r in stream.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b


def test_multimodal_frame_sample(spark, sf_dir):
    from proj_4_spark.operators.multimodal import frame_sample

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    blobs = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    frames = frame_sample(blobs, every_n=4)
    rows = frames.collect()
    assert len(rows) == 20  # 5 docs x 4 frames
    assert all(isinstance(r["frame_bytes"], (bytes, bytearray)) for r in rows)


def test_multimodal_decode_probe_both_ways(monkeypatch):
    """extract_meta's codec probe: the stub path and a fake-PIL path
    must agree on non-image payloads, and a decodable payload must get
    its TRUE dimensions when the imaging stack is present (VERDICT r04
    ask #10 — runtime probe, not a hard dependency)."""
    import sys
    import types

    from proj_4_spark.operators import multimodal as MM

    payload = b"not an image at all"
    assert MM._pil_image_module() is None or True  # probe never raises
    stub = MM._decode_stub(payload)
    assert MM._decode_dims(payload, None) == stub

    class _FakeImage:
        width, height = 320, 200

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _FakeImageMod:
        @staticmethod
        def open(fp):
            if fp.read(4) == b"IMG!":
                return _FakeImage()
            raise OSError("cannot identify image file")

    # undecodable payload falls back to the stub even "with PIL"
    assert MM._decode_dims(payload, _FakeImageMod) == stub
    # decodable payload reports true dims
    assert MM._decode_dims(b"IMG!....", _FakeImageMod) == (320, 200)

    # and the probe picks up an installed PIL
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = _FakeImageMod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", _FakeImageMod)
    assert MM._pil_image_module() is _FakeImageMod


def test_knn_cell_pruned_exact(spark, sf_dir):
    """The widening-ring pruned kNN equals brute force exactly."""
    from proj_4_spark.operators.knn import knn_broadcast, knn_cell_pruned
    from proj_4_spark.sources.coords import CITIES

    pts = coords_df(spark, sf_dir)
    qs = spark.createDataFrame(
        [(i, c[1] + 0.05, c[2] - 0.05) for i, c in enumerate(CITIES[:5])],
        "query_id long, q_lon double, q_lat double")
    exact = knn_broadcast(pts, qs, k=3).collect()
    pruned = knn_cell_pruned(pts, qs, k=3).collect()
    ex = {(r["query_id"], r["rank"]): r["doc_id"] for r in exact}
    pr = {(r["query_id"], r["rank"]): r["doc_id"] for r in pruned}
    assert ex == pr


def test_knn_ring_boundary_query(spark):
    """A query on a cell corner whose true neighbors all sit in
    adjacent cells: single-cell pruning provably returns the wrong
    set; the ring search matches brute force."""
    from proj_4_spark.operators.knn import knn_broadcast, knn_cell_pruned

    # grid_deg=2 -> cell boundaries at even lon/lat (offset by 180/90)
    pts_rows = [(1, -0.05, 0.5), (2, -0.10, 0.5), (3, -0.15, 0.5),
                (4, 1.9, 1.9), (5, 1.8, 1.8)]  # 4,5 in the query cell
    pts = spark.createDataFrame(pts_rows, "doc_id long, lon double, lat double")
    qs = spark.createDataFrame([(0, 0.01, 0.5)],
                               "query_id long, q_lon double, q_lat double")
    exact = knn_broadcast(pts, qs, k=3).collect()
    pruned = knn_cell_pruned(pts, qs, k=3, grid_deg=2.0).collect()
    ex = {(r["query_id"], r["rank"]): r["doc_id"] for r in exact}
    pr = {(r["query_id"], r["rank"]): r["doc_id"] for r in pruned}
    assert ex == pr == {(0, 1): 1, (0, 2): 2, (0, 3): 3}


def test_lsh_hot_bucket_capped(spark):
    """A boilerplate bucket above max_bucket contributes no pairs; the
    remaining near-dup group is still found."""
    from proj_4_spark.operators.dedup import lsh_candidate_pairs

    boiler = "cookie banner accept all cookies to continue to this site"
    near_a = "the quick brown fox jumps over the lazy dog tonight"
    near_b = "the quick brown fox jumps over the lazy dog today"
    rows = [(i, boiler) for i in range(20)]
    rows += [(100, near_a), (101, near_b)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = lsh_candidate_pairs(docs, max_bucket=10)
    got = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    # every boilerplate bucket has 20 > 10 members -> dropped entirely
    assert all(a >= 100 for a, b in got), got
    assert (100, 101) in got
    uncapped = lsh_candidate_pairs(docs, max_bucket=1000)
    n_uncapped = uncapped.count()
    assert n_uncapped >= 20 * 19 // 2  # boilerplate pairs present


def test_ivf_recall_vs_exact(spark, sf_dir):
    """IVF with a kmeans-trained codebook: recall@5 vs the exact
    brute-force baseline on the embeddings table."""
    from proj_4_spark.operators.similarity import (cosine_topk,
                                                   ivf_topk,
                                                   kmeans_centroids)

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qids = list(range(8))
    exact = cosine_topk(e, qids, 5).collect()
    C = kmeans_centroids(e, n_centroids=8, sample_n=512)
    approx = ivf_topk(e, qids, 5, centroids=C, nprobe=4).collect()
    ex = {(r["query_id"], r["vec_id"]) for r in exact}
    ap = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.5, recall  # nprobe=4 of 8 lists


def test_neardup_hot_bucket_capped(spark):
    """A hot LSH bucket (many near-identical embeddings) above
    max_bucket contributes no pairs; a small distinct near-dup group
    elsewhere is still found."""
    import numpy as np

    from proj_4_spark.operators.similarity import neardup_pairs

    rng = np.random.RandomState(0)
    base = rng.standard_normal(64)
    other = rng.standard_normal(64)
    rows = [(i, (base + 1e-3 * rng.standard_normal(64)).tolist())
            for i in range(30)]
    rows += [(100, other.tolist()),
             (101, (other + 1e-3 * rng.standard_normal(64)).tolist())]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = neardup_pairs(df, threshold=0.9, max_bucket=10)
    got = {(r["vec_a"], r["vec_b"]) for r in capped.collect()}
    assert all(a >= 100 for a, _ in got), got
    assert (100, 101) in got
    uncapped = neardup_pairs(df, threshold=0.9, max_bucket=1000)
    assert uncapped.count() >= 30 * 29 // 2
