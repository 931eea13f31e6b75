"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns; decode / feature-extract
/ resize / frame-sample run as Arrow-batched `mapInPandas` stages.
The actual codec calls are STUBBED (no imaging/audio libs in this
environment) behind `_decode_stub`, which produces deterministic fake
dimensions from the byte length — the Spark-side plumbing (schema,
batch iteration, partitioning) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

META_SCHEMA = "doc_id long, n_bytes long, width long, height long"


def _decode_stub(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode: dims derived from byte length.

    Replace with PIL/libvips/ffmpeg probing on a real cluster:
        raise NotImplementedError("image decode requires PIL")
    """
    n = len(payload)
    return n % 640, (n * 7) % 480


def extract_meta(blobs: DataFrame, id_col: str = "doc_id",
                 payload_col: str = "payload") -> DataFrame:
    """mapInPandas metadata extraction over binary payloads."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lens = pdf[payload_col].map(len)
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "n_bytes": lens.astype("int64"),
                "width": (lens % 640).astype("int64"),
                "height": ((lens * 7) % 480).astype("int64"),
            })

    return blobs.mapInPandas(_extract, META_SCHEMA)


def frame_sample(blobs: DataFrame, every_n: int = 10,
                 id_col: str = "doc_id",
                 payload_col: str = "payload") -> DataFrame:
    """Video frame-sampling plumbing: emits (doc_id, frame_idx,
    frame_bytes) rows; frame extraction itself is the stub (slices of
    the payload stand in for decoded frames)."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = pdf[payload_col].to_numpy()
            n_rows = len(payloads)
            lens = np.fromiter((len(p) for p in payloads),
                               dtype=np.int64, count=n_rows)
            counts = np.minimum(every_n, lens)
            steps = np.maximum(1, lens // max(1, every_n))
            rep_row = np.repeat(np.arange(n_rows), counts)
            rep_doc = np.repeat(pdf[id_col].to_numpy(), counts)
            total = int(counts.sum())
            # per-frame index within each doc: global arange minus the
            # repeated per-doc offset (vectorized grouped cumcount)
            idx = np.arange(total) - np.repeat(counts.cumsum() - counts,
                                               counts)
            starts = idx * steps[rep_row]
            ends = starts + steps[rep_row]
            # the byte-slice materialization below stands in for the
            # per-frame codec call (stubbed; see module docstring) —
            # all offset arithmetic above is vectorized
            frames = [bytes(payloads[r][s:e])
                      for r, s, e in zip(rep_row, starts, ends)]
            yield pd.DataFrame({"doc_id": rep_doc,
                                "frame_idx": idx.astype(np.int32),
                                "frame_bytes": frames})

    return blobs.mapInPandas(_sample,
                             "doc_id long, frame_idx int, frame_bytes binary")


def fake_embedding_cols(payload_col: str = "payload", dim: int = 4):
    """Deterministic placeholder feature extractor over a binary
    payload, built entirely from JVM-side expressions (md5 + conv —
    whole-stage codegen, no Python in the hot path).  On a real
    cluster the md5-derived features are replaced by a model forward
    pass (Arrow-batched pandas UDF); the column shape (binary ->
    fixed-width float features) and everything downstream stay
    identical.

    feature_k = (int(md5(payload || str(k))[:8], 16) % 1e6) / 1e6
    """
    from pyspark.sql import functions as F

    cols = []
    for k in range(dim):
        h = F.md5(F.concat(F.col(payload_col),
                           F.lit(str(k)).cast("binary")))
        v = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
             % 1000000) / 1000000.0
        cols.append(v.alias(f"f{k}"))
    return cols
