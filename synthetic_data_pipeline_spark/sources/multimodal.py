"""Multimodal columns: image/audio/video as opaque BinaryType payloads
with typed metadata (north star requirement). The real decoders
(Pillow / libav) are NOT in this container, so decoding is STUBBED with
a deterministic raw-container interpretation — but everything Spark-side
is real and tested: the schema, the mapInPandas batch shape, the Arrow
transfer of binary columns, the partition-parallel feature extraction.

Container convention for the stub codec (clearly fake, never a real
format): payload = raw uint8 bytes, row-major; images are
``meta.width × meta.height`` grayscale; audio is ``meta.n_samples``
unsigned 8-bit PCM; video is ``meta.n_frames`` concatenated images.
A real deployment swaps ``_decode_*`` for Pillow/soundfile/av calls —
the Spark plumbing does not change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, n_samples:int, n_frames:int>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, "
    "mean double, std double, p_bright double"
)


def synth_media(spark: SparkSession, n: int = 60) -> DataFrame:
    """Deterministic fake corpus: payload bytes derived from md5(media_id)
    so every test run (and partitioning) sees identical data."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        seed = hashlib.md5(f"media:{i}".encode()).digest()
        rng = np.random.default_rng(int.from_bytes(seed[:8], "big"))
        if kind == "image":
            w, h, ns, nf = 16, 12, 0, 0
            payload = rng.integers(0, 256, w * h, dtype=np.uint8)
        elif kind == "audio":
            w, h, ns, nf = 0, 0, 400, 0
            payload = rng.integers(0, 256, ns, dtype=np.uint8)
        else:
            w, h, ns, nf = 8, 8, 0, 5
            payload = rng.integers(0, 256, w * h * nf, dtype=np.uint8)
        rows.append((i, kind, bytes(payload.tobytes()), (w, h, ns, nf)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_array(kind: str, payload: bytes, meta) -> np.ndarray:
    """STUB decoder — raw-container interpretation (see module doc).
    Real image/audio decoding would raise on these fake bytes:"""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if kind == "image":
        return arr.reshape(meta["height"], meta["width"])
    if kind == "audio":
        return arr[: meta["n_samples"]]
    if kind == "video":
        return arr.reshape(meta["n_frames"], meta["height"], meta["width"])
    raise NotImplementedError(f"unknown media kind: {kind}")


def extract_features(media: DataFrame) -> DataFrame:
    """Per-row brightness/energy features via mapInPandas — the Arrow
    batch boundary a real decode pipeline would use. Partition-parallel;
    no shuffle."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for r in pdf.itertuples(index=False):
                arr = _decode_array(r.kind, r.payload, r.meta)
                out.append(
                    (
                        r.media_id,
                        r.kind,
                        len(r.payload),
                        float(arr.mean()),
                        float(arr.std()),
                        float((arr > 127).mean()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "kind", "n_bytes", "mean", "std", "p_bright"
                ],
            )

    return media.mapInPandas(_batches, FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of image payloads (STUB decode, real
    resample math + real binary-in/binary-out plumbing)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "image":
                    continue
                img = _decode_array(r.kind, r.payload, r.meta)
                ys = (np.arange(out_h) * img.shape[0] // out_h)
                xs = (np.arange(out_w) * img.shape[1] // out_w)
                small = img[np.ix_(ys, xs)]
                rows.append(
                    (r.media_id, bytes(small.tobytes()), out_w, out_h)
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "width", "height"]
            )

    return media.mapInPandas(
        _batches, "media_id long, payload binary, width int, height int"
    )


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame sampling for video payloads: keep every k-th frame —
    one row out per kept frame (explode-shaped mapInPandas)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "video":
                    continue
                vid = _decode_array(r.kind, r.payload, r.meta)
                for fi in range(0, vid.shape[0], every_k):
                    rows.append(
                        (r.media_id, fi, bytes(vid[fi].tobytes()))
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_no", "frame"])

    return media.mapInPandas(
        _batches, "media_id long, frame_no int, frame binary"
    )
