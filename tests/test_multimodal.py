"""Multimodal plumbing tests: deterministic fake corpus, feature
extraction over mapInPandas, resize + frame sampling shapes."""

from __future__ import annotations

import hashlib

import numpy as np

from synthetic_data_pipeline_spark.sources.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
    synth_media,
)


def test_features_match_numpy_reference(spark):
    media = synth_media(spark, 30).cache()
    feats = {r.media_id: r for r in extract_features(media).collect()}
    assert len(feats) == 30
    # recompute media 0 (an image) independently
    seed = hashlib.md5(b"media:0").digest()
    rng = np.random.default_rng(int.from_bytes(seed[:8], "big"))
    arr = rng.integers(0, 256, 16 * 12, dtype=np.uint8)
    r = feats[0]
    assert r.kind == "image"
    assert abs(r.mean - arr.mean()) < 1e-9
    assert abs(r.std - arr.std()) < 1e-9
    assert abs(r.p_bright - (arr > 127).mean()) < 1e-9


def test_resize_shapes(spark):
    media = synth_media(spark, 12)
    out = resize_images(media, 4, 3).collect()
    assert len(out) == 4  # one third of rows are images
    for r in out:
        assert len(r.payload) == 4 * 3


def test_frame_sampling(spark):
    media = synth_media(spark, 12)
    frames = sample_frames(media, every_k=2).collect()
    vids = 4  # one third of 12
    assert len(frames) == vids * 3  # frames 0, 2, 4 of 5
    for r in frames:
        assert len(r.frame) == 8 * 8
        assert r.frame_no in (0, 2, 4)


def test_determinism_across_partitions(spark):
    a = sorted(map(tuple, extract_features(synth_media(spark, 18)).collect()))
    b = sorted(
        map(tuple, extract_features(synth_media(spark, 18).repartition(5)).collect())
    )
    assert a == b
