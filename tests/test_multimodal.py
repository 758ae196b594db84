"""Multimodal binary-column plumbing: schema, batch shape, determinism."""

from sifter_mrc_search_engine_spark.operators.multimodal import (
    image_features,
    synthesize_media,
    video_frame_samples,
)


def test_image_features_shape_and_determinism(spark):
    media = synthesize_media(spark, 30)
    out = image_features(media).collect()
    assert len(out) == 10  # every 3rd row is an image
    for r in out:
        assert len(r["embedding"]) == 16
        assert r["width"] >= 64 and r["height"] >= 48
    again = image_features(media.repartition(7)).collect()
    a = {r["media_id"]: r["embedding"] for r in out}
    b = {r["media_id"]: r["embedding"] for r in again}
    assert a == b  # partition-independent


def test_video_frame_sampling(spark):
    media = synthesize_media(spark, 30)
    out = video_frame_samples(media, every_ms=1000).collect()
    by_media = {}
    for r in out:
        by_media.setdefault(r["media_id"], []).append((r["frame_idx"], r["frame_ts_ms"]))
    # every video yields ceil(duration/1000) frames at 0,1000,2000,...
    for mid, frames in by_media.items():
        frames.sort()
        assert frames[0] == (0, 0)
        assert [f[1] for f in frames] == [i * 1000 for i in range(len(frames))]
        assert len(frames) >= 3  # durations are >= 3000 ms


def test_real_decode_is_gated(spark):
    import pytest

    from sifter_mrc_search_engine_spark.operators.multimodal import decode_image_real

    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image_real(b"fakebytes")
