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


def test_audio_windows_plumbing(spark):
    from sifter_mrc_search_engine_spark.operators.multimodal import (
        audio_windows,
        synthesize_media,
    )

    media = synthesize_media(spark, 24)
    rows = audio_windows(media, window_ms=500).collect()
    assert rows
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, ws in by_media.items():
        ws.sort(key=lambda r: r["window_idx"])
        # contiguous fixed windows covering [0, duration)
        assert [w["window_idx"] for w in ws] == list(range(len(ws)))
        for w in ws:
            assert w["start_ms"] == w["window_idx"] * 500
            assert w["end_ms"] > w["start_ms"]
            assert len(w["embedding"]) == 16
    # only audio rows produced
    kinds = {r["media_id"] % 3 for r in rows}
    assert kinds == {1}  # synthesize_media: kind index 1 == audio
