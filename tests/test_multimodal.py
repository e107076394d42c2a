"""Multimodal plumbing tests: schema, magic sniffing, mapInPandas batch
shape, frame sampling, stubbed codec gating."""

from __future__ import annotations

import pytest

from pond_spark.multimodal import (
    MEDIA_SCHEMA,
    decode_media_batch,
    extract_media_meta,
    frame_sample,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", bytes.fromhex("89504e47") + b"fakepng", "image/png", 10, 10, None),
        (2, "image", bytes.fromhex("ffd8ffe0") + b"fakejpg", None, None, None, None),
        (3, "audio", b"ID3fakempeg", None, None, None, 4500),
        (4, "video", bytes.fromhex("000000") + b"ftypmp4", None, None, None, 3500),
        (5, "image", b"no-magic-here", None, None, None, None),
        (6, "image", None, None, None, None, None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).cache()


def test_extract_media_meta(media):
    out = {r.media_id: (r.payload_bytes, r.sniffed_mime)
           for r in extract_media_meta(media).collect()}
    assert out[1] == (11, "image/png")
    assert out[2] == (11, "image/jpeg")
    assert out[3] == (11, "audio/mpeg")
    assert out[4] == (10, "video/mp4")
    assert out[5] == (13, None)
    assert out[6] == (None, None)


def test_decode_media_batch_fake_codec(media):
    out = {r.media_id: r for r in decode_media_batch(media).collect()}
    assert len(out) == 6
    assert out[1].n_pixels == 11
    assert out[6].n_pixels == 0
    feat = out[1].feat
    assert len(feat) == 8
    assert all(0.0 <= f <= 1.0 for f in feat)
    # determinism: same payload → same features on re-run
    out2 = {r.media_id: r for r in decode_media_batch(media).collect()}
    assert out2[1].feat == feat


def test_decode_real_codec_is_stubbed(media):
    with pytest.raises(NotImplementedError):
        decode_media_batch(media, codec="pillow")


def test_frame_sample(media):
    out = frame_sample(media, every_ms=1000).collect()
    rows = sorted((r.media_id, r.sample_ms) for r in out)
    # only the video row (id 4, 3500ms) is sampled: 0,1000,2000,3000
    assert rows == [(4, 0), (4, 1000), (4, 2000), (4, 3000)]


def test_resize_image_batch_fake_codec(media):
    from pond_spark.multimodal import resize_image_batch

    out = resize_image_batch(media, width=4, height=3).collect()
    by_id = {r.media_id: r for r in out}
    assert len(out) == media.count()
    for r in out:
        if r.payload is not None:
            assert len(r.payload) == 12
            assert (r.width, r.height) == (4, 3)
    # deterministic: same input → same bytes
    out2 = {r.media_id: r.payload for r in resize_image_batch(media, 4, 3).collect()}
    assert all(out2[i] == by_id[i].payload for i in by_id)


def test_resize_real_codec_is_stubbed(media):
    import pytest as _pytest

    from pond_spark.multimodal import resize_image_batch

    with _pytest.raises(NotImplementedError):
        resize_image_batch(media, 4, 3, codec="pillow")
