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
        (4, "video", bytes.fromhex("00000018") + b"ftypisom", None, None, None, 3500),
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
    assert out[4] == (12, "video/mp4")
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


# -- real stdlib codecs (multimodal/codecs.py) ---------------------------


def test_png_roundtrip_pixel_exact():
    from pond_spark.multimodal.codecs import decode_png, encode_png

    w, h, ch = 5, 3, 3
    samples = bytes((x * 40 + y * 10 + c) % 256 for y in range(h) for x in range(w) for c in range(ch))
    data = encode_png(w, h, ch, samples)
    w2, h2, ch2, out = decode_png(data)
    assert (w2, h2, ch2) == (w, h, ch)
    assert out == samples


def test_png_all_filters_decode():
    """Un-filtering handles Sub/Up/Average/Paeth rows: zlib-compress a
    stream that uses each filter type explicitly."""
    import struct
    import zlib

    from pond_spark.multimodal.codecs import decode_png

    w, h, ch = 4, 5, 1
    rows = [bytes([10, 20, 30, 40]) for _ in range(h)]
    # filter each row differently: none, sub, up, average, paeth
    raw = bytearray()
    prev = bytes(w)
    for i, r in enumerate(rows):
        f = i % 5
        raw.append(f)
        if f == 0:
            raw += r
        elif f == 1:
            raw += bytes((r[j] - (r[j - 1] if j else 0)) & 0xFF for j in range(w))
        elif f == 2:
            raw += bytes((r[j] - prev[j]) & 0xFF for j in range(w))
        elif f == 3:
            raw += bytes(
                (r[j] - (((r[j - 1] if j else 0) + prev[j]) >> 1)) & 0xFF
                for j in range(w)
            )
        else:
            out = []
            for j in range(w):
                a = r[j - 1] if j else 0
                b, c = prev[j], (prev[j - 1] if j else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out.append((r[j] - pr) & 0xFF)
            raw += bytes(out)
        prev = r

    def chunk(t, p):
        crc = zlib.crc32(t + p) & 0xFFFFFFFF
        return struct.pack(">I", len(p)) + t + p + struct.pack(">I", crc)

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    w2, h2, ch2, out = decode_png(data)
    assert out == b"".join(rows)


def test_bmp_roundtrip():
    from pond_spark.multimodal.codecs import decode_bmp, encode_bmp

    w, h = 3, 2  # stride padding exercised (3*3=9 -> pad to 12)
    samples = bytes(range(w * h * 3))
    data = encode_bmp(w, h, samples)
    w2, h2, ch, out = decode_bmp(data)
    assert (w2, h2, ch) == (w, h, 3)
    assert out == samples


def test_wav_roundtrip():
    from pond_spark.multimodal.codecs import decode_wav, encode_wav

    frames = bytes(range(64)) * 2
    data = encode_wav(frames, n_channels=1, sample_rate=8000, width=2)
    n, ch, rate, width, out = decode_wav(data)
    assert (n, ch, rate, width) == (64, 1, 8000, 2)
    assert out == frames
    # non-16-bit widths surface, they don't silently reinterpret
    data24 = encode_wav(bytes(range(96)), n_channels=1, sample_rate=8000, width=3)
    assert decode_wav(data24)[3] == 3


def test_resize_nearest_known():
    from pond_spark.multimodal.codecs import resize_nearest

    # 2x2 gray image -> 4x4: each pixel becomes a 2x2 block
    samples = bytes([0, 50, 100, 150])
    out = resize_nearest(2, 2, 1, samples, 4, 4)
    assert out == bytes(
        [0, 0, 50, 50, 0, 0, 50, 50, 100, 100, 150, 150, 100, 100, 150, 150]
    )


def test_decode_media_batch_stdlib(spark):
    """Spark-side real decode: PNG and WAV payloads decode to true
    pixel/frame counts; JPEG-magic and junk payloads yield NULLs."""
    from pond_spark.multimodal.binaryops import decode_media_batch
    from pond_spark.multimodal.codecs import encode_png, encode_wav

    png = encode_png(4, 3, 3, bytes(range(36)))
    wav = encode_wav(bytes(range(100)), width=2)
    rows = [
        (1, "image", bytearray(png)),
        (2, "audio", bytearray(wav)),
        (3, "image", bytearray(b"\xff\xd8\xffjunkjpeg")),
        (4, "image", bytearray(b"garbage")),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = {r.media_id: r for r in decode_media_batch(df, codec="stdlib").collect()}
    assert out[1].n_pixels == 12
    assert out[2].n_pixels == 50  # 100 bytes / 2-byte samples
    assert out[3].n_pixels is None and out[4].n_pixels is None
    assert len(out[1].feat) == 8 and all(0.0 <= v <= 1.0 for v in out[1].feat)


def test_resize_image_batch_stdlib(spark):
    """Real resize: PNG in, PNG out at the target raster, pixel
    content preserved under nearest-neighbor."""
    from pond_spark.multimodal.binaryops import resize_image_batch
    from pond_spark.multimodal.codecs import decode_png, encode_png

    samples = bytes([0, 50, 100, 150])  # 2x2 gray
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(2, 2, 1, samples))), (2, bytearray(b"junk"))],
        "media_id long, payload binary",
    )
    out = {r.media_id: r for r in resize_image_batch(df, 4, 4, codec="stdlib").collect()}
    w, h, ch, resized = decode_png(bytes(out[1].payload))
    assert (w, h, ch) == (4, 4, 1)
    assert resized[:4] == bytes([0, 0, 50, 50])
    assert out[2].payload is None


def test_audio_features_batch_known_signal(spark):
    """Hand-computable PCM: [100, -100, 100, -100, 0, 0] has 4
    sign-boundary flips ((x>=0) flips at every +/- transition; 0
    counts as non-negative so the trailing zeros add one flip at the
    -100 -> 0 edge), sum_abs 400, peak 100. Junk rows yield NULLs."""
    import numpy as np

    from pond_spark.multimodal.binaryops import audio_features_batch
    from pond_spark.multimodal.codecs import encode_wav

    pcm = np.array([100, -100, 100, -100, 0, 0], dtype="<i2").tobytes()
    rows = [
        (1, bytearray(encode_wav(pcm, n_channels=1, sample_rate=8000))),
        (2, bytearray(b"not a wav")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r for r in audio_features_batch(df).collect()}
    assert out[1].n_samples == 6 and out[1].sample_rate == 8000
    assert out[1].zero_crossings == 4
    assert out[1].sum_abs == 400 and out[1].peak == 100
    assert out[2].n_samples is None and out[2].zero_crossings is None


def test_image_dhash_near_pairs(spark):
    """dHash: a one-pixel perturbation stays within Hamming 1 of the
    original; a different image is far; undecodable payloads hash to
    NULL and never pair. The pair join is the SAME pigeonhole
    machinery text SimHash uses."""
    from pond_spark.dedup.simhash import hamming_near_pairs
    from pond_spark.multimodal.binaryops import image_dhash_batch
    from pond_spark.multimodal.codecs import encode_png

    base = bytes((k * 29 + (k * k) % 97) % 256 for k in range(72))
    tweaked = bytes([(base[0] + 90) % 256]) + base[1:]
    other = bytes((k * 151 + 7) % 256 for k in range(72))
    rows = [
        (1, encode_png(9, 8, 1, base)),
        (2, encode_png(9, 8, 1, tweaked)),
        (3, encode_png(9, 8, 1, other)),
        (4, b"\xff\xd8\xffJPEG-ish"),  # needs external codec -> NULL
        (5, None),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    fps = image_dhash_batch(media)
    got = {r.media_id: r.dhash for r in fps.collect()}
    assert got[4] is None and got[5] is None
    assert got[1] is not None and got[1] != got[3]
    pairs = hamming_near_pairs(
        fps.filter("dhash IS NOT NULL"), sig_col="dhash",
        id_col="media_id", max_hamming=2,
    ).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(1, 2)]
    assert pairs[0].hamming <= 1


def test_sniff_riff_containers_and_unknown_duration(spark):
    """Regression (r4 review): RIFF is a container — the fourcc at
    offset 8 decides WAV vs WebP vs AVI; a bare length-prefixed blob
    is NOT an mp4; and a video with zero/NULL duration yields no
    sampled frames."""
    from pond_spark.multimodal.binaryops import extract_media_meta, frame_sample

    rows = [
        (1, "audio", b"RIFF\x10\x00\x00\x00WAVEfmt ", None, None, None, None),
        (2, "image", b"RIFF\x10\x00\x00\x00WEBPVP8 ", None, None, None, None),
        (3, "video", b"RIFF\x10\x00\x00\x00AVI LIST", None, None, None, None),
        (4, "image", b"RIFF\x10\x00\x00\x00XXXX????", None, None, None, None),
        (5, "video", b"\x00\x00\x00\x01notftyp!", None, None, None, None),
        (6, "video", b"\x00\x00\x02\x00ftypMSNV", None, None, None, None),
        (7, "video", b"x", None, None, None, 0),     # zero duration
        (8, "video", b"x", None, None, None, None),  # unknown duration
        (9, "video", b"x", None, None, None, 1500),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r.sniffed_mime for r in extract_media_meta(df).collect()}
    assert got[1] == "audio/wav"
    assert got[2] == "image/webp"
    assert got[3] == "video/avi"
    assert got[4] is None   # unknown RIFF fourcc: no claim
    assert got[5] is None   # leading zeros without ftyp: not mp4
    assert got[6] == "video/mp4"

    sampled = sorted(
        (r.media_id, r.sample_ms) for r in frame_sample(df).collect()
    )
    assert sampled == [(9, 0), (9, 1000)]


# -- baseline JPEG codec (multimodal/codecs.py, VERDICT r4 ask #3) -------


def _np():
    import numpy as np

    return np


def test_jpeg_flat_even_blocks_roundtrip_exact():
    """Flat 8x8 blocks with EVEN pixel values survive the full
    FDCT -> quant -> Huffman -> dequant -> IDCT pipeline exactly
    (DC quant 16: round(8s/16) = s/2 lossless for even level-shifted
    s; every AC coefficient is zero)."""
    np = _np()
    from pond_spark.multimodal.codecs import decode_jpeg, encode_jpeg

    img = np.zeros((16, 16), dtype=np.uint8)
    img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:] = 14, 250, 128, 2
    w, h, ch, out = decode_jpeg(encode_jpeg(16, 16, 1, img.tobytes()))
    assert (w, h, ch) == (16, 16, 1)
    assert np.array_equal(np.frombuffer(out, np.uint8).reshape(16, 16), img)


def test_jpeg_smooth_image_close_and_nonmultiple_dims():
    """A smooth gradient survives with small quantization error, at
    non-multiple-of-8 dimensions (edge-replication padding + crop)."""
    np = _np()
    from pond_spark.multimodal.codecs import decode_jpeg, encode_jpeg

    xx, yy = np.meshgrid(np.arange(17), np.arange(24))
    img = ((xx * 3 + yy * 5) % 200 + 20).astype(np.uint8)
    w, h, ch, out = decode_jpeg(encode_jpeg(17, 24, 1, img.tobytes()))
    assert (w, h, ch) == (17, 24, 1)
    dec = np.frombuffer(out, np.uint8).reshape(24, 17).astype(int)
    assert np.abs(dec - img.astype(int)).max() <= 12


def test_jpeg_color_444_roundtrip():
    np = _np()
    from pond_spark.multimodal.codecs import decode_jpeg, encode_jpeg

    img = np.full((8, 8, 3), (120, 64, 200), dtype=np.uint8)
    w, h, ch, out = decode_jpeg(encode_jpeg(8, 8, 3, img.tobytes()))
    assert (w, h, ch) == (8, 8, 3)
    dec = np.frombuffer(out, np.uint8).reshape(8, 8, 3).astype(int)
    # YCbCr forward+inverse costs at most +-2 per channel on flat color
    assert np.abs(dec - img.astype(int)).max() <= 2


def test_jpeg_restart_markers_do_not_change_pixels():
    np = _np()
    from pond_spark.multimodal.codecs import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8).tobytes()
    plain = decode_jpeg(encode_jpeg(32, 32, 1, img))
    rst = decode_jpeg(encode_jpeg(32, 32, 1, img, restart_interval=3))
    assert plain == rst
    # and DRI actually emitted RST markers into the stream
    assert b"\xff\xd0" in encode_jpeg(32, 32, 1, img, restart_interval=3)


def test_jpeg_420_subsampled_decode():
    """Hand-built 4:2:0 stream (2x2 Y sampling, 1x1 chroma): flat gray
    v with Cb=Cr=128 must decode to exactly (v, v, v) everywhere —
    drives the multi-block MCU loop and the replication upsampler,
    which the 4:4:4-only encoder cannot produce."""
    import struct

    np = _np()
    from pond_spark.multimodal import codecs as cj

    v = 100  # even -> DC-exact
    dc_enc, _ = cj._canonical_codes(cj._DC_BITS, cj._DC_SYMS)
    ac_enc, _ = cj._canonical_codes(cj._AC_BITS, cj._AC_SYMS)
    w = cj._BitWriter()

    def put_flat_block(dc_quant: int, prev: int) -> int:
        diff = dc_quant - prev
        size = abs(diff).bit_length()
        code, ln = dc_enc[size]
        w.write(code, ln)
        if size:
            w.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
        code, ln = ac_enc[0x00]  # EOB
        w.write(code, ln)
        return dc_quant

    # one MCU: 4 Y blocks (DC = 8*(v-128)/16) then Cb, Cr (DC = 0)
    ydc = (8 * (v - 128)) // 16
    prev = 0
    for _ in range(4):
        prev = put_flat_block(ydc, prev)
    put_flat_block(0, 0)  # Cb
    put_flat_block(0, 0)  # Cr
    entropy = w.flush()

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    qt_l = bytes(cj._QT_LUMA[cj._ZIGZAG[i]] for i in range(64))
    qt_c = bytes(cj._QT_CHROMA[cj._ZIGZAG[i]] for i in range(64))
    data = (
        b"\xff\xd8"
        + seg(0xDB, b"\x00" + qt_l)
        + seg(0xDB, b"\x01" + qt_c)
        + seg(0xC0, struct.pack(">BHHB", 8, 16, 16, 3)
              + struct.pack(">BBB", 1, 0x22, 0)
              + struct.pack(">BBB", 2, 0x11, 1)
              + struct.pack(">BBB", 3, 0x11, 1))
        + seg(0xC4, bytes([0x00]) + bytes(cj._DC_BITS) + bytes(cj._DC_SYMS))
        + seg(0xC4, bytes([0x10]) + bytes(cj._AC_BITS) + bytes(cj._AC_SYMS))
        + seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
        + entropy
        + b"\xff\xd9"
    )
    w_, h_, ch, out = cj.decode_jpeg(data)
    assert (w_, h_, ch) == (16, 16, 3)
    dec = np.frombuffer(out, np.uint8).reshape(16, 16, 3)
    assert (dec == v).all()


def test_jpeg_progressive_and_truncated_rejected():
    import struct

    from pond_spark.multimodal.codecs import decode_jpeg, encode_jpeg

    jp = bytearray(encode_jpeg(8, 8, 1, bytes(64)))
    # flip SOF0 -> SOF2 (progressive)
    i = jp.find(b"\xff\xc0")
    jp[i + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(jp))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x11garbage")
    with pytest.raises(Exception):
        decode_jpeg(encode_jpeg(8, 8, 1, bytes(64))[:20])


def test_jpeg_dct_matrix_orthonormal_and_unquantized_roundtrip():
    """Independent math check that guards against compensating
    encoder/decoder bugs: the DCT matrix is orthonormal, and
    IDCT(FDCT(x)) == x without quantization in the loop."""
    np = _np()
    from pond_spark.multimodal.codecs import _dct_matrix

    C = _dct_matrix()
    assert np.allclose(C @ C.T, np.eye(8), atol=1e-12)
    rng = np.random.default_rng(1)
    f = rng.uniform(-128, 127, (8, 8))
    assert np.allclose(C.T @ (C @ f @ C.T) @ C, f, atol=1e-9)


def test_jpeg_dispatch_and_dhash():
    """decode() routes JPEG payloads; image_dhash_batch fingerprints
    them like any raster (decode_raster path)."""
    np = _np()
    from pond_spark.multimodal.codecs import decode, decode_raster, encode_jpeg

    img = np.zeros((8, 8), dtype=np.uint8) + 200
    jp = encode_jpeg(8, 8, 1, img.tobytes())
    kind, n, samples = decode(jp)
    assert (kind, n) == ("image", 64)
    assert decode_raster(jp)[:3] == (8, 8, 1)


def test_jpeg_decoder_fuzz_fails_fast():
    """Mutated/truncated streams must raise promptly (the Arrow batch
    decoder maps failures to NULL rows) — no hangs, no silent
    mis-sized output."""
    import random
    import time

    np = _np()
    from pond_spark.multimodal.codecs import decode_jpeg, encode_jpeg

    rng = random.Random(0)
    jp = bytearray(encode_jpeg(16, 16, 1, bytes(range(256))))
    t0 = time.time()
    for _ in range(200):
        b = bytearray(jp)
        for _ in range(rng.randint(1, 8)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            w, h, ch, out = decode_jpeg(bytes(b))
            # when a mutation still decodes, the geometry contract holds
            assert len(out) == w * h * ch
        except Exception:
            pass
    assert time.time() - t0 < 20.0


def test_media_ops_compose_with_structured_streaming(spark, tmp_path):
    """The multimodal plumbing works on the LIVE path too: JVM-side
    magic sniffing and the Arrow-batched mapInPandas decode both
    compose with a streaming source (mapInPandas is streaming-safe —
    stateless, per-partition), so a media-bearing ingest stream can
    extract features without a batch detour."""
    src = str(tmp_path / "media")
    rows = [
        (1, "image", bytes.fromhex("89504e47") + b"streampng",
         "image/png", 10, 10, None),
        (2, "image", bytes.fromhex("ffd8ffe0") + b"streamjpg",
         None, None, None, None),
        (3, "image", None, None, None, None, None),
    ]
    spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    stream = spark.readStream.schema(MEDIA_SCHEMA).parquet(src)
    q = (
        decode_media_batch(extract_media_meta(stream).drop(
            "payload_bytes", "sniffed_mime"
        ))
        .writeStream.format("memory")
        .queryName("media_live")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.media_id: r for r in spark.sql("select * from media_live").collect()}
    batch = {r.media_id: r for r in decode_media_batch(
        spark.read.parquet(src)).collect()}
    assert set(got) == set(batch) == {1, 2, 3}
    for mid in got:
        assert got[mid].n_pixels == batch[mid].n_pixels
        assert list(got[mid].feat or []) == list(batch[mid].feat or [])
