"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata (north-star extension).

The Spark-side plumbing — schema, Arrow batch shape, mapInPandas
signatures, partitioning discipline — is real and tested. Codecs:
``codec='stdlib'`` REALLY decodes/resizes PNG, 24-bit BMP, PCM WAV
and baseline sequential JPEG without external codec libraries
(multimodal/codecs.py — zlib inflate + scanline un-filtering for PNG,
struct for BMP, the ``wave`` module for audio, canonical Huffman +
dequant + IDCT for JPEG); MP3/MP4 and progressive JPEG still raise
``NotImplementedError`` (those genuinely need external libraries,
which this container lacks). ``codec='fake'`` keeps a deterministic
stand-in with the identical batch interface for synthetic payloads.

Scale notes: media payloads dominate row size, so every operator here
is ``mapInPandas`` (Arrow-batched, streaming per partition — payloads
never materialize as Python lists) and metadata-only operators project
the binary column away *before* any shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: media row: opaque payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

#: magic rules → mime: (prefix bytes | None, (offset, marker) | None).
#: Container formats need the SECOND check — 'RIFF' alone is WAV or
#: WebP or AVI depending on the fourcc at offset 8, and MP4 is
#: identified by 'ftyp' at offset 4 after an arbitrary box size (the
#: r3 leading-zeros rule matched any length-prefixed blob). Rules here
#: agree with codecs.decode's dispatch, so a sniff-routed row decodes
#: under the same format the sniffer claimed.
_MAGIC = [
    (b"\x89PNG", None, "image/png"),
    (b"\xff\xd8\xff", None, "image/jpeg"),
    (b"GIF8", None, "image/gif"),
    (b"RIFF", (8, b"WAVE"), "audio/wav"),
    (b"RIFF", (8, b"WEBP"), "image/webp"),
    (b"RIFF", (8, b"AVI "), "video/avi"),
    (b"ID3", None, "audio/mpeg"),
    (None, (4, b"ftyp"), "video/mp4"),
]


def extract_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Metadata pass: payload size + sniffed mime, built-ins only
    (no Python) — length, prefix and fourcc tests run JVM-side."""
    p = F.col(payload_col)
    mime = F.lit(None).cast("string")
    for magic, marker, m in reversed(_MAGIC):
        cond = F.lit(True)
        if magic is not None:
            cond = cond & (
                F.hex(F.substring(p, 1, len(magic))) == magic.hex().upper()
            )
        if marker is not None:
            off, mk = marker
            cond = cond & (
                F.hex(F.substring(p, off + 1, len(mk))) == mk.hex().upper()
            )
        mime = F.when(cond, F.lit(m)).otherwise(mime)
    return df.withColumn("payload_bytes", F.length(p).cast("long")).withColumn(
        "sniffed_mime", mime
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_pixels", T.LongType(), True),
        T.StructField("feat", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_media_batch(
    df: DataFrame, codec: str = "fake", feat_dim: int = 8
) -> DataFrame:
    """Decode + feature-extract via Arrow-batched ``mapInPandas``.

    ``codec='stdlib'`` runs REAL decoders for PNG (zlib inflate +
    scanline un-filtering), 24-bit BMP, PCM WAV and baseline JPEG
    (canonical Huffman + dequant + IDCT) — no external codec
    libraries, multimodal/codecs.py; rows whose payload is another
    format (MP3/MP4 genuinely need external libraries; progressive
    JPEG too) or unrecognized decode to NULLs instead of failing the
    batch. ``codec='fake'`` keeps the deterministic stand-in
    (byte-histogram features) with the identical batch shape for
    synthetic payloads.
    """
    if codec not in ("fake", "stdlib"):
        raise NotImplementedError(
            f"codec {codec!r}: only 'stdlib' (PNG/BMP/WAV/baseline "
            "JPEG, real) and 'fake' (deterministic stand-in) are "
            "available — MP3/MP4 decoders require external libraries"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec == "stdlib":
            from pond_spark.multimodal.codecs import decode as _decode

            def row(b):
                if b is None:
                    return None, None
                try:
                    _kind, n, samples = _decode(bytes(b))
                except Exception:  # undecodable / needs external codec
                    return None, None
                if not samples:
                    return n, [0.0] * feat_dim
                chunk = max(1, len(samples) // feat_dim)
                feat = [
                    (
                        float(
                            sum(samples[i * chunk : (i + 1) * chunk])
                            / max(1, len(samples[i * chunk : (i + 1) * chunk]))
                        )
                        / 255.0
                    )
                    for i in range(feat_dim)
                ]
                return n, feat

            for pdf in it:
                decoded = [row(b) for b in pdf["payload"]]
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "n_pixels": pd.array(
                            [d[0] for d in decoded], dtype="Int64"
                        ),
                        "feat": [d[1] for d in decoded],
                    }
                )
            return
        for pdf in it:
            payloads = pdf["payload"]
            n_pixels = payloads.map(lambda b: len(b) if b is not None else 0)
            feats = payloads.map(
                lambda b: [
                    float(sum(b[i::feat_dim]) % 256) / 255.0 if b else 0.0
                    for i in range(feat_dim)
                ]
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_pixels": n_pixels.astype("int64"),
                    "feat": feats,
                }
            )

    return df.select("media_id", "payload").mapInPandas(batches, DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def resize_image_batch(
    df: DataFrame, width: int, height: int, codec: str = "fake"
) -> DataFrame:
    """Resize via Arrow-batched ``mapInPandas`` — the third stubbed
    codec verb next to decode and frame-sample.

    ``codec='stdlib'`` REALLY resizes PNG/BMP/baseline-JPEG rasters:
    decode (multimodal/codecs.py), nearest-neighbor resample,
    re-encode as PNG; non-raster / unrecognized payloads map to NULL.
    ``codec='fake'`` keeps the deterministic stand-in payload of
    exactly ``width*height`` bytes (cyclic repetition/truncation).
    """
    if codec not in ("fake", "stdlib"):
        raise NotImplementedError(
            f"codec {codec!r}: only 'stdlib' (PNG/BMP/JPEG, real) and "
            "'fake' are available"
        )
    n = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec == "stdlib":
            from pond_spark.multimodal.codecs import (
                decode_raster,
                encode_png,
                resize_nearest,
            )

            def real_resize(b):
                if not b:
                    return None
                try:
                    w, h, ch, samples = decode_raster(bytes(b))
                    resized = resize_nearest(w, h, ch, samples, width, height)
                    return encode_png(width, height, ch, resized)
                except Exception:
                    return None

            for pdf in it:
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "payload": pdf["payload"].map(real_resize),
                        "width": width,
                        "height": height,
                    }
                )
            return
        for pdf in it:
            def fake_resize(b):
                if not b:
                    return None
                reps = -(-n // len(b))  # ceil division
                return (bytes(b) * reps)[:n]

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"].map(fake_resize),
                    "width": width,
                    "height": height,
                }
            )

    out = df.select("media_id", "payload").mapInPandas(batches, RESIZED_SCHEMA)
    return out


def frame_sample(
    df: DataFrame, every_ms: int = 1000, duration_col: str = "duration_ms"
) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (the decode of each frame is the stubbed step). Pure
    ``sequence`` + ``explode`` — the row multiplication happens JVM-side
    and the payload column is carried by reference, not copied per row."""
    # a zero-length or unknown-duration video has NO sampleable frame:
    # the sequence would still emit t=0 and hand downstream decode a
    # timestamp outside the media (r4 review finding) — explode of the
    # NULL sequence drops the row instead
    dur = F.col(duration_col)
    return (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "sample_ms",
            F.explode(
                F.when(
                    dur > 0,
                    F.sequence(F.lit(0), dur - 1, F.lit(every_ms)),
                )
            ),
        )
        .select("media_id", "sample_ms")
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
        T.StructField("sum_abs", T.LongType(), True),
        T.StructField("peak", T.IntegerType(), True),
    ]
)


def audio_features_batch(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """PCM-WAV audio features via Arrow-batched ``mapInPandas`` — the
    audio sibling of ``decode_media_batch``'s image path, REAL decode
    (stdlib ``wave``, codecs.decode_wav).

    Features are deliberately INTEGER-exact so a cross-engine oracle
    can hash them (see PERF_NOTES: any rounded float is tie-prone):
    ``n_samples``, ``sample_rate``, ``zero_crossings`` (count of
    sign-boundary flips, (x>=0) changing between adjacent samples),
    ``sum_abs`` (Σ|x| — the un-normalized loudness numerator) and
    ``peak`` (max |x|). Undecodable / non-WAV rows yield NULLs instead
    of failing the batch — and so do 8/24/32-bit PCM rows: the
    features are defined over int16 samples, and reinterpreting other
    widths as ``<i2`` emits garbage, not features (r6 review fix; the
    sample width now comes from codecs.decode_wav). Multi-channel
    frames are treated as the interleaved stream (crossings count
    transitions in interleaved order — document-level signal, not
    per-channel DSP).

    Scale: map-only (no shuffle); numpy vectorized per Arrow batch;
    the binary column never leaves the scan stage.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pond_spark.multimodal.codecs import decode_wav

        for pdf in it:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf[payload_col]):
                try:
                    n, _ch, rate, width, frames = decode_wav(bytes(b))
                    if width != 2:  # non-int16 PCM: NULLs, not garbage
                        rows.append((mid, None, None, None, None, None))
                        continue
                    x = np.frombuffer(frames, dtype="<i2").astype(np.int64)
                    nonneg = x >= 0
                    zc = int((nonneg[1:] != nonneg[:-1]).sum())
                    rows.append(
                        (
                            mid,
                            n,
                            rate,
                            zc,
                            int(np.abs(x).sum()),
                            int(np.abs(x).max()) if len(x) else 0,
                        )
                    )
                except Exception:  # undecodable / not PCM WAV
                    rows.append((mid, None, None, None, None, None))
            out = pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_samples",
                    "sample_rate",
                    "zero_crossings",
                    "sum_abs",
                    "peak",
                ],
            )
            for c in out.columns[1:]:
                out[c] = out[c].astype("Int64")
            yield out

    return df.select("media_id", payload_col).mapInPandas(
        batches, AUDIO_FEATURES_SCHEMA
    )


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("dhash", T.LongType(), True),
    ]
)


def image_dhash_batch(
    df: DataFrame, hash_w: int = 8, hash_h: int = 8
) -> DataFrame:
    """Perceptual image fingerprint (difference hash): decode with the
    pure-stdlib codecs, grayscale, nearest-resize to
    ``(hash_w+1) x hash_h``, and set bit ``r*hash_w + c`` when
    ``pixel[r][c] < pixel[r][c+1]`` — 64 bits at the 8x8 default.
    The LAION-style image-dedup front end: feed the output to
    ``dedup.simhash.hamming_near_pairs`` for near-duplicate pairs
    (the same pigeonhole chunk join text SimHash uses — one near-dup
    machinery for every 64-bit fingerprint in the engine).

    Arrow-batched ``mapInPandas``; rows whose payload is undecodable
    or needs an external codec (MP4; progressive JPEG) hash to NULL
    instead of failing the batch. Map-only at any scale."""
    from pond_spark.multimodal.codecs import decode_raster, resize_nearest

    def dhash(b) -> int | None:
        if b is None:
            return None
        try:
            w, h, ch, samples = decode_raster(bytes(b))
        except Exception:
            return None
        if ch > 1:  # grayscale = per-pixel channel mean
            samples = bytes(
                sum(samples[i : i + ch]) // ch
                for i in range(0, len(samples), ch)
            )
        small = resize_nearest(w, h, 1, samples, hash_w + 1, hash_h)
        out = 0
        for r in range(hash_h):
            row = small[r * (hash_w + 1) : (r + 1) * (hash_w + 1)]
            for c in range(hash_w):
                if row[c] < row[c + 1]:
                    out |= 1 << (r * hash_w + c)
        if out >= 1 << 63:  # pack into signed int64 (Spark LongType)
            out -= 1 << 64
        return out

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dhash": pd.array(
                        [dhash(b) for b in pdf["payload"]], dtype="Int64"
                    ),
                }
            )

    return df.select("media_id", "payload").mapInPandas(batches, DHASH_SCHEMA)
