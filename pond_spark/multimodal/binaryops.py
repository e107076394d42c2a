"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata (north-star extension).

The Spark-side plumbing — schema, Arrow batch shape, mapInPandas
signatures, partitioning discipline — is real and tested. The actual
codec work (image decode, resampling, frame extraction) is STUBBED:
the container has no image/audio libraries, so ``decode_media_batch``
ships a deterministic fake decoder behind the same batch interface a
Pillow/ffmpeg-backed implementation would use, and raises
``NotImplementedError`` when asked for a real codec.

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

#: magic-byte prefixes → mime (deterministic sniffing, no codec needed)
_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mpeg"),
    (b"\x00\x00\x00", "video/mp4"),
]


def extract_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Metadata pass: payload size + sniffed mime, built-ins only
    (no Python) — length and prefix tests run JVM-side."""
    p = F.col(payload_col)
    mime = F.lit(None).cast("string")
    for magic, m in reversed(_MAGIC):
        hexpfx = magic.hex()
        mime = F.when(
            F.hex(F.substring(p, 1, len(magic))) == hexpfx.upper(), F.lit(m)
        ).otherwise(mime)
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

    ``codec='fake'`` runs a deterministic stand-in (byte-histogram
    features) with the exact batch shape a real decoder would have;
    any other codec raises NotImplementedError (no media libs in this
    environment — swap in Pillow/torchaudio/ffmpeg here).
    """
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r}: real decoders require image/audio libraries "
            "not present in this environment; the 'fake' codec exercises "
            "the identical mapInPandas plumbing"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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

    ``codec='fake'`` produces a deterministic payload of exactly
    ``width*height`` bytes (cyclic repetition/truncation of the source
    bytes) through the same batch interface a Pillow ``Image.resize``
    implementation would use; other codecs raise NotImplementedError.
    """
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r}: real resizing requires image libraries not "
            "present in this environment; the 'fake' codec exercises the "
            "identical mapInPandas plumbing"
        )
    n = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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
    return (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "sample_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col(duration_col), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "sample_ms")
    )
