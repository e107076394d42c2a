"""Pure-stdlib media codecs: PNG, BMP, WAV — real decodes, no
external libraries.

The container has no Pillow/ffmpeg, but three ubiquitous formats are
fully decodable with the standard library alone: PNG is zlib inflate
+ per-scanline un-filtering (RFC 2083 §6), BMP is a struct-packed
uncompressed raster, and PCM WAV parses with the ``wave`` module.
These back ``decode_media_batch(codec="stdlib")`` so the decode path
runs a REAL codec for those formats; JPEG/MP4 still raise (their
entropy coders genuinely need external libraries).

Encoders for the same three formats exist so tests can round-trip
pixel-exact payloads without fixtures.

Everything here is per-payload Python executed inside Arrow-batched
``mapInPandas`` workers — the Spark-side batching discipline lives in
binaryops.py; this module is deliberately plain bytes-in/arrays-out.
"""

from __future__ import annotations

import io
import struct
import zlib

__all__ = [
    "decode",
    "decode_png",
    "decode_bmp",
    "decode_wav",
    "encode_png",
    "encode_bmp",
    "encode_wav",
    "resize_nearest",
]

# ---------------------------------------------------------------------------
# PNG

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
#: color type → samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, raw samples) for an 8-bit,
    non-interlaced PNG (color types 0/2/4/6)."""
    if not data.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG")
    pos, idat, meta = len(_PNG_MAGIC), [], None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
                raise ValueError("unsupported PNG variant")
            meta = (w, h, _PNG_CHANNELS[color])
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if meta is None or not idat:
        raise ValueError("truncated PNG")
    w, h, ch = meta
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    out = bytearray()
    prev = bytearray(stride)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter {ftype}")
        out += line
        prev = line
    return w, h, ch, bytes(out)


def encode_png(width: int, height: int, channels: int, samples: bytes) -> bytes:
    """Minimal PNG encoder (filter 0 rows, one IDAT)."""
    color = {1: 0, 3: 2, 2: 4, 4: 6}[channels]
    stride = width * channels
    raw = b"".join(
        b"\x00" + samples[y * stride : (y + 1) * stride] for y in range(height)
    )

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(
            ">I", crc
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed, bottom-up)


def decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, 3, RGB samples top-down) for BI_RGB 24-bit BMPs."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack("<I", data[10:14])
    w, h = struct.unpack("<ii", data[18:26])
    bpp, comp = struct.unpack("<HI", data[28:34])
    if bpp != 24 or comp != 0:
        raise ValueError("unsupported BMP variant")
    top_down = h < 0
    h = abs(h)
    row = ((w * 3 + 3) // 4) * 4  # 4-byte aligned
    out = bytearray()
    rows = range(h) if top_down else range(h - 1, -1, -1)
    for y in rows:
        line = data[off + y * row : off + y * row + w * 3]
        # BMP stores BGR; flip to RGB
        for x in range(w):
            b, g, r = line[x * 3 : x * 3 + 3]
            out += bytes((r, g, b))
    return w, h, 3, bytes(out)


def encode_bmp(width: int, height: int, samples: bytes) -> bytes:
    """24-bit BI_RGB bottom-up BMP from top-down RGB samples."""
    row = ((width * 3 + 3) // 4) * 4
    pad = b"\x00" * (row - width * 3)
    body = bytearray()
    for y in range(height - 1, -1, -1):
        line = samples[y * width * 3 : (y + 1) * width * 3]
        for x in range(width):
            r, g, b = line[x * 3 : x * 3 + 3]
            body += bytes((b, g, r))
        body += pad
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytes(header) + bytes(body)


# ---------------------------------------------------------------------------
# WAV (PCM)


def decode_wav(data: bytes) -> tuple[int, int, int, bytes]:
    """(n_frames, n_channels, sample_rate, raw frame bytes) via the
    stdlib ``wave`` reader (PCM only)."""
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        return (
            w.getnframes(),
            w.getnchannels(),
            w.getframerate(),
            w.readframes(w.getnframes()),
        )


def encode_wav(
    frames: bytes, n_channels: int = 1, sample_rate: int = 16000, width: int = 2
) -> bytes:
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(width)
        w.setframerate(sample_rate)
        w.writeframes(frames)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# dispatch + raster resize


def decode(data: bytes) -> tuple[str, int, bytes]:
    """Sniff + decode: returns (kind, n_values, raw samples) where
    n_values is pixels (images) or frames (audio). Raises ValueError
    for undecodable payloads, NotImplementedError for formats that
    genuinely need external codecs (JPEG, MP4, MP3)."""
    if data.startswith(_PNG_MAGIC):
        w, h, _ch, samples = decode_png(data)
        return "image", w * h, samples
    if data[:2] == b"BM":
        w, h, _ch, samples = decode_bmp(data)
        return "image", w * h, samples
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        n, _ch, _rate, frames = decode_wav(data)
        return "audio", n, frames
    if data[:3] == b"\xff\xd8\xff" or data[:3] == b"ID3" or data[4:8] == b"ftyp":
        raise NotImplementedError("JPEG/MP3/MP4 need external codecs")
    raise ValueError("unrecognized media payload")


def resize_nearest(
    width: int,
    height: int,
    channels: int,
    samples: bytes,
    new_w: int,
    new_h: int,
) -> bytes:
    """Nearest-neighbor raster resize on decoded samples."""
    out = bytearray()
    for y in range(new_h):
        sy = y * height // new_h
        base = sy * width * channels
        for x in range(new_w):
            sx = x * width // new_w
            off = base + sx * channels
            out += samples[off : off + channels]
    return bytes(out)
