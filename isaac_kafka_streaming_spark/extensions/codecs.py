"""Pure-stdlib media codecs for the X5 multimodal path.

The container ships no image/audio libraries (PIL, cv2, soundfile), so
"real decode" here means real *formats* decoded with real *parsers*
built on the stdlib: PNG via zlib/struct (signature, chunked layout,
CRC validation, inflate, all five scanline filters), WAV via the
`wave` module.  These are complete for the subset they declare —
8-bit-depth non-interlaced greyscale/RGB/RGBA PNG, PCM WAV — and
raise on anything else rather than guessing.

Everything is a pure bytes->values function with no Spark imports, so
the Arrow workers that run them inside mapInPandas need nothing but
the stdlib, and the functions unit-test without a session.

Reference scope note: the reference engine has no media path at all;
this implements SURVEY.md §2.13's multimodal column contract.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
WAV_MAGIC = b"RIFF"

# PNG color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def png_encode(pixels: bytes, width: int, height: int, color_type: int = 0) -> bytes:
    """Encode raw 8-bit samples as a real PNG (non-interlaced).

    `pixels` is the concatenation of scanlines, `channels * width *
    height` bytes.  Output parses in any standards-compliant reader.
    """
    channels = _CHANNELS[color_type]
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel payload {len(pixels)}B != {width}x{height}x{channels}"
        )

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(blob: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG: returns (width, height, channels, pixel bytes).

    Real decode: chunk walk with CRC validation, IHDR checks, IDAT
    inflate, and per-scanline unfiltering (None/Sub/Up/Average/Paeth).
    Supports 8-bit non-interlaced color types 0/2/6; raises ValueError
    on anything else (interlace, palette, 16-bit) instead of guessing.
    """
    if blob[:8] != PNG_MAGIC:
        raise ValueError("not a PNG: bad signature")
    pos, width = 8, None
    height = channels = None
    idat = bytearray()
    while pos < len(blob):
        try:
            (length,) = struct.unpack_from(">I", blob, pos)
            tag = blob[pos + 4 : pos + 8]
            body = blob[pos + 8 : pos + 8 + length]
            (crc,) = struct.unpack_from(">I", blob, pos + 8 + length)
        except struct.error as e:  # truncated mid-chunk
            raise ValueError(f"truncated PNG chunk stream: {e}") from e
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color not in _CHANNELS:
                raise ValueError(f"unsupported PNG: depth={depth} color={color}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
            channels = _CHANNELS[color]
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG payload size mismatch")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for x in range(channels, stride):
                line[x] = (line[x] + line[x - channels]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = line[x - channels] if x >= channels else 0
                line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = line[x - channels] if x >= channels else 0
                ul = prev[x - channels] if x >= channels else 0
                line[x] = (line[x] + _paeth(left, prev[x], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, channels, bytes(out)


def wav_encode(
    pcm: bytes, sample_rate: int = 8000, n_channels: int = 1, sampwidth: int = 1
) -> bytes:
    """Encode raw PCM as a real WAV container (RIFF/fmt/data)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        w.writeframes(pcm)
    return buf.getvalue()


def wav_decode(blob: bytes) -> tuple[int, int, int, bytes]:
    """Decode a WAV: (sample_rate, n_channels, n_frames, pcm bytes)."""
    if blob[:4] != WAV_MAGIC:
        raise ValueError("not a WAV: bad RIFF signature")
    try:
        with wave.open(io.BytesIO(blob), "rb") as w:
            return (
                w.getframerate(),
                w.getnchannels(),
                w.getnframes(),
                w.readframes(w.getnframes()),
            )
    except (wave.Error, EOFError) as e:  # malformed RIFF body
        raise ValueError(f"malformed WAV: {e}") from e
