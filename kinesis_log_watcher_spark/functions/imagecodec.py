"""Pure-stdlib image/audio codecs for the multimodal operators.

The container ships no imaging library, but a REAL (not stand-in) decoder
is still possible from the standard library alone:

- PNG (public spec, RFC 2083 / W3C PNG): a PNG is zlib-compressed
  scanlines, each prefixed by one of five filter bytes. ``zlib`` +
  ``struct`` implement the whole core — chunk walk, IDAT inflate,
  per-scanline unfilter (None/Sub/Up/Average/Paeth) — for 8-bit
  greyscale / grey+alpha / RGB / RGBA, non-interlaced (the overwhelming
  majority of real PNGs; Adam7 is rejected explicitly).
- WAV: stdlib ``wave`` reads PCM frames directly.

These back ``operators.multimodal.decode_image / resize_image /
decode_audio`` (previously NotImplementedError stubs). They run inside
Arrow-batched ``mapInPandas`` workers — per-element Python over batched
transfer, the same execution shape a C decoder binding would have.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel (8-bit depth)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngError(ValueError):
    """Payload is not a decodable PNG (bad signature/structure or an
    unsupported variant: non-8-bit depth, palette, interlace)."""


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG → (width, height, channels, row-major 8-bit pixels).

    Supports color types 0 (grey), 2 (RGB), 4 (grey+alpha), 6 (RGBA) at
    bit depth 8, non-interlaced — filters 0-4 per the spec.
    """
    if len(data) < 8 or data[:8] != _PNG_SIG:
        raise PngError("not a PNG (bad signature)")
    pos = 8
    width = height = -1
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise PngError("truncated chunk")
        pos += 12 + length  # length + type + body + CRC
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise PngError(f"unsupported bit depth {depth}")
            if color not in _CHANNELS:
                raise PngError(f"unsupported color type {color}")
            if interlace != 0:
                raise PngError("interlaced (Adam7) PNGs unsupported")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width < 0:
        raise PngError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise PngError("pixel data length mismatch")
    out = bytearray(stride * height)
    prev_start = -1
    for y in range(height):
        fpos = y * (stride + 1)
        ftype = raw[fpos]
        line = bytearray(raw[fpos + 1 : fpos + 1 + stride])
        if ftype == 1:  # Sub
            for x in range(channels, stride):
                line[x] = (line[x] + line[x - channels]) & 0xFF
        elif ftype == 2:  # Up
            if prev_start >= 0:
                for x in range(stride):
                    line[x] = (line[x] + out[prev_start + x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = line[x - channels] if x >= channels else 0
                up = out[prev_start + x] if prev_start >= 0 else 0
                line[x] = (line[x] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = line[x - channels] if x >= channels else 0
                up = out[prev_start + x] if prev_start >= 0 else 0
                ul = out[prev_start + x - channels] if (
                    prev_start >= 0 and x >= channels
                ) else 0
                line[x] = (line[x] + _paeth(left, up, ul)) & 0xFF
        elif ftype != 0:
            raise PngError(f"bad filter type {ftype}")
        start = y * stride
        out[start : start + stride] = line
        prev_start = start
    return width, height, channels, bytes(out)


def encode_png(pixels: bytes, width: int, height: int, channels: int = 3) -> bytes:
    """Encode row-major 8-bit pixels → PNG (filter 0, one IDAT)."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color is None:
        raise PngError(f"unsupported channel count {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise PngError("pixel buffer does not match dimensions")
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw.extend(pixels[y * stride : (y + 1) * stride])

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def resize_nearest(
    pixels: bytes, width: int, height: int, channels: int,
    new_width: int, new_height: int,
) -> bytes:
    """Nearest-neighbor resample of row-major 8-bit pixels."""
    out = bytearray(new_width * new_height * channels)
    for ny in range(new_height):
        sy = min(ny * height // new_height, height - 1)
        src_row = sy * width * channels
        dst_row = ny * new_width * channels
        for nx in range(new_width):
            sx = min(nx * width // new_width, width - 1)
            s = src_row + sx * channels
            d = dst_row + nx * channels
            out[d : d + channels] = pixels[s : s + channels]
    return bytes(out)


def decode_wav(data: bytes) -> tuple[int, int, int, int, bytes]:
    """Decode a WAV → (channels, sample_width_bytes, frame_rate,
    n_frames, raw PCM frames) via stdlib ``wave``."""
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            return (
                w.getnchannels(),
                w.getsampwidth(),
                w.getframerate(),
                w.getnframes(),
                w.readframes(w.getnframes()),
            )
    except (wave.Error, EOFError) as e:
        raise ValueError(f"not a decodable WAV: {e}") from None


def encode_wav(
    pcm: bytes, channels: int = 1, sample_width: int = 2, frame_rate: int = 16000
) -> bytes:
    """Encode raw PCM frames → WAV bytes (test/fixture helper)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sample_width)
        w.setframerate(frame_rate)
        w.writeframes(pcm)
    return buf.getvalue()
