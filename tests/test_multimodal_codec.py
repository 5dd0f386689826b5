"""Real pure-stdlib codecs (functions/imagecodec.py) + their multimodal
operator seams: PNG encode/decode round-trip, every scanline filter
type, nearest-neighbor resize, WAV PCM, and the Spark mapInPandas paths
on real bytes."""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from kinesis_log_watcher_spark.functions.imagecodec import (
    PngError,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    resize_nearest,
)


def _rand_pixels(n: int, seed: int = 0) -> bytes:
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(n))


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip(channels):
    w, h = 13, 7  # non-power-of-two to catch stride bugs
    px = _rand_pixels(w * h * channels, seed=channels)
    data = encode_png(px, w, h, channels)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    gw, gh, gch, gpx = decode_png(data)
    assert (gw, gh, gch) == (w, h, channels)
    assert gpx == px


def _png_with_filters(px: bytes, w: int, h: int, ch: int, ftypes: list[int]) -> bytes:
    """Hand-build a PNG whose scanlines use the given filter types —
    exercises the decoder's unfilter paths our encoder (filter 0 only)
    never emits. Filtering per the spec: out = raw - predictor."""
    stride = w * ch
    raw = bytearray()
    prev = bytes(stride)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    for y in range(h):
        line = px[y * stride : (y + 1) * stride]
        ft = ftypes[y % len(ftypes)]
        raw.append(ft)
        for x in range(stride):
            left = line[x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) >> 1,
                    4: paeth(left, up, ul)}[ft]
            raw.append((line[x] - pred) & 0xFF)
        prev = line

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_decode_all_filter_types(ftypes):
    w, h, ch = 9, 10, 3
    px = _rand_pixels(w * h * ch, seed=42)
    data = _png_with_filters(px, w, h, ch, ftypes)
    gw, gh, gch, gpx = decode_png(data)
    assert (gw, gh, gch) == (w, h, ch)
    assert gpx == px


def test_png_multiple_idat_chunks():
    w, h, ch = 4, 4, 1
    px = _rand_pixels(w * h, seed=3)
    data = encode_png(px, w, h, ch)
    # split the single IDAT into two chunks; decoder must concatenate
    sig, rest = data[:8], data[8:]
    chunks = []
    pos = 0
    while pos < len(rest):
        (ln,) = struct.unpack(">I", rest[pos : pos + 4])
        chunks.append((rest[pos + 4 : pos + 8], rest[pos + 8 : pos + 8 + ln]))
        pos += 12 + ln
    out = bytearray(sig)

    def emit(ctype, body):
        out.extend(struct.pack(">I", len(body)) + ctype + body
                   + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    for ctype, body in chunks:
        if ctype == b"IDAT":
            mid = len(body) // 2
            emit(b"IDAT", body[:mid])
            emit(b"IDAT", body[mid:])
        else:
            emit(ctype, body)
    assert decode_png(bytes(out))[3] == px


def test_png_rejects_garbage_and_unsupported():
    with pytest.raises(PngError):
        decode_png(b"not a png at all")
    w, h = 2, 2
    px = _rand_pixels(w * h * 3, seed=5)
    data = bytearray(encode_png(px, w, h, 3))
    data[24] = 16  # IHDR bit depth byte → 16-bit
    with pytest.raises(PngError):
        decode_png(bytes(data))


def test_resize_nearest_exact_mapping():
    # 2x2 grey: upscale 4x4 duplicates each pixel into a 2x2 block
    px = bytes([10, 20, 30, 40])
    up = resize_nearest(px, 2, 2, 1, 4, 4)
    assert up == bytes([10, 10, 20, 20,
                        10, 10, 20, 20,
                        30, 30, 40, 40,
                        30, 30, 40, 40])
    # downscale picks top-left of each block
    assert resize_nearest(up, 4, 4, 1, 2, 2) == px


def test_wav_roundtrip():
    pcm = _rand_pixels(16000 * 2, seed=9)  # 1s of 16-bit mono
    data = encode_wav(pcm, channels=1, sample_width=2, frame_rate=16000)
    ch, sw, rate, n, got = decode_wav(data)
    assert (ch, sw, rate, n) == (1, 2, 16000, 16000)
    assert got == pcm
    with pytest.raises(ValueError):
        decode_wav(b"RIFFgarbage")


def test_real_decoders_through_spark_plumbing(spark):
    """The real PNG/WAV kernels through the actual mapInPandas operators
    on real bytes."""
    import pandas as pd

    from kinesis_log_watcher_spark.operators.multimodal import (
        decode_image,
        frame_samples,
        image_metadata,
        resize_image,
        resize_images,
        wav_frame_fn,
    )

    w, h, ch = 6, 5, 3
    rows = []
    for doc_id in range(20):
        px = _rand_pixels(w * h * ch, seed=doc_id)
        rows.append((doc_id, bytearray(encode_png(px, w, h, ch))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    meta = {r["doc_id"]: r for r in image_metadata(df, decode=decode_image).collect()}
    for doc_id in range(20):
        px = _rand_pixels(w * h * ch, seed=doc_id)
        m = meta[doc_id]
        assert (m["width"], m["height"], m["channels"]) == (w, h, ch)
        assert m["mean_val"] == pytest.approx(sum(px) / len(px) / 255.0)

    resized = resize_images(df, width=3, height=2, resize_fn=resize_image).collect()
    for r in resized:
        gw, gh, gch, gpx = decode_png(bytes(r["resized"]))
        assert (gw, gh, gch) == (3, 2, ch)
        src = _rand_pixels(w * h * ch, seed=r["doc_id"])
        assert gpx == resize_nearest(src, w, h, ch, 3, 2)

    wav_rows = [
        (i, bytearray(encode_wav(_rand_pixels(256, seed=i)))) for i in range(5)
    ]
    wdf = spark.createDataFrame(wav_rows, "doc_id long, payload binary")
    frames = frame_samples(wdf, frame_bytes=32, stride=2, frame_fn=wav_frame_fn)
    got = frames.groupBy("doc_id").count().collect()
    # 256 bytes PCM → 8 frames of 32 → every 2nd sampled → 4 per doc
    assert {r["doc_id"]: r["count"] for r in got} == {i: 4 for i in range(5)}


def test_wav_frame_energies_exact():
    import struct

    from kinesis_log_watcher_spark.functions.imagecodec import encode_wav
    from kinesis_log_watcher_spark.operators.multimodal import (
        wav_frame_energies,
    )

    samples = [0, 3, -4, 100, -100, 1, 2, -2]  # two 4-sample frames
    pcm = b"".join(struct.pack("<h", s) for s in samples)
    wav = encode_wav(pcm, channels=1, sample_width=2, frame_rate=8000)
    got = wav_frame_energies(wav, samples_per_frame=4)
    assert got == [
        (0, 0 + 9 + 16 + 10000),
        (1, 10000 + 1 + 4 + 4),
    ]
    # trailing partial frame is dropped
    assert wav_frame_energies(wav, samples_per_frame=3) == [
        (0, 0 + 9 + 16),
        (1, 10000 + 10000 + 1),
    ]
