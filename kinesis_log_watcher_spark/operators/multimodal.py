"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — binary columns move through
Arrow record batches into Pandas UDFs (`mapInPandas`), the schema is
typed, and the batch shape is what a decoder needs.

The decoders are real too, within what the standard library can express
(no imaging package ships in this container): ``decode_image`` /
``resize_image`` decode and nearest-neighbor-resample actual PNGs
(functions/imagecodec.py implements the public PNG spec — zlib inflate +
the five scanline filters), and ``decode_audio`` reads WAV PCM via
stdlib ``wave``. Formats beyond PNG/WAV (JPEG, MP3, H.264 …) need a
native library and raise ValueError → the row lands on the error path,
exactly like a corrupt blob. The REAL kernels are the defaults
(``image_metadata(decode=decode_image)``,
``resize_images(resize_fn=resize_image)``); the deterministic ``fake_*``
kernels are explicitly-named stand-ins for plumbing checks whose DuckDB
oracle must reproduce the kernel arithmetically (a SQL oracle can't run
a PNG codec) — swapped in via the same ``decode=`` / ``resize_fn=`` /
``frame_fn=`` seams.

Scale: mapInPandas streams Arrow batches per partition — no row-at-a-time
Python, no driver involvement; a 100 TB binary column processes as
N-partitions × batched decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_log_watcher_spark.functions.imagecodec import (
    decode_png,
    decode_wav,
    encode_png,
    resize_nearest,
)

IMAGE_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width bigint, height bigint, "
    "channels bigint, mean_val double"
)


def decode_image(payload: bytes) -> tuple[int, int, int, int, float]:
    """REAL image decoder (PNG, pure stdlib — functions/imagecodec.py):
    returns (n_bytes, width, height, channels, mean pixel value in
    [0, 1]). Non-PNG payloads raise ValueError (the corrupt-blob path).
    Swap into ``image_metadata(decode=decode_image)``."""
    width, height, channels, pixels = decode_png(payload)
    mean = (sum(pixels) / len(pixels)) / 255.0 if pixels else 0.0
    return len(payload), width, height, channels, mean


def fake_image_meta(payload: bytes) -> tuple[int, int, int, int, float]:
    """Deterministic stand-in decoder: metadata derived arithmetically
    from the payload length (so a SQL oracle can reproduce it)."""
    n = len(payload)
    return n, 64 + n % 512, 64 + (7 * n) % 512, 3, (n % 256) / 255.0


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a multimodal table: the text bytes stand in for an encoded
    image blob (`binary` column + passthrough metadata)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """REAL image resize (PNG in → PNG out): decode, nearest-neighbor
    resample on actual pixels, re-encode. Same signature as fake_resize;
    swap into ``resize_images(resize_fn=resize_image)``."""
    w, h, ch, pixels = decode_png(payload)
    return encode_png(resize_nearest(pixels, w, h, ch, width, height),
                      width, height, ch)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in resize kernel: nearest-neighbor-style byte
    subsample/pad of the payload to exactly width*height bytes (what a
    real kernel does to pixels, done to raw bytes so tests can verify
    the plumbing end to end without an imaging lib)."""
    target = width * height
    if not payload:
        return bytes(target)
    if len(payload) >= target:
        step = len(payload) / target
        return bytes(payload[int(i * step)] for i in range(target))
    reps = -(-target // len(payload))
    return (payload * reps)[:target]


RESIZED_SCHEMA = "doc_id bigint, resized binary, n_bytes_out bigint"


def resize_images(
    df: DataFrame, width: int = 16, height: int = 16, resize_fn=resize_image
) -> DataFrame:
    """Batch image resize over a binary column: binary in → binary out
    through one mapInPandas stage (Arrow both directions). The default
    kernel is the REAL PNG resample (resize_image); pass
    ``resize_fn=fake_resize`` for the SQL-reproducible byte stand-in.
    Narrow map, no shuffle; chains with image_metadata/frame_samples on
    the same partitioning."""

    def transform(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [resize_fn(p, width, height) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "resized": resized,
                    "n_bytes_out": [len(r) for r in resized],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(transform, RESIZED_SCHEMA)


def decode_audio(payload: bytes) -> tuple[int, int, int, int, bytes]:
    """REAL audio decoder (WAV/PCM via stdlib ``wave``): returns
    (channels, sample_width, frame_rate, n_frames, pcm). Non-WAV
    payloads raise ValueError. Compressed formats (MP3/AAC/…) need a
    native codec library."""
    return decode_wav(payload)


def wav_frame_fn(payload: bytes, frame_bytes: int, stride: int):
    """REAL frame extractor for WAV payloads: decodes the PCM stream,
    then windows it exactly like fake_frame_fn windows raw bytes — swap
    into ``frame_samples(frame_fn=wav_frame_fn)``."""
    _ch, _sw, _rate, _n, pcm = decode_wav(payload)
    return fake_frame_fn(pcm, frame_bytes, stride)


FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_md5 string"


def fake_frame_fn(payload: bytes, frame_bytes: int, stride: int):
    """Deterministic stand-in frame extractor: the payload is cut into
    fixed-size byte frames; every ``stride``-th frame is sampled and
    summarized by its md5 (what a real decoder would do with pixel/PCM
    frame content). SQL-reproducible via substr+md5."""
    import hashlib

    out = []
    n_frames = len(payload) // frame_bytes
    for i in range(0, n_frames, stride):
        chunk = payload[i * frame_bytes : (i + 1) * frame_bytes]
        out.append((i, hashlib.md5(chunk).hexdigest()))
    return out


def frame_samples(
    df: DataFrame, frame_bytes: int = 32, stride: int = 4, frame_fn=fake_frame_fn
) -> DataFrame:
    """Video/audio frame sampling over a binary column via mapInPandas:
    one input row fans out to its sampled frames (1→N), batched through
    Arrow. Swap ``frame_fn`` for a real decoder (frame_fn(payload, …) →
    [(frame_idx, digest)]). Narrow map — scales with input partitions,
    no shuffle; a downstream per-frame model step would chain another
    mapInPandas over the same partitioning."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            digests: list[str] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for idx, digest in frame_fn(payload, frame_bytes, stride):
                    ids.append(doc_id)
                    idxs.append(idx)
                    digests.append(digest)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_md5": digests}
            )

    return df.select("doc_id", "payload").mapInPandas(extract, FRAME_SCHEMA)


def image_metadata(df: DataFrame, decode=decode_image) -> DataFrame:
    """Extract typed metadata from a binary column via mapInPandas.

    Arrow moves (doc_id, payload) batches to Python; each batch is decoded
    vectorized-ish (per element, but batched transfer); output is a typed
    struct per row. The default decoder is the REAL PNG codec
    (decode_image); pass ``decode=fake_image_meta`` for the
    SQL-reproducible arithmetic stand-in."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                metas, columns=["n_bytes", "width", "height", "channels", "mean_val"]
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return df.select("doc_id", "payload").mapInPandas(extract, IMAGE_META_SCHEMA)


ENERGY_SCHEMA = "doc_id bigint, frame_idx bigint, energy bigint"


def wav_frame_energies(payload: bytes, samples_per_frame: int):
    """REAL per-frame energy extractor: decode the WAV, reinterpret the
    PCM stream as little-endian int16 samples, cut into fixed-size
    frames, and return [(frame_idx, sum(sample^2))] — exact int64 (the
    max |int16| squared times any sane frame length stays far under
    2^63). The feature step a VAD / loudness gate runs before keeping
    or dropping audio for training."""
    import numpy as np

    _ch, sw, _rate, _n, pcm = decode_wav(payload)
    if sw != 2:
        raise ValueError(f"int16 PCM expected, got sample_width={sw}")
    samples = np.frombuffer(pcm, dtype="<i2").astype(np.int64)
    n_frames = len(samples) // samples_per_frame
    out = []
    for i in range(n_frames):
        frame = samples[i * samples_per_frame : (i + 1) * samples_per_frame]
        out.append((i, int((frame * frame).sum())))
    return out


def frame_energies(df: DataFrame, samples_per_frame: int = 16) -> DataFrame:
    """Per-frame audio energy over a binary WAV column via mapInPandas
    (Arrow-batched, 1→N fan-out, narrow map — same seam as
    frame_samples). Downstream aggregation (peak frame, total energy,
    silence gating) happens in Spark relational ops, so the Python stage
    stays a pure per-payload feature kernel."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            energies: list[int] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for idx, en in wav_frame_energies(payload, samples_per_frame):
                    ids.append(doc_id)
                    idxs.append(idx)
                    energies.append(en)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "energy": energies}
            )

    return df.select("doc_id", "payload").mapInPandas(extract, ENERGY_SCHEMA)
