"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — binary columns move through
Arrow record batches into Pandas UDFs (`mapInPandas`), the schema is
typed, and the batch shape is what a decoder needs. The *decoders*
themselves are stubbed: the image/audio libraries are not in this
container, so `decode_image`/`decode_audio` raise NotImplementedError and
the deterministic `fake_image_meta` path stands in for them in tests and
oracle-checked queries (its outputs are pure arithmetic on the byte
length, so a SQL oracle can verify the plumbing end-to-end).

Scale: mapInPandas streams Arrow batches per partition — no row-at-a-time
Python, no driver involvement; a 100 TB binary column processes as
N-partitions × batched decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width bigint, height bigint, "
    "channels bigint, mean_val double"
)


def decode_image(payload: bytes):  # pragma: no cover - stub
    """REAL decoder stub: needs an image library (PIL/cv2) not present in
    this environment. The mapInPandas plumbing around it is tested via
    fake_image_meta."""
    raise NotImplementedError(
        "image decoding requires an imaging library; install one and swap "
        "this stub into image_metadata(decode=...)"
    )


def fake_image_meta(payload: bytes) -> tuple[int, int, int, int, float]:
    """Deterministic stand-in decoder: metadata derived arithmetically
    from the payload length (so a SQL oracle can reproduce it)."""
    n = len(payload)
    return n, 64 + n % 512, 64 + (7 * n) % 512, 3, (n % 256) / 255.0


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a multimodal table: the text bytes stand in for an encoded
    image blob (`binary` column + passthrough metadata)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def image_metadata(df: DataFrame, decode=fake_image_meta) -> DataFrame:
    """Extract typed metadata from a binary column via mapInPandas.

    Arrow moves (doc_id, payload) batches to Python; each batch is decoded
    vectorized-ish (per element, but batched transfer); output is a typed
    struct per row. Swap ``decode`` for a real decoder when available."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                metas, columns=["n_bytes", "width", "height", "channels", "mean_val"]
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return df.select("doc_id", "payload").mapInPandas(extract, IMAGE_META_SCHEMA)
