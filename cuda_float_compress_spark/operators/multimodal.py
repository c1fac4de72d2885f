"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The decode step is STUBBED (no image/audio libraries in this container):
``decode_image`` raises NotImplementedError unless ``fake=True``, in which
case a deterministic fake decoder stands in so the Spark-side plumbing —
schema, partitioning, UDF signature, batch shape — is real and tested.
The byte-level feature extractor (histogram/entropy) is real.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "url string, media_type string, n_bytes long, magic string, "
    "byte_entropy double, fake_width int, fake_height int"
)

_MAGICS = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"GIF8": "image/gif",
    b"RIFF": "audio/wav",
    b"OggS": "audio/ogg",
    b"\x1aE\xdf\xa3": "video/webm",
}


def sniff_media_type(payload: bytes) -> str:
    for magic, mt in _MAGICS.items():
        if payload[: len(magic)] == magic:
            return mt
    return "application/octet-stream"


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 array. STUB: real decoding needs
    an image library not present in this container."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an imaging library not present in this "
            "container; pass fake=True for the deterministic stand-in"
        )
    # deterministic fake: dimensions + pixels derived from the byte content
    h = 4 + (len(payload) % 13)
    w = 4 + (len(payload) % 17)
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def extract_media_features(
    df: DataFrame, url_col: str = "url", bin_col: str = "html", fake_decode: bool = True
) -> DataFrame:
    """mapInPandas over binary payloads: magic sniff, byte-entropy, fake
    decode dims. Arrow-batched; one numpy pass per batch, no per-row Python
    beyond the payload loop (payloads are opaque blobs)."""

    def feats(batches):
        for pdf in batches:
            urls = pdf[url_col]
            blobs = pdf[bin_col]
            rows = []
            for u, b in zip(urls, blobs):
                b = b if b is not None else b""
                if len(b):
                    counts = np.bincount(
                        np.frombuffer(b, dtype=np.uint8), minlength=256
                    ).astype(np.float64)
                    p = counts[counts > 0] / len(b)
                    entropy = float(-(p * np.log2(p)).sum())
                else:
                    entropy = 0.0
                img = decode_image(b, fake=fake_decode) if len(b) else None
                rows.append(
                    (
                        u,
                        sniff_media_type(b),
                        len(b),
                        b[:4].hex(),
                        round(entropy, 6),
                        img.shape[1] if img is not None else 0,
                        img.shape[0] if img is not None else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "media_type", "n_bytes", "magic",
                    "byte_entropy", "fake_width", "fake_height",
                ],
            )

    return df.select(url_col, bin_col).mapInPandas(feats, schema=MEDIA_META_SCHEMA)


def frame_sample_plan(df: DataFrame, url_col: str = "url", bin_col: str = "html",
                      every_n: int = 10) -> DataFrame:
    """Video frame-sampling PLAN: emits (url, frame_idx) rows for a stubbed
    downstream decoder — demonstrates the explode/partition shape without the
    codec. Frame count is faked deterministically from payload size."""
    n_frames = (F.octet_length(F.col(bin_col)) / 1024 + 1).cast("int")
    return df.select(
        F.col(url_col),
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).filter(F.col("frame_idx") % every_n == 0)
