"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

REAL decoders (pure numpy, no external libs): uncompressed 24-bit BMP,
binary PPM (P6), PCM-16 WAV, 8-bit PNG (zlib + all five scanline filters),
baseline + progressive JPEG (huffman + IDCT + chroma upsample —
operators/jpeg.py), and lossless WebP (VP8L: prefix codes, LZ77, color
cache, all four transforms — operators/webp.py).
Remaining compressed formats (lossy-VP8 WebP, AVIF, OGG/WebM) would need
codec libraries not present in this container; for those ``decode_image``
raises NotImplementedError unless ``fake=True``, in which case a
deterministic fake decoder stands in so the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — stays real and tested. The
byte-level feature extractor (histogram/entropy) is real for every format.
"""

from __future__ import annotations

import struct

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
    b"BM": "image/bmp",
    b"P6": "image/x-portable-pixmap",
    b"OggS": "audio/ogg",
    b"\x1aE\xdf\xa3": "video/webm",
}


def sniff_media_type(payload: bytes) -> str:
    if payload[:4] == b"RIFF":  # container family: subtype at offset 8
        sub = payload[8:12]
        if sub == b"WEBP":
            return "image/webp"
        if sub == b"AVI ":
            return "video/x-msvideo"
        if sub == b"WAVE":
            return "audio/wav"
        # other RIFF families (RMID, CDDA, ANI, ...) are not audio — fall
        # through to the unknown path rather than mislabel them
        return "application/octet-stream"
    for magic, mt in _MAGICS.items():
        if payload[: len(magic)] == magic:
            return mt
    return "application/octet-stream"


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER) -> HxWx3 RGB uint8.
    Rows are 4-byte padded, stored bottom-up (negative height = top-down),
    pixels BGR."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    need = data_off + row_bytes * h
    if len(payload) < need:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h,
                         offset=data_off).reshape(h, row_bytes)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 RGB uint8 -> uncompressed 24-bit BMP bytes (test/fixture twin
    of decode_bmp)."""
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                      2835, 2835, 0, 0)
    return header + dib + data


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> HxWx3 RGB uint8."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header: P6 <w> <h> <maxval> single-whitespace-delimited (comments ok)
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval=255 PPM supported")
    need = pos + w * h * 3
    if len(payload) < need:
        raise ValueError("truncated PPM payload")
    return np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                         offset=pos).reshape(h, w, 3).copy()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM-16 WAV -> (samples[n, channels] int16, sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:  # truncated fmt chunk — malformed, not fatal
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"only PCM-16 supported (fmt={audio_fmt}, bits={bits})")
    if channels == 0:
        raise ValueError("fmt declares 0 channels")
    samples = np.frombuffer(data, dtype="<i2")
    if len(samples) % channels:
        raise ValueError("data chunk not a whole number of frames")
    return samples.reshape(-1, channels), rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n, channels) int16 -> PCM-16 WAV bytes (test/fixture twin)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    channels = samples.shape[1]
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# hard cap on the inflated scanline buffer (256 MB ~ a 9000x9000 RGBA image);
# anything claiming more is hostile or out of scope for this decoder
_MAX_PNG_RAW_BYTES = 1 << 28


def _paeth_scalar(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (spec 9.4): nearest of left/up/up-left to a+b-c,
    ties breaking left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> np.ndarray:
    """Pure-numpy+zlib PNG decode -> HxWx3 uint8 (no imaging library).

    Supports the web-dominant profile: 8-bit depth, color types 0 (gray),
    2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced, all five
    scanline filters. Alpha is dropped (pipelines downstream are RGB).
    Filters None/Sub/Up are fully vectorized per row (Sub is a per-lane
    cumsum mod 256); Average/Paeth rows carry a true sequential dependence
    on the reconstructed left neighbor, so those rows fall back to a
    per-byte loop — bounded per row, and rare in practice for fixture-scale
    payloads this decoder serves."""
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    plte = None
    idat = []
    n = len(payload)
    while pos + 8 <= n:
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated PNG chunk")
        if typ == b"IHDR":
            if len(body) != 13:
                raise ValueError(f"bad IHDR length {len(body)}")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"PLTE":
            if len(body) % 3:
                raise ValueError("bad PLTE length")
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        pos += 12 + ln  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, bit, color, comp, filt_method, interlace = ihdr
    if bit != 8 or comp != 0 or filt_method != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (bit={bit}, interlace={interlace}) — only "
            "8-bit non-interlaced is implemented"
        )
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if nch is None:
        raise ValueError(f"unsupported PNG color type {color}")
    if color == 3 and plte is None:
        raise ValueError("palette PNG without PLTE")
    stride = w * nch
    expected = h * (stride + 1)
    # Bound the decompression BY the IHDR-derived size BEFORE inflating:
    # zlib expands up to ~1000x, so a small malicious/corrupt PNG could
    # otherwise allocate gigabytes here and OOM the executor — memory
    # exhaustion is not catchable by the row-skip try/except in
    # image_thumbnails/media features. decompressobj(max_length) caps the
    # output buffer; one extra probe byte detects oversized streams.
    if expected > _MAX_PNG_RAW_BYTES:
        raise ValueError(
            f"PNG dimensions {w}x{h}x{nch} exceed the decoder cap "
            f"({expected} > {_MAX_PNG_RAW_BYTES} raw bytes)"
        )
    try:
        dec = zlib.decompressobj()
        raw = dec.decompress(b"".join(idat), expected)
        extra = dec.decompress(dec.unconsumed_tail, 1) if not dec.eof else b""
    except zlib.error as e:
        raise ValueError(f"corrupt IDAT stream: {e}") from None
    if extra:
        raise ValueError("IDAT stream larger than IHDR dimensions")
    if len(raw) != expected:
        raise ValueError("IDAT length does not match dimensions")
    rr = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes = rr[:, 0]
    rows = rr[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), np.uint8)
    zero_prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = int(ftypes[y])
        cur = rows[y]
        prev = out[y - 1].astype(np.int32) if y else zero_prev
        if f == 0:  # None
            rec = cur
        elif f == 1:  # Sub: recon = cumsum of filt per byte lane, mod 256
            rec = (np.cumsum(cur.reshape(w, nch), axis=0) & 0xFF).reshape(-1)
        elif f == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif f == 3:  # Average (sequential on recon-left)
            rec = np.empty(stride, np.int32)
            for x in range(stride):
                left = rec[x - nch] if x >= nch else 0
                rec[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth (sequential on recon-left)
            rec = np.empty(stride, np.int32)
            for x in range(stride):
                left = rec[x - nch] if x >= nch else 0
                ul = prev[x - nch] if x >= nch else 0
                rec[x] = (cur[x] + _paeth_scalar(int(left), int(prev[x]), int(ul))) & 0xFF
            # (per-byte loop: Paeth's left-neighbor dependence is inherently
            # sequential — bounded to this row)
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec.astype(np.uint8)
    arr = out.reshape(h, w, nch)
    if color == 2:
        return arr
    if color == 6:
        return arr[:, :, :3]  # drop alpha
    if color == 3:
        idx = arr[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        return plte[idx]
    # gray / gray+alpha -> replicate the luma channel
    return np.repeat(arr[:, :, :1], 3, axis=2)


def encode_png(img: np.ndarray, filters=None) -> bytes:
    """HxWx3 (or HxW) uint8 -> PNG bytes (test/fixture twin of decode_png).
    ``filters``: per-row filter type (int or list, default 0) — lets tests
    exercise every scanline filter; filtering uses the RECONSTRUCTED
    neighbors, so encode is fully vectorized."""
    import zlib

    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nch = img.shape
    color = {1: 0, 3: 2, 4: 6}[nch]
    rows = img.reshape(h, w * nch).astype(np.int32)
    stride = w * nch
    if filters is None:
        ftypes = [0] * h
    elif isinstance(filters, int):
        ftypes = [filters] * h
    else:
        ftypes = list(filters)
    lines = []
    for y in range(h):
        cur = rows[y]
        prev = rows[y - 1] if y else np.zeros(stride, np.int32)
        left = np.zeros(stride, np.int32)
        left[nch:] = cur[:-nch]
        ul = np.zeros(stride, np.int32)
        ul[nch:] = prev[:-nch]
        f = ftypes[y]
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - ((left + prev) >> 1)
        elif f == 4:
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            filt = cur - pred
        else:
            raise ValueError(f"bad filter type {f}")
        lines.append(bytes([f]) + (filt & 0xFF).astype(np.uint8).tobytes())
    raw = zlib.compress(b"".join(lines))

    def chunk(typ: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(typ + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + typ + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", raw)
        + chunk(b"IEND", b"")
    )


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 array. REAL for BMP 24-bit,
    PPM P6, PNG (8-bit, pure numpy+zlib — see decode_png), baseline +
    progressive JPEG (pure numpy huffman+IDCT — see operators/jpeg.py),
    and lossless WebP (VP8L, pure numpy — see operators/webp.py); lossy
    WebP (VP8) would need the VP8 intra decoder — pass fake=True for the
    deterministic stand-in (plumbing tests)."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:8] == _PNG_MAGIC:
        return decode_png(payload)
    if payload[:3] == b"\xff\xd8\xff":
        from cuda_float_compress_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from cuda_float_compress_spark.operators.webp import decode_webp

        return decode_webp(payload)
    if not fake:
        raise NotImplementedError(
            "unrecognized image format (lossy-WebP/AVIF/... would need "
            "codec libraries not present in this container); use "
            "BMP/PPM/PNG/JPEG/lossless-WebP payloads or fake=True"
        )
    # deterministic fake: dimensions + pixels derived from the byte content
    h = 4 + (len(payload) % 13)
    w = 4 + (len(payload) % 17)
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def resize_image(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy index gather) — the real resize
    step of an image-preprocessing pipeline (bilinear would change pixel
    values; nearest keeps them exact and deterministic)."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h // out_h).astype(np.int64)
    cols = (np.arange(out_w) * w // out_w).astype(np.int64)
    return img[rows[:, None], cols[None, :]]


def audio_features(payload: bytes) -> dict:
    """PCM-16 WAV features: duration, RMS, peak — the cheap quality signals
    an audio-corpus pipeline filters on."""
    samples, rate = decode_wav(payload)
    x = samples.astype(np.float64) / 32768.0
    return {
        "sample_rate": int(rate),
        "n_samples": int(samples.shape[0]),
        "channels": int(samples.shape[1]),
        "duration_sec": round(samples.shape[0] / rate, 6),
        "rms": round(float(np.sqrt((x * x).mean())) if x.size else 0.0, 6),
        "peak": round(float(np.abs(x).max()) if x.size else 0.0, 6),
    }


IMAGE_THUMB_SCHEMA = (
    "url string, width int, height int, thumb_w int, thumb_h int, "
    "mean_r double, mean_g double, mean_b double"
)


def image_thumbnails(
    df: DataFrame, url_col: str = "url", bin_col: str = "payload",
    thumb: int = 8,
) -> DataFrame:
    """mapInPandas image pipeline: REAL decode (BMP/PPM/PNG/baseline JPEG)
    -> nearest-neighbor resize -> per-channel means. Non-image payloads are
    skipped (a training pipeline routes by sniffed type first)."""

    def work(batches):
        for pdf in batches:
            rows = []
            for u, b in zip(pdf[url_col], pdf[bin_col]):
                b = b if b is not None else b""
                if (b[:2] not in (b"BM", b"P6") and b[:8] != _PNG_MAGIC
                        and bytes(b[:3]) != b"\xff\xd8\xff"):
                    continue
                try:
                    img = decode_image(bytes(b))
                except (ValueError, NotImplementedError, struct.error):
                    # malformed header bytes skip the row — one corrupt
                    # payload must not kill the Spark task
                    continue
                th = resize_image(img, thumb, thumb)
                m = th.reshape(-1, 3).mean(axis=0)
                rows.append((u, img.shape[1], img.shape[0], thumb, thumb,
                             round(float(m[0]), 4), round(float(m[1]), 4),
                             round(float(m[2]), 4)))
            yield pd.DataFrame(
                rows, columns=["url", "width", "height", "thumb_w", "thumb_h",
                               "mean_r", "mean_g", "mean_b"],
            )

    return df.select(url_col, bin_col).mapInPandas(work, schema=IMAGE_THUMB_SCHEMA)


VP8_QUALITY_SCHEMA = (
    "url string, width int, height int, y_ac_qi int, filter_level int, "
    "sharpness int, n_token_partitions int, segmentation boolean"
)


def vp8_quality_table(
    df: DataFrame, url_col: str = "url", bin_col: str = "payload"
) -> DataFrame:
    """mapInPandas over lossy-WebP payloads: parse the VP8 keyframe header
    (operators/webp.py parse_vp8_frame_header, RFC 6386 9.2-9.7) into a
    quality/decode-cost table — quantizer index is the compression-quality
    proxy a crawl pipeline filters on (high qi = heavily compressed, low
    visual quality), token-partition count bounds decode parallelism.
    Non-WebP / lossless / interframe / malformed rows are skipped."""

    def work(batches):
        from cuda_float_compress_spark.operators.webp import vp8_header_info

        for pdf in batches:
            rows = []
            for u, b in zip(pdf[url_col], pdf[bin_col]):
                b = bytes(b) if b is not None else b""
                if b[:4] != b"RIFF" or b[8:12] != b"WEBP":
                    continue
                try:
                    h = vp8_header_info(b)
                except (ValueError, NotImplementedError, struct.error):
                    continue
                rows.append((u, h["width"], h["height"], h["y_ac_qi"],
                             h["filter_level"], h["sharpness_level"],
                             h["n_token_partitions"],
                             bool(h["segmentation_enabled"])))
            yield pd.DataFrame(
                rows, columns=["url", "width", "height", "y_ac_qi",
                               "filter_level", "sharpness",
                               "n_token_partitions", "segmentation"],
            )

    return df.select(url_col, bin_col).mapInPandas(work, schema=VP8_QUALITY_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "url string, sample_rate int, n_samples int, channels int, "
    "duration_sec double, rms double, peak double"
)


def audio_feature_table(
    df: DataFrame, url_col: str = "url", bin_col: str = "payload"
) -> DataFrame:
    """mapInPandas audio pipeline over WAV payloads (real PCM-16 decode)."""

    def work(batches):
        for pdf in batches:
            rows = []
            for u, b in zip(pdf[url_col], pdf[bin_col]):
                b = bytes(b) if b is not None else b""
                if b[:4] != b"RIFF":
                    continue
                try:
                    f = audio_features(b)
                except (ValueError, struct.error):
                    # malformed RIFF (truncated header/fmt, bad sizes) skips
                    # the row — one bad payload must not kill the Spark task
                    continue
                rows.append((u, f["sample_rate"], f["n_samples"], f["channels"],
                             f["duration_sec"], f["rms"], f["peak"]))
            yield pd.DataFrame(
                rows, columns=["url", "sample_rate", "n_samples", "channels",
                               "duration_sec", "rms", "peak"],
            )

    return df.select(url_col, bin_col).mapInPandas(work, schema=AUDIO_FEATURES_SCHEMA)


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
                dims = None
                try:
                    img = decode_image(b, fake=fake_decode) if len(b) else None
                    if img is not None:
                        dims = (img.shape[1], img.shape[0])
                except (ValueError, NotImplementedError, struct.error):
                    img = None  # magic-like prefix on non-image bytes
                    # lossy WebP: pixels are out of decode scope, but the
                    # keyframe header carries real dimensions (RFC 6386
                    # uncompressed part) — report those instead of 0x0
                    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
                        from cuda_float_compress_spark.operators.webp import (
                            webp_dims,
                        )

                        try:
                            dims = webp_dims(b)
                        except (ValueError, NotImplementedError):
                            dims = None
                rows.append(
                    (
                        u,
                        sniff_media_type(b),
                        len(b),
                        b[:4].hex(),
                        round(entropy, 6),
                        dims[0] if dims is not None else 0,
                        dims[1] if dims is not None else 0,
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


# ---------------------------------------------------------------------------
# Video: MJPEG-in-AVI — REAL container walk + frame decode (no codec libs:
# each frame is a baseline/progressive JPEG our own decoder handles)
# ---------------------------------------------------------------------------

VIDEO_FRAME_SCHEMA = (
    "url string, frame_idx int, height int, width int, "
    "mean_luma double"
)


def iter_avi_frames(payload: bytes):
    """Yield (frame_idx, jpeg_bytes) for every video frame chunk ('##dc' /
    '##db') in an AVI 'movi' list — WITHOUT decoding, so samplers skip
    unwanted frames for free (the chunk walk is header arithmetic only).
    Malformed containers raise ValueError (row-skip contract)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")

    def walk(start: int, end: int):
        pos = start
        while pos + 8 <= end:
            cid = payload[pos:pos + 4]
            size = struct.unpack_from("<I", payload, pos + 4)[0]
            body_start = pos + 8
            if body_start + size > end:
                raise ValueError("truncated AVI chunk")
            yield cid, body_start, size
            pos = body_start + size + (size & 1)  # word alignment

    frame_idx = 0
    found_movi = False
    for cid, off, size in walk(12, len(payload)):
        if cid == b"LIST" and payload[off:off + 4] == b"movi":
            found_movi = True
            for scid, soff, ssize in walk(off + 4, off + size):
                if scid[2:4] in (b"dc", b"db"):
                    yield frame_idx, payload[soff:soff + ssize]
                    frame_idx += 1
    if not found_movi:
        raise ValueError("AVI payload has no movi list")


def decode_video_frames(payload: bytes, every_n: int = 1,
                        max_frames: int | None = None):
    """[(frame_idx, HxWx3 uint8)] for every ``every_n``-th MJPEG frame.
    Unsampled frames are never decoded (the sampling IS the scale story:
    at every_n=30 a pipeline touches ~3% of the decode work)."""
    from cuda_float_compress_spark.operators.jpeg import decode_jpeg

    out = []
    for idx, jpg in iter_avi_frames(payload):
        if idx % every_n:
            continue
        out.append((idx, decode_jpeg(jpg)))
        if max_frames is not None and len(out) >= max_frames:
            break
    return out


def sample_video_frames(df: DataFrame, url_col: str = "url",
                        bin_col: str = "payload",
                        every_n: int = 10) -> DataFrame:
    """REAL video frame sampling over an opaque binary column: decode every
    ``every_n``-th MJPEG frame of each AVI payload (pure-numpy JPEG
    decoder) and emit one feature row per sampled frame. Malformed or
    out-of-profile payloads are row-skips, never task failures — the same
    contract as extract_media_features."""
    import pandas as pd

    def sample(batches):
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf[url_col], pdf[bin_col]):
                if payload is None:
                    continue
                try:
                    frames = decode_video_frames(bytes(payload), every_n)
                except (ValueError, NotImplementedError):
                    continue  # skip bad payloads, keep the task alive
                for idx, img in frames:
                    # ITU-R BT.601 luma — one float per sampled frame
                    luma = (0.299 * img[:, :, 0].astype(np.float64)
                            + 0.587 * img[:, :, 1]
                            + 0.114 * img[:, :, 2]).mean()
                    rows.append((url, idx, img.shape[0], img.shape[1],
                                 float(luma)))
            yield pd.DataFrame(
                rows, columns=["url", "frame_idx", "height", "width",
                               "mean_luma"],
            )

    return df.select(url_col, bin_col).mapInPandas(
        sample, schema=VIDEO_FRAME_SCHEMA
    )


def encode_avi_mjpeg(frames, fps: int = 10, quality: int = 90) -> bytes:
    """Test/fixture twin: HxWx3 uint8 frames -> a real MJPEG AVI container
    (RIFF hdrl/avih + strl/strh/strf + movi with '00dc' JPEG chunks)."""
    from cuda_float_compress_spark.operators.jpeg import encode_jpeg

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    jpgs = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(cid: bytes, body: bytes) -> bytes:
        out = cid + struct.pack("<I", len(body)) + body
        if len(body) & 1:
            out += b"\x00"
        return out

    def lst(four_cc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", four_cc + body)

    avih = struct.pack(
        "<14I", 1_000_000 // fps, 0, 0, 0x10, len(jpgs), 0, 1, 0,
        w, h, 0, 0, 0, 0,
    )
    strh = (b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(jpgs), 0, 0, 0, 0,
    ))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpgs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
