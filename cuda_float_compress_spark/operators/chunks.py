"""Typed column-chunk encode/decode: the bridge between Arrow record batches
and the numpy codec kernels.

Works directly on Arrow buffers where possible (string/binary columns encode
from the offsets+data buffers with zero Python-object materialization — the
Spark analog of the reference's register-resident hot loop,
src/cuszplus_f32.cu:375). Null handling is engine-level: a zstd'd validity
bitmap section wraps the non-null payload, mirroring how the reference keeps
its format concerns (padding, header) out of the core transform.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from cuda_float_compress_spark.codecs import core, select

# ---------------------------------------------------------------------------
# ptype: the engine's logical type tag (stored per block row in the manifest)
# ---------------------------------------------------------------------------


def ptype_of(arrow_type: pa.DataType) -> str:
    if pa.types.is_string(arrow_type) or pa.types.is_large_string(arrow_type):
        return "string"
    if pa.types.is_binary(arrow_type) or pa.types.is_large_binary(arrow_type):
        return "binary"
    if pa.types.is_timestamp(arrow_type):
        # Spark TimestampType arrives tz-aware; TimestampNTZType naive.
        # Reject what the us-precision round-trip contract cannot represent
        # bit-identically (ns-unit would truncate)
        if arrow_type.unit != "us":
            raise TypeError(
                f"timestamp unit '{arrow_type.unit}' is not the codec's us "
                "domain (ns would truncate, s/ms would change the schema on "
                "decode); cast to us first"
            )
        # Arrow tz-aware timestamps store UTC-normalized instants by spec;
        # the tz string is DISPLAY metadata (Spark stamps the session tz on
        # Arrow batches). Instants round-trip bit-identical for ANY tz — the
        # decoded schema says UTC, which Spark re-renders in session tz.
        return "timestamp_us" if arrow_type.tz is not None else "timestamp_ntz"
    if pa.types.is_int64(arrow_type):
        return "int64"
    if pa.types.is_int32(arrow_type):
        return "int32"
    if pa.types.is_float32(arrow_type):
        return "float32"
    if pa.types.is_float64(arrow_type):
        return "float64"
    if pa.types.is_date32(arrow_type):
        return "date32"
    if (pa.types.is_list(arrow_type) or pa.types.is_large_list(arrow_type)) and (
        pa.types.is_float32(arrow_type.value_type)
    ):
        return "list_float32"
    raise TypeError(f"unsupported column type: {arrow_type}")


def arrow_type_for(ptype: str) -> pa.DataType:
    return {
        "string": pa.large_string(),
        "binary": pa.large_binary(),
        "timestamp_us": pa.timestamp("us", tz="UTC"),  # Spark TimestampType over Arrow
        "timestamp_ntz": pa.timestamp("us"),
        "int64": pa.int64(),
        "int32": pa.int32(),
        "float32": pa.float32(),
        "float64": pa.float64(),
        "date32": pa.date32(),
        "list_float32": pa.list_(pa.float32()),
    }[ptype]


# ---------------------------------------------------------------------------
# Arrow <-> (lengths, data) / numpy extraction
# ---------------------------------------------------------------------------


_EMPTY_U8 = np.empty(0, dtype=np.uint8)


def _bytes_ld(arr: pa.Array, with_data: bool = True) -> tuple[np.ndarray, object]:
    """(lengths[-1=null], concatenated data) from a string/binary array,
    via buffers (no per-item Python objects). ``data`` is a ZERO-COPY
    np.uint8 view into the Arrow buffer whenever the values are already
    contiguous (a fresh copy only on the null-slots-hold-bytes repack
    path) — every consumer (zstd/lz4 via pa.Codec, pack_sections' join,
    np.frombuffer, pa.py_buffer) takes buffer-protocol objects, so the
    old per-column ``.tobytes()`` copy was pure overhead on the encode
    hot path. ``with_data=False`` skips the data entirely (lengths-only
    callers like raw_size_of)."""
    if not (
        pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type)
    ):
        arr = arr.cast(
            pa.large_string() if pa.types.is_string(arr.type) else pa.large_binary()
        )
    if isinstance(arr, pa.ChunkedArray):
        # chunk(0) is zero-copy; combine_chunks copies even for one chunk
        arr = arr.chunk(0) if arr.num_chunks == 1 else arr.combine_chunks()
    n = len(arr)
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64, count=n + 1, offset=arr.offset * 8)
    lengths = np.diff(offsets).astype(np.int64)
    data_buf = bufs[2]
    if arr.null_count:
        valid = np.array(arr.is_valid(), dtype=bool)
        if (lengths[~valid] != 0).any():
            marked = np.where(valid, lengths, -1)
            if not with_data:
                return marked, None
            # a VALID Arrow array may keep bytes under null slots (sliced /
            # externally-built buffers); slicing offsets[0]:offsets[-1] would
            # then misalign every value after the null — repack instead
            data_np = np.frombuffer(data_buf, dtype=np.uint8)
            starts = offsets[:-1][valid]
            lens_sel = lengths[valid]
            total = int(lens_sel.sum())
            if total:
                cs = np.zeros(len(lens_sel), dtype=np.int64)
                np.cumsum(lens_sel[:-1], out=cs[1:])
                within = np.arange(total, dtype=np.int64) - np.repeat(cs, lens_sel)
                data = data_np[np.repeat(starts, lens_sel) + within]
            else:
                data = _EMPTY_U8
            return marked, data
        lengths = np.where(valid, lengths, -1)
    if not with_data:
        return lengths, None
    if data_buf is not None and offsets[-1] > offsets[0]:
        data = np.frombuffer(data_buf, dtype=np.uint8)[
            offsets[0] : offsets[-1]
        ]
    else:
        data = _EMPTY_U8
    return lengths, data


def _ld_to_arrow(lengths: np.ndarray, data: bytes, ptype: str,
                 validated: bool = True) -> pa.Array:
    sizes = np.where(lengths >= 0, lengths, 0).astype(np.int64)
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])
    null_mask = lengths < 0
    validity = None
    if null_mask.any():
        validity = pa.py_buffer(np.packbits(~null_mask, bitorder="little").tobytes())
    # large_string shares large_binary's buffer layout; building it directly
    # skips the cast's UTF8 validation pass (~13% of the 1-core decode floor).
    # Safe WHEN the payload's integrity was established (crc32 verified, or
    # the caller opted out for a trusted read): the data buffer is then our
    # own encoder's output, which only ever stored bytes from a valid Arrow
    # string column. LEGACY tables carry no crc — there a storage bit-flip
    # could otherwise smuggle invalid UTF-8 into an Arrow string array, so
    # the validating cast stays on that path (validated=False).
    if ptype == "string" and not validated:
        binary = pa.Array.from_buffers(
            pa.large_binary(), len(lengths),
            [validity, pa.py_buffer(offsets), pa.py_buffer(data)],
            null_count=int(null_mask.sum()),
        )
        return binary.cast(pa.large_string())  # raises ArrowInvalid on rot
    at = pa.large_string() if ptype == "string" else pa.large_binary()
    return pa.Array.from_buffers(
        at,
        len(lengths),
        # py_buffer(offsets) wraps the numpy array zero-copy (and holds a
        # reference); .tobytes() would add a full extra pass over offsets
        [validity, pa.py_buffer(offsets), pa.py_buffer(data)],
        null_count=int(null_mask.sum()),
    )


def _numeric_values_and_validity(arr: pa.Array, np_dtype) -> tuple[np.ndarray, np.ndarray | None]:
    if arr.null_count:
        valid = np.array(arr.is_valid(), dtype=bool)
        vals = arr.drop_null().to_numpy(zero_copy_only=False).astype(np_dtype, copy=False)
        return vals, valid
    return arr.to_numpy(zero_copy_only=False).astype(np_dtype, copy=False), None


def _wrap_nulls(payload: bytes, valid: np.ndarray | None) -> bytes:
    if valid is None:
        return payload
    bitmap = np.packbits(valid, bitorder="little").tobytes()
    return core.pack_sections(core.zstd_compress(bitmap), payload)


def _unwrap_nulls(payload: bytes, n: int, n_nulls: int) -> tuple[bytes, np.ndarray | None]:
    if n_nulls == 0:
        return payload, None
    bm_buf, inner = core.unpack_sections(payload)
    bitmap = core.zstd_decompress(bm_buf, (n + 7) // 8)
    valid = np.unpackbits(
        np.frombuffer(bitmap, dtype=np.uint8), bitorder="little", count=n
    ).astype(bool)
    return inner, valid


# ---------------------------------------------------------------------------
# Column-chunk encode/decode
# ---------------------------------------------------------------------------


def string_prefix64(v) -> int | None:
    """Order-preserving 7-byte big-endian prefix of a string/bytes value, as
    a non-negative int64 — the zone-map domain for string columns. Monotone
    w.r.t. bytewise (UTF8String) order: s1 <= s2 implies prefix(s1) <=
    prefix(s2), so numeric [vmin, vmax] checks are conservatively sound for
    string predicates (chunks sharing a >7-byte prefix just don't prune)."""
    if v is None:
        return None
    b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
    return int.from_bytes(b[:7].ljust(7, b"\x00"), "big")


#: zone-map key for NaN: one above +inf's key — Spark orders NaN GREATER
#: than every other double, so a chunk containing NaN must report a vmax
#: that satisfies any ">= x" predicate (pruning stays conservative)
FLOAT_KEY_NAN = 9218868437227405312 + 1  # key(+inf) + 1


def float_key64(v) -> int | None:
    """Order-preserving map float -> int64 matching SPARK's total order
    (NaN greatest, -0.0 == 0.0) — the zone-map domain for float columns.
    Positive floats map to their raw bit pattern; negatives reflect below
    zero so more-negative values get smaller keys."""
    import math
    import struct

    if v is None:
        return None
    v = float(v)
    if math.isnan(v):
        return FLOAT_KEY_NAN
    if v == 0.0:
        v = 0.0  # -0.0 and +0.0 compare equal: one key
    bits = struct.unpack(">q", struct.pack(">d", v))[0]
    return bits if bits >= 0 else -(bits + (1 << 63)) - 1


def raw_size_of(arr: pa.Array, ptype: str) -> int:
    """Logical uncompressed size (value bytes, nulls free) for ratio metrics."""
    if ptype in ("string", "binary"):
        # lengths-only: computing the size must not copy the data buffer
        lengths, _ = _bytes_ld(arr, with_data=False)
        return int(np.where(lengths > 0, lengths, 0).sum())
    if ptype == "list_float32":
        flat = arr.flatten() if hasattr(arr, "flatten") else arr.values
        return 4 * len(flat) + 8 * len(arr)
    width = {"timestamp_us": 8, "timestamp_ntz": 8, "int64": 8, "int32": 4,
             "date32": 4, "float32": 4, "float64": 8}[ptype]
    return width * (len(arr) - arr.null_count)


def encode_column_chunk(
    arr: pa.Array, ptype: str, codec_override: str | None = None,
    profile: str = "ratio",
) -> tuple[str, bytes, str, int, int]:
    """-> (codec, payload, params_json, n, n_nulls).
    ``profile``: 'ratio' (default, zstd/FSST frontier) or 'throughput' (lz4
    bulk backend — see codecs/select.py). Selection only; decode reads the
    codec name from the manifest, so mixed-profile tables decode fine."""
    n = len(arr)
    n_nulls = arr.null_count

    if ptype in ("string", "binary"):
        lengths, data = _bytes_ld(arr)
        if codec_override:
            codec = codec_override
        else:
            codec = _select_bytes_ld(lengths, data, profile)
        payload, params = _LD_ENCODERS[codec](lengths, data)
        return codec, payload, _params_with_crc(params, payload), n, n_nulls

    if ptype in ("timestamp_us", "timestamp_ntz", "int64", "int32", "date32"):
        np_in = {"timestamp_us": "datetime64[us]", "timestamp_ntz": "datetime64[us]",
                 "int64": np.int64, "int32": np.int32, "date32": "datetime64[D]"}[ptype]
        vals, valid = _numeric_values_and_validity(arr, np_in)
        vals = vals.astype(np.int64) if vals.dtype != np.int64 else vals
        if vals.dtype.kind == "M":
            vals = vals.view(np.int64)
        with np.errstate(over="ignore"):
            if codec_override:
                codec = codec_override
                payload, params = core.INT_CODECS[codec][0](vals)
            else:
                codec, payload, params = select.select_and_encode_int(vals)
        payload = _wrap_nulls(payload, valid)
        return codec, payload, _params_with_crc(params, payload), n, n_nulls

    if ptype in ("float32", "float64"):
        np_dtype = np.float32 if ptype == "float32" else np.float64
        vals, valid = _numeric_values_and_validity(arr, np_dtype)
        if codec_override:
            codec = codec_override
            payload, params = core.FLOAT_CODECS[codec][0](vals)
        else:
            codec, payload, params = select.select_and_encode_float(
                vals, profile=profile
            )
        payload = _wrap_nulls(payload, valid)
        return codec, payload, _params_with_crc(params, payload), n, n_nulls

    if ptype == "list_float32":
        return _encode_list_float(arr, n, n_nulls)

    raise TypeError(f"unsupported ptype: {ptype}")


def _params_with_crc(params: dict, payload: bytes) -> str:
    """Serialize codec params with a crc32 of the FINAL payload bytes.
    zstd/lz4 frames carry no content checksum here, so a storage bit-flip
    can otherwise decompress into silently-wrong values — fatal to the
    bit-identity contract at 100 TB. ~2 GB/s on this host over the
    compressed (5-6x smaller) bytes = a few percent of decode. Old tables
    without the key still decode (check is skipped)."""
    import zlib

    params = dict(params)
    params["_crc"] = zlib.crc32(payload)
    return json.dumps(params)


class BlockIntegrityError(ValueError):
    """A block payload failed its crc32 — storage corruption, not a bug in
    the codec. Subclasses ValueError so the existing error contract holds."""


def decode_column_chunk(
    payload: bytes, codec: str, params_json: str, n: int, n_nulls: int,
    ptype: str, verify: bool = True
) -> pa.Array:
    """Decode one column chunk. Corruption anywhere — bad params JSON,
    checksum mismatch, truncated/garbled compressed sections — raises
    ValueError (BlockIntegrityError for checksum failures), never
    OSError/KeyError/struct.error: a reader must be able to catch one
    exception type and report WHICH block is bad.

    ``verify=False`` skips the crc32 pass (AND the UTF-8 validation it
    licenses) for TRUSTED local reads — e.g. re-reading bytes this process
    just wrote, or a measured kernel floor. The default stays on: at
    100 TB, storage rot is a when, not an if."""
    try:
        return _decode_column_chunk(payload, codec, params_json, n, n_nulls,
                                    ptype, verify)
    except (ValueError, TypeError):
        raise
    except Exception as e:
        raise ValueError(
            f"corrupted block payload (codec={codec}, ptype={ptype}): "
            f"{type(e).__name__}: {e}"
        ) from e


def _decode_column_chunk(
    payload: bytes, codec: str, params_json: str, n: int, n_nulls: int,
    ptype: str, verify: bool = True
) -> pa.Array:
    try:
        params = json.loads(params_json)
    except json.JSONDecodeError as e:
        raise ValueError(f"corrupted block params: {e}") from e
    crc = params.pop("_crc", None)
    integrity_checked = not verify  # caller vouches when verify=False
    if crc is not None and verify:
        import zlib

        if zlib.crc32(payload) != crc:
            raise BlockIntegrityError(
                f"block payload crc32 mismatch (codec={codec}, "
                f"ptype={ptype}, n={n}) — storage corruption"
            )
        integrity_checked = True

    if ptype in ("string", "binary"):
        lengths, data = _LD_DECODERS[codec](payload, params, n)
        return _ld_to_arrow(lengths, data, ptype,
                            validated=integrity_checked)

    if ptype in ("timestamp_us", "timestamp_ntz", "int64", "int32", "date32"):
        inner, valid = _unwrap_nulls(payload, n, n_nulls)
        vals = core.INT_CODECS[codec][1](inner, params, n - n_nulls)
        return _numeric_to_arrow(vals, valid, ptype, n)

    if ptype in ("float32", "float64"):
        inner, valid = _unwrap_nulls(payload, n, n_nulls)
        vals = core.FLOAT_CODECS[codec][1](inner, params, n - n_nulls)
        return _numeric_to_arrow(vals, valid, ptype, n)

    if ptype == "list_float32":
        return _decode_list_float(payload, params, n, n_nulls)

    raise TypeError(f"unsupported ptype: {ptype}")


def _numeric_to_arrow(vals: np.ndarray, valid: np.ndarray | None, ptype: str, n: int) -> pa.Array:
    at = arrow_type_for(ptype)
    if ptype in ("timestamp_us", "timestamp_ntz"):
        vals = vals.view("datetime64[us]")
    elif ptype == "date32":
        # astype, NOT view: datetime64[D] is 8 bytes — viewing an int32 days
        # array as it would halve the element count and scramble values
        vals = vals.astype("datetime64[D]")
    elif ptype == "int32":
        vals = vals.astype(np.int32)
    if valid is None:
        return pa.array(vals, type=at)
    full = np.zeros(n, dtype=vals.dtype)
    full[valid] = vals
    return pa.array(full, type=at, mask=~valid)


# --- (lengths, data) fast-path encoders sharing the list-codec wire format ---


def _ld_zstd_encode(lengths, data):
    len_payload, len_params = core.int_delta_encode(lengths)
    payload = core.pack_sections(len_payload, core.zstd_compress(data))
    return payload, {
        "l_first": len_params["first"], "l_width": len_params["width"],
        "data_size": len(data),
    }


def _ld_zstd_decode(payload, params, n):
    len_buf, data_buf = core.unpack_sections(payload)
    lengths = core.int_delta_decode(
        len_buf, {"first": params["l_first"], "width": params["l_width"]}, n
    )
    return lengths, core.zstd_decompress(data_buf, int(params["data_size"]))


def _ld_lz4_encode(lengths, data):
    len_payload, len_params = core.int_delta_encode(lengths)
    payload = core.pack_sections(len_payload, core.lz4_compress(data))
    return payload, {
        "l_first": len_params["first"], "l_width": len_params["width"],
        "data_size": len(data),
    }


def _ld_lz4_decode(payload, params, n):
    len_buf, data_buf = core.unpack_sections(payload)
    lengths = core.int_delta_decode(
        len_buf, {"first": params["l_first"], "width": params["l_width"]}, n
    )
    return lengths, core.lz4_decompress(data_buf, int(params["data_size"]))


def _ld_fsst_encode(lengths, data):
    symbols = core.fsst_train(data)
    enc = core.fsst_encode_bytes(data, symbols)
    len_payload, len_params = core.int_delta_encode(lengths)
    payload = core.pack_sections(
        len_payload, core.fsst_serialize_table(symbols), core.zstd_compress(enc)
    )
    return payload, {
        "l_first": len_params["first"], "l_width": len_params["width"],
        "enc_size": len(enc), "data_size": len(data),
    }


def _ld_fsst_decode(payload, params, n):
    len_buf, table_buf, enc_buf = core.unpack_sections(payload)
    lengths = core.int_delta_decode(
        len_buf, {"first": params["l_first"], "width": params["l_width"]}, n
    )
    symbols = core.fsst_deserialize_table(table_buf)
    enc = core.zstd_decompress(enc_buf, int(params["enc_size"]))
    return lengths, core.fsst_decode_bytes(enc, symbols)


def _ld_raw_encode(lengths, data):
    len_payload, len_params = core.int_delta_encode(lengths)
    payload = core.pack_sections(len_payload, data)
    return payload, {"l_first": len_params["first"], "l_width": len_params["width"]}


def _ld_raw_decode(payload, params, n):
    len_buf, data = core.unpack_sections(payload)
    lengths = core.int_delta_decode(
        len_buf, {"first": params["l_first"], "width": params["l_width"]}, n
    )
    return lengths, data


# --- dict / dict+RLE in the (lengths, data) domain: Arrow dictionary_encode
# for factorization (C++), ragged numpy gather for decode — no per-value
# Python anywhere (the round-1 hot-path fix). Wire format identical to the
# list-based core.bytes_dict/bytes_rle codecs.


def _ld_factorize(lengths: np.ndarray, data: bytes):
    arr = _ld_to_arrow(lengths, data, "binary")
    dd = arr.dictionary_encode()
    ind = dd.indices
    if ind.null_count:
        ind = ind.fill_null(-1)
    codes = ind.to_numpy(zero_copy_only=False).astype(np.int64)
    u_lengths, u_data = _bytes_ld(dd.dictionary)
    return codes, u_lengths, u_data


def _gather_ld(
    u_lengths: np.ndarray, u_data: bytes, codes: np.ndarray
) -> tuple[np.ndarray, bytes]:
    """Expand dictionary codes (0 = null, 1..card) to (lengths, data)."""
    if len(u_lengths) == 0:  # all-null chunk: empty dictionary, every code 0
        return np.full(len(codes), -1, dtype=np.int64), b""
    u_lengths = np.where(u_lengths >= 0, u_lengths, 0).astype(np.int64)
    u_starts = np.zeros(len(u_lengths), dtype=np.int64)
    if len(u_lengths) > 1:
        np.cumsum(u_lengths[:-1], out=u_starts[1:])
    out_lengths = np.where(
        codes == 0, np.int64(-1), u_lengths[np.maximum(codes - 1, 0)]
    )
    sel = codes[codes > 0] - 1
    lens_sel = u_lengths[sel]
    total = int(lens_sel.sum())
    if total == 0:
        return out_lengths, b""
    u_np = np.frombuffer(u_data, dtype=np.uint8)
    cs = np.zeros(len(lens_sel), dtype=np.int64)
    np.cumsum(lens_sel[:-1], out=cs[1:])
    within = np.arange(total, dtype=np.int64) - np.repeat(cs, lens_sel)
    data = u_np[np.repeat(u_starts[sel], lens_sel) + within].tobytes()
    return out_lengths, data


def _ld_dict_encode(lengths, data):
    codes, u_lengths, u_data = _ld_factorize(lengths, data)
    len_payload, len_params = core.int_delta_encode(u_lengths)
    dict_payload = core.pack_sections(len_payload, core.zstd_compress(u_data))
    codes_payload, codes_params = core.int_for_encode(codes + 1)  # 0 = null
    payload = core.pack_sections(dict_payload, codes_payload)
    return payload, {
        "card": len(u_lengths),
        "d_l_first": len_params["first"], "d_l_width": len_params["width"],
        "d_data_size": len(u_data),
        "c_ref": codes_params["ref"], "c_width": codes_params["width"],
    }


def _ld_dict_decode(payload, params, n):
    dict_buf, codes_buf = core.unpack_sections(payload)
    u_len_buf, u_data_buf = core.unpack_sections(dict_buf)
    card = int(params["card"])
    u_lengths = core.int_delta_decode(
        u_len_buf, {"first": params["d_l_first"], "width": params["d_l_width"]}, card
    )
    u_data = core.zstd_decompress(u_data_buf, int(params["d_data_size"]))
    codes = core.int_for_decode(
        codes_buf, {"ref": params["c_ref"], "width": params["c_width"]}, n
    )
    return _gather_ld(u_lengths, u_data, codes)


def _ld_rle_encode(lengths, data):
    codes, u_lengths, u_data = _ld_factorize(lengths, data)
    len_payload, len_params = core.int_delta_encode(u_lengths)
    dict_payload = core.pack_sections(len_payload, core.zstd_compress(u_data))
    codes_payload, codes_params = core.int_rle_encode(codes + 1)
    payload = core.pack_sections(dict_payload, codes_payload)
    return payload, {
        "card": len(u_lengths),
        "d_l_first": len_params["first"], "d_l_width": len_params["width"],
        "d_data_size": len(u_data),
        "r": codes_params,
    }


def _ld_rle_decode(payload, params, n):
    dict_buf, codes_buf = core.unpack_sections(payload)
    u_len_buf, u_data_buf = core.unpack_sections(dict_buf)
    card = int(params["card"])
    u_lengths = core.int_delta_decode(
        u_len_buf, {"first": params["d_l_first"], "width": params["d_l_width"]}, card
    )
    u_data = core.zstd_decompress(u_data_buf, int(params["d_data_size"]))
    codes = core.int_rle_decode(codes_buf, params["r"], n)
    return _gather_ld(u_lengths, u_data, codes)


_LD_ENCODERS = {
    "bytes_zstd": _ld_zstd_encode,
    "bytes_lz4": _ld_lz4_encode,
    "bytes_fsst": _ld_fsst_encode,
    "bytes_raw": _ld_raw_encode,
    "bytes_dict": _ld_dict_encode,
    "bytes_rle": _ld_rle_encode,
}
_LD_DECODERS = {
    "bytes_zstd": _ld_zstd_decode,
    "bytes_lz4": _ld_lz4_decode,
    "bytes_fsst": _ld_fsst_decode,
    "bytes_raw": _ld_raw_decode,
    "bytes_dict": _ld_dict_decode,
    "bytes_rle": _ld_rle_decode,
}


def _select_bytes_ld(
    lengths: np.ndarray, data: bytes, profile: str = "ratio"
) -> str:
    """Min-size codec selection from a value sample, without materializing
    the full chunk as Python objects. ``profile='throughput'`` swaps the
    zstd bulk codec for lz4 and drops the FSST trial (see codecs/select.py)."""
    base = "bytes_zstd" if profile == "ratio" else "bytes_lz4"
    n = len(lengths)
    if n == 0 or len(data) == 0:
        return base
    step = max(1, n // 256)
    sizes = np.where(lengths >= 0, lengths, 0)
    ends = np.cumsum(sizes)
    starts = ends - sizes
    idx = np.arange(0, n, step)
    sample = [
        # bytes() copies ~256 small values — required: np-view slices are
        # unhashable, and the trial codecs hash/compare sample items
        None if lengths[i] < 0 else bytes(data[starts[i] : ends[i]])
        for i in idx
    ]
    non_null = [s for s in sample if s is not None]
    card = len(set(non_null))
    cands = [base]
    if non_null and card <= max(1, len(non_null) // 2):
        cands += ["bytes_dict", "bytes_rle"]
    # FSST trial only when values are short-ish strings (its sweet spot);
    # long documents go straight to zstd which dominates there.
    elif (profile == "ratio" and non_null
          and (len(data) / max(1, len(non_null))) < 128):
        cands.append("bytes_fsst")
    if len(cands) == 1:
        return cands[0]
    best, best_size = None, None
    for name in cands:
        enc = core.BYTES_CODECS[name][0]
        size = len(enc(sample)[0])
        if best_size is None or size < best_size:
            best, best_size = name, size
    return best


# --- list<float32> (embedding vectors): offsets + flat values ---------------


def _encode_list_float(arr: pa.Array, n: int, n_nulls: int):
    arr = arr.cast(pa.list_(pa.float32()))
    if n_nulls:
        valid = np.array(arr.is_valid(), dtype=bool)
        arr_nn = arr.drop_null()
    else:
        valid = None
        arr_nn = arr
    offsets = np.array(arr_nn.offsets, dtype=np.int64)
    lengths = np.diff(offsets)
    flat = arr_nn.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
    len_payload, len_params = core.int_for_encode(lengths)
    val_codec, val_payload, val_params = select.select_and_encode_float(flat)
    payload = core.pack_sections(len_payload, val_payload)
    params = {
        "l_ref": len_params["ref"], "l_width": len_params["width"],
        "n_flat": int(len(flat)), "val_codec": val_codec, "val": val_params,
    }
    payload = _wrap_nulls(payload, valid)
    return (
        f"list_{val_codec}", payload, _params_with_crc(params, payload),
        n, n_nulls,
    )


def _decode_list_float(payload: bytes, params: dict, n: int, n_nulls: int) -> pa.Array:
    inner, valid = _unwrap_nulls(payload, n, n_nulls)
    len_buf, val_buf = core.unpack_sections(inner)
    n_nn = n - n_nulls
    lengths = core.int_for_decode(
        len_buf, {"ref": params["l_ref"], "width": params["l_width"]}, n_nn
    )
    flat = core.FLOAT_CODECS[params["val_codec"]][1](
        val_buf, params["val"], int(params["n_flat"])
    )
    offsets = np.zeros(n_nn + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:].view(np.int32)[:])
    nn_arr = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(flat, type=pa.float32())
    )
    if valid is None:
        return nn_arr
    # re-insert nulls Arrow-natively: null slots get zero-length offsets and
    # a validity bitmap (mirrors _ld_to_arrow for binary) — the old
    # to_pylist() + per-row loop was the only Python-per-row path left on
    # nullable embedding decode
    full_lengths = np.zeros(n, dtype=np.int64)
    full_lengths[valid] = lengths
    full_offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(full_lengths, out=full_offsets[1:].view(np.int32)[:])
    validity = pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())
    return pa.Array.from_buffers(
        pa.list_(pa.float32()),
        n,
        [validity, pa.py_buffer(full_offsets.tobytes())],
        null_count=int(n_nulls),
        children=[pa.array(flat, type=pa.float32())],
    )
