"""Drop-in API surface matching the reference's two public functions.

The reference exposes exactly ``cuszplus_compress(tensor, max_error)`` and
``cuszplus_decompress(data, device)`` via pybind11
(src/cuda_float_compress.cpp:88-91). A user switching to this repo calls the
same names with numpy arrays (torch users: pass ``t.numpy()``, wrap the
result back with ``torch.from_numpy``). Semantics match the reference:

* input: 1-D float32; values quantized to round-half-even(x / (2*max_error))
  (src/cuda_float_compress.cpp:34, src/cuszplus_f32.cu:384-388), then the
  LOSSLESS integer pipeline: delta -> zigzag -> bit-plane pack -> Zstd L1.
* output: self-describing bytes with a little-endian header
  (magic u32, count u32, eps f32 — the reference's header fields,
  src/cuszplus_f32.cu:30-35) followed by the payload.
* guarantee: |decompress(compress(x)) - x| <= max_error (up to the same
  float32 rounding slack the reference itself exhibits, README.md:127-142).

Wire compatibility: ``cuszplus_decompress`` auto-detects the REFERENCE's
on-disk format (magic 0x00010203, src/cuszplus_f32.cu:12) and decodes it
bit-exactly via :mod:`cuda_float_compress_spark.refformat` — stored
reference-compressed blobs migrate without re-compression. Blobs written by
THIS engine use a new magic (0x00010204) and a richer layout; to EMIT
reference-format bytes use ``compress_ref`` (re-exported here).

Torch interop (reference call sites pass torch tensors and a device arg,
src/cuda_float_compress.cpp:43-55, examples/minimal_example.py:14-17):
inputs may be torch tensors (converted via .detach().cpu().numpy());
``device`` is accepted and, when torch is importable, the result is returned
as a torch tensor on that device — without torch it must be None/"cpu".

Also exposes the exact (lossless) integer path the reference's CPU harness
tests (compress_int32/decompress_int32, cpu_compress_test.cpp:109-245).
"""

from __future__ import annotations

import json
import struct

import numpy as np

from cuda_float_compress_spark.codecs import core
from cuda_float_compress_spark.refformat import (  # noqa: F401  (re-exports)
    REF_MAGIC,
    compress_ref,
    decompress_ref,
    probe_ref,
)

_MAGIC = 0x00010204  # this engine's format; 0x00010203 = reference format


def _as_numpy(values):
    """Accept numpy arrays, lists, and torch tensors (duck-typed: anything
    with .detach/.cpu, so no hard torch dependency)."""
    if hasattr(values, "detach"):
        values = values.detach()
        if hasattr(values, "cpu"):
            values = values.cpu()
        values = values.numpy()
    return values


def _to_device(arr: np.ndarray, device):
    if device is None or device == "cpu":
        return arr
    try:
        import torch
    except ImportError as e:
        raise ValueError(
            f"device={device!r} requires torch, which is not installed; "
            "pass device=None for a numpy result"
        ) from e
    return torch.from_numpy(arr).to(device)


def _pack(kind: int, n: int, eps: float, params: dict, payload: bytes) -> bytes:
    params_b = json.dumps(params).encode()
    head = struct.pack("<IIfBI", _MAGIC, n, eps, kind, len(params_b))
    return head + params_b + payload


def _unpack(data: bytes) -> tuple[int, int, float, dict, bytes]:
    magic, n, eps, kind, plen = struct.unpack_from("<IIfBI", data, 0)
    if magic != _MAGIC:
        raise ValueError(f"bad magic 0x{magic:08x}")  # mirrors cuszplus_f32.cu:582-586
    off = struct.calcsize("<IIfBI")
    params = json.loads(data[off : off + plen])
    return kind, n, eps, params, data[off + plen :]


def cuszplus_compress(values, max_error: float = 1e-4) -> bytes:
    """Error-bounded compression of a 1-D float32 array or torch tensor
    (reference signature: cuszplus_compress(tensor, max_error) -> u8 tensor,
    src/cuda_float_compress.cpp:11-41)."""
    v = np.ascontiguousarray(_as_numpy(values))
    if v.ndim != 1:
        v = v.reshape(-1)  # reference flattens via .contiguous() semantics
    if v.dtype != np.float32:
        raise TypeError("Input tensor must be float32")  # cuda_float_compress.cpp:15-17
    payloads, chunk_params = _encode_chunked(
        v, lambda c: core.float_quantize_encode(c, max_error)
    )
    params = {"chunk": _CHUNK, "parts": chunk_params}
    return _pack(1, len(v), 2.0 * max_error, params, pack_chunks(payloads))


# processing block: bounds the bitpack bit-matrix working set (the engine's
# 32k chunks scaled up for single-array throughput; reference blocks are
# 32768 floats, src/cuszplus_f32.cu:21-28)
_CHUNK = 1 << 21

# chunk-parallel threads for the single-array API: numpy kernels and pyarrow
# zstd release the GIL, and chunks are independent (same property the Spark
# engine exploits across executors). Default 1 = reference-like single
# stream; CUSZPLUS_THREADS=N opts in.
import os as _os

_THREADS = max(1, int(_os.environ.get("CUSZPLUS_THREADS", "1")))


def _map_chunks(fn, jobs: list, threads: int | None = None) -> list:
    threads = _THREADS if threads is None else threads
    if threads <= 1 or len(jobs) <= 1:
        return [fn(j) for j in jobs]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(threads, len(jobs))) as ex:
        return list(ex.map(fn, jobs))


def _encode_chunked(
    v: np.ndarray, enc, threads: int | None = None
) -> tuple[list[bytes], list[dict]]:
    chunks = [v[off : off + _CHUNK] for off in range(0, max(len(v), 1), _CHUNK)]
    results = _map_chunks(enc, chunks, threads)
    return [p for p, _ in results], [prm for _, prm in results]


def pack_chunks(payloads: list[bytes]) -> bytes:
    return core.pack_sections(*payloads)


def _decode_chunked(payload: bytes, params: dict, n: int, dec) -> np.ndarray:
    sections = core.unpack_sections(payload)
    parts = params["parts"]
    chunk = int(params["chunk"])
    jobs = [
        (sec, prm, min(chunk, n - i * chunk))
        for i, (sec, prm) in enumerate(zip(sections, parts))
    ]
    out = _map_chunks(lambda j: dec(j[0], j[1], j[2]), jobs)
    return np.concatenate(out) if out else dec(b"", parts[0] if parts else {}, 0)


def cuszplus_decompress(data, device=None):
    """Inverse of cuszplus_compress (reference signature:
    cuszplus_decompress(data, device), src/cuda_float_compress.cpp:43-55).

    Accepts blobs from THIS engine (magic 0x00010204) AND blobs written by
    the reference itself (magic 0x00010203) — the latter decode bit-exactly
    through the refformat reader. ``data`` may be bytes, a numpy uint8
    array, or a torch uint8 tensor; ``device`` (torch only) places the
    result."""
    buf = bytes(bytearray(_as_numpy(data))) if not isinstance(
        data, (bytes, bytearray)
    ) else bytes(data)
    if len(buf) >= 4 and struct.unpack_from("<I", buf, 0)[0] == REF_MAGIC:
        return _to_device(decompress_ref(buf), device)
    kind, n, _eps, params, payload = _unpack(buf)
    if kind == 1:
        out = _decode_chunked(
            payload, params, n, core.float_quantize_decode
        ).astype(np.float32)
    elif kind == 2:
        out = _decode_chunked(payload, params, n, core.int_delta_decode).astype(
            np.int32
        )
    elif kind == 3:
        out = core.float_byteplane_decode(payload, params, n)
    else:
        raise ValueError(f"unknown payload kind {kind}")
    return _to_device(out, device)


def compress_int32(values) -> bytes:
    """Exact lossless int32 path (reference CPU harness:
    cpu_compress_test.cpp:109-114)."""
    v = np.ascontiguousarray(values, dtype=np.int32).reshape(-1)
    payloads, chunk_params = _encode_chunked(
        v.astype(np.int64), core.int_delta_encode
    )
    params = {"chunk": _CHUNK, "parts": chunk_params}
    return _pack(2, len(v), 0.0, params, pack_chunks(payloads))


def decompress_int32(data: bytes) -> np.ndarray:
    out = cuszplus_decompress(data)
    if out.dtype != np.int32:
        raise ValueError("payload is not an int32 stream")
    return out


def compress_lossless_f32(values) -> bytes:
    """Bit-exact float path (byte-plane + zstd) — for callers who need
    max_error=0 semantics the reference can't provide."""
    v = np.ascontiguousarray(values, dtype=np.float32).reshape(-1)
    payload, params = core.float_byteplane_encode(v)
    return _pack(3, len(v), 0.0, params, payload)


def get_decompressed_float_count(data: bytes) -> int:
    """Header probe (reference: GetDecompressedFloatCount,
    src/cuszplus_f32.cu:568-588)."""
    _, n, _, _, _ = _unpack(bytes(data))
    return n
