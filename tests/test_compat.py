"""API-compat tests mirroring the reference's example scripts and CPU
round-trip harness."""

from __future__ import annotations

import numpy as np
import pytest

from cuda_float_compress_spark import compat


def test_minimal_example_parity():
    # examples/minimal_example.py: 32768 Normal(0,1) float32, max_error=1e-4,
    # allclose(original, decompressed, atol=max_error)
    v = np.random.default_rng(42).normal(0, 1, 32_768).astype(np.float32)
    max_error = 1e-4
    blob = compat.cuszplus_compress(v, max_error)
    out = compat.cuszplus_decompress(blob)
    assert out.dtype == np.float32 and out.shape == v.shape
    assert np.allclose(out, v, atol=max_error * 1.001)
    assert len(blob) < v.nbytes  # it compresses


def test_model_compress_example_parity():
    # examples/model_compress_example.py: flatten many float32 "layers",
    # compress, decompress, per-layer max-error check + ratio report
    rng = np.random.default_rng(0)
    layers = [rng.normal(0, s, n).astype(np.float32)
              for s, n in [(0.02, 10_000), (0.5, 4_096), (1.0, 65_536)]]
    flat = np.concatenate(layers)
    blob = compat.cuszplus_compress(flat, 1e-4)
    out = compat.cuszplus_decompress(blob)
    off = 0
    for layer in layers:
        got = out[off : off + len(layer)]
        assert np.max(np.abs(got - layer)) <= 1e-4 * 1.001
        off += len(layer)
    ratio = flat.nbytes / len(blob)
    assert ratio > 2.0  # reference reports 4.02x on model weights


def test_int32_exact_roundtrip_reference_fixture():
    # cpu_compress_test.cpp:809-826,914-919: Gaussian int32, exact equality
    v = np.rint(np.random.default_rng(1337).normal(78000, 317, 1_048_576)).astype(
        np.int32
    )
    blob = compat.compress_int32(v)
    out = compat.decompress_int32(blob)
    np.testing.assert_array_equal(out, v)
    assert v.nbytes / len(blob) > 2.5  # reference: 2.94x on this distribution


def test_lossless_float_roundtrip_bitexact():
    v = np.random.default_rng(7).normal(0, 1, 50_000).astype(np.float32)
    v[::97] = np.nan
    blob = compat.compress_lossless_f32(v)
    out = compat.cuszplus_decompress(blob)
    np.testing.assert_array_equal(out.view(np.uint32), v.view(np.uint32))


def test_lossy_quantize_refuses_out_of_domain():
    """inf/nan and |x|/eps >= 2^62 cannot be represented by the int64
    quantizer; pre-guard they cast to garbage and DECODED silently wrong
    (1e38 at eps=2e-4 round-tripped with error 1e38). The reference's int32
    quantizer shares the domain limit without a guard — we refuse loudly
    and point at the lossless path."""
    for bad in (
        np.array([np.inf, 1.0], np.float32),
        np.array([np.nan], np.float32),
        np.array([1e38, 0.0], np.float32),
    ):
        with pytest.raises(ValueError, match="lossless"):
            compat.cuszplus_compress(bad, 1e-4)
    # the same values are fine through the lossless API
    v = np.array([np.inf, -np.inf, np.nan, 1e38, -0.0], np.float32)
    out = compat.cuszplus_decompress(compat.compress_lossless_f32(v))
    np.testing.assert_array_equal(out.view(np.uint32), v.view(np.uint32))
    # and in-domain large values still honor the bound
    big = np.array([1e9, -1e9, 123.456], np.float32)
    dec = compat.cuszplus_decompress(compat.cuszplus_compress(big, 0.01))
    assert np.abs(dec - big).max() <= 0.01 * (1 + 1e-6)


def test_header_probe_and_errors():
    v = np.zeros(100, dtype=np.float32)
    blob = compat.cuszplus_compress(v, 1e-3)
    assert compat.get_decompressed_float_count(blob) == 100
    with pytest.raises(ValueError):  # bad magic (cuszplus_f32.cu:582-586)
        compat.cuszplus_decompress(b"\x00" * 32)
    with pytest.raises(TypeError):  # dtype check (cuda_float_compress.cpp:15-17)
        compat.cuszplus_compress(np.zeros(10, dtype=np.float64))


# --- reference wire format (magic 0x00010203) --------------------------------


def test_refformat_roundtrip_odd_sizes():
    from cuda_float_compress_spark import refformat as R

    rng = np.random.default_rng(1337)
    for n in [0, 1, 31, 32, 127, 128, 129, 32_768, 32_769, 100_000]:
        x = rng.normal(0, 1, n).astype(np.float32)
        blob = R.compress_ref(x, max_error=1e-4)
        n_probe, eps = R.probe_ref(blob)
        assert n_probe == n and eps == np.float32(2e-4)
        y = R.decompress_ref(blob)
        assert y.dtype == np.float32 and len(y) == n
        if n:
            # reference's own slack: README.md:127-142 reports 1.0002e-4 > 1e-4
            assert np.abs(x - y).max() <= 1.02e-4


def test_refformat_header_layout():
    """Header must be byte-for-byte the reference layout: magic u32 LE,
    FloatCount u32 LE, Epsilon f32 LE (src/cuszplus_f32.cu:546-549)."""
    import struct

    from cuda_float_compress_spark import refformat as R

    x = np.zeros(100, dtype=np.float32)
    blob = R.compress_ref(x, max_error=5e-4)
    magic, n, eps = struct.unpack_from("<IIf", blob, 0)
    assert magic == 0x00010203
    assert n == 100
    assert eps == np.float32(2 * 5e-4)
    # payload is one zstd frame expanding to block_count * BLOCK_BYTES
    import pyarrow as pa

    raw = pa.Codec("zstd").decompress(blob[12:], R.BLOCK_BYTES, asbytes=True)
    assert len(raw) == R.BLOCK_BYTES


def test_refformat_fixture_blob_bit_exact():
    """A hand-built fixture blob in the documented layout (slow scalar
    construction straight from the spec) decodes bit-exactly — and the
    engine's writer produces the identical blob bytes."""
    from cuda_float_compress_spark import refformat as R

    rng = np.random.default_rng(7)
    n = 200  # < one thread-lane x2: exercises padding + lane reset
    x = rng.normal(0, 1, n).astype(np.float32)
    eps = np.float32(2e-4)
    inv = np.float32(1.0) / eps
    # scalar spec transcription: quantize -> per-128 delta -> zigzag -> pad
    q = [int(np.rint(np.float32(v) * inv)) for v in x]
    words = []
    prev = 0
    for j, qv in enumerate(q):
        if j % 128 == 0:
            prev = 0
        d = (qv - prev) & 0xFFFFFFFF
        d_signed = d - (1 << 32) if d >= (1 << 31) else d
        prev = qv
        words.append(((d_signed << 1) ^ (d_signed >> 31)) & 0xFFFFFFFF)
    words += [0] * (R.BLOCK_FLOAT_COUNT - len(words))
    # 2-bit interleave per 32-word group, scatter at stride 1024
    out_words = [0] * R.BLOCK_FLOAT_COUNT
    for g in range(R.BLOCK_FLOAT_COUNT // 32):
        grp = words[g * 32:(g + 1) * 32]
        shuf = [0] * 32
        for shift in range(0, 32, 2):
            r0 = r1 = 0
            for i in range(16):
                r0 |= (((grp[i] >> shift) & 3) << (i * 2))
                r1 |= (((grp[i + 16] >> shift) & 3) << (i * 2))
            shuf[shift] = r0
            shuf[shift + 1] = r1
        for j in range(32):
            out_words[j * 1024 + g] = shuf[j]
    import struct

    import pyarrow as pa

    payload = np.array(out_words, dtype="<u4").tobytes()
    fixture = struct.pack("<IIf", 0x00010203, n, float(eps)) + pa.Codec(
        "zstd", compression_level=1
    ).compress(payload, asbytes=True)
    got = R.decompress_ref(fixture)
    expect = (np.array(q, dtype=np.int32)[:n]).astype(np.float32) * eps
    assert np.array_equal(got, expect)
    # writer parity: engine-compressed blob == the hand-built fixture
    assert R.compress_ref(x, max_error=1e-4) == fixture


def test_compat_decompress_autodetects_reference_blob():
    from cuda_float_compress_spark import refformat as R

    x = np.random.default_rng(3).normal(0, 1, 40_000).astype(np.float32)
    blob = R.compress_ref(x, max_error=1e-4)
    out = compat.cuszplus_decompress(blob)  # reference magic routed
    assert np.abs(out - x).max() <= 1.02e-4
    # numpy-uint8-array input (the reference returns u8 tensors)
    out2 = compat.cuszplus_decompress(np.frombuffer(blob, dtype=np.uint8))
    assert np.array_equal(out, out2)


def test_compat_device_arg_without_torch():
    x = np.random.default_rng(4).normal(0, 1, 1000).astype(np.float32)
    blob = compat.cuszplus_compress(x, 1e-4)
    assert compat.cuszplus_decompress(blob, device=None) is not None
    try:
        import torch  # noqa: F401
        has_torch = True
    except ImportError:
        has_torch = False
    if not has_torch:
        with pytest.raises(ValueError, match="torch"):
            compat.cuszplus_decompress(blob, device="cuda")


def test_refformat_error_paths():
    from cuda_float_compress_spark import refformat as R

    with pytest.raises(ValueError, match="too small"):
        R.probe_ref(b"\x03\x02")
    with pytest.raises(ValueError, match="bad magic"):
        R.decompress_ref(b"\x00\x00\x00\x00" + b"\x00" * 20)
    good = R.compress_ref(np.ones(1000, dtype=np.float32))
    with pytest.raises(Exception):  # truncated zstd frame / size mismatch
        R.decompress_ref(good[: len(good) - 8])
    # payload expanding to the wrong size must fail loudly (:632-636)
    import struct
    import pyarrow as pa
    bad = struct.pack("<IIf", R.REF_MAGIC, 1000, 2e-4) + pa.Codec(
        "zstd", compression_level=1
    ).compress(b"\x00" * 100, asbytes=True)
    with pytest.raises(Exception):
        R.decompress_ref(bad)
