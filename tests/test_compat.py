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


def test_header_probe_and_errors():
    v = np.zeros(100, dtype=np.float32)
    blob = compat.cuszplus_compress(v, 1e-3)
    assert compat.get_decompressed_float_count(blob) == 100
    with pytest.raises(ValueError):  # bad magic (cuszplus_f32.cu:582-586)
        compat.cuszplus_decompress(b"\x00" * 32)
    with pytest.raises(TypeError):  # dtype check (cuda_float_compress.cpp:15-17)
        compat.cuszplus_compress(np.zeros(10, dtype=np.float64))
