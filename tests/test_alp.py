"""ALP float codecs (float_alp / float_alprd): bit-exact round trips on
decimal and adversarial data, exception patching, selector behavior, and the
end-to-end chunk path. Scheme per the public ALP paper (Afroozeh & Boncz,
SIGMOD 2024); the reference repo (catid/cuda_float_compress) compresses
floats only lossily via quantization — ALP is the engine's LOSSLESS float
frontier next to byteplane+zstd."""
from __future__ import annotations

import json

import numpy as np
import pytest

from cuda_float_compress_spark.codecs import core, select


def _assert_bitexact(v, payload, params, dec):
    out = dec(payload, params, len(v))
    assert out.dtype == v.dtype and len(out) == len(v)
    np.testing.assert_array_equal(out.view(np.uint8), v.view(np.uint8))


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_alp_decimal_data_no_exceptions(dtype):
    rng = np.random.default_rng(11)
    v = np.round(rng.uniform(-500, 500, 20_000), 2).astype(dtype)
    payload, params = core.float_alp_encode(v)
    assert params["n_exc"] == 0, "2-decimal data must hit a clean scale"
    # f32 keeps fewer mantissa bits, so digits span a wider relative range
    assert len(payload) < v.nbytes * (0.6 if dtype is np.float32 else 0.5)
    _assert_bitexact(v, payload, params, core.float_alp_decode)
    json.dumps(params)  # manifest params must serialize


def test_alp_beats_byteplane_on_decimals():
    rng = np.random.default_rng(12)
    v = np.round(rng.random(50_000), 3)  # 3-decimal scores in [0,1)
    alp, _ = core.float_alp_encode(v)
    bp, _ = core.float_byteplane_encode(v)
    assert len(alp) < len(bp) * 0.5, (len(alp), len(bp))
    codec, payload, _ = select.select_and_encode_float(v)
    assert codec == "float_alp"


def test_alp_specials_become_exceptions():
    v = np.array([1.25, np.nan, np.inf, -np.inf, -0.0, 0.0, 5e-324, 1e308,
                  2.5, 3.75])
    payload, params = core.float_alp_encode(v)
    assert params["n_exc"] >= 4  # nan/inf/-inf/denormal/1e308 can't scale
    _assert_bitexact(v, payload, params, core.float_alp_decode)
    # -0.0 restored with its sign bit (bit-compare above already proves it,
    # state it explicitly: the np.testing equality treats -0.0 == 0.0)
    out = core.float_alp_decode(payload, params, len(v))
    assert np.signbit(out[4]) and not np.signbit(out[5])


def test_alp_all_exceptions_still_valid():
    """Uniform random doubles: no decimal scale fits — the codec must stay
    CORRECT (selector just won't pick it)."""
    v = np.random.default_rng(13).normal(0, 1, 3_000)
    payload, params = core.float_alp_encode(v)
    _assert_bitexact(v, payload, params, core.float_alp_decode)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_alprd_roundtrip_and_dict(dtype):
    rng = np.random.default_rng(14)
    # narrow-range data: high IEEE bits low-cardinality (the ALP-RD case)
    v = (1000.0 + rng.random(30_000) * 1e-3).astype(dtype)
    payload, params = core.float_alprd_encode(v)
    assert params["ndict"] <= 256
    _assert_bitexact(v, payload, params, core.float_alprd_decode)
    assert len(payload) < v.nbytes  # beats raw on clustered exponents


def test_alprd_dict_overflow_patches_exceptions(monkeypatch):
    """High parts beyond the dict capacity ride the exception list and
    still round-trip bit-exactly. At the default 256-entry capacity the
    widest f64 cut (r=56 -> 8 high bits) can always be covered, so cap the
    dict at 4 to exercise the patch path deterministically."""
    monkeypatch.setattr(core, "_ALPRD_MAX_DICT", 4)
    rng = np.random.default_rng(15)
    v = rng.normal(0, 1, 4_000) * (10.0 ** rng.integers(-300, 300, 4_000))
    payload, params = core.float_alprd_encode(v)
    assert params["ndict"] <= 4 and params["n_exc"] > 0
    _assert_bitexact(v, payload, params, core.float_alprd_decode)


@pytest.mark.parametrize(
    "codec", ["float_alp", "float_alprd"]
)
@pytest.mark.parametrize("n", [0, 1, 2, 7])
def test_alp_tiny_and_empty(codec, n):
    enc, dec = core.FLOAT_CODECS[codec]
    v = np.linspace(0.25, 10.0, n)
    payload, params = enc(v)
    _assert_bitexact(v, payload, params, dec)


def test_alp_negative_scale_large_decimals():
    """Values like 123400.0 (trailing zeros) should pick a NEGATIVE scale
    (divide by 10^k) and still round-trip."""
    rng = np.random.default_rng(16)
    v = (rng.integers(1, 10_000, 10_000) * 100).astype(np.float64)
    payload, params = core.float_alp_encode(v)
    assert params["n_exc"] == 0
    assert params["s"] <= 0
    _assert_bitexact(v, payload, params, core.float_alp_decode)


def test_alp_chunk_path_floats():
    """encode_column_chunk -> decode_column_chunk over a float64 Arrow array
    with nulls: ALP is selected for decimal data and the nulls re-insert."""
    import pyarrow as pa

    from cuda_float_compress_spark.operators import chunks as C

    vals = [round(x, 2) for x in np.random.default_rng(17).uniform(0, 9, 5_000)]
    vals[3] = None
    vals[4999] = None
    arr = pa.array(vals, type=pa.float64())
    codec, payload, params, n, n_nulls = C.encode_column_chunk(arr, "float64")
    assert codec == "float_alp"
    out = C.decode_column_chunk(payload, codec, params, n, n_nulls, "float64")
    assert out.to_pylist() == vals


def test_float_xor_roundtrip_and_wins_on_smooth_series():
    """Gorilla-style XOR codec: bit-exact on specials, and the selector
    picks it (or better) on a smooth random walk where successive values
    share high bits."""
    rng = np.random.default_rng(18)
    walk = np.cumsum(rng.normal(0, 1e-4, 40_000)) + 100.0
    payload, params = core.float_xor_encode(walk)
    _assert_bitexact(walk, payload, params, core.float_xor_decode)
    bp, _ = core.float_byteplane_encode(walk)
    assert len(payload) < len(bp), (len(payload), len(bp))
    specials = np.array([np.nan, np.inf, -np.inf, -0.0, 0.0, 5e-324])
    p2, pr2 = core.float_xor_encode(specials)
    _assert_bitexact(specials, p2, pr2, core.float_xor_decode)
    for n in (0, 1, 2):
        v = np.linspace(1.5, 2.5, n)
        p3, pr3 = core.float_xor_encode(v)
        _assert_bitexact(v, p3, pr3, core.float_xor_decode)
    # f32 twin
    w32 = walk.astype(np.float32)
    p4, pr4 = core.float_xor_encode(w32)
    _assert_bitexact(w32, p4, pr4, core.float_xor_decode)
