"""Hypothesis property tests: decode(encode(x)) == x for arbitrary inputs —
the generative extension of the reference's exhaustive width sweep
(interleave_test.cu:892-1001)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cuda_float_compress_spark.codecs import core, select

int_arrays = st.lists(
    st.integers(min_value=-(2**62), max_value=2**62), min_size=0, max_size=300
).map(lambda xs: np.array(xs, dtype=np.int64))

byte_lists = st.lists(
    st.one_of(st.none(), st.binary(min_size=0, max_size=64)),
    min_size=0,
    max_size=100,
)


@settings(max_examples=60, deadline=None)
@given(v=int_arrays, codec=st.sampled_from(sorted(core.INT_CODECS)))
def test_int_codecs_roundtrip_property(v, codec):
    with np.errstate(over="ignore"):
        payload, params = core.encode_int_chunk(v, codec)
        out = core.decode_int_chunk(payload, codec, params, len(v))
    np.testing.assert_array_equal(out, v)


@settings(max_examples=60, deadline=None)
@given(items=byte_lists, codec=st.sampled_from(sorted(core.BYTES_CODECS)))
def test_bytes_codecs_roundtrip_property(items, codec):
    payload, params = core.encode_bytes_chunk(items, codec)
    assert core.decode_bytes_chunk(payload, codec, params, len(items)) == items


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=4096))
def test_fsst_roundtrip_property(data):
    symbols = core.fsst_train(data)
    enc = core.fsst_encode_bytes(data, symbols)
    assert core.fsst_decode_bytes(enc, symbols) == data


@settings(max_examples=40, deadline=None)
@given(v=int_arrays)
def test_selector_roundtrip_property(v):
    with np.errstate(over="ignore"):
        codec, payload, params = select.select_and_encode_int(v)
        out = core.decode_int_chunk(payload, codec, params, len(v))
    np.testing.assert_array_equal(out, v)
