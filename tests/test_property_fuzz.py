"""Property-based round-trip fuzz over the block codec layer (hypothesis).

Mirrors the reference's randomized end-to-end tests
(/root/reference/parquet_test.go:33-502, 802-920: 3001-row randomized sets,
nils in every position, extreme values) as generative properties: any
array the strategies produce must decode bit-identically.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from parquet_spark.codecs import blocks as blk

settings.register_profile("ci", max_examples=60, deadline=None)
settings.load_profile("ci")


def rt_equal(arr: pa.Array) -> bool:
    out = blk.decode_array(blk.encode_array(arr))
    return out.equals(arr)


int_dtypes = st.sampled_from([pa.int32(), pa.int64(), pa.uint32(), pa.uint64(), pa.int16(), pa.uint8()])


@st.composite
def int_arrays(draw):
    typ = draw(int_dtypes)
    bits = typ.bit_width
    signed = not pa.types.is_unsigned_integer(typ)
    lo = -(2 ** (bits - 1)) if signed else 0
    hi = 2 ** (bits - 1) - 1 if signed else 2**bits - 1
    vals = draw(
        st.lists(st.one_of(st.none(), st.integers(lo, hi), st.sampled_from([lo, hi, 0])), max_size=300)
    )
    return pa.array(vals, typ)


@given(int_arrays())
def test_int_roundtrip_any(arr):
    assert rt_equal(arr)


@given(
    st.lists(st.one_of(st.none(), st.floats(allow_nan=False, width=64), st.just(float("inf"))), max_size=200)
)
def test_float_roundtrip_any(vals):
    arr = pa.array(vals, pa.float64())
    out = blk.decode_array(blk.encode_array(arr))
    a, b = arr.to_pandas(), out.to_pandas()
    assert len(a) == len(b)
    assert np.array_equal(a.to_numpy(), b.to_numpy(), equal_nan=True)


@given(st.lists(st.one_of(st.none(), st.text(max_size=40)), max_size=200))
def test_string_roundtrip_any(vals):
    assert rt_equal(pa.array(vals, pa.string()))


@given(st.lists(st.one_of(st.none(), st.binary(max_size=64)), max_size=150))
def test_binary_roundtrip_any(vals):
    assert rt_equal(pa.array(vals, pa.binary()))


@given(
    st.lists(
        st.one_of(st.none(), st.lists(st.integers(-(2**31), 2**31 - 1), max_size=50)),
        max_size=80,
    )
)
def test_list_int_roundtrip_any(vals):
    assert rt_equal(pa.array(vals, pa.list_(pa.int32())))


@given(
    st.lists(
        st.one_of(
            st.none(),
            st.fixed_dictionaries(
                {"a": st.one_of(st.none(), st.integers(-1000, 1000)), "b": st.one_of(st.none(), st.text(max_size=10))}
            ),
        ),
        max_size=80,
    )
)
def test_struct_roundtrip_any(vals):
    assert rt_equal(pa.array(vals, pa.struct([("a", pa.int64()), ("b", pa.string())])))


@given(st.lists(st.one_of(st.none(), st.booleans()), max_size=300))
def test_bool_roundtrip_any(vals):
    assert rt_equal(pa.array(vals, pa.bool_()))


@given(st.data())
def test_forced_codec_roundtrip(data):
    codec = data.draw(st.sampled_from(["plain", "dict", "rle", "for_bp", "bitpack"]))
    vals = data.draw(st.lists(st.integers(0, 2**31 - 1), max_size=300))
    arr = pa.array(vals, pa.int64())
    out = blk.decode_array(blk.encode_array(arr, codec=codec))
    assert out.equals(arr)
