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


@given(
    st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.tuples(st.text(max_size=8),
                          st.one_of(st.none(), st.integers(-10**6, 10**6))),
                max_size=6,
                unique_by=lambda kv: kv[0],  # map keys must be unique
            ),
        ),
        max_size=120,
    )
)
def test_map_roundtrip_any(vals):
    assert rt_equal(pa.array(vals, pa.map_(pa.string(), pa.int64())))


@given(
    st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.tuples(st.integers(0, 50),
                          st.one_of(st.none(), st.text(max_size=12))),
                max_size=4,
                unique_by=lambda kv: kv[0],
            ),
        ),
        max_size=80,
    )
)
def test_map_int_keys_roundtrip_any(vals):
    assert rt_equal(pa.array(vals, pa.map_(pa.int64(), pa.string())))


@given(st.data())
def test_forced_codec_roundtrip(data):
    codec = data.draw(st.sampled_from(["plain", "dict", "rle", "for_bp", "bitpack"]))
    vals = data.draw(st.lists(st.integers(0, 2**31 - 1), max_size=300))
    arr = pa.array(vals, pa.int64())
    out = blk.decode_array(blk.encode_array(arr, codec=codec))
    assert out.equals(arr)


# ---------------------------------------------------------------- structs
# Randomized nested-struct schemas through the raw standards-Parquet
# writer/reader (the same generative stance as the reference's randomized
# Person sets, applied to the round-4 struct path): any (nesting, nulls,
# page split, row-group split) combination must round-trip element-exact
# and open identically in pyarrow.

import os
import tempfile

import pyarrow.compute as pc
import pyarrow.parquet as pq

from parquet_spark.sources import parquet_raw as praw

_LEAF_TYPES = [pa.int32(), pa.int64(), pa.float64(), pa.string(), pa.bool_()]


def _leaf_values(draw, typ, n):
    if typ == pa.string():
        elems = st.one_of(st.none(), st.text(max_size=8))
    elif typ == pa.bool_():
        elems = st.one_of(st.none(), st.booleans())
    elif typ == pa.float64():
        elems = st.one_of(st.none(), st.floats(allow_nan=False, width=64))
    else:
        bits = typ.bit_width
        elems = st.one_of(st.none(), st.integers(-(2 ** (bits - 1)), 2 ** (bits - 1) - 1))
    return pa.array(draw(st.lists(elems, min_size=n, max_size=n)), typ)


def _struct_array(draw, n, depth):
    k = draw(st.integers(1, 3))
    children, fields = [], []
    for i in range(k):
        if depth < 2 and draw(st.booleans()):
            arr = _struct_array(draw, n, depth + 1)
        else:
            typ = draw(st.sampled_from(_LEAF_TYPES))
            arr = _leaf_values(draw, typ, n)
        children.append(arr)
        fields.append(pa.field(f"f{depth}_{i}", arr.type))
    mask = pa.array(draw(st.lists(st.booleans(), min_size=n, max_size=n)))
    return pa.StructArray.from_arrays(children, fields=fields, mask=mask)


@st.composite
def struct_tables(draw):
    n = draw(st.integers(1, 60))
    return pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "s": _struct_array(draw, n, 0),
    })


def _canon(arr):
    """Null out struct-child slots under null parents: Dremel has no
    representation for values below a null ancestor, so equality is
    defined on this canonical form."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_struct(arr.type):
        parent_null = pc.is_null(arr)
        kids = [
            pc.if_else(parent_null, pa.nulls(len(arr), _canon(arr.field(i)).type), _canon(arr.field(i)))
            for i in range(arr.type.num_fields)
        ]
        return pa.StructArray.from_arrays(kids, fields=list(arr.type), mask=parent_null)
    return arr


@given(struct_tables(), st.sampled_from([7, 16, 64]), st.sampled_from([None, 13, 40]))
@settings(max_examples=25, deadline=None)
def test_struct_roundtrip_fuzz(tbl, page_rows, row_group_rows):
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.parquet")
        praw.write_file(p, tbl, page_rows=page_rows, row_group_rows=row_group_rows)
        want = pa.table({c: _canon(tbl.column(c)) for c in tbl.column_names})
        got_pa = pq.read_table(p)
        assert pa.table({c: _canon(got_pa.column(c)) for c in tbl.column_names}).equals(want)
        got_self = praw.read_file(p).cast(tbl.schema)
        assert pa.table({c: _canon(got_self.column(c)) for c in tbl.column_names}).equals(want)
