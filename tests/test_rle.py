"""RLE hybrid: golden parity against the reference's encoder state machine
(test cases mirrored from /root/reference/internal/rle/rle_test.go:20-101)
and cross-compatibility between the reference-exact encoder (rle_ref) and
the engine's generalized vectorized codec (rle)."""

import numpy as np
import pytest

from parquet_spark.codecs import rle, rle_ref

REF_CASES = [
    # (name, width, values) — from rle_test.go:20-77
    ("rle only", 3, [4] * 100 + [5] * 100),
    ("repeated zeros", 0, [0] * 10),
    ("odd number of repeated zeros", 1, [0] * 17),
    ("odd number of repeated ones", 1, [1] * 17),
    ("bitpacking only", 3, [i % 3 for i in range(100)]),
    ("more bitpacking only", 3, [i % 3 for i in range(103)]),
    ("single value", 1, [1]),
    ("odd number of non-repeated values", 1, [1, 0, 1, 1, 0]),
    ("width 2", 2, [1, 2, 3]),
    ("width 3", 3, [1, 2, 7]),
]


@pytest.mark.parametrize("name,width,vals", REF_CASES, ids=[c[0] for c in REF_CASES])
def test_ref_encoder_roundtrip_via_engine_decoder(name, width, vals):
    """The generalized decoder must read reference-produced bytes."""
    buf = rle_ref.encode_ref(vals, width)
    out, consumed = rle.decode(buf, len(vals), width)
    assert consumed == len(buf)
    assert list(out) == vals


@pytest.mark.parametrize("name,width,vals", REF_CASES, ids=[c[0] for c in REF_CASES])
def test_engine_encoder_roundtrip(name, width, vals):
    arr = np.array(vals, dtype=np.uint64)
    buf = rle.encode(arr, width)
    out, consumed = rle.decode(buf, len(vals), width)
    assert consumed == len(buf)
    assert list(out) == vals


@pytest.mark.parametrize("name,width,vals", REF_CASES, ids=[c[0] for c in REF_CASES])
def test_engine_not_larger_than_reference(name, width, vals):
    """The vectorized encoder must never be bigger than the reference's."""
    ref = rle_ref.encode_ref(vals, width)
    eng = rle.encode(np.array(vals, dtype=np.uint64), width)
    assert len(eng) <= len(ref)


def test_golden_bytes_pure_rle_run():
    # 100 × value 4 at width 3: header LEB128(100<<1)=200 -> 0xC8 0x01,
    # value padded to 1 byte -> 0x04; length prefix 3 (rle.go:98-128,153-155)
    expected = (3).to_bytes(4, "little") + bytes([0xC8, 0x01, 0x04])
    assert rle_ref.encode_ref([4] * 100, 3) == expected
    assert rle.encode(np.full(100, 4, dtype=np.uint64), 3) == expected


def test_golden_bytes_bitpack_only():
    # 8 values 0..7 at width 3: ref emits header (1<<1)|1=3 then the Apache
    # doc bytes (bitpack_test.go:33-38)
    expected = (4).to_bytes(4, "little") + bytes([0x03, 0b10001000, 0b11000110, 0b11111010])
    assert rle_ref.encode_ref(list(range(8)), 3) == expected
    assert rle.encode(np.arange(8, dtype=np.uint64), 3) == expected


def test_width_gt4_rejected_by_ref_allowed_by_engine():
    with pytest.raises(ValueError):
        rle_ref.RefRLE(5)
    vals = np.array([1000, 1000, 7, 90000] * 50, dtype=np.uint64)
    buf = rle.encode(vals, 17)
    out, _ = rle.decode(buf, len(vals), 17)
    np.testing.assert_array_equal(out, vals)


@pytest.mark.parametrize("width", [0, 1, 2, 3, 4])
def test_cross_parity_fuzz(width):
    """Engine decode(ref encode(x)) == x == engine decode(engine encode(x))
    over run-heavy random streams."""
    rng = np.random.default_rng(7 + width)
    hi = (1 << width) - 1 if width else 0
    chunks = []
    for _ in range(60):
        v = int(rng.integers(0, hi + 1))
        chunks.append(np.full(int(rng.integers(1, 30)), v, dtype=np.uint64))
    vals = np.concatenate(chunks)
    ref_buf = rle_ref.encode_ref(vals, width)
    out_ref, _ = rle.decode(ref_buf, len(vals), width)
    np.testing.assert_array_equal(out_ref, vals)
    eng_buf = rle.encode(vals, width)
    out_eng, _ = rle.decode(eng_buf, len(vals), width)
    np.testing.assert_array_equal(out_eng, vals)
    assert len(eng_buf) <= len(ref_buf)


def test_long_run_63_group_boundary():
    """>63 bit-packed groups forces the reference's header back-patch path
    (rle.go:69-96); decoder must handle consecutive bit-packed regions."""
    vals = np.arange(8 * 70, dtype=np.uint64) % 7
    buf = rle_ref.encode_ref(vals, 3)
    out, _ = rle.decode(buf, len(vals), 3)
    np.testing.assert_array_equal(out, vals)


def test_empty():
    buf = rle.encode(np.array([], dtype=np.uint64), 3)
    out, consumed = rle.decode(buf, 0, 3)
    assert len(out) == 0 and consumed == 4
