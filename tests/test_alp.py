"""ALP-style decimal-float codec: exact 10^e rescale to int mantissas +
the int-codec chooser. Bit-exactness is enforced with uint-view compares,
so -0.0, NaN, and non-decimal blocks fall back rather than drift."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from parquet_spark.codecs import alp, blocks as blk


def rt(arr):
    buf = blk.encode_array(arr)
    return blk.decode_array(buf), buf


def test_prices_pick_alp_and_roundtrip_bit_exact():
    rng = np.random.default_rng(1)
    vals = np.round(rng.uniform(1, 100000, 20000), 2)  # 2-decimal prices
    arr = pa.array(vals, pa.float64())
    out, buf = rt(arr)
    assert blk.describe(buf)["codec"] == "alp"
    assert np.asarray(out).tobytes() == vals.tobytes()
    assert len(buf) < vals.nbytes / 2  # mantissas ~24 bits vs 64


def test_integral_floats_pick_alp_e0():
    vals = np.arange(5000, dtype=np.float64) * 3
    assert alp.find_exponent(vals) == 0
    arr = pa.array(vals)
    out, buf = rt(arr)
    assert blk.describe(buf)["codec"] == "alp"
    assert np.asarray(out).tobytes() == vals.tobytes()


def test_negative_zero_falls_back():
    vals = np.array([1.5, -0.0, 2.25], dtype=np.float64)
    assert alp.find_exponent(vals) is None
    arr = pa.array(vals)
    out, buf = rt(arr)
    assert blk.describe(buf)["codec"] != "alp"
    assert np.asarray(out).tobytes() == vals.tobytes()


def test_nan_and_random_fall_back():
    rng = np.random.default_rng(2)
    vals = rng.standard_normal(4000)  # full-precision noise: not decimal
    assert alp.find_exponent(vals) is None
    v2 = np.array([1.25, float("nan"), 2.5])
    assert alp.find_exponent(v2) is None


def test_float32_decimals():
    vals = np.round(np.random.default_rng(3).uniform(0, 100, 8000), 1).astype(np.float32)
    arr = pa.array(vals, pa.float32())
    out, buf = rt(arr)
    assert np.asarray(out).tobytes() == vals.tobytes()
    # float32 decimals usually verify bit-exactly through the f64 path;
    # if not, fallback still round-trips (assert above is the contract)


def test_alp_with_nulls():
    vals = [1.25, None, 3.5, None, 100.75]
    arr = pa.array(vals, pa.float64())
    out, _ = rt(arr)
    assert out.equals(arr)


def test_forced_alp_on_nondecimal_raises():
    arr = pa.array(np.random.default_rng(4).standard_normal(100))
    with pytest.raises(ValueError, match="alp"):
        blk.encode_array(arr, codec="alp")


def test_sorted_decimal_prices_use_delta_mantissas():
    vals = np.round(np.cumsum(np.random.default_rng(5).uniform(0, 1, 30000)), 2)
    arr = pa.array(vals)
    out, buf = rt(arr)
    d = blk.describe(buf)
    assert d["codec"] == "alp"
    assert np.asarray(out).tobytes() == vals.tobytes()
    assert len(buf) < vals.nbytes / 3
