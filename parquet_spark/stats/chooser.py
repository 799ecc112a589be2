"""Codec auto-selection: a pure decision function from sampled block stats
to (codec, compression). Unit-tested against constructed distributions
(SURVEY.md §7 Phase 2); estimates are bytes-per-value models of the codecs
in parquet_spark.codecs.
"""

from __future__ import annotations

from parquet_spark.util import bit_length

# byte cost of an RLE run header+value (LEB128 ~2 bytes + value bytes)
_RLE_RUN_BYTES = 3.0


def choose_int_codec(stats: dict, itemsize: int) -> str:
    """Pick plain | rle | dict | for_bp for an integer block."""
    n = stats["n"]
    if n == 0:
        return "plain"
    width_for = bit_length(int(stats["vmax"]) - int(stats["vmin"]))
    cost_plain = float(itemsize)
    cost_for = width_for / 8.0 + 0.02
    costs = {"plain": cost_plain, "for_bp": cost_for}
    mean_run = stats.get("mean_run", 1.0)
    if mean_run >= 4 and width_for <= 32:
        # runs ≥8 collapse; shorter runs fall back to bit-packing inside the
        # hybrid, so model as a blend
        run_cost = _RLE_RUN_BYTES / mean_run
        costs["rle"] = min(run_cost, width_for / 8.0) + 0.05
    zz = stats.get("zz_width")
    if zz is not None and zz <= 32:
        # sorted / sequential data: deltas narrower than the FOR range
        costs["delta_bp"] = zz / 8.0 + 0.03
    ndv, sample_n = stats.get("ndv", n), stats.get("sample_n", n)
    if ndv < 0.5 * sample_n:
        # extrapolate ndv to the block conservatively (sampled ndv is a floor)
        ndv_est = ndv if ndv < sample_n // 8 else ndv * max(1, n // max(sample_n, 1)) // 4
        idx_width = max(1, bit_length(max(ndv_est - 1, 1)))
        key_bytes = ndv_est * itemsize
        if idx_width <= 32:
            costs["dict"] = idx_width / 8.0 / max(1.0, min(mean_run / 2, 4.0)) + key_bytes / n + 0.05
    return min(costs, key=costs.get)


def choose_string_codec(stats: dict, general_compression: bool = True) -> str:
    """Pick plain | dict | fsst for a string data block.

    `general_compression`: whether the container will trial a general
    compressor (zstd/snappy) over the encoded payload. When it will —
    the default path — FSST is strictly dominated: measured on both
    structured ids and natural text, plain+zstd is 15-50x faster to
    encode AND 15-25% smaller than fsst+zstd (zstd already captures the
    substring redundancy FSST targets, and compressing FSST output
    destroys the patterns zstd needs). FSST earns its keep only when
    general compression is off (random-access-friendly storage) or via
    explicit codec override."""
    n = stats["n"]
    if n == 0:
        return "plain"
    ndv, sample_n = stats.get("ndv", n), stats.get("sample_n", n)
    if ndv <= max(2, 0.25 * sample_n) and ndv <= 65536:
        return "dict"
    if (
        not general_compression
        and stats.get("avg_len", 0.0) >= 4.0
        and stats.get("total_bytes", 0) >= 1024
    ):
        return "fsst"
    return "plain"


def choose_float_codec(stats: dict) -> str:
    ndv, sample_n = stats.get("ndv", 1), stats.get("sample_n", 1)
    if ndv <= 0.1 * sample_n and ndv <= 4096:
        return "dict"
    return "plain"
