"""Sampled per-block column statistics that drive codec auto-selection.

The reference declares a DistinctCount stat but never computes it
(/root/reference/cmd/parquetgen/gen/template_required.go:102-104); its
min/max/null-count stats are write-only metadata (/root/reference/
parquet.go:102-107,164-169). This engine *consumes* statistics: sampled
cardinality, run structure, and value range decide the codec per
(partition, column) block — the north-star upgrade of reference op T7.

All stats are numpy-vectorized over a stride sample of the block.
"""

from __future__ import annotations

import numpy as np

SAMPLE_TARGET = 4096


def _sample(vals: np.ndarray, target: int = SAMPLE_TARGET) -> np.ndarray:
    n = len(vals)
    if n <= target:
        return vals
    # contiguous prefix + stride tail: keeps run structure visible while
    # still seeing the whole block's value range
    stride = max(1, n // (target // 2))
    return np.concatenate([vals[: target // 2], vals[:: stride][: target // 2]])


def block_stats(vals: np.ndarray) -> dict:
    """Stats for an integer/float value block (already null-stripped)."""
    n = len(vals)
    if n == 0:
        return {"n": 0, "ndv": 0, "mean_run": 1.0, "vmin": 0, "vmax": 0}
    s = _sample(vals)
    ns = len(s)
    runs = 1 + int(np.count_nonzero(np.diff(s))) if ns > 1 else 1
    kind = vals.dtype.kind
    if kind in "iu":
        vmin, vmax = int(vals.min()), int(vals.max())
    else:
        vmin, vmax = float(np.nanmin(vals)) if n else 0.0, float(np.nanmax(vals)) if n else 0.0
    ndv = int(len(np.unique(s)))
    out = {
        "n": n,
        "ndv": ndv,
        "sample_n": ns,
        "mean_run": ns / runs,
        "vmin": vmin,
        "vmax": vmax,
    }
    if kind in "iu" and n > 1:
        # zigzag-delta width over the CONTIGUOUS prefix (stride samples
        # break adjacency) — drives the delta_bp codec for sorted data
        pref = vals[: min(n, 2048)]
        u = pref.astype(np.int64, copy=False).view(np.uint64) if kind == "i" else pref.astype(np.uint64, copy=False)
        d = (u[1:] - u[:-1]).view(np.int64)
        zz = ((d << np.int64(1)) ^ (d >> np.int64(63))).view(np.uint64)
        m = int(zz.max()) if len(zz) else 0
        out["zz_width"] = int(m).bit_length()
    return out


def string_stats(offsets: np.ndarray, data: np.ndarray) -> dict:
    n = len(offsets) - 1
    if n <= 0:
        return {"n": 0, "ndv": 0, "avg_len": 0.0, "total_bytes": 0}
    lens = np.diff(offsets)
    if int(offsets[-1] - offsets[0]) == 0:
        # every string is empty — nothing to hash
        return {"n": n, "ndv": 1, "sample_n": n, "avg_len": 0.0, "total_bytes": 0}
    take = min(n, SAMPLE_TARGET)
    stride = max(1, n // take)
    idx = np.arange(0, n, stride)[:take]
    # hash-based sampled ndv: fnv-ish over (len, first8, last8 bytes) —
    # cheap, vectorized, collision-tolerant (only steers codec choice)
    starts = offsets[:-1][idx].astype(np.int64)
    ln = lens[idx].astype(np.int64)
    h = ln.copy()
    for k in range(8):
        b1 = np.where(ln > k, data[np.minimum(starts + k, len(data) - 1) if len(data) else starts * 0], 0)
        b2 = np.where(ln > k, data[np.maximum(starts + ln - 1 - k, 0)] if len(data) else 0, 0)
        h = h * 1099511628211 + b1 * 131 + b2
    ndv = int(len(np.unique(h)))
    return {
        "n": n,
        "ndv": ndv,
        "sample_n": len(idx),
        "avg_len": float(lens.mean()),
        "total_bytes": int(offsets[-1] - offsets[0]),
    }
