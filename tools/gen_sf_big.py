"""Generate a larger bench dataset by tiling sf0.1 tables K times with
key offsets (default K=10 ≈ sf1.0, the driver's r5 measurement scale).

Measurement-infrastructure only — NOT part of the engine and NOT used by
bench.py; it exists so the optimization round can A/B at the driver's
scale after sandbox restarts wiped the tmpfs copy. /root/testdata itself
is read-only and untouched.

Usage: python tools/gen_sf_big.py [out_dir] [K]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
KEY_OFFSETS = {
    "lineitem": ("l_orderkey",),
    "orders": ("o_orderkey",),
    "documents": ("doc_id",),
    "events": ("event_id",),
    "embeddings": ("emb_id",),
}


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/sfbig"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    for name in ("lineitem", "documents", "orders"):
        t = pq.read_table(f"{SRC}/{name}.parquet")
        tiles = []
        for i in range(k):
            tile = t
            for keycol in KEY_OFFSETS.get(name, ()):
                if keycol in tile.column_names:
                    col = tile.column(keycol)
                    off = pa.scalar(
                        i * 10_000_000, type=col.type if pa.types.is_integer(col.type) else pa.int64()
                    )
                    if pa.types.is_integer(col.type):
                        tile = tile.set_column(
                            tile.schema.get_field_index(keycol),
                            keycol,
                            pc.add(col, off),
                        )
            tiles.append(tile)
        big = pa.concat_tables(tiles)
        # match sf0.1's layout style: a handful of row groups so Spark's
        # planner and the fused planner both see a few-files/few-rg shape,
        # like the driver's own single-file-per-table layout
        pq.write_table(big, f"{out}/{name}.parquet", row_group_size=len(big) // 8 + 1)
        print(name, len(big), "->", f"{out}/{name}.parquet", flush=True)


if __name__ == "__main__":
    main()
