"""Pure numpy/pyarrow codec kernels — no Spark imports here.

Codec ids (stable on-disk values, see blocks.py for the container format):

  0 plain       LE fixed-width / offsets-strings (reference E1-E3)
  1 bitpack     LSB-first bit-packing, width 0..64 (reference E11 generalized)
  2 rle         Parquet RLE/bit-packed hybrid, width 0..32 (reference E10 generalized)
  3 dict        dictionary page + RLE/bit-packed indices (new vs reference)
  4 for_bp      frame-of-reference + bit-pack (new)
  5 fsst        FSST-style symbol-table string compression (new)
  6 delta_bp    delta + zigzag + bit-pack for sorted/sequential data (new)
  7 alp         ALP-style decimal floats: exact 10^e rescale to int64 +
                any int codec (new; Afroozeh & Boncz, "ALP: Adaptive
                Lossless floating-Point compression", SIGMOD 2023)
"""

PLAIN = 0
BITPACK = 1
RLE = 2
DICT = 3
FOR_BP = 4
FSST = 5
DELTA_BP = 6
ALP = 7

CODEC_NAMES = {
    PLAIN: "plain",
    BITPACK: "bitpack",
    RLE: "rle",
    DICT: "dict",
    FOR_BP: "for_bp",
    FSST: "fsst",
    DELTA_BP: "delta_bp",
    ALP: "alp",
}
CODEC_IDS = {v: k for k, v in CODEC_NAMES.items()}
