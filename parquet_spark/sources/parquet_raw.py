"""Standards-compliant Parquet v1 writer/reader built from the public
format spec (parquet-format thrift definitions + thrift compact protocol)
— no pyarrow.parquet involved, so this module IS the interop proof.

The reference's entire deliverable is a file any Parquet reader can open:
`PAR1` magic + thrift FileMetaData footer (/root/reference/parquet.go:
217-260), page headers (:154-186), PLAIN values + RLE definition levels
for optional columns (fields.go:96-135,232-317). This module reproduces
that exact layout on the write side and parses it on the read side:

    PAR1
    [column chunk: page header (thrift compact) + def levels (RLE, 4-byte
     length prefix) + PLAIN values] ...
    FileMetaData (thrift compact)
    uint32 LE footer length
    PAR1

Scope (the reference's own envelope): flat schemas, REQUIRED/OPTIONAL
fields, BOOLEAN/INT32/INT64/FLOAT/DOUBLE/BYTE_ARRAY, v1 data pages, PLAIN
encoding, UNCOMPRESSED/SNAPPY/GZIP/ZSTD page compression. The reader also
accepts the subset pyarrow emits under use_dictionary=False +
data_page_version='1.0' (cross-writer test coverage).

Byte kernels are shared with the engine's own codecs: plain.py for PLAIN
values (encode parity with template_required.go:37-48 /
template_string.go:29-36 / template_bool.go:24-36) and rle.py for the
definition-level hybrid stream (identical to internal/rle/rle.go).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from parquet_spark.codecs import plain, rle

MAGIC = b"PAR1"

# parquet-format enums (public spec)
T_BOOLEAN, T_INT32, T_INT64, T_INT96, T_FLOAT, T_DOUBLE, T_BYTE_ARRAY = 0, 1, 2, 3, 4, 5, 6
REQUIRED, OPTIONAL, REPEATED = 0, 1, 2
ENC_PLAIN, ENC_PLAIN_DICT, ENC_RLE, ENC_BIT_PACKED, ENC_RLE_DICT = 0, 2, 3, 4, 8
CODEC_IDS = {"none": 0, "snappy": 1, "gzip": 2, "lz4": 5, "zstd": 6}
CODEC_NAMES = {v: k for k, v in CODEC_IDS.items()}
PAGE_DATA, PAGE_INDEX, PAGE_DICT, PAGE_DATA_V2 = 0, 1, 2, 3
CONVERTED_UTF8 = 0

_PA_TO_PHYS = {
    pa.bool_(): T_BOOLEAN,
    pa.int32(): T_INT32,
    pa.int64(): T_INT64,
    pa.float32(): T_FLOAT,
    pa.float64(): T_DOUBLE,
    pa.string(): T_BYTE_ARRAY,
    pa.binary(): T_BYTE_ARRAY,
}
_PHYS_NP = {T_INT32: np.int32, T_INT64: np.int64, T_FLOAT: np.float32, T_DOUBLE: np.float64}


# ===================================================== thrift compact protocol
# Public spec: field header (delta<<4)|type, zigzag ULEB128 ints, varint-
# length binary, (size<<4)|elemtype list headers, 0x00 struct terminator.

CT_STOP, CT_TRUE, CT_FALSE, CT_BYTE, CT_I16, CT_I32, CT_I64 = 0, 1, 2, 3, 4, 5, 6
CT_DOUBLE, CT_BINARY, CT_LIST, CT_SET, CT_MAP, CT_STRUCT = 7, 8, 9, 10, 11, 12


def _uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


class TCWriter:
    """Minimal thrift-compact struct writer (fields must come id-ascending)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self._last: list[int] = [0]

    def _header(self, fid: int, ctype: int) -> None:
        delta = fid - self._last[-1]
        if 0 < delta <= 15:
            self.buf.append((delta << 4) | ctype)
        else:
            self.buf.append(ctype)
            self.buf += _uvarint(_zigzag(fid))
        self._last[-1] = fid

    def i32(self, fid: int, v: int) -> None:
        self._header(fid, CT_I32)
        self.buf += _uvarint(_zigzag(v))

    def i64(self, fid: int, v: int) -> None:
        self._header(fid, CT_I64)
        self.buf += _uvarint(_zigzag(v))

    def boolean(self, fid: int, v: bool) -> None:
        self._header(fid, CT_TRUE if v else CT_FALSE)

    def binary(self, fid: int, v: bytes | str) -> None:
        if isinstance(v, str):
            v = v.encode()
        self._header(fid, CT_BINARY)
        self.buf += _uvarint(len(v)) + v

    def list_header(self, fid: int, elem_ctype: int, size: int) -> None:
        self._header(fid, CT_LIST)
        if size < 15:
            self.buf.append((size << 4) | elem_ctype)
        else:
            self.buf.append(0xF0 | elem_ctype)
            self.buf += _uvarint(size)

    def i32_list(self, fid: int, vals: list[int]) -> None:
        self.list_header(fid, CT_I32, len(vals))
        for v in vals:
            self.buf += _uvarint(_zigzag(v))

    def str_list(self, fid: int, vals: list[str]) -> None:
        self.list_header(fid, CT_BINARY, len(vals))
        for v in vals:
            b = v.encode()
            self.buf += _uvarint(len(b)) + b

    def struct_begin(self, fid: int) -> None:
        self._header(fid, CT_STRUCT)
        self._last.append(0)

    def struct_end(self) -> None:
        self.buf.append(CT_STOP)
        self._last.pop()

    def struct_list_begin(self, fid: int, size: int) -> None:
        self.list_header(fid, CT_STRUCT, size)

    def finish(self) -> bytes:
        """Terminate the top-level struct and return its bytes."""
        self.buf.append(CT_STOP)
        return bytes(self.buf)

    def elem_struct_begin(self) -> None:  # struct inside a list: fresh id context
        self._last.append(0)

    def elem_struct_end(self) -> None:
        self.buf.append(CT_STOP)
        self._last.pop()


class TCReader:
    """Generic thrift-compact parser: returns {field_id: value}, structs as
    nested dicts, lists as Python lists — unknown fields parse fine (needed
    to read pyarrow/duckdb footers with logical types, column orders...)."""

    def __init__(self, buf: memoryview, pos: int = 0) -> None:
        self.buf = buf
        self.pos = pos

    def _uvarint(self) -> int:
        out = shift = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7

    def _zigzag(self) -> int:
        u = self._uvarint()
        return (u >> 1) ^ -(u & 1)

    def _value(self, ctype: int):
        if ctype in (CT_TRUE, CT_FALSE):
            return ctype == CT_TRUE
        if ctype == CT_BYTE:
            v = self.buf[self.pos]
            self.pos += 1
            return v
        if ctype in (CT_I16, CT_I32, CT_I64):
            return self._zigzag()
        if ctype == CT_DOUBLE:
            (v,) = struct.unpack_from("<d", self.buf, self.pos)
            self.pos += 8
            return v
        if ctype == CT_BINARY:
            n = self._uvarint()
            v = bytes(self.buf[self.pos : self.pos + n])
            self.pos += n
            return v
        if ctype in (CT_LIST, CT_SET):
            head = self.buf[self.pos]
            self.pos += 1
            size = head >> 4
            etype = head & 0x0F
            if size == 15:
                size = self._uvarint()
            if etype in (CT_TRUE, CT_FALSE):  # list bools are 1-byte values
                vals = [self.buf[self.pos + i] == 1 for i in range(size)]
                self.pos += size
                return vals
            return [self._value(etype) for _ in range(size)]
        if ctype == CT_STRUCT:
            return self.read_struct()
        raise ValueError(f"unsupported thrift compact type {ctype}")

    def read_struct(self) -> dict:
        out: dict = {}
        fid = 0
        while True:
            head = self.buf[self.pos]
            self.pos += 1
            if head == CT_STOP:
                return out
            delta = head >> 4
            ctype = head & 0x0F
            fid = fid + delta if delta else self._zigzag()
            out[fid] = self._value(ctype)


# ================================================================= writer


def _plain_encode(arr: pa.Array, phys: int) -> tuple[bytes, int]:
    """PLAIN bytes of the non-null values + num_values (incl nulls)."""
    dense = arr.drop_null() if arr.null_count else arr
    if phys == T_BOOLEAN:
        return plain.encode_bool(np.asarray(dense.cast(pa.bool_()))), len(arr)
    if phys == T_BYTE_ARRAY:
        vals = [v.encode() if isinstance(v, str) else v for v in dense.to_pylist()]
        return plain.encode_strings_ref(vals), len(arr)
    npdt = _PHYS_NP[phys]
    return plain.encode_numeric(np.asarray(dense).astype(npdt, copy=False)), len(arr)


def _def_levels(arr: pa.Array) -> bytes:
    """RLE hybrid stream (4-byte length prefix included — rle.encode emits
    exactly parquet's definition-level framing) at bit width 1."""
    valid = np.zeros(len(arr), dtype=np.uint64)
    if arr.null_count == 0:
        valid[:] = 1
    else:
        valid[~np.asarray(arr.is_null())] = 1
    return rle.encode(valid, 1)


def write_file(
    path: str,
    table: pa.Table,
    compression: str = "none",
    page_rows: int = 65536,
    created_by: str = "parquet_spark raw writer",
) -> dict:
    """Write `table` (flat schema) as a standards-compliant Parquet v1
    file. Returns a summary {column: {pages, bytes}} for inspection."""
    codec_id = CODEC_IDS[compression]
    codec = None if compression == "none" else pa.Codec(compression)
    cols = []
    for field in table.schema:
        if field.type not in _PA_TO_PHYS:
            raise TypeError(f"unsupported type {field.type} for column {field.name!r}")
        cols.append((field.name, _PA_TO_PHYS[field.type], field))

    summary: dict = {}
    with open(path, "wb") as f:
        f.write(MAGIC)
        offset = 4
        chunks_meta = []
        for (name, phys, field), col in zip(cols, table.columns):
            arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            optional = field.nullable
            if not optional and arr.null_count:
                # a REQUIRED column writes no def levels, so nulls here would
                # silently produce a value stream shorter than num_values —
                # an unreadable file; fail at write time instead
                raise ValueError(
                    f"column {name!r} is declared non-nullable but holds "
                    f"{arr.null_count} null(s)"
                )
            data_page_offset = offset
            total_comp = total_uncomp = 0
            n_pages = 0
            for start in range(0, len(arr), page_rows):
                page = arr.slice(start, page_rows)
                body = b""
                if optional:
                    body += _def_levels(page)
                values, n_vals = _plain_encode(page, phys)
                body += values
                comp_body = codec.compress(body).to_pybytes() if codec else body
                hdr = TCWriter()
                hdr.i32(1, PAGE_DATA)
                hdr.i32(2, len(body))
                hdr.i32(3, len(comp_body))
                hdr.struct_begin(5)  # DataPageHeader
                hdr.i32(1, n_vals)
                hdr.i32(2, ENC_PLAIN)
                hdr.i32(3, ENC_RLE)         # definition levels
                hdr.i32(4, ENC_BIT_PACKED)  # repetition levels (absent, flat)
                hdr.struct_end()
                page_bytes = hdr.finish() + comp_body
                f.write(page_bytes)
                offset += len(page_bytes)
                total_comp += len(page_bytes)
                total_uncomp += len(hdr.buf) + len(body)
                n_pages += 1
            chunks_meta.append(
                dict(name=name, phys=phys, n_values=len(arr), codec=codec_id,
                     uncomp=total_uncomp, comp=total_comp, page_off=data_page_offset)
            )
            summary[name] = {"pages": n_pages, "bytes": total_comp}

        # FileMetaData footer
        w = TCWriter()
        w.i32(1, 1)  # version
        w.struct_list_begin(2, len(cols) + 1)  # schema: root + leaves
        w.elem_struct_begin()
        w.binary(4, "schema")
        w.i32(5, len(cols))
        w.elem_struct_end()
        for name, phys, field in cols:
            w.elem_struct_begin()
            w.i32(1, phys)
            w.i32(3, OPTIONAL if field.nullable else REQUIRED)
            w.binary(4, name)
            if field.type == pa.string():
                w.i32(6, CONVERTED_UTF8)
            w.elem_struct_end()
        w.i64(3, table.num_rows)
        w.struct_list_begin(4, 1)  # one row group
        w.elem_struct_begin()
        w.struct_list_begin(1, len(chunks_meta))  # columns
        for cm in chunks_meta:
            w.elem_struct_begin()
            w.i64(2, cm["page_off"])  # file_offset
            w.struct_begin(3)  # ColumnMetaData
            w.i32(1, cm["phys"])
            w.i32_list(2, [ENC_PLAIN, ENC_RLE])
            w.str_list(3, [cm["name"]])
            w.i32(4, cm["codec"])
            w.i64(5, cm["n_values"])
            w.i64(6, cm["uncomp"])
            w.i64(7, cm["comp"])
            w.i64(9, cm["page_off"])  # data_page_offset
            w.struct_end()
            w.elem_struct_end()
        w.i64(2, sum(cm["comp"] for cm in chunks_meta))
        w.i64(3, table.num_rows)
        w.elem_struct_end()
        w.binary(6, created_by)
        footer = w.finish()
        f.write(footer)
        f.write(struct.pack("<I", len(footer)))
        f.write(MAGIC)
    return summary


# ================================================================= reader


def _plain_decode(body: memoryview, n: int, phys: int) -> pa.Array:
    if phys == T_BOOLEAN:
        return pa.array(plain.decode_bool(body, n))
    if phys == T_BYTE_ARRAY:
        return pa.array(plain.decode_strings_ref(bytes(body), n), pa.binary())
    npdt = _PHYS_NP[phys]
    return pa.array(plain.decode_numeric(body, n, np.dtype(npdt)))


def read_metadata(path: str) -> dict:
    """Parse the thrift FileMetaData footer into the raw field-id dict."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != MAGIC or data[-4:] != MAGIC:
        raise ValueError(f"{path}: not a parquet file (missing PAR1 magic)")
    (flen,) = struct.unpack_from("<I", data, len(data) - 8)
    start = len(data) - 8 - flen
    return {"_raw": data, "meta": TCReader(memoryview(data), start).read_struct()}


def read_file(path: str, columns: list[str] | None = None) -> pa.Table:
    """Read a flat-schema Parquet v1 file (PLAIN or dictionary-free subset)
    into a pa.Table, using only this module's parsers and the engine's
    plain/rle kernels."""
    parsed = read_metadata(path)
    data, meta = memoryview(parsed["_raw"]), parsed["meta"]
    schema_elems = meta[2]
    root, leaves = schema_elems[0], schema_elems[1:]
    if any(e.get(5) for e in leaves):
        raise NotImplementedError("nested parquet schemas not supported by the raw reader")
    names = [e[4].decode() for e in leaves]
    phys_by_name = {e[4].decode(): e[1] for e in leaves}
    opt_by_name = {e[4].decode(): e.get(3, REQUIRED) == OPTIONAL for e in leaves}
    utf8_by_name = {e[4].decode(): e.get(6) == CONVERTED_UTF8 for e in leaves}
    # None = all columns; an explicit [] is an (honored) empty projection
    want = names if columns is None else list(columns)
    unknown = [c for c in want if c not in names]
    if unknown:
        raise KeyError(f"column(s) {unknown} not in parquet file; available: {names}")

    arrays: dict[str, list[pa.Array]] = {c: [] for c in want}
    for rg in meta[4]:
        for chunk in rg[1]:
            cm = chunk[3]
            name = cm[3][0].decode()
            if name not in want:
                continue
            phys, n_total, codec_id = cm[1], cm[5], cm[4]
            codec_name = CODEC_NAMES.get(codec_id)
            if codec_name is None:
                raise NotImplementedError(f"compression codec id {codec_id}")
            codec = None if codec_name == "none" else pa.Codec(codec_name)
            pos = cm.get(11) or cm.get(9) or chunk.get(2)  # dict page first if any
            got = 0
            dict_vals: pa.Array | None = None
            while got < n_total:
                rdr = TCReader(data, pos)
                hdr = rdr.read_struct()
                body_start = rdr.pos
                comp_size = hdr[3]
                body = data[body_start : body_start + comp_size]
                pos = body_start + comp_size
                if codec is not None:
                    body = memoryview(codec.decompress(bytes(body), hdr[2]))
                if hdr[1] == PAGE_DICT:
                    dph = hdr[7]
                    if dph[2] not in (ENC_PLAIN, ENC_PLAIN_DICT):
                        raise NotImplementedError(f"dictionary page encoding {dph[2]}")
                    dict_vals = _plain_decode(body, dph[1], phys)
                    continue
                if hdr[1] != PAGE_DATA:
                    raise NotImplementedError(f"page type {hdr[1]} (v2 pages unsupported)")
                dph = hdr[5]
                n_vals, enc, def_enc = dph[1], dph[2], dph[3]
                if enc not in (ENC_PLAIN, ENC_PLAIN_DICT, ENC_RLE_DICT):
                    raise NotImplementedError(f"value encoding {enc}")
                off = 0
                validity = None
                if opt_by_name[name]:
                    if def_enc != ENC_RLE:
                        raise NotImplementedError(f"definition-level encoding {def_enc}")
                    levels, consumed = rle.decode(body, n_vals, 1)
                    off += consumed
                    if int(levels.sum()) != n_vals:
                        validity = levels.astype(bool)
                n_dense = n_vals if validity is None else int(validity.sum())
                if enc == ENC_PLAIN:
                    vals = _plain_decode(body[off:], n_dense, phys)
                else:  # dictionary indices: 1 byte bit width + unframed RLE
                    if dict_vals is None:
                        raise ValueError(f"column {name!r}: dict-encoded page before dict page")
                    width = body[off]
                    rest = bytes(body[off + 1 :])
                    idx, _ = rle.decode(struct.pack("<i", len(rest)) + rest, n_dense, width)
                    vals = dict_vals.take(pa.array(idx.astype(np.int64), pa.int64()))
                if validity is not None:
                    # null scatter: take() with null indices yields nulls
                    idx = np.zeros(n_vals, dtype=np.int64)
                    idx[validity] = np.arange(n_dense)
                    vals = vals.take(pa.array(idx, pa.int64(), mask=~validity))
                if utf8_by_name[name] and vals.type == pa.binary():
                    vals = vals.cast(pa.string())
                arrays[name].append(vals)
                got += n_vals

    phys_pa = {T_BOOLEAN: pa.bool_(), T_INT32: pa.int32(), T_INT64: pa.int64(),
               T_FLOAT: pa.float32(), T_DOUBLE: pa.float64()}
    out = []
    for c in want:
        chunks = arrays[c]
        if not chunks:  # zero-row file
            t = phys_pa.get(phys_by_name[c], pa.string() if utf8_by_name[c] else pa.binary())
            out.append(pa.array([], t))
        else:
            out.append(pa.concat_arrays(chunks) if len(chunks) != 1 else chunks[0])
    return pa.table(out, names=list(want))


# ===================================================== distributed export


def export_parquet(df, out_dir: str, compression: str = "snappy", page_rows: int = 65536):
    """Distributed standards-Parquet export: each partition writes one
    part-N.parquet via the raw writer inside a mapInArrow task (no driver
    collect — the scale path for 'hand this table to any Parquet reader').
    Returns the per-part summary DataFrame (path, rows, bytes); consuming
    it is what triggers the export."""
    import os

    def fn(batches):
        from pyspark import TaskContext

        import pyarrow as _pa

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        tbls = [
            _pa.Table.from_batches([b]) for b in batches if b.num_rows
        ]
        if not tbls:
            return
        table = _pa.concat_tables(tbls)
        path = os.path.join(out_dir, f"part-{pid:05d}.parquet")
        write_file(path, table, compression=compression, page_rows=page_rows)
        yield _pa.RecordBatch.from_arrays(
            [
                _pa.array([path], _pa.string()),
                _pa.array([table.num_rows], _pa.int64()),
                _pa.array([os.path.getsize(path)], _pa.int64()),
            ],
            names=["path", "n_rows", "n_bytes"],
        )

    os.makedirs(out_dir, exist_ok=True)
    return df.mapInArrow(fn, "path string, n_rows long, n_bytes long")
