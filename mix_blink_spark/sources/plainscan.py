"""Direct PLAIN-page decode of an uncompressed parquet BYTE_ARRAY column.

Why this exists (round 8): the python-direct scan's cost after the
zero-copy utf-8 decode landed is pyarrow's parquet->Arrow BYTE_ARRAY
assembly itself — measured 0.55 GB/s single-threaded on the bench
corpus' 80 KB html cells against a 6.9 GB/s warm page-cache read ceiling
(DuckDB's reader measures the same 0.4-0.5 GB/s band, so this is the
state of general-purpose parquet readers, not a pyarrow defect). For the
narrow case the bench corpus actually is — UNCOMPRESSED codec, PLAIN
encoding, no dictionary page, v1 data pages, top-level optional column —
the column chunk's on-disk layout is just

    [page header (thrift compact)]
    [def levels: <u32 LE byte-length><RLE/bit-packed hybrid, bit width 1>]
    [values: <u32 LE length><bytes> ...]           (repeated per page)

and the values can be decoded straight off the mmap'd file at utf-8
speed (~3.7 GB/s here) with no intermediate Arrow materialization.

Safety contract: ``plain_decode_utf8`` returns ``None`` whenever ANY
metadata or page-level guard fails (codec, encoding, dictionary page,
page type, a null value in the def levels, short reads) — the caller
falls back to the pyarrow path, so the fast path can only ever produce
byte-identical output or decline. Byte-identity vs pyarrow is asserted
corpus-wide in tests (tests/test_plainscan.py) including null-bearing,
dictionary-encoded and compressed layouts that must all decline.
"""

from __future__ import annotations

import mmap
import struct as _struct

# thrift compact protocol type nibbles
_T_STOP = 0
_T_TRUE = 1
_T_FALSE = 2
_T_BYTE = 3
_T_I16 = 4
_T_I32 = 5
_T_I64 = 6
_T_DOUBLE = 7
_T_BINARY = 8
_T_LIST = 9
_T_SET = 10
_T_MAP = 11
_T_STRUCT = 12


def _varint(buf, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _zigzag(buf, pos: int) -> tuple[int, int]:
    v, pos = _varint(buf, pos)
    return (v >> 1) ^ -(v & 1), pos


def _skip(buf, pos: int, ftype: int) -> int:
    """Skip one thrift-compact value of ``ftype`` starting at ``pos``."""
    if ftype in (_T_TRUE, _T_FALSE):
        return pos
    if ftype == _T_BYTE:
        return pos + 1
    if ftype in (_T_I16, _T_I32, _T_I64):
        return _varint(buf, pos)[1]
    if ftype == _T_DOUBLE:
        return pos + 8
    if ftype == _T_BINARY:
        n, pos = _varint(buf, pos)
        return pos + n
    if ftype == _T_STRUCT:
        return _skip_struct(buf, pos)
    if ftype in (_T_LIST, _T_SET):
        b = buf[pos]
        pos += 1
        size = b >> 4
        etype = b & 0x0F
        if size == 15:
            size, pos = _varint(buf, pos)
        for _ in range(size):
            pos = _skip(buf, pos, etype)
        return pos
    if ftype == _T_MAP:
        size, pos = _varint(buf, pos)
        if size == 0:
            return pos
        b = buf[pos]
        pos += 1
        kt, vt = b >> 4, b & 0x0F
        for _ in range(size):
            pos = _skip(buf, pos, kt)
            pos = _skip(buf, pos, vt)
        return pos
    raise ValueError(f"unknown thrift type {ftype}")


def _skip_struct(buf, pos: int) -> int:
    last_id = 0
    while True:
        b = buf[pos]
        pos += 1
        if b == _T_STOP:
            return pos
        delta = b >> 4
        ftype = b & 0x0F
        if delta:
            last_id += delta
        else:
            last_id, pos = _zigzag(buf, pos)
        pos = _skip(buf, pos, ftype)


def _read_struct_i32s(buf, pos: int, want: dict[int, int | None]) -> tuple[dict, int]:
    """Read a thrift-compact struct keeping only i32 fields listed in
    ``want`` (and struct fields whose id is in want, recursing one level
    with the nested ``want`` replaced by i32 capture of all ids).

    Returns ({field_id: value-or-(nested dict)}, end_pos)."""
    out: dict = {}
    last_id = 0
    while True:
        b = buf[pos]
        pos += 1
        if b == _T_STOP:
            return out, pos
        delta = b >> 4
        ftype = b & 0x0F
        if delta:
            last_id += delta
        else:
            last_id, pos = _zigzag(buf, pos)
        if last_id in want and ftype in (_T_I16, _T_I32, _T_I64):
            v, pos = _zigzag(buf, pos)
            out[last_id] = v
        elif last_id in want and ftype == _T_STRUCT:
            nested, pos = _read_struct_i32s(buf, pos, _ALL_I32)
            out[last_id] = nested
        else:
            pos = _skip(buf, pos, ftype)


class _AllI32(dict):
    def __contains__(self, k) -> bool:  # capture every i32 field id
        return True


_ALL_I32 = _AllI32()

# parquet enum constants
_CODEC_UNCOMPRESSED = 0
_ENC_PLAIN = 0
_ENC_RLE = 3
_PAGE_DATA = 0


def _rle_all_ones(buf, pos: int, end: int, num_values: int) -> bool:
    """True iff the bit-width-1 RLE/bit-packed hybrid block in
    buf[pos:end] decodes to ``num_values`` ones (no nulls). False on any
    zero or anything surprising (caller then falls back)."""
    seen = 0
    while pos < end and seen < num_values:
        header, pos = _varint(buf, pos)
        if header & 1:  # bit-packed group: 8*(header>>1) values, 1 bit each
            groups = header >> 1
            nbytes = groups  # bit width 1 -> 1 byte per 8 values
            if pos + nbytes > end:
                return False
            n_here = min(8 * groups, num_values - seen)
            full, rem = divmod(n_here, 8)
            for i in range(full):
                if buf[pos + i] != 0xFF:
                    return False
            if rem and (buf[pos + full] & ((1 << rem) - 1)) != (1 << rem) - 1:
                return False
            seen += n_here
            pos += nbytes
        else:  # RLE run: (header>>1) copies of a 1-byte value (bit width 1)
            count = header >> 1
            if pos >= end:
                return False
            if buf[pos] != 1:
                return False
            seen += count
            pos += 1
    return seen >= num_values


def chunk_meta_supported(col_meta) -> bool:
    """Metadata-level guard: only UNCOMPRESSED + PLAIN (levels RLE or
    BIT_PACKED) with no dictionary page qualifies."""
    try:
        if col_meta.compression != "UNCOMPRESSED":
            return False
        if col_meta.dictionary_page_offset is not None:
            return False
        encs = set(col_meta.encodings)
        if not encs <= {"PLAIN", "RLE", "BIT_PACKED"}:
            return False
        if col_meta.physical_type != "BYTE_ARRAY":
            return False
    except Exception:
        return False
    return True


def plain_decode_utf8(
    mm: "mmap.mmap | bytes", col_meta, num_rows: int
) -> list[str] | None:
    """Decode one row group's BYTE_ARRAY column straight from the mmap'd
    file bytes as utf-8 (errors=replace), or return None if any guard
    fails. ``col_meta``: a pyarrow ColumnChunkMetaData for the column;
    ``num_rows``: the row group's row count (top-level column: one level
    per row)."""
    if not chunk_meta_supported(col_meta):
        return None
    start = col_meta.data_page_offset
    end = start + col_meta.total_compressed_size
    if end > len(mm):
        return None
    buf = mm
    out: list[str] = []
    unpack_u32 = _struct.unpack_from
    pos = start
    mv = memoryview(mm)
    try:
        while pos < end and len(out) < num_rows:
            hdr, hend = _read_struct_i32s(buf, pos, {1: None, 2: None, 3: None, 5: None})
            ptype = hdr.get(1)
            usize = hdr.get(2)
            csize = hdr.get(3)
            if usize is None or csize is None or usize != csize:
                return None
            payload0 = hend
            payload1 = payload0 + csize
            if payload1 > end:
                return None
            if ptype != _PAGE_DATA:
                return None
            dph = hdr.get(5)
            if not isinstance(dph, dict):
                return None
            num_values = dph.get(1)
            enc = dph.get(2)
            dl_enc = dph.get(3)
            if num_values is None or enc != _ENC_PLAIN or dl_enc != _ENC_RLE:
                return None
            # def levels block: <u32 LE byte length><hybrid runs>
            (dl_len,) = unpack_u32("<I", buf, payload0)
            dpos = payload0 + 4
            vpos = dpos + dl_len
            if vpos > payload1:
                return None
            if not _rle_all_ones(buf, dpos, vpos, num_values):
                return None  # nulls (or surprise): pyarrow path handles them
            for _ in range(num_values):
                (ln,) = unpack_u32("<I", buf, vpos)
                vpos += 4
                nxt = vpos + ln
                if nxt > payload1:
                    return None
                out.append(str(mv[vpos:nxt], "utf-8", "replace"))
                vpos = nxt
            pos = payload1
    except (IndexError, _struct.error, ValueError):
        return None
    if len(out) != num_rows:
        return None
    return out
