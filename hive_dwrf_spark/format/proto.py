"""Minimal protobuf wire-format codec for the DWRF metadata messages.

Message/field layout follows orc_proto.proto (package com.facebook.hive.orc)
verbatim; the codec itself is a tiny generic encoder/decoder driven by a
per-message field spec, so we carry no protobuf dependency.

Wire types used: 0 = varint, 1 = 64-bit, 2 = length-delimited.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field, fields as dc_fields

# --- primitive wire helpers -------------------------------------------------


def write_varint(out: bytearray, value: int) -> None:
    value &= (1 << 64) - 1
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def zigzag(value: int) -> int:
    return (value << 1) ^ (value >> 63) if value >= 0 else ((-value) << 1) - 1


def unzigzag(value: int) -> int:
    return (value >> 1) ^ -(value & 1)


def read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if b < 0x80:
            return result, pos
        shift += 7


def _tag(out: bytearray, num: int, wire: int) -> None:
    write_varint(out, (num << 3) | wire)


# --- field spec driven encode/decode ----------------------------------------
# spec entry: field number -> (attr_name, kind)
# kind: "uint" | "sint" | "double" | "bytes" | "string" | "packed_uint"
#       | ("msg", cls) | ("rmsg", cls) — repeated message


def encode_message(msg) -> bytes:
    out = bytearray()
    for num, (name, kind) in type(msg).SPEC.items():
        val = getattr(msg, name)
        if val is None:
            continue
        if kind == "uint":
            _tag(out, num, 0)
            write_varint(out, int(val))
        elif kind == "sint":
            _tag(out, num, 0)
            write_varint(out, zigzag(int(val)))
        elif kind == "double":
            _tag(out, num, 1)
            out += struct.pack("<d", float(val))
        elif kind in ("bytes", "string"):
            data = val.encode("utf-8") if isinstance(val, str) else bytes(val)
            _tag(out, num, 2)
            write_varint(out, len(data))
            out += data
        elif kind == "packed_uint":
            if len(val) == 0:
                continue
            body = bytearray()
            for v in val:
                write_varint(body, int(v))
            _tag(out, num, 2)
            write_varint(out, len(body))
            out += body
        elif isinstance(kind, tuple) and kind[0] == "msg":
            body = encode_message(val)
            _tag(out, num, 2)
            write_varint(out, len(body))
            out += body
        elif isinstance(kind, tuple) and kind[0] == "rmsg":
            for item in val:
                body = encode_message(item)
                _tag(out, num, 2)
                write_varint(out, len(body))
                out += body
        elif kind == "rstring":
            for item in val:
                data = item.encode("utf-8")
                _tag(out, num, 2)
                write_varint(out, len(data))
                out += data
        else:  # pragma: no cover
            raise ValueError(f"unknown kind {kind}")
    return bytes(out)


def decode_message(cls, buf: memoryview, start: int = 0, end: int | None = None):
    if end is None:
        end = len(buf)
    msg = cls()
    pos = start
    spec = cls.SPEC
    while pos < end:
        key, pos = read_varint(buf, pos)
        num, wire = key >> 3, key & 7
        entry = spec.get(num)
        if wire == 0:
            val, pos = read_varint(buf, pos)
            if entry:
                name, kind = entry
                if kind == "packed_uint":
                    # proto2 writers (the reference's generated Java) emit
                    # repeated uints UNPACKED by default: one varint-wired
                    # field per element — append, never overwrite the list
                    getattr(msg, name).append(val)
                else:
                    setattr(msg, name, unzigzag(val) if kind == "sint" else val)
        elif wire == 1:
            if entry:
                setattr(msg, entry[0], struct.unpack_from("<d", buf, pos)[0])
            pos += 8
        elif wire == 2:
            ln, pos = read_varint(buf, pos)
            if entry:
                name, kind = entry
                if kind == "string":
                    setattr(msg, name, bytes(buf[pos : pos + ln]).decode("utf-8"))
                elif kind == "bytes":
                    setattr(msg, name, bytes(buf[pos : pos + ln]))
                elif kind == "packed_uint":
                    vals = getattr(msg, name)
                    p = pos
                    while p < pos + ln:
                        v, p = read_varint(buf, p)
                        vals.append(v)
                elif kind == "rstring":
                    getattr(msg, name).append(
                        bytes(buf[pos : pos + ln]).decode("utf-8")
                    )
                elif isinstance(kind, tuple) and kind[0] == "msg":
                    setattr(msg, name, decode_message(kind[1], buf, pos, pos + ln))
                elif isinstance(kind, tuple) and kind[0] == "rmsg":
                    getattr(msg, name).append(
                        decode_message(kind[1], buf, pos, pos + ln)
                    )
            pos += ln
        elif wire == 5:
            pos += 4
        else:  # pragma: no cover
            raise ValueError(f"unsupported wire type {wire}")
    return msg


# --- messages (orc_proto.proto) ----------------------------------------------


@dataclass
class IntegerStatistics:
    minimum: int | None = None
    maximum: int | None = None
    sum: int | None = None

    SPEC = {1: ("minimum", "sint"), 2: ("maximum", "sint"), 3: ("sum", "sint")}


@dataclass
class DoubleStatistics:
    minimum: float | None = None
    maximum: float | None = None
    sum: float | None = None

    SPEC = {1: ("minimum", "double"), 2: ("maximum", "double"), 3: ("sum", "double")}


@dataclass
class StringStatistics:
    minimum: str | None = None
    maximum: str | None = None

    SPEC = {1: ("minimum", "string"), 2: ("maximum", "string")}


@dataclass
class BucketStatistics:
    count: list = field(default_factory=list)

    SPEC = {1: ("count", "packed_uint")}


@dataclass
class ColumnStatistics:
    numberOfValues: int | None = None
    intStatistics: IntegerStatistics | None = None
    doubleStatistics: DoubleStatistics | None = None
    stringStatistics: StringStatistics | None = None
    bucketStatistics: BucketStatistics | None = None

    SPEC = {
        1: ("numberOfValues", "uint"),
        2: ("intStatistics", ("msg", IntegerStatistics)),
        3: ("doubleStatistics", ("msg", DoubleStatistics)),
        4: ("stringStatistics", ("msg", StringStatistics)),
        5: ("bucketStatistics", ("msg", BucketStatistics)),
    }


@dataclass
class RowIndexEntry:
    positions: list = field(default_factory=list)
    statistics: ColumnStatistics | None = None

    SPEC = {1: ("positions", "packed_uint"), 2: ("statistics", ("msg", ColumnStatistics))}


@dataclass
class RowIndex:
    entry: list = field(default_factory=list)

    SPEC = {1: ("entry", ("rmsg", RowIndexEntry))}


@dataclass
class Stream:
    kind: int | None = None
    column: int | None = None
    length: int | None = None
    useVInts: int | None = None  # proto default true

    SPEC = {
        1: ("kind", "uint"),
        2: ("column", "uint"),
        3: ("length", "uint"),
        4: ("useVInts", "uint"),
    }

    @property
    def use_vints(self) -> bool:
        return True if self.useVInts is None else bool(self.useVInts)


@dataclass
class ColumnEncoding:
    kind: int | None = None
    dictionarySize: int | None = None

    SPEC = {1: ("kind", "uint"), 2: ("dictionarySize", "uint")}


@dataclass
class StripeFooter:
    streams: list = field(default_factory=list)
    columns: list = field(default_factory=list)

    SPEC = {1: ("streams", ("rmsg", Stream)), 2: ("columns", ("rmsg", ColumnEncoding))}


@dataclass
class Type:
    kind: int | None = None
    subtypes: list = field(default_factory=list)
    fieldNames: list = field(default_factory=list)

    SPEC = {
        1: ("kind", "uint"),
        2: ("subtypes", "packed_uint"),
        3: ("fieldNames", "rstring"),
    }


@dataclass
class StripeInformation:
    offset: int | None = None
    indexLength: int | None = None
    dataLength: int | None = None
    footerLength: int | None = None
    numberOfRows: int | None = None
    rawDataSize: int | None = None

    SPEC = {
        1: ("offset", "uint"),
        2: ("indexLength", "uint"),
        3: ("dataLength", "uint"),
        4: ("footerLength", "uint"),
        5: ("numberOfRows", "uint"),
        6: ("rawDataSize", "uint"),
    }


@dataclass
class UserMetadataItem:
    name: str | None = None
    value: bytes | None = None

    SPEC = {1: ("name", "string"), 2: ("value", "bytes")}


@dataclass
class Footer:
    headerLength: int | None = None
    contentLength: int | None = None
    stripes: list = field(default_factory=list)
    types: list = field(default_factory=list)
    metadata: list = field(default_factory=list)
    numberOfRows: int | None = None
    statistics: list = field(default_factory=list)
    rowIndexStride: int | None = None
    rawDataSize: int | None = None

    SPEC = {
        1: ("headerLength", "uint"),
        2: ("contentLength", "uint"),
        3: ("stripes", ("rmsg", StripeInformation)),
        4: ("types", ("rmsg", Type)),
        5: ("metadata", ("rmsg", UserMetadataItem)),
        6: ("numberOfRows", "uint"),
        7: ("statistics", ("rmsg", ColumnStatistics)),
        8: ("rowIndexStride", "uint"),
        9: ("rawDataSize", "uint"),
    }


@dataclass
class PostScript:
    footerLength: int | None = None
    compression: int | None = None
    compressionBlockSize: int | None = None

    SPEC = {
        1: ("footerLength", "uint"),
        2: ("compression", "uint"),
        3: ("compressionBlockSize", "uint"),
    }


def roundtrip_equal(msg) -> bool:
    """Debug helper: encode→decode→encode must be byte-stable."""
    enc = encode_message(msg)
    dec = decode_message(type(msg), memoryview(enc))
    return encode_message(dec) == enc
