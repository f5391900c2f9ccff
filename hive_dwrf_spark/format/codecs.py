"""Numpy-vectorized stream codecs for DWRF.

On-disk bit/byte contracts follow the reference implementation:
- LEB128 varints, zigzag for signed (SerializationUtils.java:33-117)
- RLE v1: header byte h>=0 → run of h+3 values (delta byte + base),
  h<0 → -h literal values (RunLengthIntegerWriter.java:52-133)
- byte RLE: same grouping over raw bytes (RunLengthByteWriter.java)
- bitfield: 1-bit MSB-first packing layered on byte RLE (BitFieldWriter.java)
- block compression: 3-byte little-endian header (len<<1 | isOriginal),
  raw-deflate zlib / snappy per block (OutStream.java:116-134, ZlibCodec.java)

The implementations are original and batch-oriented: encode/decode whole
numpy arrays, never per-value Python loops on the hot path. Python-level
loops only iterate over *groups/blocks* (≤ n/3 for RLE, ~n/256KiB for
compression), with all per-value work inside numpy kernels.
"""

from __future__ import annotations

import zlib

import numpy as np

from .constants import (
    MAX_DELTA,
    MAX_LITERAL_SIZE,
    MAX_REPEAT_SIZE,
    MIN_DELTA,
    MIN_REPEAT_SIZE,
    CompressionKind,
)

try:
    import snappy  # optional

    _HAVE_SNAPPY = True
except ImportError:
    _HAVE_SNAPPY = False

U64 = np.uint64
_SHIFTS10 = (np.arange(10, dtype=np.uint64) * np.uint64(7))[None, :]
_IDX10 = np.arange(10)[None, :]


# --- varints ------------------------------------------------------------------


def zigzag_encode(values: np.ndarray) -> np.ndarray:
    v = values.astype(np.int64, copy=False)
    return ((v << 1) ^ (v >> 63)).view(np.uint64)


def zigzag_decode(values: np.ndarray) -> np.ndarray:
    v = values.astype(np.uint64, copy=False)
    return ((v >> np.uint64(1)).view(np.int64)) ^ -((v & np.uint64(1)).view(np.int64))


def encode_varints(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """uint64 array -> (LEB128 bytes, per-value byte lengths)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b"", np.zeros(0, dtype=np.int64)
    chunks = (v[:, None] >> _SHIFTS10) & np.uint64(0x7F)
    nonzero = chunks != 0
    any_nz = nonzero.any(axis=1)
    lengths = np.where(any_nz, 10 - np.argmax(nonzero[:, ::-1], axis=1), 1).astype(
        np.int64
    )
    keep = _IDX10 < lengths[:, None]
    cont = _IDX10 < (lengths - 1)[:, None]
    out = chunks.astype(np.uint8)
    out[cont] |= 0x80
    return out[keep].tobytes(), lengths


def decode_varints(buf: np.ndarray, count: int, pos: int = 0) -> tuple[np.ndarray, int]:
    """Decode `count` LEB128 varints from uint8 array starting at pos.

    Returns (uint64 values, next position). Vectorized: one pass to find
    terminator bytes, one reduceat to combine 7-bit groups.
    """
    if count == 0:
        return np.zeros(0, dtype=np.uint64), pos
    window = buf[pos:]
    term = np.flatnonzero(window < 0x80)
    end = int(term[count - 1]) + 1
    b = window[:end].astype(np.uint64)
    starts = np.empty(count, dtype=np.int64)
    starts[0] = 0
    starts[1:] = term[: count - 1] + 1
    # offset of each byte within its varint
    offsets = np.arange(end, dtype=np.int64) - np.repeat(
        starts, np.diff(np.append(starts, end))
    )
    contrib = (b & np.uint64(0x7F)) << (offsets.astype(np.uint64) * np.uint64(7))
    values = np.bitwise_or.reduceat(contrib, starts)
    return values, pos + end


# --- fixed-width little-endian (useVInts=false fallback) -----------------------


def encode_fixed(values: np.ndarray, num_bytes: int) -> bytes:
    v = values.astype(np.int64, copy=False).view(np.uint64)
    le = v[:, None] >> (np.arange(num_bytes, dtype=np.uint64) * np.uint64(8))[None, :]
    return (le & np.uint64(0xFF)).astype(np.uint8).tobytes()


def decode_fixed(buf: np.ndarray, count: int, num_bytes: int, pos: int = 0):
    raw = buf[pos : pos + count * num_bytes].reshape(count, num_bytes).astype(np.uint64)
    shifts = (np.arange(num_bytes, dtype=np.uint64) * np.uint64(8))[None, :]
    return (raw << shifts).sum(axis=1, dtype=np.uint64), pos + count * num_bytes


# --- RLE v1 over integers -------------------------------------------------------


def encode_int_rle(values: np.ndarray, signed: bool) -> bytes:
    """RLE v1 encode. Any valid grouping is legal; we pick maximal
    constant-delta runs ≥3 with delta in [-128,127], literals elsewhere.

    All varint work happens in ONE vectorized pass over every value that
    needs encoding (literals + run bases, in output order); the per-group
    Python loop only assembles headers and payload slices."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    n = len(v)
    if n == 0:
        return b""

    # groups: (header_bytes, n_encoded_values) in output order, with the
    # values to be varint-encoded collected in parallel
    groups: list[tuple[bytes, int]] = []
    enc_chunks: list[np.ndarray] = []

    def add_literals(span: np.ndarray) -> None:
        m = len(span)
        for gs in range(0, m, MAX_LITERAL_SIZE):
            sz = min(m - gs, MAX_LITERAL_SIZE)
            groups.append((bytes([256 - sz]), sz))
        enc_chunks.append(span)

    if n < MIN_REPEAT_SIZE:
        add_literals(v)
    else:
        d = v[1:] - v[:-1]
        eligible = (d[:-1] == d[1:]) & (d[:-1] >= MIN_DELTA) & (d[:-1] <= MAX_DELTA)
        pad = np.concatenate([[False], eligible, [False]])
        starts = np.flatnonzero(~pad[:-1] & pad[1:])
        ends = np.flatnonzero(pad[:-1] & ~pad[1:])  # exclusive, eligible-index space
        cursor = 0
        for s, e in zip(starts, ends):
            run_start, run_len = int(s), int(e - s) + 2  # values covered
            if run_start < cursor:
                run_len -= cursor - run_start
                run_start = cursor
                if run_len < MIN_REPEAT_SIZE:
                    continue
            if run_start > cursor:
                add_literals(v[cursor:run_start])
            delta = int(d[s])
            base = int(v[run_start])
            remaining = run_len
            bases = []
            while remaining >= MIN_REPEAT_SIZE:
                chunk = min(remaining, MAX_REPEAT_SIZE)
                groups.append((bytes([chunk - MIN_REPEAT_SIZE, delta & 0xFF]), 1))
                bases.append(base)
                base += delta * chunk
                remaining -= chunk
            enc_chunks.append(np.asarray(bases, dtype=np.int64))
            cursor = run_start + run_len - remaining
            if remaining:
                add_literals(v[cursor : cursor + remaining])
                cursor += remaining
        if cursor < n:
            add_literals(v[cursor:])

    ordered = (
        enc_chunks[0] if len(enc_chunks) == 1 else np.concatenate(enc_chunks)
    )
    enc = zigzag_encode(ordered) if signed else ordered.astype(np.uint64)
    body, lengths = encode_varints(enc)
    byte_offsets = np.empty(len(lengths) + 1, dtype=np.int64)
    byte_offsets[0] = 0
    np.cumsum(lengths, out=byte_offsets[1:])
    mv = memoryview(body)
    pieces = []
    vpos = 0
    for header, nvals in groups:
        pieces.append(header)
        pieces.append(mv[byte_offsets[vpos] : byte_offsets[vpos + nvals]])
        vpos += nvals
    return b"".join(pieces)


def decode_int_rle(buf: np.ndarray, count: int, signed: bool, pos: int = 0):
    """Decode `count` RLE v1 integers. Returns (int64 array, next pos).

    Batch strategy: one pass finds every varint terminator, the group walk
    only does O(log n) searchsorted per group to locate payload boundaries,
    then ALL varints decode in a single vectorized pass and groups are
    materialized by slice assignment into the preallocated output."""
    if count == 0:
        return np.zeros(0, dtype=np.int64), pos
    term = np.flatnonzero(buf[pos:] < 0x80) + pos  # terminator byte positions
    # group walk: (is_repeat, out_start, run_or_cnt, delta, n_varints) in order
    groups: list[tuple[bool, int, int, int, int]] = []
    regions: list[tuple[int, int]] = []  # varint payload byte regions, in order
    got = 0
    while got < count:
        h = int(buf[pos])
        pos += 1
        if h < 0x80:  # repeat: h+3 values (delta byte + base varint)
            run = h + MIN_REPEAT_SIZE
            delta = int(np.int8(buf[pos]))
            pos += 1
            ti = int(np.searchsorted(term, pos, side="left"))
            end = int(term[ti]) + 1
            regions.append((pos, end))
            groups.append((True, got, run, delta, 1))
            got += run
            pos = end
        else:  # literal: 256-h varints
            cnt = 256 - h
            ti = int(np.searchsorted(term, pos, side="left"))
            end = int(term[ti + cnt - 1]) + 1
            regions.append((pos, end))
            groups.append((False, got, cnt, 0, cnt))
            got += cnt
            pos = end
    if got != count:
        raise ValueError(f"RLE stream yielded {got} values, expected {count}")

    # one vectorized varint decode over the concatenated payload regions
    payload = (
        buf[regions[0][0] : regions[0][1]]
        if len(regions) == 1
        else np.concatenate([buf[a:b] for a, b in regions])
    )
    total_varints = sum(g[4] for g in groups)
    decoded_u, _ = decode_varints(payload, total_varints, 0)
    decoded = zigzag_decode(decoded_u) if signed else decoded_u.view(np.int64)

    out = np.empty(count, dtype=np.int64)
    vpos = 0
    for is_repeat, start, length, delta, nv in groups:
        if is_repeat:
            base = decoded[vpos]
            if delta == 0:
                out[start : start + length] = base
            else:
                out[start : start + length] = base + delta * np.arange(
                    length, dtype=np.int64
                )
        else:
            out[start : start + length] = decoded[vpos : vpos + nv]
        vpos += nv
    return out, pos


# --- byte RLE -------------------------------------------------------------------


def encode_byte_rle(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.uint8)
    n = len(v)
    out = bytearray()
    if n == 0:
        return b""
    change = np.flatnonzero(v[1:] != v[:-1]) + 1
    seg_starts = np.concatenate([[0], change])
    seg_ends = np.concatenate([change, [n]])
    lit_start = None
    for s, e in zip(seg_starts, seg_ends):
        ln = e - s
        if ln >= MIN_REPEAT_SIZE:
            if lit_start is not None:
                _emit_byte_literals(out, v[lit_start:s])
                lit_start = None
            remaining = ln
            while remaining >= MIN_REPEAT_SIZE:
                chunk = min(remaining, MAX_REPEAT_SIZE)
                out.append(chunk - MIN_REPEAT_SIZE)
                out.append(int(v[s]))
                remaining -= chunk
            if remaining:
                lit_start = e - remaining
        else:
            if lit_start is None:
                lit_start = s
    if lit_start is not None:
        _emit_byte_literals(out, v[lit_start:])
    return bytes(out)


def _emit_byte_literals(out: bytearray, vals: np.ndarray) -> None:
    n = len(vals)
    for gs in range(0, n, MAX_LITERAL_SIZE):
        sz = min(n - gs, MAX_LITERAL_SIZE)
        out.append(256 - sz)
        out += vals[gs : gs + sz].tobytes()


def decode_byte_rle(buf: np.ndarray, count: int, pos: int = 0):
    pieces = []
    got = 0
    while got < count:
        h = int(buf[pos])
        pos += 1
        if h < 0x80:
            run = h + MIN_REPEAT_SIZE
            pieces.append(np.full(run, buf[pos], dtype=np.uint8))
            pos += 1
            got += run
        else:
            cnt = 256 - h
            pieces.append(buf[pos : pos + cnt].copy())
            pos += cnt
            got += cnt
    values = np.concatenate(pieces) if pieces else np.zeros(0, dtype=np.uint8)
    if got != count:
        raise ValueError(f"byte RLE yielded {got} values, expected {count}")
    return values, pos


# --- bitfield (1-bit, MSB-first, layered on byte RLE) ----------------------------


def encode_bits(bits: np.ndarray) -> bytes:
    packed = np.packbits(bits.astype(np.uint8))  # MSB-first
    return encode_byte_rle(packed)


def decode_bits(buf: np.ndarray, count: int, pos: int = 0):
    nbytes = (count + 7) // 8
    packed, pos = decode_byte_rle(buf, nbytes, pos)
    return np.unpackbits(packed)[:count].astype(bool), pos


# --- block compression framing ----------------------------------------------------


def _compress_block(block: bytes, kind: CompressionKind, level: int) -> bytes:
    if kind == CompressionKind.ZLIB:
        c = zlib.compressobj(level, zlib.DEFLATED, -15)  # raw deflate
        return c.compress(block) + c.flush()
    if kind == CompressionKind.SNAPPY:
        if not _HAVE_SNAPPY:
            raise RuntimeError("snappy not available in this environment")
        return snappy.compress(block)
    raise ValueError(f"unsupported compression {kind}")


def _decompress_block(block: bytes, kind: CompressionKind) -> bytes:
    if kind == CompressionKind.ZLIB:
        return zlib.decompress(block, -15)
    if kind == CompressionKind.SNAPPY:
        if not _HAVE_SNAPPY:
            raise RuntimeError("snappy not available in this environment")
        return snappy.decompress(block)
    raise ValueError(f"unsupported compression {kind}")


def compress_stream(
    data: bytes, kind: CompressionKind, block_size: int, level: int = 4
) -> bytes:
    """Frame `data` into compressed blocks with 3-byte headers.

    Header low bit = 1 means the block is stored original (codec did not
    shrink it), matching OutStream.writeHeader.
    """
    if kind == CompressionKind.NONE:
        return data
    out = bytearray()
    for off in range(0, len(data), block_size):
        block = data[off : off + block_size]
        comp = _compress_block(block, kind, level)
        if len(comp) < len(block):
            header = (len(comp) << 1) | 0
            out += header.to_bytes(3, "little")
            out += comp
        else:
            header = (len(block) << 1) | 1
            out += header.to_bytes(3, "little")
            out += block
    return bytes(out)


def decompress_stream(data: bytes, kind: CompressionKind) -> bytes:
    if kind == CompressionKind.NONE:
        return data
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        header = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        ln = header >> 1
        block = data[pos : pos + ln]
        pos += ln
        out += block if header & 1 else _decompress_block(bytes(block), kind)
    return bytes(out)
