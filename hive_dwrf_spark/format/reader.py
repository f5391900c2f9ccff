"""DWRF file reader: footer parse -> stripe decode -> Arrow batches.

Tail-first parse like ReaderImpl.java:204-260 (1-byte postscript length,
PostScript, compressed Footer), then per-stripe decode of only the included
columns' streams (column projection, OrcInputFormat.java:121-163 analog) in
one vectorized pass per column — no lazy per-row materialization; Spark's
scan is batch-columnar anyway.

Filter pruning: pushed predicates are evaluated against file-level column
statistics and per-stride ROW_INDEX statistics; a stripe is skipped when no
stride can match (the reference records the machinery but leaves stats
evaluation to the consumer — SURVEY.md §4 O2)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from . import codecs, proto
from .profiler import profiler
from .constants import (
    MAGIC,
    TIMESTAMP_BASE_SECONDS,
    ColumnEncodingKind,
    CompressionKind,
    StreamKind,
    TypeKind,
)
from .stats import ColumnStats, stats_from_proto
from .types import arrow_type_of as _arrow_type_of
from .types import type_tree_to_schema


#: trailing-zero multiplier LUT for packed nanos: tag 0 -> x1 (no packing),
#: tag z>=1 -> x10^(z+1) (LazyTimestampTreeReader.java:99-108 decode table)
_NANO_MULT = np.array(
    [1] + [10 ** (z + 1) for z in range(1, 8)], dtype=np.int64
)


def _unpack_nanos(packed: np.ndarray) -> np.ndarray:
    # nanos < 1e9 so packed < 2^33: a signed view is safe, and the LUT
    # gather replaces the elementwise pow + where (was ~25% of a full
    # lineitem scan) with one gather and one multiply
    p = packed.view(np.int64)
    return (p >> 3) * _NANO_MULT[p & 7]


def _scatter(dense: pa.Array, present: np.ndarray) -> pa.Array:
    """Expand a dense (null-free) array to full length with nulls."""
    n = len(present)
    if len(dense) == n:
        return dense
    idx = np.zeros(n, dtype=np.int64)
    idx[present] = np.arange(len(dense), dtype=np.int64)
    return dense.take(pa.array(idx, type=pa.int64(), mask=~present))


def _validity_buffer(present: np.ndarray | None):
    if present is None:
        return None
    return pa.py_buffer(np.packbits(present, bitorder="little").tobytes())


class NoStridePositions(Exception):
    """Raised when a column carries no usable ROW_INDEX seek positions
    (nested type, stride-dictionary column, or a legacy file) — the
    caller falls back to whole-stripe decode."""


class DwrfNoChecksumsError(ValueError):
    """verify() called on a file written without ``checksums=True`` —
    there is nothing to scrub. A DEDICATED type so scrub surfaces (CLI
    ``verify``, the ``dwrf_verify`` TVF) can report 'no checksums'
    without a bare ``except ValueError`` that would also swallow an
    unexpected real failure as a benign skip."""


class DwrfCorruptError(ValueError):
    """Structurally invalid, truncated, or bit-damaged DWRF bytes.

    Every DwrfFile read surface funnels decode-time failures through
    this one type (original exception chained as __cause__), so callers
    can distinguish 'the file is damaged' from their own usage errors —
    the contract the reference pins with its corrupt-stream tests
    (TestInStream.java). Detection boundary, documented honestly: like
    the reference format, streams carry no per-block checksums, so a
    bit-flip inside raw DATA bytes that still decodes structurally
    (e.g. a literal value in an RLE run) is undetectable by ANY reader
    of this format; structural damage — truncation, header/footer/
    ROW_INDEX/stripe-directory corruption, compressed-block damage
    (zlib's own framing catches most flips) — raises this error and
    never returns fabricated rows."""


def _corrupt_guard(ctx: str):
    """Context manager converting low-level decode failures into
    DwrfCorruptError. Argument-contract errors must be raised BEFORE
    entering the guard (row-range IndexError, unknown-column KeyError)."""
    import struct
    import zlib
    from contextlib import contextmanager

    @contextmanager
    def guard():
        try:
            yield
        except (DwrfCorruptError, NoStridePositions):
            raise
        except (
            ValueError,
            TypeError,
            KeyError,
            IndexError,
            AttributeError,  # proto wire-type confusion on flipped tags
            OverflowError,
            EOFError,
            MemoryError,
            struct.error,
            zlib.error,
            pa.ArrowException,
        ) as e:
            raise DwrfCorruptError(f"{ctx}: corrupt DWRF data: {e}") from e

    return guard()


#: type kinds the stride-bounded decoder handles (matches the writer's
#: position-spec coverage; UNION falls back to full decode — branch value
#: positions would need per-stride per-branch counts the reference also
#: does not record)
_STRIDE_DECODABLE = {
    TypeKind.BOOLEAN,
    TypeKind.BYTE,
    TypeKind.SHORT,
    TypeKind.INT,
    TypeKind.LONG,
    TypeKind.FLOAT,
    TypeKind.DOUBLE,
    TypeKind.STRING,
    TypeKind.BINARY,
    TypeKind.TIMESTAMP,
    TypeKind.LIST,
    TypeKind.MAP,
    TypeKind.STRUCT,
}


class _PosCursor:
    """Sequential consumer of a RowIndexEntry's positions list (the
    stream-by-stream layout DwrfWriter._resolve_positions writes)."""

    def __init__(self, vals: list, compressed: bool):
        self.vals = vals
        self.i = 0
        self.compressed = compressed

    def take(self, k: int) -> list:
        if self.i + k > len(self.vals):
            raise NoStridePositions("positions exhausted")
        out = self.vals[self.i : self.i + k]
        self.i += k
        return out

    def instream(self):
        """(block offset | None, uncompressed offset)."""
        if self.compressed:
            blk, off = self.take(2)
            return blk, off
        (off,) = self.take(1)
        return None, off


class _StripeDecoder:
    """Decodes one stripe's streams.

    IO policy (RecordReaderImpl.java:281-399 / OrcConf.java:63-64 analog):
    with no projection, one eager read covers the whole stripe. With a
    projection, only the stripe footer is read up front; the included
    columns' stream byte ranges are then fetched in coalesced reads
    (adjacent/near ranges merged), falling back to one eager read when the
    projection covers most of the stripe bytes anyway. On object storage
    this is the difference between O(columns touched) and O(table width)
    bytes per task."""

    #: merge ranges separated by less than this many bytes into one IO
    _COALESCE_GAP = 64 * 1024
    #: if included streams cover more than this fraction, read eagerly
    _EAGER_FRACTION = 0.75

    def __init__(
        self,
        reader: "DwrfFile",
        stripe: proto.StripeInformation,
        include_ids: set[int] | None = None,
        index_ids: set[int] | None = None,
        prefetch: bool = True,
    ):
        """prefetch=False skips the up-front chunk read entirely — streams
        are then fetched on demand via the _raw_slice direct-IO fallback
        (one pread of the touched stream's compressed range). The point-
        lookup path uses this: a seek that decodes one stride must not
        pay a whole-stripe read per call."""
        self.r = reader
        self.stripe = stripe
        self._index_ids = index_ids or set()
        # nested-field projection: when set, struct decode emits only the
        # children whose type ids are included (A4's recursive pushdown)
        self.decode_ids = include_ids
        body_len = stripe.indexLength + stripe.dataLength
        footer_raw = reader._read_at(stripe.offset + body_len, stripe.footerLength)
        self.footer = proto.decode_message(
            proto.StripeFooter,
            memoryview(codecs.decompress_stream(bytes(footer_raw), reader.compression)),
        )
        self.encodings = self.footer.columns
        # stream directory: (column, kind) -> compressed byte range
        self._ranges: dict[tuple[int, int], tuple[int, int]] = {}
        off = 0
        for s in self.footer.streams:
            self._ranges[(s.column, s.kind)] = (off, s.length)
            off += s.length
        self._chunks: list[tuple[int, np.ndarray]] = []  # (start, bytes) sorted
        # stream cache: plain dict, GIL-atomic get/set. Under the column
        # thread pool two threads may rarely decompress the same stream
        # twice (distinct columns touch distinct streams, so in practice
        # never); idempotent, so no lock on the hot path.
        self._cache: dict[tuple[int, int], np.ndarray] = {}
        self._raw_cache: dict[tuple[int, int], np.ndarray] = {}
        self._ri_cache: dict[int, proto.RowIndex] = {}
        # decompressed-block cache for the stride-seek path (_buf_at):
        # consecutive stride seeks overwhelmingly land in the SAME
        # compression block (a 256 KB block holds ~5-10 strides of a
        # typical int stream), so without this every point lookup re-ran
        # zlib over bytes a previous lookup already inflated — measured
        # ~50% of read_row wall time on the sf0.1 lookup table. Keyed by
        # (column, stream kind, block offset); insertion-order eviction
        # under a byte budget, same GIL-atomic discipline as _cache.
        self._blk_cache: dict[tuple[int, int, int], np.ndarray] = {}
        self._blk_cache_bytes = 0
        self._blk_cache_budget = 32 * 1024 * 1024
        # per-thread decode scratch (present mask handoff to stride-dict
        # decode) so columns can decode concurrently
        import threading

        self._tls = threading.local()
        wanted = (
            self._wanted_ranges(include_ids, body_len) if prefetch else []
        )
        for start, end in wanted:
            data = reader._read_at(stripe.offset + start, end - start)
            self._chunks.append((start, np.frombuffer(data, dtype=np.uint8)))

    def _wanted_ranges(
        self, include_ids: set[int] | None, body_len: int
    ) -> list[tuple[int, int]]:
        if body_len == 0:
            return []
        if include_ids is None:
            return [(0, body_len)]
        # stride-dictionary columns need their ROW_INDEX even without a
        # filter: the per-stride dictionary sizes live in its positions
        stride_dict_cols = {
            col
            for (col, kind) in self._ranges
            if kind == int(StreamKind.IN_DICTIONARY) and col in include_ids
        }
        spans = sorted(
            (off, off + ln)
            for (col, kind), (off, ln) in self._ranges.items()
            if col in include_ids
            or (
                kind == int(StreamKind.ROW_INDEX)
                and (col in self._index_ids or col in stride_dict_cols)
            )
        )
        if not spans:
            return []
        merged = [list(spans[0])]
        for a, b in spans[1:]:
            if a - merged[-1][1] <= self._COALESCE_GAP:
                merged[-1][1] = max(merged[-1][1], b)
            else:
                merged.append([a, b])
        covered = sum(b - a for a, b in merged)
        if covered >= self._EAGER_FRACTION * body_len:
            return [(0, body_len)]
        return [(a, b) for a, b in merged]

    def has_stream(self, column: int, kind: StreamKind) -> bool:
        return (column, int(kind)) in self._ranges

    def _raw_slice(self, off: int, ln: int) -> np.ndarray:
        for start, arr in self._chunks:
            if start <= off and off + ln <= start + len(arr):
                return arr[off - start : off - start + ln]
        # stream outside the prefetched ranges (no-prefetch point-lookup
        # decoders, dump tooling): direct IO, memoized so a reused
        # decoder preads each touched stream once, not once per lookup —
        # bounded by the compressed size of the streams actually touched
        hit = self._raw_cache.get((off, ln))
        if hit is None:
            data = self.r._read_at(self.stripe.offset + off, ln)
            hit = np.frombuffer(data, dtype=np.uint8)
            self._raw_cache[(off, ln)] = hit
        return hit

    def stream(self, column: int, kind: StreamKind) -> np.ndarray:
        key = (column, int(kind))
        if key not in self._cache:
            off, ln = self._ranges[key]
            with profiler.phase("decompression"):
                # zero-copy handoff: the raw slice passes as a buffer
                # (no bytes() duplicate of the compressed stream) and a
                # stored single-block stream comes back as a window into
                # the prefetched chunk — no copies at all on that path
                data = codecs.decompress_stream(
                    self._raw_slice(off, ln), self.r.compression
                )
            self._cache[key] = np.frombuffer(data, dtype=np.uint8)
        return self._cache[key]

    def row_index(self, column: int) -> proto.RowIndex | None:
        if not self.has_stream(column, StreamKind.ROW_INDEX):
            return None
        # memoized: repeated point lookups on a reused decoder were
        # re-parsing every column's RowIndex proto per read_row (~40% of
        # a lookup); the parsed object is immutable here
        hit = self._ri_cache.get(column)
        if hit is None:
            hit = proto.decode_message(
                proto.RowIndex,
                memoryview(self.stream(column, StreamKind.ROW_INDEX).tobytes()),
            )
            self._ri_cache[column] = hit
        return hit

    # -- stride-bounded decode (ROW_INDEX seek positions) ----------------------
    # Consumes the per-stride positions the writer records
    # (WriterImpl.java:317-328 PositionRecorder parity; see
    # DwrfWriter._resolve_positions for the layout): only the compressed
    # blocks covering the stride are decompressed and only the stride's
    # RLE groups are decoded — RecordReaderImpl.java:494-543 seekToRow +
    # RunLengthIntegerReader.java:94-126 skip semantics.

    def _buf_at(self, col: int, kind: StreamKind, blk: int | None, off: int, need: int):
        """(byte buffer, start pos) for reading `need` bytes of the
        DECOMPRESSED stream starting at uncompressed offset `off` —
        compressed files decompress only blocks from `blk` until covered."""
        if self.r.compression == CompressionKind.NONE:
            return self.stream(col, kind), int(off)
        rng_off, rng_len = self._ranges[(col, int(kind))]
        comp = self._raw_slice(rng_off, rng_len)
        p = int(blk)
        have = 0
        need_total = int(off) + int(need)
        parts: list[np.ndarray] = []
        while p < rng_len and have < need_total:
            header = int(comp[p]) | (int(comp[p + 1]) << 8) | (int(comp[p + 2]) << 16)
            bl = header >> 1
            if header & 1:
                part = comp[p + 3 : p + 3 + bl]  # stored: zero-copy view
            else:
                ck = (col, int(kind), p)
                part = self._blk_cache.get(ck)
                if part is None:
                    part = np.frombuffer(
                        codecs._decompress_block(
                            comp[p + 3 : p + 3 + bl].tobytes(),
                            self.r.compression,
                        ),
                        dtype=np.uint8,
                    )
                    self._blk_cache[ck] = part
                    self._blk_cache_bytes += part.nbytes
                    while (
                        self._blk_cache_bytes > self._blk_cache_budget
                        and self._blk_cache
                    ):
                        old = self._blk_cache.pop(next(iter(self._blk_cache)))
                        self._blk_cache_bytes -= old.nbytes
            parts.append(part)
            have += len(part)
            p += 3 + bl
        if not parts:
            return np.zeros(0, dtype=np.uint8), int(off)
        buf = parts[0] if len(parts) == 1 else np.concatenate(parts)
        return buf, int(off)

    def _ints_window(self, col, kind, cur, count, signed):
        blk, off = cur.instream()
        (skip,) = cur.take(1)
        return self._ints_at(col, kind, blk, off, skip, count, signed)

    def _ints_at(self, col, kind, blk, off, skip, count, signed):
        total = skip + count
        # RLE v1 worst case ~11 B/value (10-byte varint + headers), plus a
        # group-alignment tail of at most 129 further values
        buf, pos = self._buf_at(col, kind, blk, off, total * 11 + 1600)
        ac = codecs.int_rle_aligned_count(buf[pos:], total)
        vals, _ = codecs.decode_int_rle(buf, ac, signed, pos)
        return vals[skip : skip + count]

    def _raw_at(self, col, kind, blk, off, need):
        buf, pos = self._buf_at(col, kind, blk, off, need)
        return buf[pos : pos + need]

    def _bytes_window(self, col, kind, cur, count):
        blk, off = cur.instream()
        (skip,) = cur.take(1)
        total = skip + count
        buf, pos = self._buf_at(col, kind, blk, off, total + total // 64 + 256)
        ac = codecs.byte_rle_aligned_count(buf[pos:], total)
        vals, _ = codecs.decode_byte_rle(buf, ac, pos)
        return vals[skip : skip + count]

    def _bits_window(self, col, kind, cur, count):
        blk, off = cur.instream()
        skip, bit = cur.take(2)
        nbytes = (bit + count + 7) // 8
        total = skip + nbytes
        buf, pos = self._buf_at(col, kind, blk, off, total + total // 64 + 256)
        ac = codecs.byte_rle_aligned_count(buf[pos:], total)
        raw, _ = codecs.decode_byte_rle(buf, ac, pos)
        return np.unpackbits(raw[skip : skip + nbytes])[bit : bit + count].astype(bool)

    def _raw_window(self, col, kind, cur, need):
        blk, off = cur.instream()
        buf, pos = self._buf_at(col, kind, blk, off, need)
        return buf[pos : pos + need]

    def _stride_dict_size_index(self, type_id: int) -> int:
        """Index of the per-stride side-dictionary SIZE within a
        stride-dictionary column's RowIndexEntry positions.

        Two layouts exist: our writer's compact [size] (1 position), and
        the reference's full seek layout, where
        LazyStringDictionaryTreeReader.loadIndeces (reference :120-139)
        consumes, in order: PRESENT bitfield (InStream + byte-skip +
        bit-pos) if nullable, STRIDE_DICTIONARY raw InStream,
        STRIDE_DICTIONARY_LENGTH int-RLE (InStream + value-skip), THEN the
        size — an InStream is 1 position uncompressed, 2 compressed
        (InStream.java:123-131, :212-220)."""
        ins = 2 if self.r.compression != CompressionKind.NONE else 1
        idx = ins + (ins + 1)  # STRIDE_DICTIONARY + STRIDE_DICTIONARY_LENGTH
        if self.has_stream(type_id, StreamKind.PRESENT):
            idx += ins + 2  # PRESENT bitfield: InStream + byte-skip + bit
        return idx

    def decode_stride_column(
        self, type_id: int, s_idx: int, stride: int, n_rows: int
    ) -> pa.Array:
        """Decode rows [s_idx*stride, min((s_idx+1)*stride, n_rows)) of a
        top-level column using its recorded seek positions, recursing into
        nested children (each child consumes its OWN RowIndexEntry, the
        LazyListTreeReader.java:101-107 pattern). Raises NoStridePositions
        when a column in the subtree has none (UNION branches, legacy
        files) — callers fall back to the whole-stripe decode."""
        rows = min(stride, n_rows - s_idx * stride)
        return self._decode_stride_at(type_id, s_idx, rows)

    def _decode_stride_at(
        self, type_id: int, s_idx: int, rows: int
    ) -> pa.Array:
        t = self.r.types[type_id]
        kind = TypeKind(t.kind)
        if kind not in _STRIDE_DECODABLE:
            raise NoStridePositions(type_id)
        if rows <= 0:
            return pa.array(
                [], type=_arrow_type_of(self.r.types, type_id, self.r.type_overrides)
            )
        ri = self.row_index(type_id)
        if ri is None or s_idx >= len(ri.entry):
            if kind == TypeKind.STRUCT and not self.has_stream(
                type_id, StreamKind.PRESENT
            ):
                # a never-null struct writes no streams of its own, hence
                # no ROW_INDEX — only its children carry positions
                pos_vals: list[int] = []
            else:
                raise NoStridePositions(type_id)
        else:
            pos_vals = [int(v) for v in ri.entry[s_idx].positions]
        cur = _PosCursor(pos_vals, self.r.compression != CompressionKind.NONE)
        if self.has_stream(type_id, StreamKind.PRESENT):
            present = self._bits_window(type_id, StreamKind.PRESENT, cur, rows)
            nd = int(present.sum())
        else:
            present = None
            nd = rows
        enc = self.encodings[type_id]
        if nd == 0:
            dense = pa.array(
                [], type=_arrow_type_of(self.r.types, type_id, self.r.type_overrides)
            )
        elif kind == TypeKind.BOOLEAN:
            dense = pa.array(
                self._bits_window(type_id, StreamKind.DATA, cur, nd), type=pa.bool_()
            )
        elif kind == TypeKind.BYTE:
            dense = pa.array(
                self._bytes_window(type_id, StreamKind.DATA, cur, nd).view(np.int8),
                type=pa.int8(),
            )
        elif kind in (TypeKind.SHORT, TypeKind.INT, TypeKind.LONG):
            if enc.kind == int(ColumnEncodingKind.DICTIONARY):
                dict_vals, _ = codecs.decode_int_rle(
                    self.stream(type_id, StreamKind.DICTIONARY_DATA),
                    enc.dictionarySize,
                    signed=True,
                )
                ids = self._ints_window(type_id, StreamKind.DATA, cur, nd, signed=False)
                vals = dict_vals[ids]
            else:
                vals = self._ints_window(type_id, StreamKind.DATA, cur, nd, signed=True)
            pa_type = {
                TypeKind.SHORT: pa.int16(),
                TypeKind.INT: pa.int32(),
                TypeKind.LONG: pa.int64(),
            }[kind]
            dense = pa.array(vals.astype(pa_type.to_pandas_dtype()), type=pa_type)
        elif kind in (TypeKind.FLOAT, TypeKind.DOUBLE):
            np_t = np.dtype("<f4") if kind == TypeKind.FLOAT else np.dtype("<f8")
            raw = self._raw_window(type_id, StreamKind.DATA, cur, nd * np_t.itemsize)
            dense = pa.array(
                np.frombuffer(raw.tobytes(), dtype=np_t, count=nd),
                type=pa.float32() if kind == TypeKind.FLOAT else pa.float64(),
            )
        elif kind in (TypeKind.STRING, TypeKind.BINARY):
            if enc.kind == int(ColumnEncodingKind.DICTIONARY):
                n_dict = enc.dictionarySize
                key_lengths, _ = codecs.decode_int_rle(
                    self.stream(type_id, StreamKind.LENGTH), n_dict, signed=False
                )
                key_data = self.stream(type_id, StreamKind.DICTIONARY_DATA).tobytes()
                if self.has_stream(type_id, StreamKind.IN_DICTIONARY):
                    # A14 stride dictionaries, seek path: this stride's
                    # side dictionary loads from its own positions
                    # (LazyStringDictionaryTreeReader.loadStrideDictionary)
                    # — SD raw offset, SDL rle coords, side-dict SIZE —
                    # then ids/bits windows; singleton ids index the side
                    # dict directly since the window IS one stride
                    sd_blk, sd_off = cur.instream()
                    sdl_blk, sdl_off = cur.instream()
                    (sdl_skip,) = cur.take(1)
                    (sd_size,) = cur.take(1)
                    sd_lengths = self._ints_at(
                        type_id,
                        StreamKind.STRIDE_DICTIONARY_LENGTH,
                        sdl_blk,
                        sdl_off,
                        sdl_skip,
                        sd_size,
                        signed=False,
                    )
                    sd_raw = self._raw_at(
                        type_id,
                        StreamKind.STRIDE_DICTIONARY,
                        sd_blk,
                        sd_off,
                        int(sd_lengths.sum()),
                    )
                    ids = self._ints_window(
                        type_id, StreamKind.DATA, cur, nd, signed=False
                    )
                    in_dict = self._bits_window(
                        type_id, StreamKind.IN_DICTIONARY, cur, nd
                    )
                    ids = np.where(in_dict, ids, n_dict + ids)
                    key_lengths = np.concatenate([key_lengths, sd_lengths])
                    key_data = key_data + sd_raw.tobytes()
                    n_dict += int(sd_size)
                else:
                    ids = self._ints_window(
                        type_id, StreamKind.DATA, cur, nd, signed=False
                    )
                key_offsets = np.concatenate(
                    [np.zeros(1, dtype=np.int64), np.cumsum(key_lengths)]
                )
                dict_arr = pa.Array.from_buffers(
                    pa.large_utf8(),
                    n_dict,
                    [None, pa.py_buffer(key_offsets.tobytes()), pa.py_buffer(key_data)],
                )
                dense = dict_arr.take(pa.array(ids, type=pa.int64())).cast(pa.string())
            else:
                lengths = self._ints_window(
                    type_id, StreamKind.LENGTH, cur, nd, signed=False
                )
                need = int(lengths.sum())
                data = self._raw_window(type_id, StreamKind.DATA, cur, need)
                offsets = np.concatenate(
                    [np.zeros(1, dtype=np.int64), np.cumsum(lengths)]
                )
                is_str = kind == TypeKind.STRING
                dense = pa.Array.from_buffers(
                    pa.large_utf8() if is_str else pa.large_binary(),
                    nd,
                    [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data.tobytes())],
                ).cast(pa.string() if is_str else pa.binary())
        elif kind == TypeKind.TIMESTAMP:
            secs = self._ints_window(type_id, StreamKind.DATA, cur, nd, signed=True)
            packed = self._ints_window(
                type_id, StreamKind.NANO_DATA, cur, nd, signed=False
            )
            nanos = _unpack_nanos(packed.view(np.uint64))
            if type_id in self.r.ns_timestamp_ids:
                ns = (secs + TIMESTAMP_BASE_SECONDS) * 1_000_000_000 + nanos
                dense = pa.array(ns.view("datetime64[ns]"), type=pa.timestamp("ns"))
            else:
                us = (secs + TIMESTAMP_BASE_SECONDS) * 1_000_000 + nanos // 1000
                dense = pa.array(us.view("datetime64[us]"), type=pa.timestamp("us"))
        elif kind == TypeKind.LIST:
            lengths = self._ints_window(
                type_id, StreamKind.LENGTH, cur, nd, signed=False
            )
            child = self._decode_stride_at(
                t.subtypes[0], s_idx, int(lengths.sum())
            )
            offsets = np.concatenate(
                [np.zeros(1, dtype=np.int32), np.cumsum(lengths, dtype=np.int32)]
            )
            dense = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()), child
            )
        elif kind == TypeKind.MAP:
            lengths = self._ints_window(
                type_id, StreamKind.LENGTH, cur, nd, signed=False
            )
            child_n = int(lengths.sum())
            keys = self._decode_stride_at(t.subtypes[0], s_idx, child_n)
            items = self._decode_stride_at(t.subtypes[1], s_idx, child_n)
            offsets = np.concatenate(
                [np.zeros(1, dtype=np.int32), np.cumsum(lengths, dtype=np.int32)]
            )
            dense = pa.MapArray.from_arrays(
                pa.array(offsets, type=pa.int32()), keys, items
            )
        elif kind == TypeKind.STRUCT:
            children = [
                self._decode_stride_at(s, s_idx, nd) for s in t.subtypes
            ]
            dense = pa.StructArray.from_arrays(
                children, names=list(t.fieldNames)
            )
        else:
            raise NoStridePositions(type_id)
        out = dense if present is None else _scatter(dense, present)
        if type_id in self.r.date_ids:
            out = out.cast(pa.date32())
        return out

    # -- column decode ---------------------------------------------------------

    def decode_column(self, type_id: int, n_rows: int) -> pa.Array:
        with profiler.phase("decoding"):
            return self._decode_column_impl(type_id, n_rows)

    def _decode_column_impl(self, type_id: int, n_rows: int) -> pa.Array:
        t = self.r.types[type_id]
        kind = TypeKind(t.kind)
        if self.has_stream(type_id, StreamKind.PRESENT):
            present, _ = codecs.decode_bits(
                self.stream(type_id, StreamKind.PRESENT), n_rows
            )
            n_values = int(present.sum())
        else:
            present = None
            n_values = n_rows
        # stride-dictionary decode needs the dense->row mapping of the
        # column being decoded (top-level only; consumed before recursion);
        # thread-local so concurrent column decodes don't race
        self._tls.present_mask = present
        self._tls.present_rows = n_rows

        if n_values == 0:
            dense = pa.array(
                [], type=_arrow_type_of(self.r.types, type_id, self.r.type_overrides)
            )
            if present is None:
                return dense
            return _scatter(dense, present)

        handler = {
            TypeKind.BOOLEAN: self._decode_boolean,
            TypeKind.BYTE: self._decode_byte,
            TypeKind.SHORT: self._decode_int,
            TypeKind.INT: self._decode_int,
            TypeKind.LONG: self._decode_int,
            TypeKind.FLOAT: self._decode_float,
            TypeKind.DOUBLE: self._decode_float,
            TypeKind.STRING: self._decode_string,
            TypeKind.BINARY: self._decode_binary,
            TypeKind.TIMESTAMP: self._decode_timestamp,
            TypeKind.LIST: self._decode_list,
            TypeKind.MAP: self._decode_map,
            TypeKind.STRUCT: self._decode_struct,
            TypeKind.UNION: self._decode_union,
        }[kind]
        dense = handler(type_id, n_values)
        out = dense if present is None else _scatter(dense, present)
        if type_id in self.r.date_ids:
            out = out.cast(pa.date32())  # stored as INT days-since-epoch
        return out

    def _decode_boolean(self, type_id, n):
        bits, _ = codecs.decode_bits(self.stream(type_id, StreamKind.DATA), n)
        return pa.array(bits, type=pa.bool_())

    def _decode_byte(self, type_id, n):
        vals, _ = codecs.decode_byte_rle(self.stream(type_id, StreamKind.DATA), n)
        return pa.array(vals.view(np.int8), type=pa.int8())

    def _decode_int(self, type_id, n):
        enc = self.encodings[type_id]
        if enc.kind == int(ColumnEncodingKind.DICTIONARY):
            dict_vals, _ = codecs.decode_int_rle(
                self.stream(type_id, StreamKind.DICTIONARY_DATA),
                enc.dictionarySize,
                signed=True,
            )
            ids, _ = codecs.decode_int_rle(
                self.stream(type_id, StreamKind.DATA), n, signed=False
            )
            vals = dict_vals[ids]
        else:
            vals, _ = codecs.decode_int_rle(
                self.stream(type_id, StreamKind.DATA), n, signed=True
            )
        kind = TypeKind(self.r.types[type_id].kind)
        pa_type = {
            TypeKind.SHORT: pa.int16(),
            TypeKind.INT: pa.int32(),
            TypeKind.LONG: pa.int64(),
        }[kind]
        np_type = {
            TypeKind.SHORT: np.int16,
            TypeKind.INT: np.int32,
            TypeKind.LONG: np.int64,
        }[kind]
        # copy=False: LONG columns (already int64 from the RLE decoder)
        # hand their buffer to Arrow without a duplicate pass
        return pa.array(vals.astype(np_type, copy=False), type=pa_type)

    def _decode_float(self, type_id, n):
        kind = TypeKind(self.r.types[type_id].kind)
        np_t = np.dtype("<f4") if kind == TypeKind.FLOAT else np.dtype("<f8")
        buf = self.stream(type_id, StreamKind.DATA)
        # zero-copy reinterpret of the decompressed stream (tobytes() here
        # duplicated every float column's bytes — measured ~10% of a full
        # lineitem read); slice first so the view length is exact
        vals = np.ascontiguousarray(buf[: n * np_t.itemsize]).view(np_t)
        return pa.array(
            vals, type=pa.float32() if kind == TypeKind.FLOAT else pa.float64()
        )

    def _string_like(self, type_id, n, pa_type):
        enc = self.encodings[type_id]
        if enc.kind == int(ColumnEncodingKind.DICTIONARY):
            n_dict = enc.dictionarySize
            key_lengths, _ = codecs.decode_int_rle(
                self.stream(type_id, StreamKind.LENGTH), n_dict, signed=False
            )
            key_data = self.stream(type_id, StreamKind.DICTIONARY_DATA).tobytes()
            ids, _ = codecs.decode_int_rle(
                self.stream(type_id, StreamKind.DATA), n, signed=False
            )
            if self.has_stream(type_id, StreamKind.IN_DICTIONARY):
                # A14 stride dictionaries: IN_DICTIONARY bit selects stripe
                # vs per-stride side dictionary; ids index whichever was
                # picked. Rebuild one combined dictionary (stripe keys then
                # all stride keys in stride order) and rebase stride ids.
                in_dict, _ = codecs.decode_bits(
                    self.stream(type_id, StreamKind.IN_DICTIONARY), n
                )
                ri = self.row_index(type_id)
                sidx = self._stride_dict_size_index(type_id)
                sizes = np.array(
                    [
                        (
                            e.positions[0]
                            if len(e.positions) == 1
                            else e.positions[sidx]
                        )
                        if e.positions
                        else 0
                        for e in ri.entry
                    ],
                    dtype=np.int64,
                )
                total = int(sizes.sum())
                sd_lengths, _ = codecs.decode_int_rle(
                    self.stream(type_id, StreamKind.STRIDE_DICTIONARY_LENGTH),
                    total,
                    signed=False,
                )
                sd_data = (
                    self.stream(type_id, StreamKind.STRIDE_DICTIONARY).tobytes()
                    if self.has_stream(type_id, StreamKind.STRIDE_DICTIONARY)
                    else b""
                )
                stride = self.r.footer.rowIndexStride
                present = getattr(self._tls, "present_mask", None)
                rows_of_dense = (
                    np.flatnonzero(present)
                    if present is not None
                    else np.arange(n, dtype=np.int64)
                )
                stride_offsets = np.concatenate(
                    [np.zeros(1, dtype=np.int64), np.cumsum(sizes)[:-1]]
                )
                stride_of_dense = rows_of_dense // stride
                ids = np.where(
                    in_dict, ids, n_dict + stride_offsets[stride_of_dense] + ids
                )
                key_lengths = np.concatenate([key_lengths, sd_lengths])
                key_data = key_data + sd_data
                n_dict += total
            key_offsets = np.concatenate(
                [np.zeros(1, dtype=np.int64), np.cumsum(key_lengths)]
            )
            dict_arr = pa.Array.from_buffers(
                pa.large_utf8(),
                n_dict,
                [
                    None,
                    pa.py_buffer(key_offsets.tobytes()),
                    pa.py_buffer(key_data),
                ],
            )
            return dict_arr.take(pa.array(ids, type=pa.int64())).cast(pa_type)
        lengths, _ = codecs.decode_int_rle(
            self.stream(type_id, StreamKind.LENGTH), n, signed=False
        )
        data = (
            self.stream(type_id, StreamKind.DATA)
            if self.has_stream(type_id, StreamKind.DATA)
            else np.zeros(0, dtype=np.uint8)
        )
        offsets = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(lengths)])
        big = pa.large_utf8() if pa_type == pa.string() else pa.large_binary()
        # py_buffer over the numpy memory directly — tobytes() duplicated
        # the whole string payload (the widest stream in a text table)
        arr = pa.Array.from_buffers(
            big,
            n,
            [
                None,
                pa.py_buffer(memoryview(offsets)),
                pa.py_buffer(memoryview(np.ascontiguousarray(data))),
            ],
        )
        return arr.cast(pa_type)

    def _decode_string(self, type_id, n):
        return self._string_like(type_id, n, pa.string())

    def _decode_binary(self, type_id, n):
        return self._string_like(type_id, n, pa.binary())

    def _decode_timestamp(self, type_id, n):
        secs, _ = codecs.decode_int_rle(
            self.stream(type_id, StreamKind.DATA), n, signed=True
        )
        packed, _ = codecs.decode_int_rle(
            self.stream(type_id, StreamKind.NANO_DATA), n, signed=False
        )
        nanos = _unpack_nanos(packed.view(np.uint64))
        if type_id in self.r.ns_timestamp_ids:
            ns = (secs + TIMESTAMP_BASE_SECONDS) * 1_000_000_000 + nanos
            return pa.array(ns.view("datetime64[ns]"), type=pa.timestamp("ns"))
        us = (secs + TIMESTAMP_BASE_SECONDS) * 1_000_000 + nanos // 1000
        return pa.array(us.view("datetime64[us]"), type=pa.timestamp("us"))

    def _decode_list(self, type_id, n):
        lengths, _ = codecs.decode_int_rle(
            self.stream(type_id, StreamKind.LENGTH), n, signed=False
        )
        child_n = int(lengths.sum())
        child = self.decode_column(self.r.types[type_id].subtypes[0], child_n)
        offsets = np.concatenate(
            [np.zeros(1, dtype=np.int32), np.cumsum(lengths, dtype=np.int32)]
        )
        return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), child)

    def _decode_map(self, type_id, n):
        lengths, _ = codecs.decode_int_rle(
            self.stream(type_id, StreamKind.LENGTH), n, signed=False
        )
        child_n = int(lengths.sum())
        keys = self.decode_column(self.r.types[type_id].subtypes[0], child_n)
        items = self.decode_column(self.r.types[type_id].subtypes[1], child_n)
        offsets = np.concatenate(
            [np.zeros(1, dtype=np.int32), np.cumsum(lengths, dtype=np.int32)]
        )
        return pa.MapArray.from_arrays(pa.array(offsets, type=pa.int32()), keys, items)

    def _decode_struct(self, type_id, n):
        t = self.r.types[type_id]
        pairs = [
            (nm, s)
            for nm, s in zip(t.fieldNames, t.subtypes)
            if self.decode_ids is None or s in self.decode_ids
        ]
        children = [self.decode_column(s, n) for _, s in pairs]
        return pa.StructArray.from_arrays(children, names=[nm for nm, _ in pairs])

    def _decode_union(self, type_id, n):
        t = self.r.types[type_id]
        tags_np, _ = codecs.decode_byte_rle(self.stream(type_id, StreamKind.DATA), n)
        children = []
        for i, s in enumerate(t.subtypes):
            branch_n = int((tags_np == i).sum())
            branch = self.decode_column(s, branch_n)
            children.append(_scatter(branch, tags_np == i))
        tag_arr = pa.array(tags_np.view(np.int8), type=pa.int8())
        names = ["tag"] + [f"field{i}" for i in range(len(t.subtypes))]
        return pa.StructArray.from_arrays([tag_arr] + children, names=names)


# --- filter evaluation against statistics --------------------------------------


def _stats_may_match(st: ColumnStats, op: str, value) -> bool:
    lo, hi = st.minimum, st.maximum
    if op == "is_null":
        return True  # null counts not tracked separately; can't disprove
    if op == "is_not_null":
        return st.count > 0 or lo is not None
    if lo is None or hi is None:
        return True
    try:
        if op == "eq":
            return lo <= value <= hi
        if op == "lt":
            return lo < value
        if op == "lte":
            return lo <= value
        if op == "gt":
            return hi > value
        if op == "gte":
            return hi >= value
        if op == "in":
            return any(lo <= v <= hi for v in value)
        if op == "starts_with":
            # matching values sort in [prefix, ∞) capped below by any value
            # whose len(prefix)-char head exceeds prefix — so may-match iff
            # the max reaches the prefix and the min's head doesn't pass it.
            # (An upper sentinel like prefix+U+10FFFF is wrong: min itself
            # may carry the prefix yet sort above any finite sentinel.)
            return hi >= value and lo[: len(value)] <= value
    except TypeError:
        return True
    return True


def _resolve_field(name: str, names: list[str]) -> str | None:
    """Resolve a requested field name to its canonical spelling: exact match
    first, then case-insensitive (the reference resolves Hive's lowercased
    column names against arbitrary-case file schemas this way)."""
    if name in names:
        return name
    lowered = name.lower()
    for n in names:
        if n.lower() == lowered:
            return n
    return None


class DwrfFile:
    """Random-access DWRF file reader."""

    def __init__(self, path: str, verify_checksums: bool = False):
        from .fs import get_fs

        self.path = path
        # opt-in read-time scrub: with verify_checksums=True and CRC
        # triples recorded at write (checksums=True), every stripe's
        # index/data/footer regions are CRC-checked ONCE per handle
        # before their first decode — a flipped bit fails the SCAN with
        # a typed error naming the stripe instead of surfacing later as
        # a decode error (or waiting for the next ops-time scrub). Zero
        # tax when off or when the file carries no checksums.
        self._verify_on_read = verify_checksums
        self._verified_stripes: set[int] = set()
        self._verify_triples: list[tuple[int, int, int]] | None = None
        self._f = get_fs(path).open(path, "rb")
        # point-lookup decoder reuse (read_row): (stripe, projection) ->
        # no-prefetch _StripeDecoder with warmed dictionary/index caches
        self._point_decoders: dict = {}
        # decoded-stride-array LRU shared by all point lookups on this
        # handle: (stripe, type_id, s_idx) -> pa.Array. The serving
        # steady state re-reads a hot working set, and under concurrent
        # clients EVERY thread used to re-decode the same stride (the
        # r8-measured 9.8 ms/lookup at 32 clients vs 1.8 ms/row batched);
        # with the arrays cached a repeat hit is a dict move + .take.
        # Byte-budgeted (SPARK_GRAFT_STRIDE_CACHE_MB, default 64) so a
        # wide scan through cold strides can't pin the heap; the lock
        # guards only cache bookkeeping, never a decode.
        import threading as _threading

        self._stride_arrays: dict = {}
        self._stride_bytes = 0
        self._stride_budget = (
            int(os.environ.get("SPARK_GRAFT_STRIDE_CACHE_MB", 64)) << 20
        )
        self._stride_lock = _threading.Lock()
        try:
            # local files: positional os.pread, safe under the stripe pool
            self._fileno = self._f.fileno()
        except (AttributeError, OSError):
            # non-local file-likes (fsspec objects): seek+read under a lock
            import threading

            self._fileno = None
            self._read_lock = threading.Lock()
        self._f.seek(0, 2)
        self.file_length = self._f.tell()
        tail_len = min(self.file_length, 64 * 1024)
        tail = self._read_at(self.file_length - tail_len, tail_len)
        if bytes(self._read_at(0, 3)) != MAGIC:
            raise DwrfCorruptError(
                f"{path}: not a DWRF/ORC file (bad magic)"
            )
        with _corrupt_guard(f"{path} (file tail)"):
            ps_len = tail[-1]
            ps = proto.decode_message(
                proto.PostScript, memoryview(bytes(tail[-1 - ps_len : -1]))
            )
            if not ps.footerLength:
                raise DwrfCorruptError(
                    f"{path}: postscript carries no footer length"
                )
            self.compression = CompressionKind(ps.compression or 0)
            # every declared proto kind (orc_proto.proto:124-129) READS
            # without optional codecs: LZO blocks fall back to the
            # vendored pure-Python LZO1X decoder when python-lzo is
            # absent (codecs._decompress_block); only the WRITE side
            # still requires the real codec.
            self.block_size = ps.compressionBlockSize
            flen = ps.footerLength
            if flen + ps_len + 1 > len(tail):  # footer larger than probe
                tail = self._read_at(
                    self.file_length - (flen + ps_len + 1), flen + ps_len + 1
                )
            footer_raw = bytes(tail[-1 - ps_len - flen : -1 - ps_len])
            self.footer = proto.decode_message(
                proto.Footer,
                memoryview(
                    codecs.decompress_stream(footer_raw, self.compression)
                ),
            )
            self.types = self.footer.types
            if not self.types:
                raise DwrfCorruptError(f"{path}: footer carries no types")
            # type-tree validation: a flip surviving the footer's deflate
            # framing must not silently DROP columns (observed in fuzz: a
            # damaged root decoded as a scalar with no children, and every
            # read returned 0-column tables). Every DWRF/ORC file roots at
            # a STRUCT whose fieldNames pair 1:1 with subtypes; child ids
            # must stay inside the tree.
            root_t = self.types[0]
            if TypeKind(root_t.kind) != TypeKind.STRUCT or len(
                root_t.fieldNames
            ) != len(root_t.subtypes):
                raise DwrfCorruptError(
                    f"{path}: damaged type tree (root kind "
                    f"{root_t.kind}, {len(root_t.fieldNames)} names vs "
                    f"{len(root_t.subtypes)} children)"
                )
            for t in self.types:
                for sub in t.subtypes:
                    if sub <= 0 or sub >= len(self.types):
                        raise DwrfCorruptError(
                            f"{path}: type child id {sub} outside tree "
                            f"of {len(self.types)} nodes"
                        )
            self.num_rows = self.footer.numberOfRows or 0
            self.metadata = {m.name: m.value for m in self.footer.metadata}
            self.ns_timestamp_ids: set[int] = set()
            if "dwrf.timestamp.ns.ids" in self.metadata:
                self.ns_timestamp_ids = {
                    int(x)
                    for x in self.metadata["dwrf.timestamp.ns.ids"].split(b",")
                }
            self.date_ids: set[int] = set()
            if "dwrf.date.ids" in self.metadata:
                self.date_ids = {
                    int(x) for x in self.metadata["dwrf.date.ids"].split(b",")
                }
            self.type_overrides: dict[int, pa.DataType] = {
                tid: pa.timestamp("ns") for tid in self.ns_timestamp_ids
            }
            self.type_overrides.update(
                {tid: pa.date32() for tid in self.date_ids}
            )
            self.schema = type_tree_to_schema(self.types, self.type_overrides)
            # structural cross-validation: a bit-flip surviving the
            # footer's deflate framing must not send reads to shifted
            # offsets or fabricate row counts — stripe extents must be
            # ordered, in-bounds and row-consistent before any data read
            total_rows = 0
            prev_end = len(MAGIC)
            for s in self.footer.stripes:
                end = (
                    (s.offset or 0)
                    + (s.indexLength or 0)
                    + (s.dataLength or 0)
                    + (s.footerLength or 0)
                )
                if (s.offset or 0) < prev_end or end > self.file_length:
                    raise DwrfCorruptError(
                        f"{path}: stripe directory entry out of bounds "
                        f"(offset {s.offset}, end {end}, "
                        f"file {self.file_length})"
                    )
                prev_end = end
                total_rows += s.numberOfRows or 0
            if total_rows != self.num_rows:
                raise DwrfCorruptError(
                    f"{path}: stripe rows {total_rows} != footer rows "
                    f"{self.num_rows}"
                )

    def verify(self) -> dict:
        """Scrub this file against its recorded per-stripe CRC32s
        (writer option ``checksums=True``, metadata key
        ``dwrf.stream.crc32``): re-read every stripe's index/data/footer
        region and compare. Closes the format's documented silent-flip
        blind spot for files written with checksums — a damaged region
        raises DwrfCorruptError naming the stripe and region; a file
        written WITHOUT checksums raises ValueError (a scrub that
        silently verified nothing would be worse than none).

        Returns {"stripes": n, "bytes": total} on success. Cost: one
        sequential read of the file + crc32 (~GB/s) — the ops-time scrub
        object stores and post-compaction validation run, not a per-query
        tax (stripe merges preserve per-stripe CRCs, so compacted files
        stay verifiable; see merge_files)."""
        triples = self._checksum_triples()
        if triples is None:
            raise DwrfNoChecksumsError(
                f"{self.path}: no checksums recorded (write with "
                "checksums=True to enable scrubbing)"
            )
        total = 0
        for i in range(len(triples)):
            total += self._crc_check_stripe(i, triples[i])
        return {"stripes": len(triples), "bytes": total}

    def _checksum_triples(self) -> list[tuple[int, int, int]] | None:
        """The recorded per-stripe (index, data, footer) CRC32 triples,
        parsed once per handle; None when the file carries none."""
        if self._verify_triples is None:
            from .constants import CHECKSUM_METADATA_KEY

            blob = self.metadata.get(CHECKSUM_METADATA_KEY)
            if blob is None:
                self._verify_triples = []
            else:
                with _corrupt_guard(f"{self.path} (checksum metadata)"):
                    self._verify_triples = [
                        tuple(int(x) for x in part.split(":"))
                        for part in blob.decode().split(";")
                        if part
                    ]
                if len(self._verify_triples) != len(self.footer.stripes):
                    n = len(self._verify_triples)
                    # leave the cache unset: a repeat call must re-raise
                    # CORRUPT, not misreport the file as checksum-less
                    self._verify_triples = None
                    raise DwrfCorruptError(
                        f"{self.path}: {n} checksum triples for "
                        f"{len(self.footer.stripes)} stripes"
                    )
        return self._verify_triples or None

    def _crc_check_stripe(self, i: int, triple: tuple) -> int:
        """CRC-check one stripe's three regions; returns bytes checked."""
        import zlib as _zlib

        s = self.footer.stripes[i]
        want_i, want_d, want_f = triple
        regions = (
            ("index", s.offset, s.indexLength, want_i),
            ("data", s.offset + s.indexLength, s.dataLength, want_d),
            (
                "footer",
                s.offset + s.indexLength + s.dataLength,
                s.footerLength,
                want_f,
            ),
        )
        total = 0
        for name, off, ln, want in regions:
            got = _zlib.crc32(self._read_at(off, ln))
            total += ln
            if got != want:
                raise DwrfCorruptError(
                    f"{self.path}: stripe {i} {name} region CRC "
                    f"mismatch (recorded {want}, computed {got}) — "
                    "bytes damaged since write"
                )
        return total

    def _verify_stripe_on_read(self, i: int) -> None:
        """verify_checksums=True hook: check stripe i's CRCs once per
        handle before its first decode; no-op when the file recorded
        none (zero tax — one metadata-dict probe)."""
        if i in self._verified_stripes:
            return
        triples = self._checksum_triples()
        if triples is not None:
            self._crc_check_stripe(i, triples[i])
        self._verified_stripes.add(i)

    def _read_at(self, offset: int, length: int) -> bytes:
        # positional read: no shared seek cursor, safe under the stripe
        # thread pool in read()
        if offset < 0 or length < 0 or offset + length > self.file_length:
            # only corrupt metadata computes an out-of-file range (e.g. a
            # flipped footerLength larger than the file)
            raise DwrfCorruptError(
                f"{self.path}: read [{offset}, {offset + length}) outside "
                f"file of {self.file_length} bytes"
            )
        if self._fileno is not None:
            return os.pread(self._fileno, length, offset)
        with self._read_lock:
            self._f.seek(offset)
            return self._f.read(length)

    def close(self):
        self._f.close()

    # -- stats access -----------------------------------------------------------

    def file_stats(self, type_id: int) -> ColumnStats:
        kind = TypeKind(self.types[type_id].kind)
        return stats_from_proto(kind, self.footer.statistics[type_id])

    def _top_level_id(self, name: str) -> int | None:
        root = self.types[0]
        resolved = _resolve_field(name, root.fieldNames)
        if resolved is None:
            return None
        return dict(zip(root.fieldNames, root.subtypes))[resolved]

    # -- projection parsing (supports nested paths like "s.qty") ---------------

    def _parse_projection(self, columns: list[str]):
        """-> (ordered [(top_name, top_tid)], decode/include id set).

        A dotted path keeps only the named struct subtree: "s.qty" includes
        the struct node s (for its PRESENT stream) plus the qty subtree —
        the reference's recursive boolean[] include
        (OrcInputFormat.java:121-163)."""
        from .types import subtree_ids

        root = self.types[0]
        by_name = dict(zip(root.fieldNames, root.subtypes))
        tops: list[tuple[str, int]] = []
        full: set[str] = set()
        partial: dict[str, list[str]] = {}
        for c in columns:
            top, _, rest = c.partition(".")
            # field lookup is case-insensitive, as in the reference's
            # ObjectInspector (TestObjectInspector.java:553-587); results
            # keep the file's canonical field names
            top = _resolve_field(top, root.fieldNames)
            if top is None:
                raise KeyError(f"no such column: {c.partition('.')[0]}")
            if all(t != top for t, _ in tops):
                tops.append((top, by_name[top]))
            if rest:
                partial.setdefault(top, []).append(rest)
            else:
                full.add(top)
        ids = {0}
        for top, tid in tops:
            if top in full or top not in partial:
                ids.update(subtree_ids(self.types, tid))
            else:
                ids.update(self._path_ids(tid, partial[top]))
        return tops, ids

    def _path_ids(self, tid: int, rests: list[str]) -> set[int]:
        from .types import subtree_ids

        ids = {tid}
        t = self.types[tid]
        by = dict(zip(t.fieldNames, t.subtypes))
        for rest in rests:
            seg, _, tail = rest.partition(".")
            seg = _resolve_field(seg, t.fieldNames)
            if seg is None:
                raise KeyError(f"no such nested field: {rest.partition('.')[0]}")
            child = by[seg]
            if tail:
                ids.update(self._path_ids(child, [tail]))
            else:
                ids.update(subtree_ids(self.types, child))
        return ids

    def projected_schema(self, columns: list[str]) -> pa.Schema:
        """Arrow schema of a (possibly nested) projection result."""
        tops, ids = self._parse_projection(columns)

        def prune(field: pa.Field, tid: int) -> pa.Field:
            t = self.types[tid]
            if TypeKind(t.kind) == TypeKind.STRUCT and pa.types.is_struct(
                field.type
            ):
                kept = [
                    prune(field.type.field(i), s)
                    for i, (nm, s) in enumerate(
                        zip(t.fieldNames, t.subtypes)
                    )
                    if s in ids
                ]
                return pa.field(field.name, pa.struct(kept))
            return field

        return pa.schema(
            [prune(self.schema.field(nm), tid) for nm, tid in tops]
        )

    def _filter_may_match_stats(self, filters, stats_for) -> bool:
        """filters: list of (column_name, op, value) conjuncts."""
        for name, op, value in filters:
            tid = self._top_level_id(name)
            if tid is None:
                continue
            st = stats_for(tid)
            if st is None:
                continue
            if not _stats_may_match(st, op, value):
                return False
        return True

    def _dictionary_disproves(self, stripe, filters) -> bool:
        """Fourth pruning tier: an equality conjunct on a DICTIONARY-encoded
        string column can be decided EXACTLY from the stripe dictionary —
        if the value is not among the keys, no row in the stripe matches,
        even when min/max stats cannot prune (the value sorts inside the
        range). Reads only the LENGTH + DICTIONARY_DATA streams (direct IO,
        no data-stream prefetch); stride-dictionary stripes are skipped
        because their side dictionaries hold additional keys."""
        eligible = [
            (name, value)
            for name, op, value in filters
            if op == "eq" and isinstance(value, str)
        ]
        if not eligible:
            return False
        dec = _StripeDecoder(self, stripe, include_ids=set())
        for name, value in eligible:
            tid = self._top_level_id(name)
            if tid is None or tid >= len(dec.encodings):
                continue
            if TypeKind(self.types[tid].kind) != TypeKind.STRING:
                continue
            enc = dec.encodings[tid]
            if enc.kind != int(ColumnEncodingKind.DICTIONARY):
                continue
            if dec.has_stream(tid, StreamKind.IN_DICTIONARY):
                continue
            n_dict = enc.dictionarySize or 0
            if n_dict == 0:
                return True  # all-null column: equality cannot match
            key_lengths, _ = codecs.decode_int_rle(
                dec.stream(tid, StreamKind.LENGTH), n_dict, signed=False
            )
            key_data = dec.stream(tid, StreamKind.DICTIONARY_DATA).tobytes()
            vb = value.encode("utf-8")
            lens = np.asarray(key_lengths, dtype=np.int64)
            offs = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(lens)])
            found = any(
                key_data[offs[i] : offs[i + 1]] == vb
                for i in np.flatnonzero(lens == len(vb))
            )
            if not found:
                return True
        return False

    # -- read -------------------------------------------------------------------

    def read_stripe(
        self,
        stripe_index: int,
        columns: list[str] | None = None,
        filters: list[tuple] | None = None,
        parallel_columns: bool = False,
    ) -> pa.Table | None:
        """Decode one stripe to an Arrow table (None if pruned by filters).

        parallel_columns decodes top-level columns on a thread pool —
        profitable only when nothing else parallelizes the work (the
        whole-file `read()` of a 1-stripe file); the Spark DataSource path
        keeps it off because Spark already runs one task per stripe."""
        with profiler.phase("read"):
            return self._read_stripe_impl(
                stripe_index, columns, filters, parallel_columns
            )

    def _read_stripe_impl(
        self,
        stripe_index: int,
        columns: list[str] | None = None,
        filters: list[tuple] | None = None,
        parallel_columns: bool = False,
    ) -> pa.Table | None:
        if self._verify_on_read:
            self._verify_stripe_on_read(stripe_index)
        stripe = self.footer.stripes[stripe_index]
        if filters and self._dictionary_disproves(stripe, filters):
            return None
        include_ids: set[int] | None = None
        index_ids: set[int] | None = None
        selected: list[tuple[str, int]] | None = None
        if columns is not None:
            selected, include_ids = self._parse_projection(columns)
            if filters:
                index_ids = {
                    tid
                    for name, _op, _v in filters
                    if (tid := self._top_level_id(name)) is not None
                }
        dec = _StripeDecoder(self, stripe, include_ids, index_ids)
        n = stripe.numberOfRows
        stride_alive: list[bool] | None = None
        if filters:
            # stride-level pruning (A5 analog): mark strides whose min/max
            # stats disprove a conjunct; skip the stripe if none survive,
            # else decode and slice to the surviving stride row ranges.
            def stride_sets(tid):
                ri = dec.row_index(tid)
                if ri is None or not ri.entry:
                    return None
                kind = TypeKind(self.types[tid].kind)
                return [stats_from_proto(kind, e.statistics) for e in ri.entry if e.statistics]

            per_col = {}
            any_stride = None
            for name, op, value in filters:
                tid = self._top_level_id(name)
                if tid is None:
                    continue
                sets = stride_sets(tid)
                if sets is None:
                    continue
                # IN-list values arrive as a list after the partition
                # pickles through Spark — tuple-ize for the dict key
                key_value = (
                    tuple(value) if isinstance(value, list) else value
                )
                per_col[(name, op, key_value)] = sets
                any_stride = len(sets) if any_stride is None else any_stride
            if per_col and any_stride:
                stride_alive = [True] * any_stride
                for (name, op, value), sets in per_col.items():
                    for i, st in enumerate(sets[:any_stride]):
                        if stride_alive[i] and not _stats_may_match(st, op, value):
                            stride_alive[i] = False
                if not any(stride_alive):
                    return None
                if all(stride_alive):
                    stride_alive = None
        if selected is None:
            root = self.types[0]
            selected = list(zip(root.fieldNames, root.subtypes))
            schema = pa.schema([self.schema.field(nm) for nm, _ in selected])
        else:
            schema = self.projected_schema(columns)
        # Column parallelism: OFF by default (Spark runs one task per
        # stripe; a per-task column pool would oversubscribe). For the
        # whole-file read() of a single-stripe file it is a measured ~1.6x
        # win since the r5 native kernels — ctypes RLE decode and zlib both
        # release the GIL, and the decoder's stream cache / TLS scratch
        # were built thread-safe. (An earlier all-numpy decoder measured
        # SLOWER under a column pool; the C kernels changed that.)
        if parallel_columns and len(selected) > 1 and not profiler.enabled:
            from concurrent.futures import ThreadPoolExecutor

            workers = min(len(selected), os.cpu_count() or 4, 12)
            with ThreadPoolExecutor(max_workers=workers) as ex:
                arrays = list(
                    ex.map(
                        lambda tid: dec.decode_column(tid, n),
                        [tid for _, tid in selected],
                    )
                )
        else:
            arrays = [dec.decode_column(tid, n) for _, tid in selected]
        with profiler.phase("deserialization"):
            table = pa.Table.from_arrays(arrays, schema=schema)
        if stride_alive is not None:
            stride = self.footer.rowIndexStride or 0
            if stride > 0:
                pieces = []
                start = None
                for i, alive in enumerate(stride_alive):
                    if alive and start is None:
                        start = i
                    elif not alive and start is not None:
                        pieces.append(
                            table.slice(start * stride, (i - start) * stride)
                        )
                        start = None
                if start is not None:
                    pieces.append(table.slice(start * stride))
                table = pa.concat_tables(pieces)
        return table

    def read(
        self,
        columns: list[str] | None = None,
        filters: list[tuple] | None = None,
    ) -> pa.Table:
        """Read the whole file (filters prune stripes; residual rows remain)."""
        if columns is not None:
            self._parse_projection(columns)  # contract errors BEFORE guard
        with _corrupt_guard(self.path):
            return self._read_impl(columns, filters)

    def _read_impl(
        self,
        columns: list[str] | None = None,
        filters: list[tuple] | None = None,
    ) -> pa.Table:
        if filters and not self._filter_may_match_stats(
            filters, lambda tid: self.file_stats(tid)
        ):
            schema = (
                self.schema if columns is None else self.projected_schema(columns)
            )
            return schema.empty_table()
        n_stripes = len(self.footer.stripes)
        # parallelize across columns ONLY when the stripe pool has nothing
        # to do (1-stripe file): with 2-3 stripes the stripe pool already
        # runs, and nesting pools (~3 x 12 threads) oversubscribes the
        # host for GIL-released decode work that is cache-friendlier done
        # per-stripe (matches read_stripe's documented policy)
        par_cols = n_stripes == 1 and not profiler.enabled
        if n_stripes > 1 and not profiler.enabled:
            # Decode stripes on a small thread pool: the hot paths (ctypes
            # RLE decode, zlib, pread) all release the GIL, so this scales
            # like the C++ parquet reader's internal parallelism. Spark's
            # one-task-per-stripe path never takes this branch (each task
            # reads a single stripe); it serves whole-file readers (dump
            # tool, bench, interactive use). Order is preserved.
            from concurrent.futures import ThreadPoolExecutor

            workers = min(n_stripes, os.cpu_count() or 4, 8)
            with ThreadPoolExecutor(max_workers=workers) as ex:
                maybe = list(
                    ex.map(
                        lambda i: self.read_stripe(
                            i,
                            columns=columns,
                            filters=filters,
                            parallel_columns=par_cols,
                        ),
                        range(n_stripes),
                    )
                )
        else:
            maybe = [
                self.read_stripe(
                    i, columns=columns, filters=filters, parallel_columns=par_cols
                )
                for i in range(n_stripes)
            ]
        tables = [t for t in maybe if t is not None]
        if not tables:
            schema = (
                self.schema if columns is None else self.projected_schema(columns)
            )
            return schema.empty_table()
        return pa.concat_tables(tables)

    def read_rows(
        self, row_offset: int, count: int, columns: list[str] | None = None
    ) -> pa.Table:
        """Random access (RecordReader.seekToRow analog,
        RecordReaderImpl.java:494-543): return rows [row_offset,
        row_offset+count). Cost is O(stripes touched) — the stripe directory
        locates the containing stripes without scanning, and only those
        stripes' streams are read and decoded."""
        if columns is not None:
            self._parse_projection(columns)  # contract errors BEFORE guard
        with _corrupt_guard(self.path):
            return self._read_rows_impl(row_offset, count, columns)

    def _read_rows_impl(
        self, row_offset: int, count: int, columns: list[str] | None = None
    ) -> pa.Table:
        end = row_offset + count
        tables = []
        first_row = 0
        for i, s in enumerate(self.footer.stripes):
            n = s.numberOfRows
            if first_row + n > row_offset and first_row < end:
                lo = max(0, row_offset - first_row)
                hi = min(n, end - first_row)
                t = self._read_stripe_rows(i, lo, hi, columns)
                tables.append(t)
            first_row += n
            if first_row >= end:
                break
        if not tables:
            schema = (
                self.schema if columns is None else self.projected_schema(columns)
            )
            return schema.empty_table()
        return pa.concat_tables(tables)

    def _read_stripe_rows(
        self, stripe_index: int, lo: int, hi: int, columns: list[str] | None
    ) -> pa.Table:
        """Rows [lo, hi) of one stripe. Small ranges (≤ 2 strides) whose
        projected columns are all stride-decodable scalars ride the
        ROW_INDEX seek positions — only the covering strides decode; any
        other shape falls back to the whole-stripe decode + slice."""
        stripe = self.footer.stripes[stripe_index]
        n = stripe.numberOfRows
        stride = self.footer.rowIndexStride
        if stride and (hi - lo) <= 2 * stride:
            if columns is not None:
                tops, include_ids = self._parse_projection(columns)
            else:
                root = self.types[0]
                tops = list(zip(root.fieldNames, root.subtypes))
                include_ids = None
            if all(
                TypeKind(self.types[tid].kind) in _STRIDE_DECODABLE
                for _, tid in tops
            ):
                dec = _StripeDecoder(
                    self, stripe, include_ids, index_ids={tid for _, tid in tops}
                )
                s0, s1 = lo // stride, max(lo // stride, (hi - 1) // stride)
                try:
                    cols = {}
                    for name, tid in tops:
                        parts = [
                            dec.decode_stride_column(tid, s, stride, n)
                            for s in range(s0, s1 + 1)
                        ]
                        arr = (
                            pa.concat_arrays(parts) if len(parts) > 1 else parts[0]
                        )
                        cols[name] = arr.slice(lo - s0 * stride, hi - lo)
                    return pa.table(cols)
                except NoStridePositions:
                    pass  # legacy file / stride-dict column: full decode
        t = self.read_stripe(stripe_index, columns=columns)
        return t.slice(lo, hi - lo)

    def _point_decoder(
        self,
        stripe_index: int,
        include_ids: set[int] | None,
        index_ids: set[int],
    ) -> "_StripeDecoder":
        """Decoder reuse across point lookups (the serving pattern is MANY
        reads per open file): keyed by (stripe, projection); built with
        prefetch=False so a seek never pays a whole-stripe read — only the
        touched streams pread (memoized) and only the covering blocks
        decompress. Dictionary/index streams cache inside the decoder, so
        lookup k>1 is pure stride-window work. The cache is LRU (hit moves
        the key to the back, overflow evicts the FRONT) so workloads
        alternating across more than the cap's (stripe, projection) pairs
        keep their warm working set instead of rebuilding every decoder."""
        key = (
            stripe_index,
            tuple(sorted(include_ids)) if include_ids is not None else None,
        )
        # pop+reinsert is the LRU touch (dict preserves insertion order);
        # pop with default keeps concurrent lookups on a shared handle
        # safe — the worst race is two threads building the same decoder,
        # which is idempotent
        dec = self._point_decoders.pop(key, None)
        if dec is not None:
            self._point_decoders[key] = dec
            return dec
        while len(self._point_decoders) >= 8:  # cap: stripes x projections
            try:
                self._point_decoders.pop(next(iter(self._point_decoders)))
            except (StopIteration, KeyError):  # concurrent evictor won
                break
        dec = _StripeDecoder(
            self,
            self.footer.stripes[stripe_index],
            include_ids,
            index_ids=index_ids,
            prefetch=False,
        )
        self._point_decoders[key] = dec
        return dec

    def _stride_cache_get(self, key):
        with self._stride_lock:
            arr = self._stride_arrays.pop(key, None)
            if arr is not None:  # LRU touch: reinsert at the back
                self._stride_arrays[key] = arr
            return arr

    def _stride_cache_put(self, key, arr) -> None:
        nbytes = arr.nbytes
        if nbytes > self._stride_budget:
            return  # a single oversized array would evict everything
        with self._stride_lock:
            if key in self._stride_arrays:  # concurrent decoder won
                return
            self._stride_arrays[key] = arr
            self._stride_bytes += nbytes
            # evict from the FRONT (dict preserves insertion order; a hit
            # reinserts at the back, so the front is least-recent)
            while self._stride_bytes > self._stride_budget and self._stride_arrays:
                old = self._stride_arrays.pop(next(iter(self._stride_arrays)))
                self._stride_bytes -= old.nbytes

    def _cached_stride_column(
        self, dec, stripe_index: int, tid: int, s_idx: int, stride: int,
        n_rows: int,
    ) -> pa.Array:
        """decode_stride_column through the handle-level array LRU —
        repeat lookups into a hot stride skip the decode entirely.
        Propagates NoStridePositions (never cached)."""
        key = (stripe_index, tid, s_idx)
        arr = self._stride_cache_get(key)
        if arr is None:
            arr = dec.decode_stride_column(tid, s_idx, stride, n_rows)
            self._stride_cache_put(key, arr)
        return arr

    def _cached_whole_column(
        self, dec, stripe_index: int, tid: int, n_rows: int
    ) -> pa.Array:
        """Whole-stripe fallback (NoStridePositions columns) through the
        same LRU, keyed with s_idx=-1."""
        key = (stripe_index, tid, -1)
        arr = self._stride_cache_get(key)
        if arr is None:
            arr = dec.decode_column(tid, n_rows)
            self._stride_cache_put(key, arr)
        return arr

    def read_row(
        self, row_number: int, columns: list[str] | None = None
    ) -> dict:
        """Point lookup (RecordReaderImpl.java:494-543 seekToRow +
        LazyTreeReader.java:300-365 parity, at this format's designed
        granularity): return row `row_number` as a {column: value} dict.

        Cost model: the stripe directory locates the containing stripe in
        O(stripes) without touching data; within the stripe, each
        projected column seeks via the per-stride stream positions in its
        ROW_INDEX (WriterImpl.java:317-328 records, InStream.java:112-132 /
        RunLengthIntegerReader.java:94-126 consume) — only the compressed
        blocks covering the containing stride are decompressed and only
        that stride's RLE groups are decoded, so the seek quantum is one
        row-index stride (default 10k rows), not the stripe. Columns
        without positions (nested types, stride-dictionary columns,
        legacy files) fall back per-column to whole-stripe decode."""
        if row_number < 0 or row_number >= self.num_rows:
            raise IndexError(
                f"row {row_number} out of range [0, {self.num_rows})"
            )
        if columns is not None:
            tops, include_ids = self._parse_projection(columns)
        else:
            root = self.types[0]
            tops = list(zip(root.fieldNames, root.subtypes))
            include_ids = None
        with _corrupt_guard(self.path):
            stride = self.footer.rowIndexStride
            first_row = 0
            for i, s in enumerate(self.footer.stripes):
                if first_row + s.numberOfRows > row_number:
                    break
                first_row += s.numberOfRows
            r_in_stripe = row_number - first_row
            if not stride:
                t = self._read_rows_impl(row_number, 1, columns=columns)
                return {
                    name: t.column(j)[0].as_py()
                    for j, name in enumerate(t.schema.names)
                }
            dec = self._point_decoder(i, include_ids, {tid for _, tid in tops})
            s_idx = r_in_stripe // stride
            r_in_stride = r_in_stripe % stride
            n_rows = self.footer.stripes[i].numberOfRows
            out = {}
            for name, tid in tops:
                try:
                    arr = self._cached_stride_column(
                        dec, i, tid, s_idx, stride, n_rows
                    )
                    out[name] = arr[r_in_stride].as_py()
                except NoStridePositions:
                    col = self._cached_whole_column(dec, i, tid, n_rows)
                    out[name] = col[r_in_stripe].as_py()
            return out

    def read_rows_at(
        self, row_numbers, columns: list[str] | None = None
    ) -> pa.Table:
        """Batched point lookup — the serving half of the A5 seek surface
        (RecordReaderImpl.java:494-543 seekToRow, amortized): fetch many
        rows in ONE pass, returned as a pyarrow Table in input order
        (duplicates allowed and preserved).

        Cost model: requested rows are grouped stripe -> stride; each
        touched stride of each projected column is decoded exactly ONCE
        and all rows falling in it are gathered with a vectorized take —
        k lookups landing in the same stride cost one stride decode plus
        O(k) gathers, where the read_row loop pays k stride decodes.
        Footer / stripe-footer / ROW_INDEX parses are amortized across
        the batch through the shared LRU point-decoder cache, and columns
        without seek positions (UNION, legacy files) fall back to ONE
        whole-stripe decode per (stripe, column) for the entire batch."""
        import bisect

        ids = [int(r) for r in row_numbers]
        for r in ids:
            if r < 0 or r >= self.num_rows:
                raise IndexError(
                    f"row {r} out of range [0, {self.num_rows})"
                )
        if columns is not None:
            tops, include_ids = self._parse_projection(columns)
            schema = self.projected_schema(columns)
        else:
            root = self.types[0]
            tops = list(zip(root.fieldNames, root.subtypes))
            include_ids = None
            schema = self.schema
        if not ids:
            return schema.empty_table()
        with _corrupt_guard(self.path):
            return self._read_rows_at_impl(
                ids, tops, include_ids, schema
            )

    def _read_rows_at_impl(self, ids, tops, include_ids, schema) -> pa.Table:
        import bisect

        stride = self.footer.rowIndexStride
        firsts: list[int] = []
        acc = 0
        for s in self.footer.stripes:
            firsts.append(acc)
            acc += s.numberOfRows
        by_stripe: dict[int, list[tuple[int, int]]] = {}
        for pos, r in enumerate(ids):
            i = bisect.bisect_right(firsts, r) - 1
            by_stripe.setdefault(i, []).append((r - firsts[i], pos))
        index_ids = {tid for _, tid in tops}
        pieces: dict[str, list[pa.Array]] = {name: [] for name, _ in tops}
        order: list[int] = []  # output position of each gathered row
        for i in sorted(by_stripe):
            rows = by_stripe[i]
            n_rows = self.footer.stripes[i].numberOfRows
            dec = self._point_decoder(i, include_ids, index_ids)
            by_stride: dict[int, list[tuple[int, int]]] = {}
            if stride:
                for r_in_stripe, pos in rows:
                    by_stride.setdefault(r_in_stripe // stride, []).append(
                        (r_in_stripe % stride, pos)
                    )
            else:  # legacy file without a row index: whole-stripe decode
                by_stride[-1] = rows
            stripe_cols: dict[int, pa.Array] = {}  # fallback decode cache
            for s_idx in sorted(by_stride):
                offs_pos = by_stride[s_idx]
                offs = pa.array(
                    [o for o, _ in offs_pos], type=pa.int64()
                )
                for name, tid in tops:
                    if s_idx >= 0:
                        try:
                            arr = self._cached_stride_column(
                                dec, i, tid, s_idx, stride, n_rows
                            )
                            pieces[name].append(arr.take(offs))
                            continue
                        except NoStridePositions:
                            pass
                    col = stripe_cols.get(tid)
                    if col is None:
                        col = self._cached_whole_column(dec, i, tid, n_rows)
                        stripe_cols[tid] = col
                    base = s_idx * stride if s_idx >= 0 else 0
                    pieces[name].append(
                        col.take(
                            pa.array(
                                [base + o for o, _ in offs_pos],
                                type=pa.int64(),
                            )
                        )
                    )
                order.extend(pos for _, pos in offs_pos)
        inv = np.empty(len(ids), dtype=np.int64)
        inv[np.asarray(order, dtype=np.int64)] = np.arange(
            len(ids), dtype=np.int64
        )
        take = pa.array(inv)
        cols = []
        for name, _tid in tops:
            parts = pieces[name]
            joined = (
                pa.concat_arrays(parts) if len(parts) > 1 else parts[0]
            )
            cols.append(joined.take(take))
        return pa.table(cols, schema=schema)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
