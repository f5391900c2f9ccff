"""Optional native helper for the one irreducibly sequential loop in the
format core: the RLE v1 group walk (hop group-to-group through the
candidate table built by ``codecs.decode_int_rle``).

Everything else in the codec layer is numpy-vectorized, but the walk is a
data-dependent pointer chase — O(1) python work per *group*, which at
~0.4 us/group becomes the decode floor on runny columns (sorted keys at
~4 values/group). The reference eats the same chase in compiled code
(RunLengthIntegerReader.java:100-163); this compiles the identical 15-line
loop with the system C compiler at first use.

Strictly optional: no compiler, no write access, any failure at all ->
``rle_walk`` is None and callers keep the pure-Python loop. The .so is
cached under the user cache dir keyed by source hash, so each machine
compiles once ever; executor workers just dlopen. Compilation is
atomic-rename racing-safe for many simultaneous Spark python workers.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_SRC = r"""
#include <stdint.h>

/* Walk the RLE v1 group chain over the packed candidate table.
   packed[i] = (next_candidate_index << 9) | value_count  (count <= 130).
   Returns number of groups written to starts_out, -1 if the chain runs
   off the table before yielding `count` values, -2 if it overshoots. */
int64_t rle_walk(const int64_t *packed, int64_t limit, int64_t count,
                 int64_t *starts_out) {
    int64_t got = 0, i = 0, n = 0;
    while (got < count) {
        if (i >= limit) return -1;
        starts_out[n++] = i;
        int64_t v = packed[i];
        got += v & 0x1FF;
        i = v >> 9;
    }
    return (got == count) ? n : -2;
}

/* Same walk, but overshoot-tolerant: stops at the first group whose end
   reaches `count` (a seek target may land mid-group). Returns groups
   written, -1 on truncation. Used by the writer's seek-position tables
   where the target is mid-stream, not the stream's value count. */
int64_t rle_walk_over(const int64_t *packed, int64_t limit, int64_t count,
                      int64_t *starts_out) {
    int64_t got = 0, i = 0, n = 0;
    while (got < count) {
        if (i >= limit) return -1;
        starts_out[n++] = i;
        int64_t v = packed[i];
        got += v & 0x1FF;
        i = v >> 9;
    }
    return n;
}

/* Seek-position table in one pass over the raw stream: hop RLE v1 group
   headers (payload varints are skipped by terminator scan, never
   decoded) and report, for each sorted target value index, the byte
   offset of its containing group and the values to skip after seeking
   there. Returns 0 on success, -1 on truncation. */
int64_t rle_positions(const uint8_t *buf, int64_t n,
                      const int64_t *targets, int64_t n_targets,
                      int64_t *out_byte, int64_t *out_skip) {
    int64_t got = 0, pos = 0, t = 0;
    while (t < n_targets) {
        if (pos >= n) return -1;
        int64_t gstart = pos;
        uint8_t h = buf[pos++];
        int64_t cnt;
        if (h < 0x80) {  /* repeat: delta byte + one base varint */
            cnt = (int64_t)h + 3;
            if (pos >= n) return -1;
            pos++;
            while (pos < n && buf[pos] >= 0x80) pos++;
            if (pos >= n) return -1;
            pos++;
        } else {         /* literal: cnt varints */
            cnt = 256 - (int64_t)h;
            for (int64_t j = 0; j < cnt; j++) {
                while (pos < n && buf[pos] >= 0x80) pos++;
                if (pos >= n) return -1;
                pos++;
            }
        }
        while (t < n_targets && targets[t] < got + cnt) {
            out_byte[t] = gstart;
            out_skip[t] = targets[t] - got;
            t++;
        }
        got += cnt;
    }
    return 0;
}

/* Full RLE v1 integer decode (RunLengthIntegerReader.java:100-163
   semantics): LEB128 varints, zigzag when signed, repeat groups
   (header h < 0x80 -> h+3 values, signed byte delta, one base varint)
   and literal groups (h >= 0x80 -> 256-h varints). One sequential pass.
   Returns values decoded (== count) and writes the final byte position
   to *end_pos; -1 on truncation, -2 if a group overshoots `count`. */
static int read_uv(const uint8_t *buf, int64_t n, int64_t *pos,
                   uint64_t *val) {
    uint64_t v = 0;
    int shift = 0;
    while (*pos < n) {
        uint8_t b = buf[(*pos)++];
        v |= (uint64_t)(b & 0x7F) << shift;
        if (b < 0x80) { *val = v; return 1; }
        shift += 7;
        if (shift > 63) return 0;
    }
    return 0;
}

int64_t rle_decode(const uint8_t *buf, int64_t n, int64_t pos,
                   int64_t count, int32_t is_signed, int64_t *out,
                   int64_t *end_pos) {
    int64_t got = 0;
    while (got < count) {
        if (pos >= n) return -1;
        uint8_t h = buf[pos++];
        if (h < 0x80) {  /* repeat group */
            if (pos >= n) return -1;
            int64_t delta = (int8_t)buf[pos++];
            uint64_t u;
            if (!read_uv(buf, n, &pos, &u)) return -1;
            int64_t base = is_signed
                ? (int64_t)(u >> 1) ^ -(int64_t)(u & 1)
                : (int64_t)u;
            int64_t cnt = (int64_t)h + 3;
            if (got + cnt > count) return -2;
            for (int64_t j = 0; j < cnt; j++) out[got++] = base + j * delta;
        } else {  /* literal group */
            int64_t cnt = 256 - (int64_t)h;
            if (got + cnt > count) return -2;
            for (int64_t j = 0; j < cnt; j++) {
                uint64_t u;
                if (!read_uv(buf, n, &pos, &u)) return -1;
                out[got++] = is_signed
                    ? (int64_t)(u >> 1) ^ -(int64_t)(u & 1)
                    : (int64_t)u;
            }
        }
    }
    *end_pos = pos;
    return got;
}

/* RLE v1 integer ENCODE (RunLengthIntegerWriter.java semantics), byte-
   identical to the numpy encoder in codecs.encode_int_rle: maximal
   constant-delta spans (delta in [-128,127]) found left-to-right, each
   span's head trimmed against the previous maximal span's end (spans can
   share one value), kept when >= 3 values remain, chunked into <= 130-
   value repeat groups with a < 3 tail falling back to literals; all
   uncovered values emit as <= 128-value literal groups split from each
   uncovered span's start. Returns bytes written; caller must provide
   out with capacity >= 11*n + 2. */
static void put_uv(uint8_t *out, int64_t *w, uint64_t u) {
    while (u >= 0x80) { out[(*w)++] = (uint8_t)(u | 0x80); u >>= 7; }
    out[(*w)++] = (uint8_t)u;
}

static uint64_t enc_val(int64_t x, int32_t is_signed) {
    return is_signed ? (((uint64_t)x << 1) ^ (uint64_t)(x >> 63))
                     : (uint64_t)x;
}

static void emit_literals(const int64_t *v, int64_t from, int64_t to,
                          int32_t is_signed, uint8_t *out, int64_t *w) {
    while (from < to) {
        int64_t cnt = (to - from >= 128) ? 128 : (to - from);
        out[(*w)++] = (uint8_t)(256 - cnt);
        for (int64_t k = 0; k < cnt; k++)
            put_uv(out, w, enc_val(v[from + k], is_signed));
        from += cnt;
    }
}

int64_t rle_encode(const int64_t *v, int64_t n, int32_t is_signed,
                   uint8_t *out) {
    int64_t w = 0, lit_start = 0, j = 0, prev_E = 0;
    while (j + 2 < n) {
        int64_t delta = v[j + 1] - v[j];
        if (delta < -128 || delta > 127 || v[j + 2] - v[j + 1] != delta) {
            j++;
            continue;
        }
        int64_t e = j + 2;                 /* last value index in span */
        while (e + 1 < n && v[e + 1] - v[e] == delta) e++;
        int64_t S = j, E = e + 1;          /* span values [S, E) */
        int64_t Sp = (S > prev_E) ? S : prev_E;  /* trim shared head */
        int64_t L = E - Sp;
        prev_E = E;
        j = e;                             /* next span can share v[e] */
        if (L < 3) continue;
        emit_literals(v, lit_start, Sp, is_signed, out, &w);
        int64_t rem = L % 130;
        int64_t covered = L - (rem < 3 ? rem : 0);
        for (int64_t p = Sp; p < Sp + covered; ) {
            int64_t cnt = (Sp + covered - p >= 130) ? 130
                                                    : (Sp + covered - p);
            out[w++] = (uint8_t)(cnt - 3);
            out[w++] = (uint8_t)(delta & 0xFF);
            put_uv(out, &w, enc_val(v[p], is_signed));
            p += cnt;
        }
        lit_start = Sp + covered;
    }
    emit_literals(v, lit_start, n, is_signed, out, &w);
    return w;
}

/* Byte RLE decode (RunLengthByteReader.java semantics): repeat groups
   h < 0x80 -> h+3 copies of the next byte; literal groups h >= 0x80 ->
   256-h raw bytes. Same error codes as rle_decode. */
int64_t byte_rle_decode(const uint8_t *buf, int64_t n, int64_t pos,
                        int64_t count, uint8_t *out, int64_t *end_pos) {
    int64_t got = 0;
    while (got < count) {
        if (pos >= n) return -1;
        uint8_t h = buf[pos++];
        if (h < 0x80) {
            int64_t cnt = (int64_t)h + 3;
            if (pos >= n) return -1;
            if (got + cnt > count) return -2;
            uint8_t v = buf[pos++];
            for (int64_t j = 0; j < cnt; j++) out[got++] = v;
        } else {
            int64_t cnt = 256 - (int64_t)h;
            if (pos + cnt > n) return -1;
            if (got + cnt > count) return -2;
            for (int64_t j = 0; j < cnt; j++) out[got++] = buf[pos++];
        }
    }
    *end_pos = pos;
    return got;
}
"""

rle_walk = None  # callable(packed_int64, limit, count, out_int64) -> int64
rle_walk_over = None  # same, overshoot-tolerant (seek-position tables)
rle_positions = None  # callable(buf_u8, targets_i64, out_byte, out_skip) -> int64
rle_decode = None  # callable(buf_u8, pos, count, signed, out_i64) -> (n, pos)
byte_rle_decode = None  # callable(buf_u8, pos, count, out_u8) -> (n, pos)
rle_encode = None  # callable(values_i64, signed) -> bytes


def _cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    d = os.path.join(base, "hive_dwrf_spark")
    os.makedirs(d, exist_ok=True)
    return d


def _build() -> str | None:
    tag = hashlib.sha256(_SRC.encode()).hexdigest()[:16]
    try:
        d = _cache_dir()
    except OSError:
        return None
    so_path = os.path.join(d, f"_rle_walk_{tag}.so")
    if os.path.exists(so_path):
        return so_path
    cc = os.environ.get("CC") or "cc"
    try:
        with tempfile.TemporaryDirectory(dir=d) as tmp:
            c_path = os.path.join(tmp, "rle_walk.c")
            with open(c_path, "w") as f:
                f.write(_SRC)
            tmp_so = os.path.join(tmp, "rle_walk.so")
            subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", "-o", tmp_so, c_path],
                check=True,
                capture_output=True,
                timeout=60,
            )
            os.replace(tmp_so, so_path)  # atomic: concurrent builders race safely
        return so_path
    except Exception:
        return None


def _load() -> None:
    global rle_walk, rle_walk_over, rle_positions
    global rle_decode, byte_rle_decode, rle_encode
    if os.environ.get("DWRF_NO_NATIVE"):
        return
    so = _build()
    if so is None:
        return
    try:
        lib = ctypes.CDLL(so)
        fn = lib.rle_walk
        fn.restype = ctypes.c_int64
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]

        def walk(packed, limit, count, out):
            return fn(
                packed.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                limit,
                count,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            )

        rle_walk = walk

        ofn = lib.rle_walk_over
        ofn.restype = ctypes.c_int64
        ofn.argtypes = fn.argtypes

        def walk_over(packed, limit, count, out):
            return ofn(
                packed.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                limit,
                count,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            )

        rle_walk_over = walk_over

        pfn = lib.rle_positions
        pfn.restype = ctypes.c_int64
        pfn.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]

        def positions(buf, targets, out_byte, out_skip):
            return pfn(
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                len(buf),
                targets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(targets),
                out_byte.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                out_skip.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            )

        rle_positions = positions

        dfn = lib.rle_decode
        dfn.restype = ctypes.c_int64
        dfn.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]

        def decode(buf, pos, count, is_signed, out):
            """-> (n_decoded, end_pos); n_decoded < 0 is an error code."""
            end = ctypes.c_int64(0)
            n = dfn(
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                len(buf),
                pos,
                count,
                1 if is_signed else 0,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                ctypes.byref(end),
            )
            return n, end.value

        rle_decode = decode

        bfn = lib.byte_rle_decode
        bfn.restype = ctypes.c_int64
        bfn.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64),
        ]

        def bdecode(buf, pos, count, out):
            end = ctypes.c_int64(0)
            n = bfn(
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                len(buf),
                pos,
                count,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.byref(end),
            )
            return n, end.value

        byte_rle_decode = bdecode

        efn = lib.rle_encode
        efn.restype = ctypes.c_int64
        efn.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
        ]

        def encode(values, is_signed):
            """int64 array -> RLE v1 bytes (grouping identical to the
            numpy encoder; property-tested byte-for-byte)."""
            import numpy as np

            out = np.empty(11 * len(values) + 2, dtype=np.uint8)
            w = efn(
                values.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(values),
                1 if is_signed else 0,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
            return out[:w].tobytes()

        rle_encode = encode
    except Exception:
        rle_walk = None
        rle_walk_over = None
        rle_positions = None
        rle_decode = None
        byte_rle_decode = None
        rle_encode = None


_load()
