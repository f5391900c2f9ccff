"""Property-based codec tests (hypothesis): encode->decode is identity for
every codec, on arbitrary value patterns — the generative strengthening of
the reference's seeded-random round-trips (TestOrcFile.java:1017-1060)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hive_dwrf_spark.format import codecs

int64s = st.integers(min_value=-(2**63), max_value=2**63 - 1)
uint64s = st.integers(min_value=0, max_value=2**64 - 1)


@st.composite
def int_arrays(draw):
    """Mix of patterns RLE cares about: runs, ramps, random, boundaries."""
    kind = draw(st.sampled_from(["random", "runs", "ramp", "mixed"]))
    n = draw(st.integers(min_value=0, max_value=2000))
    if kind == "random":
        vals = draw(st.lists(int64s, min_size=n, max_size=n))
        return np.array(vals, dtype=np.int64)
    if kind == "runs":
        base = draw(int64s.filter(lambda v: abs(v) < 2**62))
        runs = draw(
            st.lists(
                st.tuples(st.integers(1, 50), st.integers(-130, 130)),
                min_size=0,
                max_size=40,
            )
        )
        out = []
        v = base
        for length, delta in runs:
            for _ in range(length):
                out.append(v)
                v += delta
        return np.array(out, dtype=np.int64)
    if kind == "ramp":
        start = draw(st.integers(-(2**31), 2**31))
        step = draw(st.integers(-128, 127))
        return start + step * np.arange(n, dtype=np.int64)
    vals = draw(
        st.lists(st.one_of(st.just(0), st.integers(-300, 300), int64s),
                 min_size=n, max_size=n)
    )
    return np.array(vals, dtype=np.int64)


@settings(max_examples=150, deadline=None)
@given(int_arrays(), st.booleans())
def test_int_rle_roundtrip(arr, signed):
    if not signed and len(arr) and arr.min() < 0:
        arr = np.abs(arr) % (2**63)
    enc = codecs.encode_int_rle(arr, signed)
    dec, pos = codecs.decode_int_rle(
        np.frombuffer(enc, dtype=np.uint8), len(arr), signed
    )
    assert pos == len(enc)
    assert np.array_equal(dec, arr)


@settings(max_examples=100, deadline=None)
@given(st.lists(uint64s, max_size=500))
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    body, lengths = codecs.encode_varints(arr)
    assert int(lengths.sum()) == len(body)
    dec, pos = codecs.decode_varints(
        np.frombuffer(body, dtype=np.uint8), len(arr)
    )
    assert pos == len(body)
    assert np.array_equal(dec, arr)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 255), max_size=2000))
def test_byte_rle_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint8)
    enc = codecs.encode_byte_rle(arr)
    dec, pos = codecs.decode_byte_rle(
        np.frombuffer(enc, dtype=np.uint8), len(arr)
    )
    assert pos == len(enc)
    assert np.array_equal(dec, arr)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.booleans(), max_size=3000))
def test_bitfield_roundtrip(vals):
    arr = np.array(vals, dtype=bool)
    enc = codecs.encode_bits(arr)
    dec, _ = codecs.decode_bits(np.frombuffer(enc, dtype=np.uint8), len(arr))
    assert np.array_equal(dec, arr)


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=200_000), st.integers(1000, 70_000))
def test_compression_roundtrip(data, block):
    from hive_dwrf_spark.format.constants import CompressionKind

    framed = codecs.compress_stream(data, CompressionKind.ZLIB, block)
    assert codecs.decompress_stream(framed, CompressionKind.ZLIB) == data


@settings(max_examples=100, deadline=None)
@given(st.lists(int64s, max_size=500))
def test_zigzag_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    assert np.array_equal(codecs.zigzag_decode(codecs.zigzag_encode(arr)), arr)


# run-biased generator: mixes constant-delta runs (various deltas/lengths,
# crossing the 130-chunk and 3-minimum boundaries) with random literals, so
# span-trim / chunk-tail / shared-value cases all get exercised
_run_biased = st.lists(
    st.tuples(
        st.integers(-300, 300),       # start value
        st.integers(-130, 130),       # delta (beyond byte range sometimes)
        st.integers(1, 140),          # run length
    ),
    max_size=12,
).map(
    lambda spans: [s + d * k for (s, d, ln) in spans for k in range(ln)]
)


@settings(max_examples=150, deadline=None)
@given(_run_biased, st.booleans())
def test_native_rle_encode_matches_numpy(vals, signed):
    """The compiled rle_encode must be byte-identical to the numpy
    encoder — golden dumps pin the writer's exact output, so the two
    paths may never diverge in grouping, trimming, or chunking."""
    from hive_dwrf_spark.format import _native

    if _native.rle_encode is None:
        import pytest

        pytest.skip("no C compiler available")
    arr = np.array(vals, dtype=np.int64)
    if not signed and len(arr) and arr.min() < 0:
        arr = arr - arr.min()
    native = _native.rle_encode(arr, signed)
    saved = _native.rle_encode
    _native.rle_encode = None
    try:
        pure = codecs.encode_int_rle(arr, signed)
    finally:
        _native.rle_encode = saved
    assert native == pure
    if len(arr):
        dec, _ = codecs.decode_int_rle(
            np.frombuffer(native, dtype=np.uint8), len(arr), signed
        )
        assert np.array_equal(dec, arr)


@settings(max_examples=100, deadline=None)
@given(int_arrays(), st.booleans(), st.data())
def test_int_rle_seek_positions(arr, signed, data):
    """Seek-table property (RunLengthIntegerReader.java:94-126 skip
    semantics): for ANY value index, (group offset, skip) recovered from
    the encoded bytes must let a group-aligned decode starting at that
    offset reproduce exactly the value at that index."""
    if len(arr) == 0:
        return
    buf = np.frombuffer(codecs.encode_int_rle(arr, signed), dtype=np.uint8)
    k = data.draw(st.integers(1, min(5, len(arr))))
    targets = np.array(
        sorted(
            data.draw(
                st.sets(
                    st.integers(0, len(arr) - 1), min_size=k, max_size=k
                )
            )
        ),
        dtype=np.int64,
    )
    for (off, skip), t in zip(codecs.int_rle_positions(buf, targets), targets):
        sub = buf[off:]
        ac = codecs.int_rle_aligned_count(sub, skip + 1)
        dec, _ = codecs.decode_int_rle(sub, ac, signed)
        assert dec[skip] == arr[t], (t, off, skip)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 255), min_size=1, max_size=2000), st.data())
def test_byte_rle_seek_positions(vals, data):
    arr = np.array(vals, dtype=np.uint8)
    buf = np.frombuffer(codecs.encode_byte_rle(arr), dtype=np.uint8)
    k = data.draw(st.integers(1, min(5, len(arr))))
    targets = np.array(
        sorted(
            data.draw(
                st.sets(st.integers(0, len(arr) - 1), min_size=k, max_size=k)
            )
        ),
        dtype=np.int64,
    )
    for (off, skip), t in zip(codecs.byte_rle_positions(buf, targets), targets):
        sub = buf[off:]
        ac = codecs.byte_rle_aligned_count(sub, skip + 1)
        dec, _ = codecs.decode_byte_rle(sub, ac)
        assert dec[skip] == arr[t], (t, off, skip)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.booleans(), min_size=1, max_size=4000), st.data())
def test_bit_seek_positions(vals, data):
    bits = np.array(vals, dtype=bool)
    buf = np.frombuffer(codecs.encode_bits(bits), dtype=np.uint8)
    k = data.draw(st.integers(1, min(5, len(bits))))
    targets = np.array(
        sorted(
            data.draw(
                st.sets(st.integers(0, len(bits) - 1), min_size=k, max_size=k)
            )
        ),
        dtype=np.int64,
    )
    for (off, skip, bit), t in zip(codecs.bit_positions(buf, targets), targets):
        sub = buf[off:]
        ac = codecs.byte_rle_aligned_count(sub, skip + 1)
        dec, _ = codecs.decode_byte_rle(sub, ac)
        got = bool((int(dec[skip]) >> (7 - bit)) & 1)
        assert got == bits[t], (t, off, skip, bit)


@given(
    st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=999_999_999),
            # bias toward trailing-zero shapes (the packed branch)
            st.integers(min_value=0, max_value=999_999).map(lambda v: v * 1000),
            st.integers(min_value=0, max_value=9).map(lambda v: v * 100_000_000),
        ),
        min_size=0,
        max_size=300,
    )
)
@settings(max_examples=200, deadline=None)
def test_nano_pack_roundtrip(vals):
    """pack -> unpack is the identity for any sub-second nano value, and
    the packed tag stays within the reference's 3-bit budget."""
    from hive_dwrf_spark.format.reader import _unpack_nanos
    from hive_dwrf_spark.format.writer import _pack_nanos

    arr = np.asarray(vals, dtype=np.int64)
    packed = _pack_nanos(arr)
    # falsifiable 3-bit-tag budget properties (a bare `tag <= 7` is
    # vacuously true for ANY uint): the tag encodes the stripped
    # trailing-zero count, so (a) re-applying the tag's multiplier to the
    # packed magnitude must stay sub-second, and (b) values with no
    # trailing-zero run of >= 2 must carry tag 0 (stored verbatim).
    tags = packed & np.uint64(7)
    mults = np.array(
        [1, 100, 1_000, 10_000, 100_000, 1_000_000, 10_000_000, 100_000_000],
        dtype=np.uint64,
    )
    assert ((packed >> np.uint64(3)) * mults[tags] < np.uint64(10**9)).all()
    not_div_100 = arr % 100 != 0
    assert (tags[not_div_100] == 0).all()
    assert (_unpack_nanos(packed) == arr).all()
