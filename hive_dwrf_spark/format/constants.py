"""DWRF format constants.

Values mirror the reference's on-disk contract:
- magic/postscript framing: OrcFile.java:42, WriterImpl.java:2346-2363
- stream kinds / areas: orc_proto.proto:41-60, StreamName.java:94-104
- RLE group bounds: RunLengthConstants.java:6-12
- writer defaults: OrcConf.java:31-55
- timestamp epoch: WriterImpl.java:1736-1738 (2015-01-01, UTC here)
"""

from __future__ import annotations

from enum import IntEnum

MAGIC = b"ORC"
HEADER_LENGTH = len(MAGIC)

# user-metadata key holding per-stripe "index:data:footer" CRC32 triples
# (scrub-time verification; foreign readers skip unknown metadata keys)
CHECKSUM_METADATA_KEY = "dwrf.stream.crc32"


class TypeKind(IntEnum):
    BOOLEAN = 0
    BYTE = 1
    SHORT = 2
    INT = 3
    LONG = 4
    FLOAT = 5
    DOUBLE = 6
    STRING = 7
    BINARY = 8
    TIMESTAMP = 9
    LIST = 10
    MAP = 11
    STRUCT = 12
    UNION = 13


class StreamKind(IntEnum):
    PRESENT = 0
    DATA = 1
    LENGTH = 2
    DICTIONARY_DATA = 3
    DICTIONARY_COUNT = 4
    NANO_DATA = 5
    ROW_INDEX = 6
    IN_DICTIONARY = 7
    STRIDE_DICTIONARY = 8
    STRIDE_DICTIONARY_LENGTH = 9


class ColumnEncodingKind(IntEnum):
    DIRECT = 0
    DICTIONARY = 1


class CompressionKind(IntEnum):
    NONE = 0
    ZLIB = 1
    SNAPPY = 2
    LZO = 3


# Stream areas decide on-disk ordering within a stripe: INDEX, then
# DICTIONARY (LENGTH hoisted next to DICTIONARY_DATA), then DATA.
INDEX_AREA = {StreamKind.ROW_INDEX, StreamKind.DICTIONARY_COUNT}
DICTIONARY_AREA = {StreamKind.DICTIONARY_DATA}

# RLE v1 group bounds (shared by int and byte RLE).
MIN_REPEAT_SIZE = 3
MAX_LITERAL_SIZE = 128
MAX_REPEAT_SIZE = 127 + MIN_REPEAT_SIZE

MIN_DELTA = -128
MAX_DELTA = 127

# Writer defaults (reference defaults scaled where noted).
DEFAULT_COMPRESSION = CompressionKind.ZLIB
DEFAULT_ZLIB_LEVEL = 4
DEFAULT_COMPRESSION_BLOCK_SIZE = 256 * 1024
DEFAULT_STRIPE_SIZE = 256 * 1024 * 1024  # bytes of raw data per stripe
DEFAULT_ROW_INDEX_STRIDE = 10_000
MIN_ROW_INDEX_STRIDE = 1_000
DEFAULT_STRING_DICT_THRESHOLD = 0.8
DEFAULT_INT_DICT_THRESHOLD = 0.7
# entropy heuristic for string dictionaries (OrcConf.java:46-51): when few
# values repeat, keep the dictionary only if sampled keys exceed this many
# distinct characters (low-entropy keys compress fine DIRECT + zlib)
DEFAULT_ENTROPY_THRESHOLD = 20
DEFAULT_ENTROPY_MIN_SAMPLES = 100
DEFAULT_ENTROPY_SAMPLE_FRACTION = 0.001
DEFAULT_ENTROPY_KEY_SIZE_THRESHOLD = 0.9

# Seconds between 1970-01-01 and 2015-01-01 UTC. The reference computes this
# in JVM-local time; we pin UTC so files are machine-independent.
TIMESTAMP_BASE_SECONDS = 1_420_070_400

# Raw (logical) datasize per value, used for rawDataSize accounting
# (RawDatasizeConst.java:29-57).
RAW_SIZE = {
    TypeKind.BOOLEAN: 1,
    TypeKind.BYTE: 1,
    TypeKind.SHORT: 2,
    TypeKind.INT: 4,
    TypeKind.LONG: 8,
    TypeKind.FLOAT: 4,
    TypeKind.DOUBLE: 8,
    TypeKind.TIMESTAMP: 12,
}
