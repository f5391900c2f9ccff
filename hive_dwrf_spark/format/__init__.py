"""Pure-Python/numpy DWRF columnar format core.

Implements the on-disk format of facebookarchive/hive-dwrf (Facebook's ORC
fork): protobuf-framed metadata (orc_proto.proto), block-compressed column
streams, RLE/bitfield/varint encodings, adaptive dictionary encoding, column
statistics, and a stripe-per-partition layout.

Architecture is deliberately NOT the reference's row-at-a-time TreeWriter /
LazyTreeReader design (WriterImpl.java / lazy/): we encode and decode whole
column batches with numpy + pyarrow, because the Python hot path must be
vectorized end-to-end, and Spark exchanges Arrow batches with Python anyway.
"""

from .reader import DwrfFile
from .writer import DwrfWriter, write_arrow_table

__all__ = ["DwrfFile", "DwrfWriter", "write_arrow_table"]
