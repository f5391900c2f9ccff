"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested: BinaryType payload columns with
a StructType metadata sibling, Arrow-batched decode/feature-extract over
mapInPandas (batch-shaped exactly like a production pipeline), partition
sizing by payload bytes. The actual media decoding is STUBBED — the
image/audio libraries are not in this container — behind
`set_decoder(...)`; the default deterministic fake derives "pixels" from a
hash of the payload so tests exercise real batch/schema mechanics.

DWRF mapping: payload -> BINARY stream (raw bytes + LENGTH), metadata ->
STRUCT subtree (SURVEY.md §2.D multimodal row).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: schema of the decoded-feature output of decode_features()
FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

_DECODER = None  # swap in a real decoder with set_decoder()


def set_decoder(fn) -> None:
    """Install a real media decoder: fn(payload: bytes) -> (w, h, np.ndarray).

    Not implemented in this container (no image/audio libs); the default is
    a deterministic fake used to validate the distributed plumbing."""
    global _DECODER
    _DECODER = fn


def _fake_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in: 'decodes' a payload into an 8-float feature
    vector derived from its sha256 — stable across machines."""
    digest = hashlib.sha256(payload).digest()
    w = 16 + digest[0] % 64
    h = 16 + digest[1] % 64
    feats = (
        np.frombuffer(digest[:32], dtype=np.uint8).reshape(8, 4).sum(axis=1)
        / 255.0
    ).astype(np.float32)
    return w, h, feats


def attach_metadata(
    df: DataFrame, payload_col: str, media_type: str, id_col: str
) -> DataFrame:
    """Standard multimodal column pair: (payload binary, meta struct)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(F.col(payload_col)).alias("n_bytes"),
            F.sha2(F.col(payload_col), 256).alias("sha256"),
        ).alias("meta"),
    )


def decode_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode payloads to feature rows via mapInPandas (Arrow batches).

    Uses the installed decoder, else the deterministic fake. A real decoder
    that needs native libs raises NotImplementedError at call time — the
    Spark plan, batch shape, and schema are identical either way."""
    decoder = _DECODER or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                w, h, feats = decoder(data)
                rows.append((mid, w, h, len(data), feats.tolist()))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_bytes", "features"]
            )

    # no spread() here: unlike the text UDFs, widening this stage means
    # shuffling the binary payloads themselves, which costs more than the
    # per-row decode saves; real media inputs arrive many-partitioned
    return df.select("media_id", payload_col).mapInPandas(run, FEATURE_SCHEMA)


def resize_plan(df: DataFrame, max_side: int = 32) -> DataFrame:
    """Image resize *plan*: computes aspect-preserving target dimensions for
    a thumbnail pass (the pixel resample itself is decoder territory and
    stays stubbed, like decode). Pure integer column arithmetic — exact and
    engine-replayable: out_w = w * max_side DIV max(w, h), floored at 1.

    Runs on the decode_features() output (media_id, width, height, ...)."""
    return df.select(
        "media_id",
        "width",
        "height",
        F.greatest(
            F.expr(f"(width * {max_side}) DIV greatest(width, height)"),
            F.lit(1),
        ).cast("int").alias("out_w"),
        F.greatest(
            F.expr(f"(height * {max_side}) DIV greatest(width, height)"),
            F.lit(1),
        ).cast("int").alias("out_h"),
    )


def frame_sample_plan(
    df: DataFrame, every_n: int = 30, max_frames: int = 8
) -> DataFrame:
    """Video frame-sampling *plan*: expands each media row into the frame
    indices a decoder would extract (decode itself is stubbed). Shows the
    explode-side scaling shape: rows multiply by <= max_frames."""
    idx = F.sequence(
        F.lit(0),
        F.least(
            F.lit((max_frames - 1) * every_n),
            F.greatest(F.col("meta.n_bytes") / 1000, F.lit(0)).cast("long"),
        ),
        F.lit(every_n),
    )
    return df.select(
        "media_id", F.explode(idx).alias("frame_index")
    )


def phash_stub(mm: DataFrame, bits: int = 60) -> DataFrame:
    """Perceptual-hash stand-in for media near-dup detection: a `bits`-wide
    integer hash per payload, derived from the metadata sha256 (the
    documented deterministic decode stub — a real pHash comes from decoded
    pixels via set_decoder, but lands in the identical column and feeds
    the identical Hamming join). 60 bits = 15 hex nibbles keeps the value
    inside a signed bigint on every engine, so the SQL oracle rebuilds it
    with plain nibble arithmetic.

    Pair with operators/dedup.py::hamming_near_pairs(bits=60) for the
    complete banded near-dup join — the image-thumbnail dedup pass of a
    multimodal corpus."""
    if not 0 < bits <= 60 or bits % 4 != 0:
        raise ValueError(f"bits must be a multiple of 4 in (0, 60], got {bits}")
    nib = bits // 4
    return mm.select(
        "media_id",
        F.conv(F.substring(F.col("meta.sha256"), 1, nib), 16, 10)
        .cast("bigint")
        .alias("phash"),
    )
