"""Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).

At 100 TB scale these reads are plain distributed parquet scans; nothing here
collects to the driver. The only special case is ``events``: its parquet
stores TIMESTAMP(NANOS) which Spark rejects, so we read nanoseconds as int64
(``spark.sql.legacy.parquet.nanosAsLong``) and truncate to microseconds as a
TIMESTAMP_NTZ — the same value DuckDB produces for ``CAST(ts AS TIMESTAMP)``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import apply_runtime_confs

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from .shipping import ensure_shipped

    apply_runtime_confs(spark)
    ensure_shipped(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # int64 nanos -> microsecond TIMESTAMP_NTZ (truncation, like DuckDB's
        # CAST(ts_ns AS TIMESTAMP)). Integer DIV — a double division here
        # would lose precision at 1e18 nanosecond magnitudes.
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz")
        )
    return df


def fan_out(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-repartition `df` to the default parallelism when it arrives in
    fewer partitions than half the cores — the single-file/single-row-group
    case where an unsplittable parquet scan pins a CPU-heavy map stage
    (tokenization, per-probe dot products) to ONE task regardless of
    cluster size.

    No-op when the input is already parallel, which is the production
    case (multi-GB inputs arrive as many files/row groups and are split by
    the scan), so this never adds a shuffle at 100 TB — same size-gated
    runtime-adaptation spirit as AQE and the broadcast threshold. Hash
    partitioning on `keys` rather than round-robin: repartition(n) without
    keys local-sorts EVERY column first for determinism (SPARK-23207),
    which is expensive on wide text/array rows, while a hash exchange
    ships rows as-is. Only worth applying in front of operators whose
    per-row map cost dwarfs one extra small exchange — blanket use at
    load() measurably regressed the overall bench."""
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    if df.rdd.getNumPartitions() * 2 <= par:
        return df.repartition(par, *keys) if keys else df.repartition(par)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() queries run as-is."""
    for t in TABLE_NAMES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
