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
    # Memoize the LAZY DataFrame per (session, dir, table): every
    # spark.read.parquet() re-runs schema inference + file listing
    # (~50-200 ms of driver work), and a query calls load() for each of
    # its tables on every invocation — q04 alone loads five. This is the
    # file-listing-cache class of optimization (guide §6), not result
    # caching: the object held is an immutable lazy plan over the
    # parquet files; every action on it still scans the files. The test
    # corpora under sf_dir are immutable; anything mutable goes through
    # the dwrf DataSource, not this loader.
    cache = getattr(spark, "_dwrf_table_dfs", None)
    if cache is None:
        cache = {}
        spark._dwrf_table_dfs = cache
    key = (os.path.abspath(sf_dir), name)
    hit = cache.get(key)
    if hit is not None:
        return hit
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # int64 nanos -> microsecond TIMESTAMP_NTZ (truncation, like DuckDB's
        # CAST(ts_ns AS TIMESTAMP)). Integer DIV — a double division here
        # would lose precision at 1e18 nanosecond magnitudes.
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz")
        )
    cache[key] = df
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
    # note: the rdd-probe here is ~1 ms on a load()-memoized DataFrame
    # (the RDD lineage caches on the reused object); the ~200 ms that
    # used to be attributed to this probe was spark.read.parquet's
    # schema/listing cost, now memoized in load() (optimization r12)
    if df.rdd.getNumPartitions() * 2 <= par:
        return df.repartition(par, *keys) if keys else df.repartition(par)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() queries run as-is."""
    for t in TABLE_NAMES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
