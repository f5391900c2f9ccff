"""Bucketed DWRF tables: co-located joins without a metastore.

Spark's built-in bucketBy needs a catalog table; for path-based DWRF data
the same effect falls out of the partitioned writer: bucket id =
pmod(hash(key), n_buckets) becomes a hive-style directory, and a join of
two tables bucketed the same way decomposes into n_buckets independent
joins of small co-located slices — no full-table shuffle. Each per-bucket
join is tiny, so AQE turns it into a broadcast join; the union of bucket
joins replaces the big shuffle with n_buckets local ones.

At 100 TB this is the classic shuffle-once-reuse-many pattern: pay the
bucket write once, then every subsequent equi-join on the bucket key skips
its shuffle entirely.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "__bucket"


def write_bucketed(
    df: DataFrame, path: str, key: str, n_buckets: int, mode: str = "append"
) -> None:
    """Write df as a DWRF table bucketed on `key` into n_buckets dirs."""
    bucketed = df.withColumn(BUCKET_COL, F.pmod(F.hash(F.col(key)), F.lit(n_buckets)))
    (
        # exactly n_buckets shuffle partitions: repartition(col) alone uses
        # spark.sql.shuffle.partitions tasks, leaving (partitions -
        # n_buckets) EMPTY write tasks that each still pay a Python
        # datasource-writer round trip
        bucketed.repartition(n_buckets, BUCKET_COL)
        .write.format("dwrf")
        .option("path", path)
        .option("partition_by", BUCKET_COL)
        .mode(mode)
        .save()
    )


def read_bucket(
    spark: SparkSession, path: str, bucket: int, schema=None
) -> DataFrame:
    reader = spark.read.format("dwrf")
    if schema is not None:
        # schema handed down from one footer read of bucket 0: without it
        # every per-bucket relation re-parses a footer on the driver
        # (2 tables x n_buckets parses for one bucketed join)
        reader = reader.schema(schema)
    return reader.load(f"{path}/{BUCKET_COL}={bucket}")


def bucketed_join(
    spark: SparkSession,
    left_path: str,
    right_path: str,
    key: str,
    n_buckets: int,
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed DWRF tables bucket-by-bucket.

    Equal keys hash to equal buckets, so bucket i of the left can only
    match bucket i of the right; the plan is a union of n_buckets small
    joins over co-located slices instead of one table-wide shuffle.

    Each per-bucket join broadcasts the RIGHT slice explicitly (callers
    put the smaller table on the right): a bucket slice is 1/n_buckets of
    its table by construction, so the build side stays small even when the
    whole right table would not broadcast — and the explicit hint keeps
    the shuffle-free property without waiting for AQE to re-plan each of
    the n_buckets joins from runtime stats. A per-bucket shuffle join
    would be wrong here: summed over buckets it re-shuffles the full
    table, which is exactly what bucketing paid the write to avoid."""
    left_schema = read_bucket(spark, left_path, 0).schema
    right_schema = read_bucket(spark, right_path, 0).schema
    joins = [
        read_bucket(spark, left_path, i, left_schema).join(
            F.broadcast(read_bucket(spark, right_path, i, right_schema)),
            key,
            how,
        )
        for i in range(n_buckets)
    ]
    return reduce(DataFrame.unionByName, joins)
