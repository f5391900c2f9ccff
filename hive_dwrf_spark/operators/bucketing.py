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
        bucketed.repartition(BUCKET_COL)
        .write.format("dwrf")
        .option("path", path)
        .option("partition_by", BUCKET_COL)
        .mode(mode)
        .save()
    )


def read_bucket(spark: SparkSession, path: str, bucket: int) -> DataFrame:
    return (
        spark.read.format("dwrf")
        .load(f"{path}/{BUCKET_COL}={bucket}")
    )


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
    joins over co-located slices instead of one table-wide shuffle."""
    joins = [
        read_bucket(spark, left_path, i).join(
            read_bucket(spark, right_path, i), key, how
        )
        for i in range(n_buckets)
    ]
    return reduce(DataFrame.unionByName, joins)
