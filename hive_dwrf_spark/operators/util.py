"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Widen a narrow scan so a Python-UDF stage uses every core.

    A small parquet file arrives as ONE input partition; any pandas UDF
    downstream then runs single-threaded no matter how many cores the
    cluster has. When (and only when) the plan has fewer partitions than
    the session's default parallelism, repartition up to it — a shuffle of
    the narrow input, trivially cheap next to the UDF it parallelizes. At
    real scale the input already has >= parallelism partitions and this is
    a metadata-only no-op (no shuffle added).
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
