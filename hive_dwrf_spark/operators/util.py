"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, cap: int | None = None) -> DataFrame:
    """Widen a narrow scan so a Python-UDF stage uses every core.

    A small parquet file arrives as ONE input partition; any pandas UDF
    downstream then runs single-threaded no matter how many cores the
    cluster has. When (and only when) the plan has fewer partitions than
    the session's default parallelism, repartition up to it — a shuffle of
    the narrow input, trivially cheap next to the UDF it parallelizes. At
    real scale the input already has >= parallelism partitions and this is
    a metadata-only no-op (no shuffle added).

    ``cap`` bounds the widening for stages whose DOWNSTREAM consumers pay
    per-task overhead on the widened partitioning: a vectorized UDF
    saturates a few cores, and every extra partition costs fixed task
    overhead in each later stage that reads it (measured: minhash end-to-
    end is fastest widened to ~8, slower at full 32).
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if cap is not None:
        target = min(cap, target)
    # Width probe via input file count, not df.rdd.getNumPartitions(): the
    # RDD probe forced a full plan analysis + RDD lineage build on every
    # call. File count under-counts (files split into stripes/row-groups),
    # so this stays conservative: a genuinely wide input (>= target files,
    # the 100 TB case) is never touched — and never narrowed — while a
    # bench-scale 1-file scan still fans out for the UDF stage.
    try:
        width = len(df.inputFiles())
    except Exception:
        width = 0
    if width >= target:
        return df
    return df.repartition(target)
