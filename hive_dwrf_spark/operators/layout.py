"""Data layout for scan efficiency: clustered DWRF writes.

Min/max statistics only prune when values are clustered: a randomly-laid-out
column has every stride spanning the whole value range, so no predicate can
skip anything. write_clustered range-partitions on the cluster keys and
sorts within partitions before writing, giving near-disjoint stride/stripe
ranges — the layout step that turns the format's statistics machinery
(WriterImpl.createRowIndexEntry, our stride stats) into real IO savings.

At 100 TB this is a one-time (or per-ingest-batch) cost: repartitionByRange
samples the key distribution, so output files are balanced even under skew,
and every later range/equality predicate on the cluster key scans only the
files/stripes/strides that can match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    n_files: int | None = None,
    mode: str = "append",
    **options: str,
) -> None:
    """Write df as DWRF, range-clustered on cluster_by.

    n_files controls output file count (default: current parallelism)."""
    parts = [df[c] for c in cluster_by]
    ranged = (
        df.repartitionByRange(n_files, *parts)
        if n_files
        else df.repartitionByRange(*parts)
    )
    writer = (
        ranged.sortWithinPartitions(*cluster_by)
        .write.format("dwrf")
        .option("path", path)
        .mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
