"""Format round-trip queries (SURVEY.md §2.C Q17/Q18): data passes through
our DWRF writer + reader (via the "dwrf" Python DataSource) and must still
hash-match a DuckDB oracle computed directly on the source parquet — proving
the format layer is value-transparent for nested types and timestamps."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..tables import load
from . import query


def _roundtrip(spark, df, tag: str, sf_dir: str):
    """Write df as DWRF, read it back. Deterministic per (tag, sf).

    The write is one file per input partition — write parallelism follows
    input partitioning, which at real scale is already wide. (Forcing a
    repartition here was measured slower at bench scale: the shuffle of the
    full rows costs more than the parallel encode saves.)"""
    from ..sources import register

    register(spark)
    base = os.path.basename(os.path.normpath(sf_dir))
    out = f"/tmp/hive_dwrf_spark_rt_{tag}_{base}"
    # row-budget stripes: read parallelism is one task per (file, stripe),
    # so a narrow input (one small parquet split) still fans out on read.
    # At real scale each task writes ~100 MB+ and the byte budget dominates;
    # this only bites when files are small enough to fit one stripe.
    df.write.format("dwrf").option("path", out).option(
        "stripe_rows", "12500"
    ).mode("overwrite").save()
    return spark.read.format("dwrf").load(out)


@query(
    "q17",
    oracle="""
    SELECT l_orderkey AS k, l_linenumber AS ln,
           l_quantity AS qty, l_returnflag AS flag,
           l_extendedprice AS arr0, l_tax AS m_tax
    FROM lineitem
    ORDER BY k, ln
    LIMIT 100
    """,
)
def q17(spark, sf_dir):
    """Nested-type round-trip: struct/array/map columns built from lineitem
    survive DWRF write+read (LIST/MAP/STRUCT stream layout,
    WriterImpl.java:1808-1973) and field access matches direct computation."""
    li = load(spark, sf_dir, "lineitem")
    nested = li.select(
        F.col("l_orderkey").alias("k"),
        F.col("l_linenumber").alias("ln"),
        F.struct(
            F.col("l_quantity").alias("qty"), F.col("l_returnflag").alias("flag")
        ).alias("s"),
        F.array("l_extendedprice", "l_discount").alias("arr"),
        F.create_map(F.lit("tax"), F.col("l_tax")).alias("m"),
    )
    back = _roundtrip(spark, nested, "q17", sf_dir)
    return (
        back.select(
            "k",
            "ln",
            F.col("s.qty").alias("qty"),
            F.col("s.flag").alias("flag"),
            F.element_at("arr", 1).alias("arr0"),
            F.element_at("m", "tax").alias("m_tax"),
        )
        .orderBy("k", "ln")
        .limit(100)
    )


@query(
    "q18",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
           count(*) AS cnt,
           min(CAST(ts AS TIMESTAMP)) AS min_ts,
           max(CAST(ts AS TIMESTAMP)) AS max_ts
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def q18(spark, sf_dir):
    """Timestamp round-trip incl. sub-millisecond values through the
    2015-epoch seconds + packed-nanos encoding (WriterImpl.java:1736-1798)."""
    e = load(spark, sf_dir, "events")
    back = _roundtrip(spark, e, "q18", sf_dir)
    return (
        back.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
        )
        .orderBy("hour")
    )
