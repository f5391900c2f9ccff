"""Range (point-in-interval) join — the other non-equi join shape from
SURVEY §2.B's joins row.

Spark executes a bare `p.x BETWEEN i.lo AND i.hi` condition as a broadcast
nested-loop (or worse, a cross product) because there is no equi key. The
scalable formulation buckets the number line: every interval is exploded to
the coarse buckets it covers, every point maps to one bucket, and the join
becomes an equi-join on bucket id plus a residual BETWEEN filter. Cost is
O(points + intervals x avg_buckets_per_interval) shuffled once — pick
bucket_width near the median interval length so the blow-up factor stays
~2x. Skewed buckets (an interval covering everything) are the caveat;
split such outliers or raise bucket_width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with lo <= point <= hi.

    how: 'inner' or 'left' (left-outer over the points side). Other outer
    shapes are rejected: the interval side is bucket-exploded, so a
    null-extended interval row would surface once per covered bucket.
    The BETWEEN residual lives in the join CONDITION, not a post-filter —
    a post-filter would drop left-join null-extended rows, silently
    degenerating 'left' to inner semantics.
    """
    how = how.lower()
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"point_in_interval_join supports how='inner'|'left', got {how!r}"
        )
    bw = float(bucket_width)
    p = points.withColumn(
        "__pbucket", F.floor(F.col(point_col) / bw).cast("long")
    )
    i = intervals.withColumn(
        "__ibucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bw).cast("long"),
                F.floor(F.col(hi_col) / bw).cast("long"),
            )
        ),
    )
    cond = (p["__pbucket"] == i["__ibucket"]) & F.col(point_col).between(
        F.col(lo_col), F.col(hi_col)
    )
    return p.join(i, cond, how).drop("__pbucket", "__ibucket")
