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


def _guard_names(taken: set[str], *names: str) -> None:
    """Temp/derived column names must not already exist in a caller frame —
    a silent collision would yield ambiguous or duplicate output columns."""
    clash = sorted(set(names) & taken)
    if clash:
        raise ValueError(
            f"column name collision with generated columns: {clash}; "
            "rename the input columns or pass a different suffix"
        )


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
    _guard_names(
        set(points.columns) | set(intervals.columns), "__pbucket", "__ibucket"
    )
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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    suffix: str = "_r",
) -> DataFrame:
    """Interval x interval overlap join: every (l, r) pair with
    l.lo <= r.hi AND r.lo <= l.hi — the genomics/session-overlap shape
    Spark would otherwise plan as a nested loop.

    Both sides explode to the coarse buckets they cover and meet in an
    equi-join on bucket id with the overlap residual in the join
    condition. A pair overlapping across several buckets would collide in
    each of them, so the join keeps ONLY the collision in the bucket
    containing max(l.lo, r.lo) — the first bucket where both intervals
    are present. Each pair emits exactly once with no distinct (a
    distinct would shuffle the output a second time).

    Cost: O(|L| + |R|) x avg buckets-per-interval shuffled once; pick
    bucket_width near the median interval length (~2x blow-up). Right
    columns are suffixed. Same caveat as point_in_interval_join: an
    interval spanning everything floods its buckets — split outliers or
    raise bucket_width.
    """
    bw = float(bucket_width)
    # guard both the temp bucket ids and the suffixed right columns: a left
    # column named e.g. 'lo_r' would silently duplicate the suffixed right lo
    suffixed = [c + suffix for c in right.columns]
    _guard_names(set(left.columns) | set(right.columns), "__bkt", "__bkt_r")
    _guard_names(set(left.columns), *suffixed)

    def burst(df: DataFrame, tag: str, lo: str, hi: str) -> DataFrame:
        return df.withColumn(
            f"__bkt{tag}",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / bw).cast("long"),
                    F.floor(F.col(hi) / bw).cast("long"),
                )
            ),
        )

    # single projection (not a withColumnRenamed loop — that nests one
    # plan node per column on wide frames)
    r = right.toDF(*suffixed)
    lb = burst(left, "", lo_col, hi_col)
    rb = burst(r, "_r", lo_col + suffix, hi_col + suffix)
    lo_r, hi_r = lo_col + suffix, hi_col + suffix
    cond = (
        (F.col("__bkt") == F.col("__bkt_r"))
        & (F.col(lo_col) <= F.col(hi_r))
        & (F.col(lo_r) <= F.col(hi_col))
        # dedup: keep only the collision in the bucket holding the later lo
        & (
            F.col("__bkt")
            == F.floor(F.greatest(F.col(lo_col), F.col(lo_r)) / bw).cast("long")
        )
    )
    return lb.join(rb, cond).drop("__bkt", "__bkt_r")
