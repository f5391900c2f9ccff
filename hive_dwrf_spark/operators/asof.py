"""As-of (point-in-time) join — the time-series join the reference's host
engines express as a non-equi join (SURVEY §2.B joins row).

Spark has no ASOF JOIN operator; the scalable formulation is union + window
carry-forward: tag both sides, union them, and per key take the latest
right-side value at-or-before each left row via last(..., ignorenulls=True)
over (key ORDER BY ts, side). One shuffle on the key — same cost as a
single sort-merge join — versus the naive non-equi join whose range
condition degenerates to a per-key cross product. At 100 TB the window
state is a single carried value per partition stream, so memory is O(1)
per key regardless of history length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
) -> DataFrame:
    """For every left row, attach the value_cols of the latest right row
    with right.on <= left.on and matching `by` key (NULLs when no earlier
    right row exists). Left columns are preserved."""
    lcols = left.columns
    l = left.select(
        *lcols, F.lit(1).alias("__side"), *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols]
    )
    r = right.select(
        *[
            F.col(c)
            if c in (on, by)
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = l.unionByName(r)
    # right rows (side 0) sort before left rows (side 1) at equal timestamps,
    # so an exact-tie right row is visible to the left row (ASOF >= match)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "__side",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(c2)
            for c, c2 in zip(value_cols, [f"asof_{c}" for c in value_cols])
        ],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")
