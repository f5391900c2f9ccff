"""Skew-handling operators for hot keys at 100 TB.

AQE's skew-join splitting handles sort-merge joins automatically; these
helpers cover the two cases it does not:

- salted_aggregate: a groupBy whose hot keys overload single reducers.
  Phase 1 aggregates on (key, salt) — hot keys spread over `salt_buckets`
  reducers — phase 2 merges the partials per key. Classic two-phase
  (map-side-combine-style) decomposition, expressed declaratively so both
  phases stay in whole-stage codegen.
- salted_broadcast_left: a broadcast join where the *stream* side has hot
  keys. The small side is exploded `salt_buckets`-fold (still tiny) and the
  big side picks a random salt, so one hot key's rows land in different
  tasks. Only useful when the big side must then aggregate per key; for
  plain enrichment broadcast already avoids skew.

Both take explicit partial/final aggregate expressions because a generic
mean cannot be decomposed without knowing its algebra; the caller states
the decomposition (sum/count/min/max compose; avg = sum÷count at the end).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation with salted keys.

    partial_aggs run per (keys, salt); final_aggs run per keys over the
    partial columns. Example:

        salted_aggregate(
            events, ["user_id"],
            [F.count("*").alias("c"), F.sum("value").alias("s")],
            [F.sum("c").alias("cnt"), F.round(F.sum("s"), 2).alias("total")],
        )
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_broadcast_left(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed big side against a small dimension, salt-expanded.

    The small side is replicated salt_buckets times (broadcast stays tiny:
    |small| × salt_buckets rows); each big-side row draws a random salt, so
    a hot key's rows spread across tasks instead of hammering one."""
    salts = F.explode(
        F.array(*[F.lit(i) for i in range(salt_buckets)])
    ).alias("__salt")
    small_exp = small.select("*", salts)
    big_salted = big.withColumn(
        "__salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )
    joined = big_salted.join(F.broadcast(small_exp), [key, "__salt"], how)
    return joined.drop("__salt")
