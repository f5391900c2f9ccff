"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q5-shaped multi-way
    join + aggregation (SURVEY.md §2.C Q04)."""
    from hive_dwrf_spark.queries import load_registry
    from hive_dwrf_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)
    queries_, _ = load_registry()
    return queries_["q04"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from hive_dwrf_spark.queries import load_registry

    queries_, _ = load_registry()
    return dict(queries_)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each hash-checked query."""
    from hive_dwrf_spark.queries import load_registry

    _, oracle_ = load_registry()
    return dict(oracle_)
