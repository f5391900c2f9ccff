from __future__ import annotations

from ..shipping import ensure_shipped
from .dwrf_datasource import DwrfDataSource
from .stats import broadcast_if_small, dwrf_path_stats

__all__ = [
    "DwrfDataSource",
    "broadcast_if_small",
    "dwrf_path_stats",
    "register",
]


def register(spark) -> None:
    """Register the dwrf format with a SparkSession (idempotent) and make
    the package importable on executors. Also applies the runtime confs
    the source needs (e.g. Python filter pushdown must be enabled or
    Spark rejects a reader that implements pushFilters), so a bare
    user-built session works with plain ``register(spark)``."""
    from ..session import apply_runtime_confs

    apply_runtime_confs(spark)
    ensure_shipped(spark)
    if not getattr(spark, "_hive_dwrf_registered", False):
        spark.dataSource.register(DwrfDataSource)
        spark._hive_dwrf_registered = True
