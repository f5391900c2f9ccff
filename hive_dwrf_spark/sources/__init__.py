from __future__ import annotations

from ..shipping import ensure_shipped
from .dwrf_datasource import DwrfDataSource

__all__ = ["DwrfDataSource", "register"]


def register(spark) -> None:
    """Register the dwrf format with a SparkSession (idempotent) and make
    the package importable on executors."""
    ensure_shipped(spark)
    if not getattr(spark, "_hive_dwrf_registered", False):
        spark.dataSource.register(DwrfDataSource)
        spark._hive_dwrf_registered = True
