"""Pure-SQL surface over DWRF paths: temp tables you can SELECT from and
INSERT into with nothing but ``spark.sql(...)``.

Spark's Python DataSource API (4.1) supports exactly one SQL table shape:
``CREATE TEMPORARY VIEW name USING dwrf OPTIONS (path '...')`` — the
CreateTempViewUsing command forwards OPTIONS to the source, so SELECT,
INSERT INTO and INSERT OVERWRITE all route through the DataSource's
reader/writer. The reference gets this surface from its host engine for
free (Hive DDL over the DWRF SerDe/InputFormat — HiveDwrfStorageHandler
parity); this module is the Spark-Python analog plus workarounds for two
JVM-side gaps, both verified against spark-sql_2.13-4.1.2 bytecode:

- **persistent catalog tables don't carry options.**
  ``CREATE TABLE ... USING dwrf LOCATION ...`` stores fine (schema() sees
  the location at DDL time), but reads resolve through
  ``PythonDataSourceV2.getTable(schema, partitioning, properties)`` which
  DROPS the properties map — at SELECT time the reader receives no path
  and fails. Until Spark forwards table properties, only TEMPORARY views
  carry options, so that is what ``create_temp_table`` issues.
- **a resolved view caches its planned read JVM-side** (the lazily-built
  ``readInfo`` file list), so after a SQL INSERT the same view serves the
  stale listing — and after INSERT OVERWRITE (which deletes the old part
  files) it errors on missing files. ``REFRESH TABLE`` only invalidates
  file-source caches and does nothing for Python sources; ``refresh``
  below re-issues CREATE OR REPLACE TEMPORARY VIEW, building a fresh
  relation — the working equivalent.

At 100 TB nothing here changes the execution plan: the view IS the
DataSource scan (same pushed filters, split packing, stats pruning), the
DDL is driver-side string handling only.
"""

from __future__ import annotations

import re

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_ident(s: str, what: str) -> str:
    if not _IDENT.match(s):
        raise ValueError(f"invalid {what}: {s!r} (need [A-Za-z_][A-Za-z0-9_]*)")
    return s


def _quote(v) -> str:
    """SQL single-quoted literal (embedded quotes doubled)."""
    return "'" + str(v).replace("'", "''") + "'"


def _registry(spark) -> dict:
    reg = getattr(spark, "_dwrf_sql_tables", None)
    if reg is None:
        reg = {}
        spark._dwrf_sql_tables = reg
    return reg


def create_temp_table(spark, name: str, path: str, **options) -> None:
    """Expose the DWRF directory/file at ``path`` as SQL table ``name``.

    After this, plain ``spark.sql`` works against it: SELECT (full scan
    semantics of ``spark.read.format("dwrf").load(path)`` — pushdown,
    pruning, split packing), ``INSERT INTO name ...`` (appends part
    files) and ``INSERT OVERWRITE name ...``. Extra keyword options are
    passed to the DataSource (compression=..., stripe_rows=...,
    mergeSchema=..., columns=...) and apply to both reads and writes
    through the table. After any DML, call :func:`refresh` before the
    next read — see the module docstring for why.
    """
    from . import register

    register(spark)
    _check_ident(name, "table name")
    opts = {"path": path, **options}
    for k in opts:
        _check_ident(k, "option key")
    kv = ", ".join(f"{k} {_quote(v)}" for k, v in opts.items())
    spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {name} USING dwrf"
              f" OPTIONS ({kv})")
    _registry(spark)[name] = opts


def refresh(spark, name: str) -> None:
    """Rebuild ``name``'s relation so reads see files written since the
    last (re)creation — required after INSERT INTO / INSERT OVERWRITE
    because the JVM caches the planned file list per resolved view."""
    opts = _registry(spark).get(_check_ident(name, "table name"))
    if opts is None:
        raise KeyError(
            f"{name!r} was not created by create_temp_table in this session"
        )
    kv = ", ".join(f"{k} {_quote(v)}" for k, v in opts.items())
    spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {name} USING dwrf"
              f" OPTIONS ({kv})")


def drop_temp_table(spark, name: str) -> None:
    """Drop the view and forget its registration."""
    _check_ident(name, "table name")
    spark.sql(f"DROP VIEW IF EXISTS {name}")
    _registry(spark).pop(name, None)
