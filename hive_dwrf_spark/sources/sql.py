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
  and fails. Re-probed round 10 on spark-sql_2.13-4.1.2 bytecode:
  getTable compiles to ``new PythonTable(this, shortName, schema)`` with
  the properties argument unread, and PythonDataSourceV2 implements only
  TableProvider — no SessionConfigSupport — so the
  ``spark.datasource.dwrf.*`` session-conf forwarding route is closed
  too. The WORKAROUND that ships here: the metastore still STORES the
  location and storage properties faithfully, so :func:`create_table`
  issues real persistent DDL and :func:`attach_catalog_tables` re-binds
  every cataloged dwrf table as a same-named temp view (temp views win
  unqualified resolution) at session start — persistent tables that
  survive restarts at the cost of one helper call per session.
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


def create_table(spark, name: str, path: str, **options) -> None:
    """PERSISTENT dwrf table: real ``CREATE TABLE ... USING dwrf``
    DDL — name, location and storage options live in the session
    catalog (and survive restarts under a persistent metastore) — plus
    the same-named temp-view binding that makes it readable in THIS
    session despite the Spark 4.1 getTable gap (module docstring).
    After a restart, one :func:`attach_catalog_tables` call re-binds
    every cataloged dwrf table."""
    from . import register

    register(spark)
    _check_ident(name, "table name")
    for k in options:
        _check_ident(k, "option key")
    kv = ", ".join(f"{k} {_quote(v)}" for k, v in options.items())
    opt_clause = f" OPTIONS ({kv})" if kv else ""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} USING dwrf{opt_clause}"
        f" LOCATION {_quote(path)}"
    )
    create_temp_table(spark, name, path, **options)


def drop_table(spark, name: str) -> None:
    """Drop a :func:`create_table` table: catalog entry + view binding.
    (dropTempView, not DROP VIEW: once the binding is gone the name
    resolves to the catalog TABLE and DROP VIEW would error on it.)"""
    _check_ident(name, "table name")
    spark.catalog.dropTempView(name)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    _registry(spark).pop(name, None)


def attach_catalog_tables(spark) -> list[str]:
    """Bind every persistent dwrf table in the current database as a
    readable same-named temp view — the per-session half of the
    persistent-table workaround (module docstring). Returns the attached
    names.

    Location and storage options come from the EXTERNAL catalog entry
    (session catalog / metastore), which stores them faithfully — it is
    only the read-path ``PythonDataSourceV2.getTable`` that drops them
    (DESCRIBE TABLE EXTENDED resolves through that same V2 table and
    shows neither provider location nor options, so the catalog entry is
    the one source of truth left)."""
    from . import register

    register(spark)
    ext = spark._jsparkSession.sessionState().catalog().externalCatalog()
    db = spark.catalog.currentDatabase()
    attached: list[str] = []
    for t in spark.catalog.listTables():
        if t.isTemporary or not _IDENT.match(t.name):
            continue
        jt = ext.getTable(db, t.name)
        provider = jt.provider()
        if not provider.isDefined() or provider.get().lower() != "dwrf":
            continue
        loc = jt.storage().locationUri()
        if not loc.isDefined():
            continue
        jprops = spark._jvm.scala.jdk.javaapi.CollectionConverters.asJava(
            jt.storage().properties()
        )
        opts = {
            k: jprops[k]
            for k in jprops.keySet().toArray()
            if k != "path" and _IDENT.match(k)
        }
        create_temp_table(spark, t.name, loc.get().toString(), **opts)
        attached.append(t.name)
    return attached
