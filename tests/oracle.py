"""Self-check comparator mirroring the driver's DuckDB oracle gate:
row-count + column-name set + order-insensitive value comparison
(columns sorted by name, rows sorted, values canonicalized)."""

from __future__ import annotations

import math
from datetime import date, datetime


def _canon(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonical_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def compare_spark_duck(sdf, duck_con, sql: str):
    """Return (ok, message) comparing a Spark DataFrame to a DuckDB result."""
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]
    res = duck_con.sql(sql)
    duck_cols = list(res.columns)
    duck_rows = [tuple(r) for r in res.fetchall()]

    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(spark_rows) != len(duck_rows):
        return False, f"row counts differ: spark={len(spark_rows)} duck={len(duck_rows)}"
    a = canonical_rows(spark_cols, spark_rows)
    b = canonical_rows(duck_cols, duck_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"values differ, first diffs: {diffs}"
    return True, "ok"
