"""Self-check comparator mirroring the driver's DuckDB oracle gate:
row-count + column-name set + order-insensitive value comparison
(columns sorted by name, rows sorted, values canonicalized).

Driver-faithful since round 5: BOTH sides are fetched through pandas
(Spark `toPandas()`, DuckDB `res.df()`) so engine type-widening is
visible locally — DuckDB types `sum()` over integers as HUGEINT, which
pandas materializes as float64, while Spark returns bigint.  The old
`fetchall()` path collapsed both to Python int and reported green while
the driver's value-hash saw `0.0` vs `0` (missed pipeline_profile in
rounds 3 and 4).  Numeric canon is therefore TYPE-TAGGED: ints render
as `0`, floats as `0.0` — an int-vs-float divergence now fails here
exactly as it does at the driver.
"""

from __future__ import annotations

import decimal
import math
import re
from datetime import date, datetime, timedelta

import numpy as np
import pandas as pd

_INTLIKE = re.compile(r"-?\d+")


def _canon(v):
    # pandas NULL sentinels first (pd.NaT is a datetime subclass)
    if v is None or v is pd.NaT:
        return "<NULL>"
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        s = f"{v:.10g}"
        # keep floats distinguishable from ints: 0.0 -> "0.0", not "0"
        if _INTLIKE.fullmatch(s):
            s += ".0"
        return s
    if isinstance(v, datetime):
        v = v.replace(tzinfo=None)
        # DuckDB's pandas path renders DATE as midnight Timestamp; fold
        # zero-time datetimes onto the date canon so date columns compare
        # equal across the two fetch paths (both engines agree on value).
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat(timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, timedelta):
        return f"interval:{v.total_seconds():.6f}"
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


def _pdf_rows(pdf: pd.DataFrame):
    return [tuple(r) for r in pdf.itertuples(index=False, name=None)]


def compare_spark_duck(sdf, duck_con, sql: str):
    """Return (ok, message) comparing a Spark DataFrame to a DuckDB result."""
    spark_pdf = sdf.toPandas()
    spark_cols = list(spark_pdf.columns)
    spark_rows = _pdf_rows(spark_pdf)
    res = duck_con.sql(sql)
    duck_pdf = res.df()
    duck_cols = list(duck_pdf.columns)
    duck_rows = _pdf_rows(duck_pdf)

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
