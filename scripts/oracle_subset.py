"""Targeted DuckDB oracle gate: replay NAMED queries at a given SF with
the driver's comparison semantics (tests/oracle.py::compare_spark_duck).
The round-13 per-change gate — the full battery (run_battery.py) stays
the round-final chain; this is the fast loop after each behavioral-
surface change.

Usage: python scripts/oracle_subset.py <sf_dir> <query> [<query> ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    import duckdb
    from pyspark.sql import SparkSession

    from oracle import compare_spark_duck

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .appName("oracle-subset")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    import __spark_entry__ as m

    qs, osql = m.queries(), m.oracle_sql()
    n_bad = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, sf_dir)
            ok, msg = compare_spark_duck(sdf, con, osql[name])
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"{type(e).__name__}: {e}"
        dt = round(time.perf_counter() - t0, 2)
        n_bad += not ok
        print(
            f"{'PASS' if ok else 'FAIL'} {name} ({dt}s)"
            f" {'' if ok else msg[:300]}",
            flush=True,
        )
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
