"""Run EVERY registered query against its DuckDB oracle at sf0.01 with the
driver's comparison semantics (row count + column name set + order-
insensitive canonicalized value hash) and write BATTERY_<tag>.json.

Usage: python scripts/run_battery.py [sf_dir] [out.json]

This is the self-run version of the driver's CORRECTNESS gate over the
FULL registry (the driver samples ~50 of the queries per round); it is how
unproven rows (fixed-but-unsampled queries) get local evidence.
"""

from __future__ import annotations

import json
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "BATTERY_local.json"
    )
    import duckdb
    from pyspark.sql import SparkSession

    from oracle import compare_spark_duck

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("battery")
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
    results: dict[str, dict] = {}
    n_ok = n_bad = 0
    for name in sorted(qs):
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, sf_dir)
            if name in osql:
                ok, msg = compare_spark_duck(sdf, con, osql[name])
            else:
                cnt = sdf.count()
                ok, msg = cnt >= 0, f"rows_only:{cnt}"
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"{type(e).__name__}: {e}"
        dt = round(time.perf_counter() - t0, 2)
        results[name] = {"ok": bool(ok), "msg": msg[:300], "sec": dt}
        n_ok += ok
        n_bad += not ok
        print(f"{'PASS' if ok else 'FAIL'} {name} ({dt}s) {'' if ok else msg[:200]}")
    summary = {
        "sf_dir": sf_dir,
        "total": len(results),
        "pass": n_ok,
        "fail": n_bad,
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"\n{n_ok}/{len(results)} pass -> {out_path}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
