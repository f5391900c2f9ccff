"""Execution-only robustness sweep: run EVERY registered query at a given
scale factor (default sf0.1 — 10x the correctness battery) and record rows,
wall seconds, and any failure. No oracles here — the point is catching
scale hazards the sf0.01 battery structurally cannot see (mis-estimated
broadcasts, single-task explosions, driver OOM paths), in the same 8 GB
session bench.py uses.

Usage: python scripts/exec_sweep.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "SWEEP_local.json"
    )
    from hive_dwrf_spark.session import get_spark

    spark = get_spark("exec-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as m

    qs = m.queries()
    results: dict[str, dict] = {}
    n_ok = n_bad = 0
    for name in sorted(qs):
        t0 = time.perf_counter()
        try:
            n = qs[name](spark, sf_dir).count()
            sec = round(time.perf_counter() - t0, 2)
            results[name] = {"ok": True, "rows": n, "sec": sec}
            n_ok += 1
            print(f"{name}: {n} rows in {sec}s", flush=True)
        except Exception:
            sec = round(time.perf_counter() - t0, 2)
            results[name] = {
                "ok": False,
                "sec": sec,
                "err": traceback.format_exc(limit=3).splitlines()[-1],
            }
            n_bad += 1
            print(f"{name}: FAILED in {sec}s", flush=True)
    out = {
        "sf_dir": sf_dir,
        "pass": n_ok,
        "fail": n_bad,
        "total": n_ok + n_bad,
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"{n_ok}/{n_ok + n_bad} executed -> {out_path}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
