"""Sink-compaction scale point: a sink directory with 2,000 small
committed part files (the shape a 1-second-trigger pipeline leaves
behind in half an hour) is compacted in place by compact_sink. Records
wall seconds, files before/after, and verifies the committed rows are
value-identical across the rewrite. The merge is stripe-copy IO
(format/merge.py — no decode), so cost scales with bytes + file count,
not rows.

Usage: python scripts/stress_sink_compact.py [out.json]
Merges a "_sink_compact_2000" entry into out.json (default
STRESS_r11.json). No Spark needed.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_FILES = 2000
ROWS_PER_FILE = 200


def main() -> int:
    import numpy as np
    import pyarrow as pa

    from hive_dwrf_spark.format import write_arrow_table
    from hive_dwrf_spark.format.reader import DwrfFile
    from hive_dwrf_spark.sources.dwrf_datasource import (
        committed_files,
        compact_sink,
    )

    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, "STRESS_r11.json")
    )
    sink = "/tmp/stress_sink_compact"
    shutil.rmtree(sink, ignore_errors=True)
    os.makedirs(sink)
    t0 = time.perf_counter()
    with open(os.path.join(sink, "_batches"), "w") as log:
        for b in range(N_FILES):
            rel = f"part-{b:05d}.dwrf"
            lo = b * ROWS_PER_FILE
            write_arrow_table(
                os.path.join(sink, rel),
                pa.table(
                    {"k": np.arange(lo, lo + ROWS_PER_FILE, dtype=np.int64)}
                ),
            )
            log.write(f"#begin\t{b}\n{b}\t{rel}\t{ROWS_PER_FILE}\n#end\t{b}\n")
    build_sec = time.perf_counter() - t0

    total_rows = N_FILES * ROWS_PER_FILE
    t0 = time.perf_counter()
    rep = compact_sink(sink, target_bytes=64 << 20, force=True)
    compact_sec = time.perf_counter() - t0

    # value identity across the rewrite
    committed = sorted(committed_files(sink))
    got_rows = 0
    ksum = 0
    for rel in committed:
        with DwrfFile(os.path.join(sink, rel)) as f:
            t = f.read()
            got_rows += t.num_rows
            ksum += sum(t.column("k").to_pylist())
    assert got_rows == total_rows, (got_rows, total_rows)
    assert ksum == total_rows * (total_rows - 1) // 2
    entry = {
        "files_before": N_FILES,
        "files_after": rep["files_after"],
        "rows": total_rows,
        "build_sec": round(build_sec, 2),
        "compact_sec": round(compact_sec, 2),
        "files_per_sec": round(N_FILES / compact_sec, 1),
    }
    shutil.rmtree(sink, ignore_errors=True)
    prior = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f)
    prior["_sink_compact_2000"] = entry
    with open(out_path, "w") as f:
        json.dump(prior, f, indent=1, sort_keys=True)
    print(json.dumps(entry, indent=1))
    print(f"-> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
