"""Probe-gated bench runner: wait for a quiet host window, then run
bench.py (BASELINE.md §3 protocol — final artifacts must carry quiet
probes; a noisy window inflates the control triad by 15-20% and
masquerades as per-query regressions on untouched code).

Polls the same numpy-mod probe bench.py embeds in its artifacts every
--poll seconds until it reads at/below the quiet threshold twice in a
row (one reading can land between noise bursts), then execs bench.py in
this process with the given BENCH_RUNS. Gives up after --max-wait and
runs anyway, exit-coding nothing — the artifact's own probe fields say
whether the window held.

Usage: python scripts/quiet_bench.py [--runs 5] [--poll 60] [--max-wait 3600]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--poll", type=float, default=60.0)
    ap.add_argument("--max-wait", type=float, default=3600.0)
    args = ap.parse_args()

    import bench

    deadline = time.monotonic() + args.max_wait
    quiet_streak = 0
    while time.monotonic() < deadline:
        p = bench.host_probe_ns_per_elem()
        quiet_streak = quiet_streak + 1 if p <= bench.PROBE_QUIET_NS else 0
        print(
            f"probe {p} ns/elem (quiet <= {bench.PROBE_QUIET_NS}, "
            f"streak {quiet_streak}/2)",
            flush=True,
        )
        if quiet_streak >= 2:
            break
        time.sleep(args.poll)
    else:
        print("max-wait reached; running anyway (check artifact probes)")

    os.environ["BENCH_RUNS"] = str(args.runs)
    bench.RUNS = args.runs
    bench.main()
    return 0


if __name__ == "__main__":
    sys.exit(main())
