"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Protocol (BASELINE.md §3): warm session, N runs per query, median
sec/query; `value` is the sum of medians over the headline set. Also
reports bytes-on-disk for lineitem as DWRF vs parquet (format-level
compression sanity vs the reference's golden-dump ratio)."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("BENCH_RUNS", "3"))

# Headline set: the relational core (scan/agg/joins/window/sort/distinct),
# events aggregation, a DWRF round-trip, and the pipeline operators that
# matter at scale. Heavy all-pairs verifiers (dedup_jaccard/dedup_cosine)
# are correctness queries, not throughput headlines.
HEADLINE = [
    "q01",
    "q02",
    "q03",
    "q04",
    "q05",
    "q06_semi",
    "q07",
    "q08",
    "q09",
    "q10",
    "q11",
    "q12",
    "q13_intersect",
    "q14",
    "q15",
    "q16",
    "q19",
    "q20",
    "q18",  # DWRF format round-trip (write+read through our DataSource)
    "dedup_exact",
    "dedup_minhash",
    "sim_topk",
    "text_tokens_top",
    "text_quality",
    "multimodal_decode",
]


def main() -> None:
    from hive_dwrf_spark.queries import load_registry
    from hive_dwrf_spark.session import get_spark

    spark = get_spark("hive-dwrf-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = load_registry()

    # warm the JVM + python workers once with a cheap query
    queries["q03"](spark, SF_DIR).collect()

    per_query: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            times.append(time.perf_counter() - t0)
        per_query[name] = round(statistics.median(times), 4)

    # format sanity: DWRF vs parquet bytes for lineitem at this SF
    extras = {}
    try:
        import pyarrow.parquet as pq

        from hive_dwrf_spark.format import write_arrow_table

        src = os.path.join(SF_DIR, "lineitem.parquet")
        table = pq.read_table(src)
        out = "/tmp/bench_lineitem.dwrf"
        t0 = time.perf_counter()
        write_arrow_table(out, table)
        extras["dwrf_write_sec"] = round(time.perf_counter() - t0, 4)
        extras["dwrf_bytes"] = os.path.getsize(out)
        extras["parquet_bytes"] = os.path.getsize(src)
        extras["dwrf_bytes_per_row"] = round(os.path.getsize(out) / table.num_rows, 2)
    except Exception as ex:  # format sanity must not sink the bench
        extras["format_error"] = str(ex)[:200]

    total = round(sum(per_query.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": os.path.basename(os.path.normpath(SF_DIR)),
                "extras": extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
