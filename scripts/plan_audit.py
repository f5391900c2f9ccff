"""Plan audit: capture the physical plan of EVERY registered query and
grade it against the red flags that matter at 100 TB.

For each query the audit records:
- CartesianProduct / BroadcastNestedLoopJoin presence (allowed only for
  the documented broadcast-bounded shapes, e.g. the 1-row stats
  cross-joins and the knn probe set);
- row-at-a-time Python evaluation (`BatchEvalPython`) — everything
  Python-side must be ArrowEvalPython (vectorized) or absent;
- whole-stage codegen coverage (a plan with zero codegen spans runs
  interpreted);
- exchange (shuffle) count — the scale currency of every plan.

Output: PLANS_<tag>.md with one row per query plus a flagged-details
section, exit 1 if any HARD red flag fires (cartesian outside the
allowlist, BatchEvalPython anywhere).

Usage: python scripts/plan_audit.py [sf_dir] [out.md]
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# 1-row broadcast stats sides and probe-set shapes where a nested-loop /
# cartesian over a broadcast side is the DOCUMENTED plan, bounded by a
# driver-size frame (see SCALE.md)
CARTESIAN_ALLOWED = {
    "q08_approx",
    "text_bm25",
    "text_tfidf",
    "text_clf_score",
    "text_bpe_merges",
    "sim_topk",
    "sim_range",
    "sim_knn_join",
    "sim_decontaminate",
    "sim_quantized_topk",
    "sim_ann",
    "sim_ivf",
    "dedup_cosine",
    "dedup_cosine_lsh",
    "embedding_centroids",
    "events_zscore",
    "sample_temperature",
    "pipeline_profile",
    "q27_percentile",
    "layout_zorder",  # 1-row min/max stats broadcast (operators/layout.py)
    "sketch_hll_merge",  # 1-row merged-estimate + sketch-count broadcasts
    "sim_recall_report",  # exact-kNN side: broadcast probe set (knn_join shape)
    "embedding_kmeans",  # corpus x BROADCAST k-row centroid frame per
                         # Lloyd round (kmeans_lloyd assign step)
    "sim_ivf_lloyd",     # same kmeans assign + nprobe-row probe broadcast
    "pipeline_drift_psi",  # 1-row totals broadcast over the bin table
    "events_outliers_mad",  # 1-row median/MAD broadcasts between passes
    "sketch_join_size",     # 1-row estimate x 1-row exact-count cross
    "sample_bootstrap_ci",  # 1-row lo x 1-row hi percentile cross
    "pipeline_fk_check",    # 1-row orphan x 1-row total crosses
    "streaming_drift_psi",  # 1-row totals broadcast (drift_psi_from_bins)
}

# streaming queries execute via their own harness, not a batch plan
SKIP = {
    "streaming_roundtrip",
    "streaming_static_join",
    "streaming_stream_join",
    "streaming_dedup",
    "stateful_running_counts",
}


def main() -> int:
    # --only=a,b,c restricts the audit (e.g. re-auditing the heavy
    # pipeline shapes against a stress-synthesized directory, where
    # queries that execute during DataFrame construction — the iterative
    # kmeans/pagerank loops — would make a full-registry audit pay real
    # compute per plan)
    only: set[str] | None = None
    argv = []
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
        else:
            argv.append(a)
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    out_path = argv[1] if len(argv) > 1 else os.path.join(
        REPO, "PLANS_local.md"
    )
    from pyspark.sql import SparkSession

    from hive_dwrf_spark.queries import load_registry

    queries, _ = load_registry()
    if only is not None:
        missing = only - set(queries)
        if missing:
            raise SystemExit(f"--only names not in registry: {missing}")
        queries = {k: v for k, v in queries.items() if k in only}
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        # --only audits run against stress-sized dirs where iterative
        # queries EXECUTE during DataFrame construction; the 1g default
        # driver heap is a plan-capture assumption, not an execution one
        .config("spark.driver.memory", "8g")
        .appName("plan-audit")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    flagged = []
    hard_fail = False
    for name in sorted(queries):
        if name in SKIP:
            rows.append((name, "-", "-", "-", "streaming (skipped)"))
            continue
        try:
            df = queries[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001
            rows.append((name, "?", "?", "?", f"ERROR {type(ex).__name__}"))
            flagged.append((name, f"plan build failed: {ex}"))
            hard_fail = True
            continue
        n_exchange = len(re.findall(r"Exchange (?:hash|range|Single)", plan))
        n_bcast = plan.count("BroadcastExchange")
        n_codegen = len(set(re.findall(r"\*\((\d+)\)", plan)))
        cartesian = (
            "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
        )
        row_python = "BatchEvalPython" in plan
        notes = []
        if cartesian:
            if name in CARTESIAN_ALLOWED:
                notes.append("cartesian: allowed (broadcast-bounded)")
            else:
                notes.append("CARTESIAN — NOT allowed")
                flagged.append((name, "unexpected cartesian/nested-loop"))
                hard_fail = True
        if row_python:
            notes.append("BatchEvalPython — row-at-a-time Python")
            flagged.append((name, "row-at-a-time Python in plan"))
            hard_fail = True
        if "ArrowEvalPython" in plan:
            notes.append("arrow-udf")
        rows.append(
            (name, str(n_exchange), str(n_bcast), str(n_codegen),
             "; ".join(notes) or "ok")
        )

    with open(out_path, "w") as fh:
        fh.write(
            "# Plan audit — every registered query's physical plan graded\n\n"
            f"sf_dir: `{sf_dir}`. Columns: shuffle exchanges / broadcast\n"
            "exchanges / whole-stage-codegen spans. HARD flags: cartesian\n"
            "outside the documented broadcast-bounded allowlist,\n"
            "row-at-a-time Python (`BatchEvalPython`).\n\n"
            "| query | exchanges | broadcasts | codegen | notes |\n"
            "|---|---|---|---|---|\n"
        )
        for r in rows:
            fh.write("| " + " | ".join(r) + " |\n")
        fh.write("\n## Flags\n\n")
        if flagged:
            for name, why in flagged:
                fh.write(f"- **{name}**: {why}\n")
        else:
            fh.write("None — every batch plan is cartesian-free outside the "
                     "documented allowlist and fully Arrow-vectorized on the "
                     "Python side.\n")
    print(f"{len(rows)} plans audited, {len(flagged)} flags -> {out_path}")
    spark.stop()
    return 1 if hard_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
