"""Measured recall contract for the LSH candidate cap (VERDICT r8 #1).

dedup_semantic's x100 point was honestly unrunnable in this sandbox: the
synthetic >=0.3-cosine tail makes TRUE candidate mass ~quadratic (360M
pairs, ~200 GB verify shuffle). The bucket_cap valve
(operators/dedup.py::lsh_candidate_pairs) bounds candidate mass at B*k
per bucket — linear at any duplication density — in exchange for a
documented recall loss. This script MEASURES that loss instead of
arguing it:

  1. at x30 (the largest size where the uncapped run completes here):
     uncapped cosine pairs = TRUTH; capped pairs -> pair-level recall,
     and capped-vs-uncapped RESOLUTION agreement (the kept-vec_id sets —
     what dedup_semantic actually returns);
  2. at x100: the capped dedup_semantic end-to-end, proving the shape
     that exhausted disk uncapped now COMPLETES, with wall time.

Usage: python scripts/capped_recall.py [out.json] [--cap=8] [--reuse]
Merges results into out.json (default STRESS_r09.json) under keys
dedup_semantic@x30_cap{B} (recall fields) and dedup_semantic@x100_cap{B}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.stress_scale import synthesize  # noqa: E402


def main() -> int:
    cap = 8
    out_path = os.path.join(REPO, "STRESS_r09.json")
    for a in sys.argv[1:]:
        if a.startswith("--cap="):
            cap = int(a.split("=", 1)[1])
        elif not a.startswith("--"):
            out_path = a

    dirs = {}
    for n in (30, 100):
        d = f"/tmp/stress_x{n}"
        if not ("--reuse" in sys.argv and os.path.isdir(d)):
            print(f"synthesizing x{n} ...", flush=True)
            synthesize(n, d)
        dirs[n] = d

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from hive_dwrf_spark.operators import dedup

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("capped-recall")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # stress measures the DISTRIBUTED components loop, same as stress_scale
    os.environ["SPARK_GRAFT_CC_LOCAL_THRESHOLD"] = "0"

    results: dict[str, dict] = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)

    # ---- x1 (sf0.1 base): cap is LOSSLESS at sane density ---------------
    # every bucket holds fewer than B ids, so the capped candidate set is
    # the uncapped one — the valve costs nothing until a pathological
    # tail actually appears
    e1 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    t1 = dedup.cosine_pairs_lsh(e1, "embedding", "vec_id", 0.3)
    c1 = dedup.cosine_pairs_lsh(
        e1, "embedding", "vec_id", 0.3, bucket_cap=cap
    )
    n_t1, n_c1 = t1.count(), c1.count()
    n_hit1 = c1.select("id1", "id2").join(
        t1.select("id1", "id2"), ["id1", "id2"]
    ).count()
    results[f"dedup_semantic@x1_cap{cap}"] = {
        "cap": cap,
        "truth_pairs": n_t1,
        "capped_pairs": n_c1,
        "pair_recall": round(n_hit1 / max(n_t1, 1), 4),
    }
    print(f"x1 cap={cap}: pairs {n_c1}/{n_t1} (recall {n_hit1 / max(n_t1, 1):.3f})")

    # ---- x30: truth vs capped ------------------------------------------
    e30 = spark.read.parquet(f"{dirs[30]}/embeddings.parquet")
    t0 = time.perf_counter()
    truth = dedup.cosine_pairs_lsh(e30, "embedding", "vec_id", 0.3)
    n_truth = truth.count()
    truth_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    capped = dedup.cosine_pairs_lsh(
        e30, "embedding", "vec_id", 0.3, bucket_cap=cap
    )
    n_capped = capped.count()
    capped_sec = time.perf_counter() - t0
    n_hit = capped.select("id1", "id2").join(
        truth.select("id1", "id2"), ["id1", "id2"]
    ).count()
    pair_recall = n_hit / max(n_truth, 1)
    # resolution agreement: the kept-vec_id sets (what dedup_semantic
    # returns). The capped run may keep extra docs (a split cluster keeps
    # two canonicals) — it never drops a doc the uncapped run kept, since
    # capped edges are a subset.
    kept_u = dedup.resolve_duplicates(e30, truth, "vec_id").select("vec_id")
    kept_c = dedup.resolve_duplicates(e30, capped, "vec_id").select("vec_id")
    n_corpus = e30.count()
    n_kept_u = kept_u.count()
    n_kept_c = kept_c.count()
    n_agree = kept_c.join(kept_u, "vec_id").count()
    spark.catalog.clearCache()
    results[f"dedup_semantic@x30_cap{cap}"] = {
        "cap": cap,
        "truth_pairs": n_truth,
        "capped_pairs": n_capped,
        "pair_recall": round(pair_recall, 4),
        "uncapped_sec": round(truth_sec, 2),
        "capped_sec": round(capped_sec, 2),
        "corpus_rows": n_corpus,
        "kept_uncapped": n_kept_u,
        "kept_capped": n_kept_c,
        "resolution_agreement": round(n_agree / max(n_kept_c, 1), 4),
        "resolution_delta_rows": n_kept_c - n_kept_u,
    }
    print(
        f"x30 cap={cap}: pairs {n_capped}/{n_truth} "
        f"(recall {pair_recall:.3f}), kept {n_kept_c} vs {n_kept_u} "
        f"uncapped, {truth_sec:.1f}s -> {capped_sec:.1f}s",
        flush=True,
    )

    # ---- x30 at a NON-degenerate threshold ------------------------------
    # at 0.3 the synthetic tail welds the corpus into one mega-component
    # (truth itself degenerate); 0.6 is the dedup threshold a real
    # pipeline runs at — same banding, stricter verify — and shows the
    # cap's recall on meaningful near-dup structure
    t06 = dedup.cosine_pairs_lsh(e30, "embedding", "vec_id", 0.6)
    c06 = dedup.cosine_pairs_lsh(
        e30, "embedding", "vec_id", 0.6, bucket_cap=cap
    )
    n_t06, n_c06 = t06.count(), c06.count()
    n_hit06 = c06.select("id1", "id2").join(
        t06.select("id1", "id2"), ["id1", "id2"]
    ).count()
    kept_u06 = dedup.resolve_duplicates(e30, t06, "vec_id").count()
    kept_c06 = dedup.resolve_duplicates(e30, c06, "vec_id").count()
    spark.catalog.clearCache()
    results[f"dedup_semantic@x30_thr0.6_cap{cap}"] = {
        "cap": cap,
        "threshold": 0.6,
        "truth_pairs": n_t06,
        "capped_pairs": n_c06,
        "pair_recall": round(n_hit06 / max(n_t06, 1), 4),
        "kept_uncapped": kept_u06,
        "kept_capped": kept_c06,
    }
    print(
        f"x30 thr0.6 cap={cap}: pairs {n_c06}/{n_t06} "
        f"(recall {n_hit06 / max(n_t06, 1):.3f}), kept {kept_c06} vs "
        f"{kept_u06} uncapped",
        flush=True,
    )

    # ---- x100: capped end-to-end completes ------------------------------
    e100 = spark.read.parquet(f"{dirs[100]}/embeddings.parquet")
    t0 = time.perf_counter()
    pairs100 = dedup.cosine_pairs_lsh(
        e100, "embedding", "vec_id", 0.3, bucket_cap=cap
    )
    kept100 = (
        dedup.resolve_duplicates(e100, pairs100, "vec_id")
        .select("vec_id")
        .count()
    )
    x100_sec = time.perf_counter() - t0
    results[f"dedup_semantic@x100_cap{cap}"] = {
        "cap": cap,
        "completed": True,
        "wall_sec": round(x100_sec, 2),
        "corpus_rows": e100.count(),
        "kept_rows": kept100,
        "note": (
            "uncapped form unrunnable here: ~360M candidate pairs / "
            "~200 GB verify shuffle exceed sandbox disk (SCALE.md); the "
            "cap is the degrade-don't-die valve that completes it"
        ),
    }
    print(f"x100 cap={cap}: COMPLETED in {x100_sec:.1f}s, kept {kept100}")

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"-> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
