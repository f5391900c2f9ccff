"""Deterministic sampling operators for training-data pipelines.

Both forms are hash-based rather than RNG-based, which buys three things at
100 TB: (1) reproducibility across runs/machines/partitionings — the sample
is a pure function of the data, so a re-run after a failure or a backfill
picks the same rows; (2) no coordination — `deterministic_sample` is a
stateless filter that runs inside the scan with zero shuffles; (3) oracle
checkability — the md5 decision is replayable in ANSI SQL.

- deterministic_sample: keep a row iff the leading 8 md5 bytes of its key,
  read as a fraction of 2^64, fall below `fraction`. One scan, no shuffle,
  no driver state; sampling composes with pushed-down filters.
- stratified_take: exactly k rows per stratum, chosen by smallest keyed
  hash — a single window shuffle on the stratum key. Bounded output per
  group regardless of skew (the window's per-partition heap is O(k) with
  rank pushdown).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash64(*cols) -> "F.Column":
    """Uniform [0, 2^64) value: the first 8 md5 digest bytes of the
    '|'-joined key columns, read little-endian — exactly DuckDB's
    ``md5_number_upper``, so oracles replay the sampling decision. Built by
    reversing the hex byte pairs, then conv(hex, 16, 10), which is unsigned
    64-bit; the decimal(20,0) cast holds the full range."""
    h = F.md5(F.concat_ws("|", *cols))
    le_hex = F.concat(*[F.substring(h, 2 * i + 1, 2) for i in reversed(range(8))])
    return F.conv(le_hex, 16, 10).cast("decimal(20,0)")


def deterministic_sample(
    df: DataFrame, fraction: float, key_cols: list[str]
) -> DataFrame:
    """Keep ~`fraction` of rows, decided per-row by keyed md5 — a pure
    filter (no shuffle, no RNG state), stable under re-runs and
    repartitioning. `key_cols` should identify rows (e.g. the primary key);
    rows with equal keys sample identically, which is exactly what a
    backfill wants."""
    threshold = int(fraction * float(1 << 64))
    return df.filter(
        _hash64(*key_cols) < F.lit(str(threshold)).cast("decimal(20,0)")
    )


def split_assign(
    df: DataFrame,
    key_cols: list[str],
    splits: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row's keyed md5
    fraction picks a bucket from the cumulative split boundaries. A pure
    per-row expression — no shuffle, no RNG state — so the assignment is
    stable under re-runs, repartitioning, and incremental backfills, and a
    row never migrates between splits when more data arrives. The salt
    decouples this hash from any sampling hash on the same key (salted and
    unsalted md5 values are independent)."""
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    h = _hash64(F.lit(salt), *key_cols)
    expr = None
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name]
        bound = F.lit(str(int(acc * float(1 << 64)))).cast("decimal(20,0)")
        expr = F.when(h < bound, name) if expr is None else expr.when(h < bound, name)
    split_col = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", split_col)


def temperature_sample(
    df: DataFrame,
    group_col: str,
    key_cols: list[str],
    alpha: float = 0.5,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-balanced downsampling (the multilingual-corpus
    rebalancing scheme): target group shares proportional to N_g^alpha,
    achieved by keeping each group at rate (N_min / N_g)^(1 - alpha) — the
    smallest group is kept whole, larger groups are thinned toward uniform.
    alpha=1 is a no-op, alpha=0 exact uniform targets.

    Two tiny aggregates (group counts, then the global min) produce a
    rates table of |groups| rows that broadcasts back; the keep decision is
    the same keyed-md5 pure filter as `deterministic_sample`, so the
    sample is deterministic, shuffle-free on the corpus side, and stable
    under backfills. The hash-vs-rate comparison is done in double
    precision identically on both engines, so oracles replay it exactly."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    # null group keys can never match the final equi-join anyway; filtering
    # them BELOW the aggregate matters for plan sharing (optimization round
    # 12, guide §2.4): the join infers exactly this isnotnull predicate on
    # the rates branch and pushes it under the group exchange, so without
    # the same filter the nmin branch's subtree diverges and the group
    # count re-scans the corpus — one reused exchange now feeds both tiny
    # aggregates (two corpus scans instead of three).
    counts = (
        df.filter(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    nmin = counts.agg(F.min("__n").alias("__nmin"))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        group_col,
        F.pow(F.col("__nmin") / F.col("__n"), F.lit(1.0 - alpha)).alias("__rate"),
    )
    frac = _hash64(F.lit(salt), *key_cols).cast("double") / F.lit(
        float(1 << 64)
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(frac < F.col("__rate"))
        .drop("__rate")
    )


def stratified_take(
    df: DataFrame, strata_cols: list[str], k: int, key_cols: list[str]
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum — the k smallest keyed
    hashes, so the pick is uniform-ish, deterministic, and independent of
    input order. One shuffle on the strata columns; per-group state is the
    window's top-k heap, so skewed strata cost output size, not memory."""
    w = Window.partitionBy(*strata_cols).orderBy(_hash64(*key_cols).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def reservoir_take(df: DataFrame, k: int, key_cols: list[str]) -> DataFrame:
    """Exactly min(k, N) rows globally — the k smallest keyed hashes, the
    deterministic twin of a distributed reservoir sample. Spark plans
    orderBy+limit as TakeOrderedAndProject: each partition keeps only its
    local top-k heap (O(k) state, no shuffle of the data), and the driver
    merges P·k candidates — for a training-data sample (k in the
    thousands) that is a few MB from even a 100 TB scan. Hash-ordering
    makes the pick a pure function of the data: re-runs, repartitions, and
    backfills return the SAME sample, and the decision replays in ANSI SQL
    (ORDER BY md5 LIMIT k)."""
    return (
        df.withColumn("__h", _hash64(*key_cols))
        .orderBy(F.col("__h").asc(), *key_cols)
        .limit(k)
        .drop("__h")
    )


def epoch_shuffle(
    df: DataFrame, key_cols: list[str], seed: str = "epoch0"
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    contiguous position 0..N-1 in the pseudo-random order of its keyed
    md5 (ties broken by the key itself). Re-runs, repartitions, and
    backfills reproduce the same epoch order; a new `seed` is a new epoch.

    The 100 TB shape is the two-pass prefix form (shared with
    text.pack_token_stream), NOT a single-partition global window:
    range-repartition on the hash, local row_number per partition, then
    offset by the broadcast per-partition totals. Correctness does not
    depend on where the range boundaries land — ranges are disjoint and
    ordered, so offset + local rank is the exact global rank."""
    h = _hash64(F.lit(seed), *key_cols)
    ranged = (
        df.withColumn("_h", h)
        .repartitionByRange("_h", *key_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    w_in = Window.partitionBy("_pid").orderBy("_h", *key_cols)
    local = ranged.withColumn("_lrn", F.row_number().over(w_in))
    w_pid = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        local.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_ptotal"))
        .withColumn("_off", F.coalesce(F.sum("_ptotal").over(w_pid), F.lit(0)))
        .select("_pid", "_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(
            "train_pos", (F.col("_off") + F.col("_lrn") - 1).cast("bigint")
        )
        .drop("_h", "_pid", "_lrn", "_off")
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    per_group_budget: float,
    key_cols: list[str],
    salt: str = "mix",
) -> DataFrame:
    """Deterministic mixture resampling: every group is up- or
    down-sampled toward `per_group_budget` expected rows — the
    domain-rebalancing step of a training-data mix (Dolma/DataComp style).
    rate = budget / |group|; each row emits floor(rate) copies plus one
    more iff its keyed md5 falls under frac(rate). Expected output is
    exactly `budget` per group; decisions are pure row-local hashes, so
    re-runs and backfills replicate identically and rows never flip.

    100 TB shapes: group counts are one map-side-combinable aggregate
    whose result (one row per domain) broadcasts back; the expansion is a
    pure projection (sequence + explode) in the scan stage — the corpus
    is never shuffled. Output carries `rep` (1..k) so downstream epoch
    shuffling can spread the copies."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n_g"))
    rates = counts.select(
        group_col, (F.lit(float(per_group_budget)) / F.col("_n_g")).alias("_rate")
    )
    frac_fp = ((F.col("_rate") - F.floor(F.col("_rate"))) * F.lit(1000000)).cast(
        "bigint"
    )
    extra = (
        F.pmod(_hash64(F.lit(salt), *key_cols), F.lit(1000000)) < frac_fp
    ).cast("int")
    n_copies = (F.floor(F.col("_rate")).cast("int") + extra).alias("_copies")
    return (
        df.join(F.broadcast(rates), group_col)
        .select("*", n_copies)
        .filter(F.col("_copies") >= 1)
        .select(
            "*", F.explode(F.sequence(F.lit(1), F.col("_copies"))).alias("rep")
        )
        .drop("_rate", "_copies")
    )


def bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    key_cols: list[str],
    n_replicas: int = 32,
    lo_ppm: int = 50_000,
    hi_ppm: int = 950_000,
    scale: int = 10_000,
    salt: str = "boot",
) -> DataFrame:
    """Distribution-free error bars on a corpus metric via deterministic
    subsampling: rows partition into `n_replicas` disjoint replicas by
    keyed md5 (no RNG, stable under re-runs/repartitioning), each
    replica's floor-mean of e4-quantized values is an independent
    estimate, and the (lo, hi)-ppm percentiles of the replica means
    bracket the metric — the "is this week's quality-score shift real or
    noise?" primitive a pipeline dashboard needs.

    Cost at 100 TB: ONE combinable aggregate over the scan (B group
    keys); the percentile pick runs on the B-row replica table. All
    arithmetic is integer (quantized sums, floor-means, integer rank
    thresholds), so the interval is deterministic and SQL-replayable.
    Returns one row: (b, mean_lo_e4, mean_hi_e4).
    """
    from pyspark.sql import functions as F

    vals = df.filter(F.col(value_col).isNotNull())
    rep = F.pmod(_hash64(F.lit(salt), *key_cols), F.lit(n_replicas))
    q = F.floor(F.col(value_col).cast("double") * F.lit(float(scale)) + F.lit(0.5))
    means = (
        vals.select(rep.alias("replica"), q.alias("qx"))
        .groupBy("replica")
        .agg(
            F.floor(F.sum("qx") / F.count(F.lit(1)))
            .cast("bigint")
            .alias("mean_e4")
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy("mean_e4", "replica")
    ranked = means.select(
        "mean_e4",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("b"),
    )
    lo = ranked.filter(
        F.col("rn") * F.lit(1_000_000) >= F.lit(int(lo_ppm)) * F.col("b")
    ).agg(F.min("mean_e4").alias("mean_lo_e4"), F.max("b").alias("b"))
    hi = ranked.filter(
        F.col("rn") * F.lit(1_000_000) >= F.lit(int(hi_ppm)) * F.col("b")
    ).agg(F.min("mean_e4").alias("mean_hi_e4"))
    return lo.crossJoin(hi).select("b", "mean_lo_e4", "mean_hi_e4")
