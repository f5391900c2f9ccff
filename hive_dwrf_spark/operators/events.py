"""Event-analytics operators: funnel, cohort retention, histogram,
z-score outliers, SCD2 history build.

These are the classic product-analytics shapes a warehouse engine is asked
for daily (the reference exposes them through its host engine's SQL surface;
here they are first-class DataFrame compositions). Every operator is a pure
Catalyst plan — no UDFs — so filters push to the scan and aggregates get
map-side partial combining.

100 TB design notes:
- funnel: each step is a filtered partial aggregate on user_id; the step
  joins are all on user_id, so with events bucketed/partitioned by user_id
  the whole funnel co-partitions after one shuffle. Filters (`event_type =
  'x'`) reach the scan as pushed predicates.
- retention: two aggregates on user_id + one co-partitioned join; the
  (cohort, offset) group-by output is tiny (weeks x weeks).
- histogram: a single map-side-combinable aggregate; bucket count is
  bounded by the value domain, never by row count.
- zscore: two passes over the fact table (stats, then flag) with the
  per-group stats broadcast back — no window over the full table, so no
  per-group sort at any scale.
- scd2: one window shuffle on the entity key; state-change compression
  happens before the second window, so the lead() pass sees only change
  rows (usually orders of magnitude smaller).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cents(value_col: str):
    """Fixed-point cents: floor(x*100 + 0.5) in BIGINT.

    Rounding convention is ties-toward-+inf, NOT HALF_UP: -0.505 yields
    -50 (HALF_UP would give -51). Chosen because this exact IEEE-754
    expression evaluates identically in Spark and DuckDB (F.round's
    HALF_UP has no DuckDB twin), so integer-cent sums are order- and
    engine-stable. All cent-summing operators in this module share it."""
    return F.floor(F.col(value_col) * 100 + 0.5).cast("bigint")


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered conversion funnel: a user reaches step i when an event of
    type steps[i] occurs at-or-after their step i-1 time (min-timestamp
    semantics). Returns one row per step with the user count.

    ONE scan, ONE keyed shuffle (optimization round 12, guide §2.4): the
    old shape ran each stage as its own `filter -> agg -> join` pipeline,
    so a k-step funnel re-scanned the corpus 2(k-1) times (k step slices
    + the per-stage join sides — 6 scans and 8 exchanges for k=3). All
    step times are instead computed in a single pass: filter to the step
    types (one pushed IN predicate), hash-exchange by user once, and take
    per-user chained window minima over the whole partition —
    t_i = min(ts where type = steps[i] and ts >= t_{i-1}) — which is
    exactly the per-stage min-timestamp recurrence. The per-user flags
    then fold into one global count row per step. The window carries no
    ordering requirement beyond the partition sort Spark inserts, and its
    per-task buffer is one user's step-typed events — the same user-keyed
    window envelope as the SCD2/rolling-median operators."""
    w = Window.partitionBy(user_col)
    ev = df.filter(F.col(type_col).isin(list(steps))).select(
        user_col, ts_col, type_col
    )
    prev = None
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) >= F.col(prev))
        ev = ev.withColumn(f"_t{i}", F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = f"_t{i}"
    per_user = ev.groupBy(user_col).agg(
        *[F.max(f"_t{i}").alias(f"_t{i}") for i in range(len(steps))]
    )
    counts = per_user.agg(
        *[
            F.count(f"_t{i}").alias(f"_n{i}")
            for i in range(len(steps))
        ]
    )
    stack_args = ", ".join(
        f"BIGINT({i + 1}), '{step}', _n{i}" for i, step in enumerate(steps)
    )
    return counts.selectExpr(
        f"stack({len(steps)}, {stack_args}) AS (step, event_type, n_users)"
    )


def retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: cohort = the Monday-truncated week of a
    user's first event; a (cohort, offset) cell counts distinct users with
    any activity `offset` weeks after their cohort week.

    Both aggregates shuffle on user_id (co-partitioned join between them);
    the final group-by output is weeks x weeks — tiny at any scale."""
    cohort = df.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).cast("date").alias("cohort_week")
    )
    active = (
        df.select(
            user_col, F.date_trunc("week", F.col(ts_col)).cast("date").alias("wk")
        )
        .distinct()
    )
    return (
        active.join(cohort, user_col)
        .select(
            "cohort_week",
            (F.datediff("wk", "cohort_week") / 7).cast("bigint").alias("week_offset"),
            user_col,
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct(user_col).alias("n_users"))
    )


def value_histogram(
    df: DataFrame, value_col: str, width: float
) -> DataFrame:
    """Fixed-width histogram over a numeric column. Bucket id is
    floor(value / width); the sum is accumulated in exact integer cents so
    it is order-independent (a float sum would hash differently between
    engines and between partitionings). Single map-side-combinable
    aggregate; output is bounded by the value domain."""
    bucket = F.floor(F.col(value_col) / F.lit(width)).cast("bigint")
    cents = _cents(value_col)
    return (
        df.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("sum_cents"),
        )
        .select(
            "bucket",
            (F.col("bucket") * F.lit(width)).alias("lo"),
            ((F.col("bucket") + 1) * F.lit(width)).alias("hi"),
            "n_events",
            "sum_cents",
        )
    )


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    threshold: float = 2.5,
) -> DataFrame:
    """Per-group z-score outlier flags via two passes: (1) group stats with
    exact integer-cent sums (order-independent, cross-engine bit-stable),
    (2) broadcast the tiny stats back and flag |z| > threshold as a pure
    projection. No window over the fact table — per-group sort is what
    kills a naive implementation at scale. Population std (divide by n)."""
    cents = _cents(value_col)
    stats = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(cents).alias("__s"),
        F.sum(cents * cents).alias("__s2"),
    )
    mean = F.col("__s") / F.col("__n")
    var = F.col("__s2") / F.col("__n") - mean * mean
    stats = stats.select(
        *group_cols,
        mean.alias("__mean"),
        F.sqrt(var).alias("__std"),
    )
    z = (cents - F.col("__mean")) / F.col("__std")
    return (
        df.join(F.broadcast(stats), group_cols)
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > threshold)
        .drop("__mean", "__std")
    )


def sliding_time_aggregate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_seconds: int = 3600,
) -> DataFrame:
    """Per-row trailing time-window aggregate: for every event, the count
    and exact integer-cent sum of the same key's events in the preceding
    `window_seconds` (inclusive of the current row) — a RANGE frame over
    microsecond epoch, not a ROWS frame, so irregular event spacing is
    handled exactly and timestamp ties contribute symmetrically to every
    row that shares the instant.

    One shuffle + one sort on (key, ts); the frame is evaluated with a
    sliding two-pointer inside each partition, so cost is O(rows), not
    O(rows x window). State is bounded by the densest window, never by
    history length."""
    # timezone-free epoch micros: the column is TIMESTAMP_NTZ (the driver
    # session has no UTC conf), and unix_micros/casts would route through
    # the session zone — timestampdiff on NTZ keeps differences exact
    # across any DST rule
    micros = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" `{ts_col}`)"
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(micros)
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    cents = _cents(value_col)
    return df.withColumn("n_window", F.count(F.lit(1)).over(w)).withColumn(
        "sum_cents_window", F.sum(cents).over(w)
    )


def scd2(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str = "ts",
    tiebreakers: tuple[str, ...] = (),
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from an event log:
    compress consecutive identical states per key, then stamp each surviving
    state row with [valid_from, valid_to) from the next change (NULL = the
    current open row).

    One shuffle on the key; both windows share the (key, ts) sort so Spark
    plans a single Sort + two Window nodes. The lead() pass runs over
    change rows only — after compression, usually a small fraction of the
    log."""
    w = Window.partitionBy(key_col).orderBy(ts_col, *tiebreakers)
    changes = (
        df.withColumn("__prev", F.lag(state_col).over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col(state_col)))
        .drop("__prev")
    )
    return (
        changes.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .select(key_col, F.col(state_col).alias("state"), "valid_from", "valid_to")
    )


def rolling_active_users(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    window_hours: int = 3,
) -> DataFrame:
    """Rolling distinct actives (the DAU/WAU/MAU primitive): for every
    observed hour, the number of DISTINCT users active in the trailing
    `window_hours` hours.

    Spark has no count_distinct over a window frame, and the naive
    per-window self-join explodes at scale. The presence-smearing shape
    instead: (user, hour) presence dedups once (shuffle 1, map-side
    combinable), each presence row then covers the `window_hours` windows
    it participates in via a pure sequence+explode projection, and one
    (user, window) dedup + count (shuffle 2) finishes. Work scales as
    presences x window size — independent of raw event volume after the
    first dedup, no per-window scans, no quadratic join."""
    hour = F.date_trunc("hour", F.col(ts_col))
    presence = events.select(
        F.col(user_col).alias("u"), hour.alias("h")
    ).distinct()
    observed = presence.select("h").distinct()
    smear = presence.select(
        "u",
        F.explode(
            F.sequence(
                F.col("h"),
                F.col("h") + F.expr(f"INTERVAL {window_hours - 1} HOURS"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("w"),
    )
    return (
        smear.join(observed, smear["w"] == observed["h"], "left_semi")
        .distinct()
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .select(F.col("w").alias("hour"), "active_users")
    )


def gap_fill_daily(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Time-series resample + forward fill (the gap-fill primitive every
    metrics store needs): build the dense per-user daily grid between each
    user's first and last event, attach the observed daily aggregate, and
    carry the most recent observed value forward across the gaps.

    Scale shape: ONE events scan (optimization round 12, guide §2.4). The
    observed aggregate is one map-side-combinable shuffle on (user, day);
    the per-user span comes from that aggregate, NOT a second pass — the
    span's min/max compare (day, day_cents) structs, which is value-
    identical to min/max(day) because day is unique within a user's
    aggregate, but makes the span branch consume day_cents, so the
    optimizer can neither collapse the bounds through the sum down to the
    raw scan nor prune the aggregate's value column: both consumers keep
    the identical (user, day) exchange and ReuseExchange runs the scan
    once (a plain min(day) here was measured to re-scan events — two
    FileScans in the plan). The grid is a pure sequence+explode projection
    of the per-user (min_day, max_day) row — grid size is users x span,
    bounded by calendar time, never by event volume; the forward fill is
    one window sort per user. No self-joins, no per-day scans. Values
    accumulate as integer cents so the fill is float-order independent.
    """
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    cents = _cents(value_col)
    observed = (
        events.select(F.col(user_col).alias("u"), day.alias("day"), cents.alias("c"))
        # null grid keys can never match the left-outer join below anyway;
        # filtering them HERE (not above the aggregate) matters for plan
        # sharing: the join infers exactly these isnotnull predicates on
        # its build side and pushes them below the exchange, so without
        # the same filter on the span branch the two subtrees diverge and
        # the scan runs twice
        .filter(F.col("u").isNotNull() & F.col("day").isNotNull())
        .groupBy("u", "day")
        .agg(F.sum("c").alias("day_cents"))
    )
    dc = F.struct("day", "day_cents")
    span = observed.groupBy("u").agg(
        F.min(dc)["day"].alias("d0"), F.max(dc)["day"].alias("d1")
    )
    grid = span.select(
        "u", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    w = (
        Window.partitionBy("u")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(observed, ["u", "day"], "left")
        .select(
            F.col("u").alias(user_col),
            "day",
            F.last("day_cents", ignorenulls=True).over(w).alias("filled_cents"),
            F.col("day_cents").isNotNull().alias("is_observed"),
        )
    )


def gap_fill_interpolate(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Gap fill by LINEAR INTERPOLATION between the surrounding observed
    days (the other standard resample policy next to forward fill): a
    missing day gets prev + (next - prev) * elapsed DIV span, all in
    integer cents with floored division, so the interpolated series is
    bit-exact under any partitioning and in any engine.

    Same scale shape as gap_fill_daily — ONE events scan (the span's
    struct min/max keeps both consumers on the shared (user, day)
    exchange, see gap_fill_daily), calendar-bounded grid, one combinable
    daily aggregate — plus two window passes per user (one forward for
    the previous observation, one backward for the next)."""
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    cents = _cents(value_col)
    observed = (
        events.select(F.col(user_col).alias("u"), day.alias("day"), cents.alias("c"))
        # null grid keys can never match the left-outer join below anyway;
        # filtering them HERE (not above the aggregate) matters for plan
        # sharing: the join infers exactly these isnotnull predicates on
        # its build side and pushes them below the exchange, so without
        # the same filter on the span branch the two subtrees diverge and
        # the scan runs twice
        .filter(F.col("u").isNotNull() & F.col("day").isNotNull())
        .groupBy("u", "day")
        .agg(F.sum("c").alias("day_cents"))
    )
    dc = F.struct("day", "day_cents")
    span = observed.groupBy("u").agg(
        F.min(dc)["day"].alias("d0"), F.max(dc)["day"].alias("d1")
    )
    grid = span.select("u", F.explode(F.sequence("d0", "d1")).alias("day"))
    wb = (
        Window.partitionBy("u")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("u")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("day_cents").isNotNull(), F.col("day"))
    joined = grid.join(observed, ["u", "day"], "left").select(
        "u",
        "day",
        "day_cents",
        F.last("day_cents", ignorenulls=True).over(wb).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(wb).alias("pd"),
        F.first("day_cents", ignorenulls=True).over(wf).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(wf).alias("nd"),
    )
    interp = F.col("pv") + F.expr(
        "((nv - pv) * datediff(day, pd)) DIV datediff(nd, pd)"
    )
    return joined.select(
        F.col("u").alias(user_col),
        "day",
        F.when(F.col("day_cents").isNotNull(), F.col("day_cents"))
        .otherwise(interp)
        .alias("filled_cents"),
        F.col("day_cents").isNotNull().alias("is_observed"),
    )


def cusum_changepoint(
    events: DataFrame,
    value_col: str = "value",
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Offline CUSUM changepoint estimate per group: the index i maximizing
    |n*S_i - i*S_n| over the time-ordered series (the classic cumulative-sum
    statistic, cross-multiplied by n so everything stays in integer cents —
    no mean, no floats, bit-exact in any engine).

    One window sort per group computes the prefix sums; the argmax is a
    max_by aggregate over (d_stat, -i) — it reuses the window's hash
    partitioning (no second per-group sort of the full series, which is
    what a rank-1 window filter would cost) and ties break on the
    earliest index so the answer is deterministic."""
    cents = _cents(value_col)
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    wall = Window.partitionBy(key_col)
    scored = events.select(
        key_col,
        F.col(ts_col).alias("cp_ts"),
        F.row_number().over(w).alias("i"),
        F.sum(cents).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("s_i"),
        F.sum(cents).over(wall).alias("s_n"),
        F.count(F.lit(1)).over(wall).alias("n"),
    ).select(
        key_col,
        "cp_ts",
        "i",
        # the cross-multiplied statistic in decimal(38,0): at 100 TB scale
        # (n ~ 1e10 rows, prefix sums ~ 1e15 cents) n*s_i exceeds int64 and
        # non-ANSI Spark would wrap silently, corrupting the argmax
        F.abs(
            F.col("n").cast("decimal(38,0)") * F.col("s_i").cast("decimal(38,0)")
            - F.col("i").cast("decimal(38,0)") * F.col("s_n").cast("decimal(38,0)")
        ).alias("d_stat"),
    )
    return (
        scored.groupBy(key_col)
        .agg(
            F.expr(
                "max_by(struct(i, cp_ts, d_stat), struct(d_stat, -i))"
            ).alias("best")
        )
        .select(
            key_col,
            F.col("best.i").alias("cp_index"),
            F.col("best.cp_ts").alias("cp_ts"),
            F.col("best.d_stat").alias("d_stat"),
        )
    )
