"""Composed training-data curation pass: quality gate -> exact near-dup
removal -> deterministic downsample, as ONE declarative DataFrame flow.

This is the shape a 100 TB pre-training pipeline actually runs, and the
composition matters as much as the pieces: everything before the dedup
window is a pure per-row projection/filter (stays in the scan's
whole-stage codegen — no shuffle, no UDF), so the only shuffle in the
whole pass is the dedup hash-partition on the fingerprint, and the final
sample is again a shuffle-free filter. Cost at scale: one pass over the
corpus plus one fingerprint-keyed exchange of (id, fingerprint) pairs.

Every step is hash-deterministic (md5 content fingerprints, keyed-md5
sampling), so re-running the pass over a grown corpus keeps previous
decisions for unchanged rows — the property that makes incremental
backfills sane — and the whole pipeline is replayable in ANSI SQL for the
correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import _hash64


def curate(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words: int = 20,
    sample_fraction: float = 0.5,
) -> DataFrame:
    """Quality-gate, dedup, and downsample a document corpus.

    1. quality gate: at least `min_words` whitespace words (JVM expression);
    2. exact content dedup: md5 of whitespace-normalized lowercase text,
       deterministic keep-smallest-id winner per fingerprint;
    3. deterministic sample of `sample_fraction` keyed on the id.

    Returns (id, fingerprint, n_words) for the surviving rows.
    """
    words = F.split(F.lower(F.col(text_col)), " ")
    n_words = F.size(F.filter(words, lambda w: w != ""))
    fingerprint = F.md5(F.lower(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    threshold = int(sample_fraction * float(1 << 64))
    w = Window.partitionBy("fingerprint").orderBy(F.col(id_col).asc())
    return (
        df.select(
            F.col(id_col),
            fingerprint.alias("fingerprint"),
            n_words.alias("n_words"),
        )
        .filter(F.col("n_words") >= min_words)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .filter(_hash64(F.col(id_col)) < F.lit(str(threshold)).cast("decimal(20,0)"))
    )


def source_cap(
    df: DataFrame, group_col: str, order_cols: list, n: int
) -> DataFrame:
    """Per-source quota (domain cap): keep at most `n` rows per group,
    ranked by `order_cols` (a total order, so the survivors are a pure
    function of the data).

    The standard web-corpus mixing step — no single domain may contribute
    more than its cap — and a per-group-top-n that must survive skew:
    one domain can hold 10% of a 100 TB crawl. Runs in two phases:

    1. local top-n per (input-partition, group): the window's hash
       exchange keys on (_pid, group), so a hot group is spread across as
       many reducers as there are input partitions — built-in salting —
       and each slice keeps only n rows;
    2. global top-n per group over the <= n x P survivors.

    Phase 1's local top-n is a superset of every group's global top-n
    (each surviving row beat all co-slice rows under the same total
    order), so the result is identical to a single global window while no
    reducer ever sorts more than one slice. Reference parity: DWRF itself
    has no query layer; this extends SURVEY §2.D curation ops.
    """
    w_local = Window.partitionBy("_pid", group_col).orderBy(*order_cols)
    w_global = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lrn", F.row_number().over(w_local))
        .filter(F.col("_lrn") <= n)
        .drop("_pid", "_lrn")
        .withColumn("_rn", F.row_number().over(w_global))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Data-quality profile of numeric columns: one row per column with
    row/null counts, min/max, and a fixed-point sum: `sum_v_e4` is
    sum(floor(x*1e4 + 0.5)) in BIGINT units of 1e-4 (ties toward +inf),
    NOT a plain double sum — divide by 1e4 for display.

    The whole profile is ONE global aggregate over one scan — every
    per-column stat is just another aggregate expression, and the 1-row
    result is unpivoted driver-side with `stack`. At 100 TB this is a
    single pass with partial aggregation; there is nothing cheaper that
    still reads the data. The standard pre-training gate: run after every
    ingest, diff against the previous profile, alert on drift."""
    aggs = []
    for c in cols:
        d = F.col(c).cast("double")
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.isnull(d).cast("bigint")).alias(f"{c}__nulls"),
            F.min(d).alias(f"{c}__min"),
            F.max(d).alias(f"{c}__max"),
            # per-value fixed-point units (floor(x*1e4+0.5) is the same
            # IEEE-754 expression in every engine — no rounding-tie
            # divergence) then an exact BIGINT sum: order-independent AND
            # engine-identical, so any replayer reproduces it bit-for-bit
            F.sum(F.floor(d * 10000 + 0.5)).alias(f"{c}__sum"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__n`, `{c}__nulls`, `{c}__min`, `{c}__max`, `{c}__sum`"
        for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(col_name, n, n_nulls, min_v, max_v, sum_v_e4)"
    )


def upsert(base: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE-style keyed upsert without a table format: rows from `updates`
    win on key collision, unmatched `base` rows pass through.

    Spark-first emulation of MERGE INTO (matched -> update, not matched ->
    insert) for plain-file tables: one left-anti join of base against the
    update keys plus a union. At 100 TB the updates side is the small one
    (a day's changes vs the full table), so the anti-join broadcasts and
    the base table is scanned once with zero shuffle; the output is then
    typically written partition-overwrite style. Deterministic: the result
    is a pure function of the two inputs, so the SQL oracle (NOT IN +
    UNION ALL) replays it exactly."""
    survivors = base.join(
        F.broadcast(updates.select(*keys).distinct()), keys, "left_anti"
    )
    return updates.unionByName(survivors)


def dataset_checksum(df: DataFrame, cols: list[str]) -> DataFrame:
    """Order-independent dataset fingerprint: the sum (mod 2^64) of every
    row's keyed-md5 over `cols` — the data-versioning primitive. Equal
    checksums <=> same multiset of rows (up to md5 collisions), regardless
    of partitioning, row order, or file layout, so ingest jobs can verify
    "same data?" across engines/copies without sorting anything.

    ONE map-side-combinable aggregate; commutative integer addition means
    partial-aggregation order cannot change the result, and the same sum
    replays in any SQL engine. Returns (n_rows, checksum as decimal)."""
    h = _hash64(*[F.col(c).cast("string") for c in cols])
    # 2^64 exceeds a Java long; pass the modulus as a decimal literal
    modulus = F.lit(str(1 << 64)).cast("decimal(38,0)")
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.pmod(F.sum(h), modulus).cast("decimal(20,0)").alias("checksum"),
    )


def dataset_diff(
    v1: DataFrame,
    v2: DataFrame,
    key_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Versioned-dataset diff: classify every key as added / removed /
    changed / same between two snapshots and count each class.

    The scale-critical move: each side is projected to (key, md5(payload))
    IN THE SCAN — the full-outer join then exchanges 16-byte hashes, never
    payloads, so comparing two 100 TB snapshots shuffles GBs, not TBs. If
    both snapshots are bucketed by key the exchange disappears entirely
    (bucketed or storage-partitioned join). One join + one 4-row
    aggregate; hash-deterministic, so the diff itself is replayable."""
    def fp(df: DataFrame) -> DataFrame:
        # null-sentinel each column before concatenation: concat_ws skips
        # NULLs, so ('a', NULL, 'b') and ('a', 'b', NULL) would otherwise
        # hash identically and be misclassified as 'same'
        sentineled = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00<NULL>"))
            for c in payload_cols
        ]
        return df.select(
            F.col(key_col).alias("k"),
            F.md5(F.concat_ws("\x1f", *sentineled)).alias("h"),
        )
    a, b = fp(v1).alias("a"), fp(v2).alias("b")
    joined = a.join(b, F.col("a.k") == F.col("b.k"), "full_outer")
    status = (
        F.when(F.col("a.k").isNull(), F.lit("added"))
        .when(F.col("b.k").isNull(), F.lit("removed"))
        .when(F.col("a.h") != F.col("b.h"), F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    return joined.select(status.alias("status")).groupBy("status").agg(
        F.count(F.lit(1)).alias("n_rows")
    )


def validate_rules(
    df: DataFrame, rules: list[tuple[str, "F.Column"]], id_col: str
) -> DataFrame:
    """Data-quality gate: evaluate named boolean rules over every row in
    ONE scan and report, per rule, the violation count plus the smallest
    violating id (a deterministic reproducer a human can actually fetch).

    Shape at 100 TB: each rule is a pure column expression fused into the
    scan; the per-rule (count, min-id) pairs come out of a single
    map-side-combinable aggregate — no per-rule pass, no shuffle of the
    fact table, output is |rules| rows regardless of corpus size. Rules
    that pass everywhere still appear (n_violations = 0), so a silent
    all-green report and a missing rule are distinguishable."""
    aggs = []
    for name, cond in rules:
        viol = ~F.coalesce(cond, F.lit(False))
        aggs.append(
            # coalesce: an EMPTY input must report 0 violations, not NULL
            F.coalesce(F.sum(viol.cast("bigint")), F.lit(0)).alias(
                f"__n_{name}"
            )
        )
        aggs.append(
            F.min(F.when(viol, F.col(id_col))).alias(f"__id_{name}")
        )
    row = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"__n_{name}").alias("n_violations"),
                F.col(f"__id_{name}").alias("sample_id"),
            )
            for name, _ in rules
        ]
    )
    return (
        row.select(F.explode(pairs).alias("r"))
        .select("r.rule", "r.n_violations", "r.sample_id")
    )


def budget_select(
    df: DataFrame,
    score_col: str,
    token_col: str,
    budget: int,
    key_cols: list[str],
) -> DataFrame:
    """Fill a token budget with the highest-scoring rows — the dataset-
    selection step of a pre-training run ("take the best 500B tokens"),
    done WITHOUT a global sort of the corpus.

    Two-pass histogram-threshold shape:
      1. histogram: one map-side-combinable aggregate (score -> token sum);
         the result is catalog-sized (bounded by score cardinality, never
         by corpus size).
      2. cumulative tokens over the histogram in score-descending order (a
         window over the tiny bin table) picks the threshold: bins whose
         cumulative total fits the budget are selected WHOLE via a
         broadcast semi-join — a shuffle-free filter on the corpus.
      3. only the single BOUNDARY bin (cum crosses the budget) needs
         per-row ordering: its rows are ranked by keyed md5 and taken
         while the running token sum fits the remainder. The window is
         partitioned by the (constant) boundary score, so its cost is one
         bin's rows — bounded by bin width, not corpus size; a finer score
         quantization shrinks it arbitrarily.

    Every decision is integer arithmetic on hash order, so the selection
    is deterministic under re-runs/repartitioning and replays in ANSI SQL.
    Returns the selected rows of `df` unchanged.

    Rows with a NULL score are never selected: the semi/inner joins on
    `score_col` cannot match NULL, so a NULL bin entering the histogram
    would only distort the cumulative accounting (silently underfilling
    the budget if it became the boundary bin). They are filtered out
    before the histogram is built.
    """
    df = df.filter(F.col(score_col).isNotNull())
    b = F.lit(int(budget)).cast("bigint")
    hist = df.groupBy(score_col).agg(
        F.sum(token_col).cast("bigint").alias("__btok")
    )
    w = Window.orderBy(F.col(score_col).desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.withColumn("__cum", F.sum("__btok").over(w)).withColumn(
        "__prev", F.col("__cum") - F.col("__btok")
    )
    full_bins = cum.filter(F.col("__cum") <= b).select(score_col)
    boundary = cum.filter((F.col("__prev") < b) & (F.col("__cum") > b)).select(
        score_col, (b - F.col("__prev")).alias("__rem")
    )
    whole = df.join(F.broadcast(full_bins), score_col, "left_semi")
    wb = Window.partitionBy(score_col).orderBy(
        _hash64(*key_cols).asc(), *[F.col(c) for c in key_cols]
    ).rowsBetween(Window.unboundedPreceding, 0)
    part = (
        df.join(F.broadcast(boundary), score_col)
        .withColumn("__run", F.sum(token_col).over(wb))
        .filter(F.col("__run") <= F.col("__rem"))
        .drop("__run", "__rem")
    )
    return whole.unionByName(part.select(*whole.columns))


def rate_wilson_ci(
    df: DataFrame,
    cond,
    group_cols: list[str],
    z: float = 1.96,
) -> DataFrame:
    """Per-group proportion with a Wilson score interval — the error bars
    for rate metrics ("what share of this source's docs fail the length
    gate, and is the difference between sources real?"). The Wilson
    interval stays inside [0, 1] and behaves at k=0/k=n where the normal
    approximation collapses — the right default for quality-rate
    dashboards over skewed sources.

    ONE combinable aggregate over the scan (k = sum(cond), n = count per
    group); the closed-form bounds are pure expressions on the group
    table. Counts are exact integers; the bounds are single-expression
    doubles rounded to 6 decimals, so both engines agree (the text_bm25
    float precedent). Returns (groups..., n, k, rate, lo, hi).
    """
    g = df.groupBy(*group_cols).agg(
        F.sum(cond.cast("bigint")).alias("k"),
        F.count(F.lit(1)).alias("n"),
    )
    zc = F.lit(float(z))
    n = F.col("n").cast("double")
    p = F.col("k") / n
    denom = 1 + zc * zc / n
    center = (p + zc * zc / (2 * n)) / denom
    half = (
        zc
        * F.sqrt(p * (1 - p) / n + zc * zc / (4 * n * n))
        / denom
    )
    return g.select(
        *group_cols,
        "n",
        "k",
        F.round(p, 6).alias("rate"),
        F.round(center - half, 6).alias("lo"),
        F.round(center + half, 6).alias("hi"),
    )
