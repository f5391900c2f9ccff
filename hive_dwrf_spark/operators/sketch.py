"""Count-Min Sketch: sub-linear frequency estimation over a key stream.

The 100 TB motivation: exact token/URL/n-gram frequency tables can be
nearly as large as the corpus, but most consumers (heavy-hitter gates,
stop-list construction, frequency-based filters) only need *estimates
with a one-sided error bound*. A CMS compresses the whole frequency
distribution into a fixed depth x width counter grid:

- build is ONE map-side-combinable aggregate (explode each key into
  `depth` (row, bucket) cells, hash-aggregate counts) — the shuffle
  carries at most depth x width cells per map partition no matter how
  large the corpus is;
- estimate(key) = min over rows of the key's bucket counter, which is
  always >= the true count (collisions only ever inflate), and exceeds
  it by more than eps*N with probability <= delta for
  width = ceil(e/eps), depth = ceil(ln(1/delta)).

Everything is hash-deterministic: the bucket function is the keyed-md5
uniform hash shared with operators/sampling.py (first 8 digest bytes
little-endian == DuckDB ``md5_number_upper``), so a SQL oracle replays
the sketch — including its collisions — bit-for-bit. No randomness, no
UDFs, no driver state.

Reference parity: the DWRF reference is a storage format with no sketch
machinery; this extends SURVEY §2.D (pipeline analytics over documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import _hash64


def _bucket(row_idx, key, width: int):
    """CMS bucket for `key` in hash row `row_idx`: keyed-md5 of
    '<row>|<key>' modulo width. Replayed in DuckDB as
    ``md5_number_upper(CAST(i AS VARCHAR) || '|' || key) % width``.

    Fast path: md5_number_upper reads the first 8 digest bytes
    little-endian, so for width | 2^16 the modulus depends only on the
    LOW two bytes — i.e. the FIRST two hex pairs — and a 16-bit conv to
    plain int replaces the 64-bit byte-reversal + decimal(20,0) pipeline
    (~5x cheaper per row, bit-identical result)."""
    if width > 0 and 65536 % width == 0:
        h = F.md5(F.concat_ws("|", row_idx.cast("string"), key))
        low16 = F.concat(F.substring(h, 3, 2), F.substring(h, 1, 2))
        return F.pmod(F.conv(low16, 16, 10).cast("int"), F.lit(width))
    return F.pmod(_hash64(row_idx.cast("string"), key), F.lit(width)).cast("int")


def cms_build(
    df: DataFrame, key_col, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the sketch: (row_i, bucket, cnt) with depth x width cells.

    Two-phase build (optimization round 13, guide §1.2 per-task work):
    keys pre-aggregate to (key, n) FIRST — one map-side-combinable hash
    count — and only the DISTINCT keys pay the depth x md5 bucket
    expressions; the cell aggregate then sums the pre-counts. Value-
    identical to hashing every occurrence (sum of per-key counts ==
    occurrence count, per cell), but the md5 work drops from
    depth x occurrences to depth x |vocab|: measured 4 x 270,704 ->
    4 x 31 on the sf0.1 token stream. At 100 TB the first exchange
    carries (key, partial-count) rows — bounded by per-map-task DISTINCT
    keys, the same envelope as any token-frequency aggregate — and the
    second stays bounded by depth x width cells per task; the md5 bill,
    previously ~depth x corpus, becomes ~depth x vocab. For near-unique
    key streams (every key once) the pre-count is a wash in bytes and
    only defers the md5s; for the skewed streams CMS exists for
    (heavy-hitter gates) it is the dominant saving.
    """
    rows = F.array(*[F.lit(i) for i in range(depth)])
    counts = (
        df.select(
            F.col(key_col).alias("_k")
            if isinstance(key_col, str)
            else key_col.alias("_k")
        )
        .groupBy("_k")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    cells = counts.select("_k", "_n", F.explode(rows).alias("row_i"))
    return cells.select(
        "row_i",
        _bucket(F.col("row_i"), F.col("_k"), width).alias("bucket"),
        "_n",
    ).groupBy("row_i", "bucket").agg(F.sum("_n").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, keys: list[str], depth: int = 4, width: int = 1024
) -> DataFrame:
    """Point-estimate the counts of `keys` from a built sketch.

    The probe side is a literal key list (heavy-hitter candidates, a
    stop-list draft) — tiny, so it broadcasts; the sketch side is at most
    depth x width rows. Estimates are min-over-rows, >= the true count.
    Keys absent from the stream can still return > 0 (collision floor);
    that is the CMS contract, and the oracle reproduces it exactly.
    """
    spark = sketch.sparkSession
    # literal-derived probe frame: spark.createDataFrame pays RDD +
    # schema machinery (~0.1-0.3 s of driver work) for a k-row list;
    # exploding a literal array is pure plan construction (round 13)
    kdf = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in keys])).alias("key")
    )
    probes = kdf.select(
        "key", F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row_i")
    )
    probes = probes.select(
        "key", "row_i", _bucket(F.col("row_i"), F.col("key"), width).alias("bucket")
    )
    joined = F.broadcast(probes).join(sketch, ["row_i", "bucket"], "left")
    return joined.groupBy("key").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")
    )


def bloom_build(
    df: DataFrame, key_col, m_bits: int = 65536, k: int = 4
) -> DataFrame:
    """Build a Bloom filter over `key_col` as a SPARSE (word_idx, bits)
    table: each key sets `k` bit positions (the CMS keyed-md5 bucket
    function with width = m_bits), positions pack into 32-bit words, and
    the words merge with one map-side-combinable ``bit_or`` aggregate —
    the same one-shuffle-bounded-output shape as cms_build, with
    bit-presence replacing counts.

    The 100 TB use: a membership gate for incremental ingest. The
    yesterday-corpus filter at 10 bits/key is ~1.2 GB per 10^9 keys —
    orders of magnitude under the signature store (~512 B/doc) that
    dedup_incremental loads — and "bit missing" is EXACT (no false
    negatives), so the expensive signature path only ever runs on the
    maybe-present sliver. The sparse word form needs no broadcast budget:
    membership checks are an equi-join on word_idx, so the filter can
    exceed executor memory and still work; densify + broadcast is the
    small-filter fast path, not a requirement.

    Hash-deterministic end to end (no RNG, no UDFs): a SQL oracle replays
    the filter — false positives included — bit-for-bit.
    """
    rows = F.array(*[F.lit(i) for i in range(k)])
    keyed = df.select(
        F.col(key_col).alias("_k") if isinstance(key_col, str) else key_col.alias("_k")
    ).select("_k", F.explode(rows).alias("row_i"))
    pos = keyed.select(
        _bucket(F.col("row_i"), F.col("_k"), m_bits).alias("pos")
    )
    words = pos.select(
        (F.col("pos") / 32).cast("int").alias("word_idx"),
        # shiftleft's python wrapper takes only literal shift counts; the
        # SQL form accepts a column
        F.expr("shiftleft(CAST(1 AS BIGINT), pmod(pos, 32))").alias("bit"),
    )
    return words.groupBy("word_idx").agg(F.bit_or("bit").alias("bits"))


def bloom_check(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    m_bits: int = 65536,
    k: int = 4,
) -> DataFrame:
    """Membership-test `probes[key_col]` against a built sparse filter:
    `maybe_present` = 1 iff ALL `k` probe bits are set. A 0 is definitive
    (the key was NOT in the build stream); a 1 is "present or false
    positive" at the standard (1 - e^{-kn/m})^k rate.

    Plan shape: probes explode into k (word_idx, bit) lookups, equi-join
    the filter on word_idx (<= m_bits/32 rows — broadcast at this size;
    at giant m the join is a plain shuffle join and still never touches
    the build corpus), then one all-bits-set aggregate per probe key.
    """
    rows = F.array(*[F.lit(i) for i in range(k)])
    p = probes.select(F.col(key_col).alias("_k")).select(
        "_k", F.explode(rows).alias("row_i")
    )
    p = p.select(
        "_k", _bucket(F.col("row_i"), F.col("_k"), m_bits).alias("pos")
    ).select(
        "_k",
        (F.col("pos") / 32).cast("int").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), pmod(pos, 32))").alias("bit"),
    )
    joined = p.join(F.broadcast(bloom), "word_idx", "left")
    hit = (
        F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("bit")) != 0
    ).cast("int")
    return joined.groupBy(F.col("_k").alias(key_col)).agg(
        F.min(hit).alias("maybe_present")
    )


def quantile_bin_sketch(
    df: DataFrame,
    value_col: str,
    width: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """The mergeable half of quantile estimation: fixed-width bin counts
    ``(bin, cnt)`` with bin = floor(value / width). ONE map-side-combinable
    hash aggregate over the scan — the shuffle carries at most
    (value-range / width) cells per map partition regardless of corpus
    size, and two sketches merge by summing counts per bin. Unlike
    rank-based sketches (GK/KLL/t-digest) the cell set is value-determined,
    so the sketch is deterministic, order-independent, and replayable in
    ANSI SQL; the price is a value-range-dependent (not rank-dependent)
    error bound of one bin width.

    With `group_cols` the sketch is per-group ((groups..., bin, cnt)) —
    same one aggregate, and the downstream finish stays bounded by
    groups x bins, never corpus rows.

    NULL values are excluded (the SQL percentile convention): a NULL bin
    would sort first in Spark's window but last in an ANSI replay, and
    NULL rows can never be selected by a quantile anyway."""
    gcols = list(group_cols or [])
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *gcols,
            F.floor(F.col(value_col) / F.lit(width)).cast("bigint").alias("bin"),
        )
        .groupBy(*gcols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def quantile_from_bins(
    bins: DataFrame,
    width: int,
    q_ppms: list[int],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Finish quantiles from a bin sketch: for each q (in exact integer
    ppm) return the upper edge of the first bin whose cumulative count
    reaches q*N/1e6 — estimate error <= one bin width. Runs on the SKETCH
    (one row per occupied bin — bounded by value range x groups,
    independent of the corpus), so the cumulative window costs nothing at
    any scale; with `group_cols` the window partitions by group, so no
    single task ever sees more than one group's bins. All arithmetic is
    integer (cum * 1e6 >= q_ppm * N), so the pick has no float-rounding
    seam and a SQL oracle replays it exactly. Output:
    (groups..., q_ppm, n, est) with est in value units
    (bin upper edge = (bin+1) * width)."""
    gcols = list(group_cols or [])
    w = (
        Window.partitionBy(*gcols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = bins.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy(*gcols))
    )
    # the q list rides as an exploded literal array — a pure projection on
    # the bin table, no join node of any kind
    qs_arr = F.array(*[F.lit(int(q)).cast("bigint") for q in q_ppms])
    # decimal(38,0) cross-multiply: cum * 1e6 would wrap int64 past ~9.2e12
    # rows — exactly the 100 TB regime this sketch exists for
    dec = "decimal(38,0)"
    return (
        cum.withColumn("q_ppm", F.explode(qs_arr))
        .filter(
            F.col("cum").cast(dec) * F.lit(1_000_000)
            >= F.col("q_ppm").cast(dec) * F.col("n")
        )
        .groupBy(*gcols, "q_ppm")
        .agg(F.max("n").alias("n"), F.min("bin").alias("__b"))
        .select(
            *gcols,
            "q_ppm",
            "n",
            ((F.col("__b") + 1) * F.lit(width)).cast("bigint").alias("est"),
        )
    )


def hll_partial_sketches(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """Per-group HyperLogLog sketches of distinct `key_col` values — the
    MERGEABLE half of distinct counting at 100 TB: build one sketch per
    partition/day/source (a few KB each), store them, and answer
    "distinct over any group combination" later by unioning sketches
    instead of rescanning the corpus. Wraps Spark's datasketches-backed
    hll_sketch_agg (JVM-side, map-side combinable)."""
    return df.groupBy(group_col).agg(
        F.hll_sketch_agg(key_col).alias("hll_sketch")
    )


def hll_merge_estimate(sketches: DataFrame) -> DataFrame:
    """Union previously-built HLL sketches and estimate the combined
    distinct count — the read side of the mergeable pattern. Input is one
    row per group (KBs), so this runs at driver-adjacent cost no matter
    how large the corpus that produced the sketches was."""
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll_sketch")).alias("est")
    )


def drift_psi(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    width: int,
) -> DataFrame:
    """Population Stability Index between two dataset snapshots — the
    training-data drift monitor ("did this week's corpus shift against
    last week's?"). Both sides reduce to the mergeable fixed-width bin
    sketch (ONE combinable aggregate per side; the shuffle carries at most
    value-range/width cells), and everything after runs on the
    catalog-sized joined bin table: Laplace add-1 smoothed proportions
    p, q over the union of occupied bins, per-bin contribution
    (p - q) * ln(p / q), rounded to 6 decimals.

    Determinism: counts are exact integers; p and q are single double
    divisions of exact integers; ln is the only transcendental and the
    6-decimal rounding tolerates last-ulp libm differences (the text_bm25
    precedent). Add-1 smoothing makes empty-on-one-side bins well-defined
    without an epsilon hyperparameter and is replayable in ANSI SQL.
    Returns (bin, cnt_a, cnt_b, psi_contrib) — sum(psi_contrib) is the
    PSI; the per-bin rows localize WHERE the shift happened, which is
    what a drift alert needs anyway.
    """
    bins_a = quantile_bin_sketch(df_a, value_col, width)
    bins_b = quantile_bin_sketch(df_b, value_col, width)
    return drift_psi_from_bins(bins_a, bins_b)


def drift_psi_from_bins(bins_a: DataFrame, bins_b: DataFrame) -> DataFrame:
    """The catalog-sized finish of drift_psi, taking PREBUILT (bin, cnt)
    sketches — the entry point when one side is a maintained/streamed
    sketch rather than a scannable snapshot (see streaming_drift_psi)."""
    a = bins_a.withColumnRenamed("cnt", "cnt_a")
    b = bins_b.withColumnRenamed("cnt", "cnt_b")
    j = (
        a.join(b, "bin", "full_outer")
        .fillna(0, subset=["cnt_a", "cnt_b"])
    )
    totals = j.agg(
        F.sum("cnt_a").alias("n_a"),
        F.sum("cnt_b").alias("n_b"),
        F.count(F.lit(1)).alias("n_bins"),
    )
    t = j.crossJoin(F.broadcast(totals))
    p = (F.col("cnt_a") + 1) / (F.col("n_a") + F.col("n_bins"))
    q = (F.col("cnt_b") + 1) / (F.col("n_b") + F.col("n_bins"))
    return t.select(
        "bin",
        "cnt_a",
        "cnt_b",
        F.round((p - q) * F.log(p / q), 6).alias("psi_contrib"),
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    width: int,
    k: int = 3,
) -> DataFrame:
    """Robust outlier detection via Median Absolute Deviation, composed
    entirely from the mergeable bin sketch — the z-score alternative that
    heavy-tailed pipeline metrics (doc lengths, request latencies) need,
    since mean/stddev are themselves dragged by the outliers.

    Three combinable passes, each a bin-sketch or count aggregate whose
    shuffle is value-range-bounded:
      1. median_est from the value sketch (error <= one bin width);
      2. mad_est from the sketch of |value - median_est| (the 1-row
         median broadcasts; the deviation bin is a pure expression);
      3. n_outliers = count(|value - median_est| > k * mad_est), with the
         1-row mad broadcast.
    All thresholds are integer bin edges, so the whole detector is
    deterministic and replays in ANSI SQL — no percentile_approx
    (rank-sketch cells depend on arrival order), no float seams.
    Returns EXACTLY one row: (n, med_est, mad_est, n_outliers); on
    empty/all-NULL input that row is (0, NULL, NULL, 0) — the sketch
    passes produce zero rows then, so a 1-row count anchor (one extra
    column-pruned count scan) left-joins the result back to life.
    """
    vals = df.filter(F.col(value_col).isNotNull())
    med = quantile_from_bins(
        quantile_bin_sketch(vals, value_col, width), width, [500_000]
    ).select(F.col("est").alias("med"), F.col("n").alias("n"))
    withmed = vals.crossJoin(F.broadcast(med))
    dev = F.abs(F.col(value_col) - F.col("med"))
    dev_bins = (
        withmed.select(
            F.floor(dev / F.lit(width)).cast("bigint").alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    mad = quantile_from_bins(dev_bins, width, [500_000]).select(
        F.col("est").alias("mad")
    )
    flagged = (
        withmed.crossJoin(F.broadcast(mad))
        .select(
            "n",
            "med",
            "mad",
            (dev > F.col("mad") * F.lit(k)).cast("bigint").alias("__o"),
        )
        .groupBy("n", "med", "mad")
        .agg(F.sum("__o").alias("n_outliers"))
    )
    # empty-input contract: flagged has 0 rows when vals is empty (the
    # median sketch emits nothing); a 1-row anchor left-join restores the
    # documented single (0, NULL, NULL, 0) row. 1-row x <=1-row nested
    # loop — broadcast-bounded like the med/mad crosses above.
    anchor = vals.agg(F.count(F.lit(1)).alias("__n_anchor"))
    return anchor.join(F.broadcast(flagged), F.lit(True), "left").select(
        F.col("__n_anchor").cast("bigint").alias("n"),
        F.col("med").alias("med_est"),
        F.col("mad").alias("mad_est"),
        F.coalesce(F.col("n_outliers"), F.lit(0))
        .cast("bigint")
        .alias("n_outliers"),
    )


def cms_inner_product(sketch_a: DataFrame, sketch_b: DataFrame) -> DataFrame:
    """Equi-join cardinality estimation from two Count-Min sketches:
    |A JOIN B on k| = sum_k a_k * b_k, estimated as min over hash rows of
    the row-wise sketch inner product sum_b A[r,b] * B[r,b]. The classic
    AMS/CMS bound applies: the estimate is ALWAYS >= the true size
    (collisions only inflate) and exceeds it by more than eps*|A|*|B|
    with probability <= delta at width e/eps, depth ln(1/delta).

    The hash-row universe is derived FROM THE SKETCHES (the intersection
    of each side's distinct row_i) rather than taken as a parameter: a
    caller-supplied depth larger than the sketches' true build depth
    would reinstate phantom all-zero rows and collapse the min to 0,
    silently breaking the one-sided >=-truth guarantee. Each shared hash
    row is an independent >=-truth estimator, so min over the shared set
    stays one-sided even if the two sketches were built with different
    depths (fewer rows only loosens delta). An empty side (empty input
    -> empty sketch) yields est = 0 — the true size of a join against
    nothing.

    The 100 TB use: size a join BEFORE running it — both sketches build
    from prior scans (or maintain incrementally as data lands), are
    depth x width rows each, and the estimate is a join of two
    catalog-sized tables. Deterministic md5 buckets (shared with
    cms_build) make the estimate — collisions included — SQL-replayable.
    Returns one row: (est)."""
    j = sketch_a.join(
        sketch_b.withColumnRenamed("cnt", "cnt_b"), ["row_i", "bucket"]
    )
    per_row = j.groupBy("row_i").agg(
        F.sum(F.col("cnt") * F.col("cnt_b")).alias("__ip")
    )
    # a hash row with NO overlapping buckets has inner product 0 and must
    # participate in the min (it proves the join is empty); rows absent
    # from the overlap aggregate are reinstated as explicit zeros. The
    # row universe is catalog-sized (<= depth rows after distinct).
    rows = (
        sketch_a.select("row_i")
        .distinct()
        .join(sketch_b.select("row_i").distinct(), "row_i")
    )
    filled = rows.join(per_row, "row_i", "left").select(
        F.coalesce(F.col("__ip"), F.lit(0)).alias("__ip")
    )
    return filled.agg(
        F.coalesce(F.min("__ip"), F.lit(0)).cast("bigint").alias("est")
    )


def drift_psi_grouped(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    width: int,
    group_cols: list[str],
) -> DataFrame:
    """Per-group PSI — the actionable form of drift detection ("WHICH
    segment moved?"): both snapshots reduce to per-group bin sketches
    (still one combinable aggregate each; the shuffle carries at most
    groups x value-range/width cells), groups join on (group, bin), and
    each group's Laplace-smoothed contributions sum to its PSI. The final
    round(…, 6) happens AFTER the per-group sum, so the ~bins-sized float
    additions stay far above the libm ulp the rounding absorbs (the
    text_bm25 precedent). Returns (groups..., n_a, n_b, psi)."""
    gcols = list(group_cols)
    a = quantile_bin_sketch(df_a, value_col, width, gcols).withColumnRenamed(
        "cnt", "cnt_a"
    )
    b = quantile_bin_sketch(df_b, value_col, width, gcols).withColumnRenamed(
        "cnt", "cnt_b"
    )
    j = a.join(b, [*gcols, "bin"], "full_outer").fillna(
        0, subset=["cnt_a", "cnt_b"]
    )
    w = Window.partitionBy(*gcols)
    t = (
        j.withColumn("n_a", F.sum("cnt_a").over(w))
        .withColumn("n_b", F.sum("cnt_b").over(w))
        .withColumn("n_bins", F.count(F.lit(1)).over(w))
    )
    p = (F.col("cnt_a") + 1) / (F.col("n_a") + F.col("n_bins"))
    q = (F.col("cnt_b") + 1) / (F.col("n_b") + F.col("n_bins"))
    return (
        t.withColumn("__c", (p - q) * F.log(p / q))
        .groupBy(*gcols)
        .agg(
            F.max("n_a").cast("bigint").alias("n_a"),
            F.max("n_b").cast("bigint").alias("n_b"),
            F.round(F.sum("__c"), 6).alias("psi"),
        )
    )
