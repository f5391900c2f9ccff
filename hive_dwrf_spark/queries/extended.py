"""Extended query surface (SURVEY.md §2.B, line-by-line): grouping sets,
analytic windows, array/map/JSON scalar functions, exact percentiles, date
arithmetic, regex, conditionals, and the three Python UDF surfaces
(pandas_udf, UDTF, applyInPandas) — each with a DuckDB oracle.

The reference serves these through its host engine (Hive operators over
DWRF scans, SURVEY §2.B); here every one is a Catalyst built-in or a
documented Python UDF surface. No driver-side loops anywhere.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ..tables import load
from . import query

# --- grouping sets -----------------------------------------------------------


@query(
    "q21_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY 1, 2
    """,
)
def q21_cube(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q22_grouping_sets",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           count(*) AS cnt, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    ORDER BY 1, 2
    """,
)
def q22_grouping_sets(spark, sf_dir):
    # GROUPING SETS has no DataFrame-API form; the SQL is identical in both
    # engines, which is the point — Catalyst expands it to an Expand node.
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               count(*) AS cnt, round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        ORDER BY 1, 2
        """
    )


# --- analytic window functions ----------------------------------------------


@query(
    "q23_window_analytic",
    oracle="""
    SELECT o_orderkey,
           round(lag(o_totalprice) OVER w, 2)          AS prev_price,
           round(lead(o_totalprice) OVER w, 2)         AS next_price,
           round(first_value(o_totalprice) OVER w, 2)  AS first_price,
           ntile(4) OVER w                             AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_orderkey
    LIMIT 1000
    """,
)
def q23_window_analytic(spark, sf_dir):
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_orderkey",
            F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
            F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
            F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


# --- array / map / JSON scalar functions -------------------------------------


@query(
    "q24_array",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           len(arr)                                           AS arr_len,
           arr[1]                                             AS first_elem,
           list_contains(arr, 3)                              AS has_three,
           CAST(list_sum(list_transform(arr, x -> x * 2)) AS BIGINT)
                                                              AS doubled_sum
    FROM (SELECT l_orderkey, l_linenumber,
                 [CAST(l_quantity AS BIGINT), l_orderkey % 7,
                  CAST(l_linenumber AS BIGINT)] AS arr
          FROM lineitem) t
    ORDER BY l_orderkey, l_linenumber, first_elem
    LIMIT 200
    """,
)
def q24_array(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    arr = F.array(
        F.col("l_quantity").cast("bigint"),
        F.col("l_orderkey") % 7,
        F.col("l_linenumber").cast("bigint"),
    )
    return (
        li.select("l_orderkey", "l_linenumber", arr.alias("arr"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.size("arr").alias("arr_len"),
            F.element_at("arr", 1).alias("first_elem"),
            F.array_contains("arr", F.lit(3).cast("bigint")).alias("has_three"),
            F.aggregate(
                F.transform("arr", lambda x: x * 2),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias("doubled_sum"),
        )
        # duplicate (l_orderkey, l_linenumber) pairs exist in the synthetic
        # data; first_elem (= l_quantity) totalizes the order — if it ties
        # too, every output column of the twins is equal, so the cut row is
        # value-deterministic either way
        .orderBy("l_orderkey", "l_linenumber", "first_elem")
        .limit(200)
    )


@query(
    "q25_map",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           array_to_string(map_keys(m), ',') AS ks,
           m['ln'][1]      AS ln_val,
           m['ok7'][1]     AS ok7_val
    FROM (SELECT l_orderkey, l_linenumber,
                 MAP {'ln': CAST(l_linenumber AS BIGINT),
                      'ok7': l_orderkey % 7} AS m
          FROM lineitem) t
    ORDER BY l_orderkey, l_linenumber
    LIMIT 200
    """,
)
def q25_map(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    m = F.create_map(
        F.lit("ln"),
        F.col("l_linenumber").cast("bigint"),
        F.lit("ok7"),
        F.col("l_orderkey") % 7,
    )
    return (
        li.select("l_orderkey", "l_linenumber", m.alias("m"))
        .select(
            "l_orderkey",
            "l_linenumber",
            # joined to a scalar: the driver's canonical sort cannot order
            # list-typed cells (pandas lexsort on lists raises)
            F.array_join(F.map_keys("m"), ",").alias("ks"),
            F.element_at("m", "ln").alias("ln_val"),
            F.element_at("m", "ok7").alias("ok7_val"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(200)
    )


@query(
    "q26_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    ORDER BY event_id
    LIMIT 500
    """,
)
def q26_json(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return (
        e.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        )
        .orderBy("event_id")
        .limit(500)
    )


@query(
    "q26_from_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    ORDER BY event_id
    LIMIT 500
    """,
)
def q26_from_json(spark, sf_dir):
    # Same oracle, different Spark surface: full JSON parse into a struct.
    e = load(spark, sf_dir, "events")
    return (
        e.select(
            "event_id",
            F.from_json("props", "k BIGINT").getField("k").alias("k_val"),
        )
        .orderBy("event_id")
        .limit(500)
    )


# --- exact percentiles --------------------------------------------------------


@query(
    "q27_percentile",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 2) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 2) AS p75
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q27_percentile(spark, sf_dir):
    # Spark's percentile() and DuckDB's quantile_cont() use the same linear
    # interpolation; rounding absorbs summation-order float noise. The
    # array form buffers+sorts each group's values ONCE for all three
    # quantiles instead of once per quantile.
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.expr(
                "percentile(o_totalprice, array(0.25, 0.5, 0.75))"
            ).alias("ps")
        )
        .select(
            "o_orderpriority",
            F.round(F.element_at("ps", 1), 2).alias("p25"),
            F.round(F.element_at("ps", 2), 2).alias("p50"),
            F.round(F.element_at("ps", 3), 2).alias("p75"),
        )
        .orderBy("o_orderpriority")
    )


# --- regex + conditionals -----------------------------------------------------


@query(
    "q28_regex",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)$', 1)        AS last_word,
           regexp_replace(p_type, '[aeiou]', '', 'g')    AS devoweled,
           string_split(p_type, ' ')[1]                  AS first_token
    FROM part
    WHERE regexp_matches(p_name, 'o[ln]')
    ORDER BY p_partkey
    LIMIT 200
    """,
)
def q28_regex(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").rlike("o[ln]"))
        .select(
            "p_partkey",
            F.regexp_extract("p_name", "([a-z]+)$", 1).alias("last_word"),
            F.regexp_replace("p_type", "[aeiou]", "").alias("devoweled"),
            F.element_at(F.split("p_type", " "), 1).alias("first_token"),
        )
        .orderBy("p_partkey")
        .limit(200)
    )


@query(
    "q29_conditional",
    oracle="""
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'O'), 'open')      AS status_label,
           round(greatest(o_totalprice, 150000.0), 2)        AS floor_price,
           round(least(o_totalprice, 150000.0), 2)           AS cap_price
    FROM orders
    ORDER BY o_orderkey
    LIMIT 500
    """,
)
def q29_conditional(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias(
                "status_label"
            ),
            F.round(F.greatest("o_totalprice", F.lit(150000.0)), 2).alias(
                "floor_price"
            ),
            F.round(F.least("o_totalprice", F.lit(150000.0)), 2).alias("cap_price"),
        )
        .orderBy("o_orderkey")
        .limit(500)
    )


# --- date arithmetic ----------------------------------------------------------


@query(
    "q26_datefns",
    oracle="""
    SELECT o_orderkey,
           date_trunc('month', o_orderdate)                          AS order_month,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                                                                     AS days_since_95,
           CAST(o_orderdate AS DATE) + 30                            AS due_date,
           isodow(o_orderdate)                                       AS iso_dow
    FROM orders
    ORDER BY o_orderkey
    LIMIT 500
    """,
)
def q26_datefns(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.trunc(F.col("o_orderdate").cast("date"), "month").alias("order_month"),
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
                "days_since_95"
            ),
            F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
            (F.weekday("o_orderdate") + 1).alias("iso_dow"),
        )
        .orderBy("o_orderkey")
        .limit(500)
    )


# --- Python UDF surfaces (pandas_udf / UDTF / applyInPandas) ------------------


@query(
    "q30_pandas_udf",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
                AS BIGINT) AS n_tokens
    FROM documents
    ORDER BY doc_id
    LIMIT 500
    """,
)
def q30_pandas_udf(spark, sf_dir):
    """Arrow-batched scalar pandas UDF (the reference's Hive-UDF surface,
    SURVEY §2.B; here the vectorized Python path)."""
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def n_tokens(texts: pd.Series) -> pd.Series:
        return texts.fillna("").str.split(" ").map(
            lambda ws: sum(1 for w in ws if w)
        ).astype("int64")

    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", n_tokens(F.col("text")).alias("n_tokens"))
        .orderBy("doc_id")
        .limit(500)
    )


@query(
    "q31_udtf",
    oracle="""
    SELECT doc_id,
           generate_subscripts(fl, 1) - 1 AS idx,
           unnest(fl)                     AS tok
    FROM (SELECT doc_id,
                 list_filter(string_split(text, ' '), w -> w <> '') AS fl
          FROM documents
          WHERE doc_id < 20) t
    ORDER BY doc_id, idx
    """,
)
def q31_udtf(spark, sf_dir):
    """Python UDTF (table function): one row per token with its position —
    the lateral-join surface Hive UDTFs provide in reference deployments."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="idx bigint, tok string")
    class Tokenize:
        def eval(self, text: str):
            if text:
                i = 0
                for w in text.split(" "):
                    if w:
                        yield i, w
                        i += 1

    spark.udtf.register("dwrf_tokenize", Tokenize)
    load(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 20
    ).createOrReplaceTempView("docs_small")
    return spark.sql(
        """
        SELECT d.doc_id, t.idx, t.tok
        FROM docs_small d, LATERAL dwrf_tokenize(d.text) t
        ORDER BY d.doc_id, t.idx
        """
    )


@query(
    "q32_apply_in_pandas",
    oracle="""
    SELECT user_id, event_id,
           row_number() OVER (PARTITION BY user_id ORDER BY value, event_id)
               AS value_rank
    FROM events
    WHERE user_id < 30
    ORDER BY user_id, event_id
    """,
)
def q32_apply_in_pandas(spark, sf_dir):
    """Grouped-map applyInPandas (the reference's Hive-UDAF-ish surface):
    per-user ranking computed in pandas, one Arrow batch per user group.
    Integer output — exact across engines (float demeaning lands on
    5-boundary digits where Java and C rounding disagree)."""
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 30)

    def rank_by_value(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.sort_values(["value", "event_id"])[["user_id", "event_id"]].copy()
        out["value_rank"] = range(1, len(out) + 1)
        return out

    return (
        e.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandas(
            rank_by_value, schema="user_id bigint, event_id bigint, value_rank bigint"
        )
        .orderBy("user_id", "event_id")
    )


# --- subquery shapes beyond q06/q20 -------------------------------------------


@query(
    "q33_exists",
    oracle="""
    SELECT c_custkey
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    ORDER BY c_custkey
    LIMIT 200
    """,
)
def q33_exists(spark, sf_dir):
    """Correlated EXISTS — Catalyst decorrelates to a left-semi join."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        ORDER BY c_custkey
        LIMIT 200
        """
    )


@query(
    "q34_not_in",
    oracle="""
    SELECT count(*) AS cnt
    FROM orders
    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                            WHERE c_acctbal > 9000)
    """,
)
def q34_not_in(spark, sf_dir):
    """NOT IN over a nullable subquery column — Spark plans a null-aware
    anti join (distinct from q06_anti's plain left-anti)."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT count(*) AS cnt
        FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                                WHERE c_acctbal > 9000)
        """
    )


@query(
    "q35_sessionize",
    # gap-based sessionization replayed with lag + running-sum session ids;
    # Spark's session_window merges events whose gap to the previous event
    # is strictly under 30 minutes — exactly `ts >= prev + 30min` starting
    # a new session in the replay
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), flags AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flags
    )
    SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events
    FROM sess GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def q35_sessionize(spark, sf_dir):
    """Gap-based sessionization via Spark's native session_window operator
    (dynamic-gap session windows; the same construct works unchanged under
    Structured Streaming with a watermark). One shuffle on user_id."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
        .orderBy("user_id", "session_start")
    )


@query(
    "q36_pivot",
    # pivot on the two l_linestatus values; quantities are integral doubles
    # so the bigint cast is exact in both engines
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'F'
                         THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS "F",
           CAST(sum(CASE WHEN l_linestatus = 'O'
                         THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS "O"
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q36_pivot(spark, sf_dir):
    """Pivot (wide aggregation): explicit value list so the plan is a single
    pass — no extra distinct-values job, stable column order at any scale."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("bigint")))
        .orderBy("l_returnflag")
    )


@query(
    "q37_maxby",
    # max_by/min_by with a (ts, event_id) struct ordering == row_number over
    # the same DESC/ASC sort in the replay (total order, so ties cannot
    # make the winner nondeterministic)
    oracle="""
    WITH latest AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ), earliest AS (
      SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP) ASC,
                                         event_id ASC) AS rn
      FROM events
    )
    SELECT l.user_id, l.event_id AS last_event_id, l.ts AS last_ts,
           e.event_id AS first_event_id
    FROM latest l JOIN earliest e
      ON l.user_id = e.user_id AND l.rn = 1 AND e.rn = 1
    ORDER BY l.user_id
    """,
)
def q37_maxby(spark, sf_dir):
    """Latest/earliest record per key via max_by/min_by with struct ordering
    (the SCD-style 'current row per entity' pattern): one hash aggregate, no
    window sort — at scale this beats row_number-filtering by avoiding the
    per-partition sort entirely."""
    e = load(spark, sf_dir, "events")
    order = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.groupBy("user_id")
        .agg(
            F.max_by("event_id", order).alias("last_event_id"),
            F.max("ts").alias("last_ts"),
            F.min_by("event_id", order).alias("first_event_id"),
        )
        .orderBy("user_id")
    )


@query(
    "q38_string_agg",
    oracle="""
    SELECT o_orderpriority,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')
             AS statuses,
           count(DISTINCT o_orderstatus) AS n_statuses
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q38_string_agg(spark, sf_dir):
    """Ordered string aggregation (listagg shape): collect_set -> sort ->
    join keeps the result order-insensitive to partitioning, so the same
    plan is deterministic on any cluster layout."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("o_orderstatus")), ","
            ).alias("statuses"),
            F.count_distinct(F.col("o_orderstatus")).alias("n_statuses"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q39_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin,
           count(*) AS cnt,
           CAST(min(floor(o_totalprice)) AS BIGINT) AS min_price_floor,
           CAST(max(floor(o_totalprice)) AS BIGINT) AS max_price_floor
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
)
def q39_histogram(spark, sf_dir):
    """Fixed-width histogram binning — the single-pass groupBy shape used
    for data profiling; integer floors keep the oracle float-free."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min(F.floor("o_totalprice")).cast("bigint").alias("min_price_floor"),
            F.max(F.floor("o_totalprice")).cast("bigint").alias("max_price_floor"),
        )
        .orderBy("bin")
    )


@query(
    "q40_approx_percentile",
    # percentile_approx's estimate is engine-specific; the checkable part is
    # its accuracy contract vs the exact percentile (accuracy 10000 =>
    # rank error <= n/10000, comfortably within 1% of the value on this
    # distribution). The exact value itself is NOT emitted: Spark's
    # percentile() and DuckDB's quantile_cont interpolate with different
    # floating orders, so a 1-ulp difference can flip any integer anchor.
    oracle="""
    SELECT count(*) AS n_rows, true AS p50_ok, true AS p95_ok
    FROM orders
    """,
)
def q40_approx_percentile(spark, sf_dir):
    """approx percentile (GK sketch) gated on an accuracy envelope against
    the exact interpolated percentile — mergeable sketches are the only
    percentile that scales to 100 TB, so the contract is what's pinned."""
    o = load(spark, sf_dir, "orders")
    exact = F.expr("percentile(o_totalprice, array(0.50, 0.95))")
    approx = F.expr("percentile_approx(o_totalprice, array(0.50, 0.95), 10000)")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.abs(approx[0] - exact[0]) <= 0.01 * exact[0]).alias("p50_ok"),
        (F.abs(approx[1] - exact[1]) <= 0.01 * exact[1]).alias("p95_ok"),
    )


@query(
    "q41_nullsafe_join",
    # null-safe equality (<=>): NULL keys match each other instead of
    # dropping out — DuckDB's IS NOT DISTINCT FROM is the same operator
    oracle="""
    WITH l AS (
      SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE o_orderkey % 5 END AS k, o_orderkey
      FROM orders
    ), r AS (
      SELECT CASE WHEN n_nationkey >= 5 THEN NULL
                  ELSE n_nationkey END AS k, n_nationkey
      FROM nation
    )
    SELECT count(*) AS cnt, count(l.k) AS non_null_keys
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    """,
)
def q41_nullsafe_join(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    l = o.select(
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_orderkey") % 5)
        .alias("k"),
        "o_orderkey",
    )
    r = n.select(
        F.when(F.col("n_nationkey") >= 5, None)
        .otherwise(F.col("n_nationkey").cast("bigint"))
        .alias("k"),
        "n_nationkey",
    )
    j = l.join(r, l["k"].eqNullSafe(r["k"]))
    return j.agg(
        F.count(F.lit(1)).alias("cnt"), F.count(l["k"]).alias("non_null_keys")
    )


@query(
    "q42_except_all",
    # multiset semantics: duplicates survive subtraction by multiplicity
    oracle="""
    SELECT o_custkey FROM (
      SELECT o_custkey FROM orders
      EXCEPT ALL
      SELECT c_custkey FROM customer
    ) t
    ORDER BY o_custkey
    LIMIT 200
    """,
)
def q42_except_all(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select("o_custkey")
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey")
    )
    return o.exceptAll(c).orderBy("o_custkey").limit(200)


@query(
    "q43_explode_outer",
    # explode_outer keeps rows whose array is empty/NULL (LATERAL VIEW
    # OUTER); DuckDB replays with a LEFT JOIN LATERAL unnest
    oracle="""
    SELECT o.o_orderkey, u.elem
    FROM (SELECT o_orderkey,
                 CASE WHEN o_orderkey % 3 = 0 THEN []
                      ELSE [o_orderkey % 5, o_orderkey % 7] END AS arr
          FROM orders) o
    LEFT JOIN LATERAL (SELECT unnest(o.arr) AS elem) u ON true
    ORDER BY o_orderkey, elem NULLS FIRST
    LIMIT 300
    """,
)
def q43_explode_outer(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    arr = F.when(
        F.col("o_orderkey") % 3 == 0, F.array().cast("array<bigint>")
    ).otherwise(F.array(F.col("o_orderkey") % 5, F.col("o_orderkey") % 7))
    return (
        o.select("o_orderkey", arr.alias("arr"))
        .select("o_orderkey", F.explode_outer("arr").alias("elem"))
        .orderBy("o_orderkey", F.col("elem").asc_nulls_first())
        .limit(300)
    )


@query(
    "q45_correlated_scalar",
    oracle="""
    SELECT c_custkey,
           (SELECT count(*) FROM orders o
            WHERE o.o_custkey = c.c_custkey) AS n_orders,
           (SELECT CAST(max(floor(o_totalprice * 100 + 0.5)) AS BIGINT)
            FROM orders o WHERE o.o_custkey = c.c_custkey) AS max_price_c
    FROM customer c
    ORDER BY c_custkey
    LIMIT 200
    """,
)
def q45_correlated_scalar(spark, sf_dir):
    """Correlated SCALAR subqueries in the projection — Catalyst
    decorrelates BOTH into one left-outer aggregate join (the executed
    plan is a single BroadcastHashJoin, never a per-row re-execution), so
    the 'subquery per row' surface costs one join at any scale. Customers
    with no orders surface count 0 / max NULL in both engines."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey,
               (SELECT count(*) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS n_orders,
               (SELECT CAST(max(floor(o_totalprice * 100 + 0.5)) AS BIGINT)
                FROM orders o WHERE o.o_custkey = c.c_custkey) AS max_price_c
        FROM customer c
        ORDER BY c_custkey
        LIMIT 200
        """
    )
