"""Core relational query battery (SURVEY.md §2.C Q01-Q16, Q19, Q20).

The reference (facebookarchive/hive-dwrf) provides the storage layer these
queries scan — scan/projection/stats live in ReaderImpl.java /
RecordReaderImpl.java / OrcInputFormat.java — while the relational operators
themselves belong to the host engine (Hive there, Spark SQL here). Every
query below is declarative DataFrame API so Catalyst plans pushdown, join
strategy, and whole-stage codegen; no driver-side loops, no Python UDFs.

Determinism notes for the DuckDB oracle hash-compare:
- every computed column is aliased identically in Spark and SQL
- double aggregates are rounded (2dp money sums, 4dp averages) because
  parallel summation order differs between engines
- every LIMIT sits under a total ORDER BY (unique tie-break columns)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import query

# ---------------------------------------------------------------------------
# Q01 — TPC-H Q1 shape: scan + filter + hash aggregate.
# Exercises the scan path the reference implements (RecordReaderImpl.java:449-472)
# plus Hive-side agg, here Catalyst partial+final hash agg (map-side combine).


@query(
    "q01",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(sum(l_extendedprice), 2)                               AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           round(avg(l_quantity), 4)                                    AS avg_qty,
           round(avg(l_extendedprice), 4)                               AS avg_price,
           round(avg(l_discount), 4)                                    AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# Q02 — projection pushdown: 2 columns of a wide table (reference analog:
# column projection via boolean[] included, OrcInputFormat.java:121-163).


@query(
    "q02",
    oracle="""
    SELECT l_orderkey, l_quantity
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber, l_quantity
    LIMIT 100
    """,
)
def q02(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        # (l_orderkey, l_linenumber) is NOT unique in the synthetic data
        # (duplicate pairs with different payloads exist, one right at this
        # query's old LIMIT cut) — extend the sort to a total order so the
        # row at the cut is deterministic across engines and runs
        li.orderBy("l_orderkey", "l_linenumber", "l_quantity")
        .select("l_orderkey", "l_quantity")
        .limit(100)
    )


# Q03 — predicate mix incl. IS NOT NULL and LIKE (filters evaluated engine-side
# in the reference's Hive deployment; Catalyst pushes them to the scan here).


@query(
    "q03",
    oracle="""
    SELECT count(*) AS cnt
    FROM orders
    WHERE o_orderstatus IS NOT NULL
      AND o_totalprice > 1000.0
      AND o_orderpriority LIKE '1%'
    """,
)
def q03(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isNotNull()
        & (F.col("o_totalprice") > 1000.0)
        & F.col("o_orderpriority").like("1%")
    ).agg(F.count(F.lit(1)).alias("cnt"))


# Q04 — TPC-H Q5 shape: multi-way equi-join + agg. nation is broadcast
# (tiny dim); the fact-fact joins shuffle on their keys and AQE picks
# broadcast for whatever side turns out small at runtime.


@query(
    "q04",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY rev DESC, n_name
    """,
)
def q04(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    # lineitem (the fact table) is the streaming side throughout: with
    # customer/orders on the build side the planner only broadcasts their
    # pruned key columns (~MBs) instead of hashing all of lineitem. At
    # cluster scale orders/customer outgrow the broadcast threshold and
    # these degrade to shuffle joins on the same keys — same declared plan.
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("rev")
        )
        .orderBy(F.col("rev").desc(), "n_name")
    )


# Q05 — left outer join + count of nullable side (TPC-H Q13 shape).


@query(
    "q05",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS order_count
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    ORDER BY order_count DESC, c_custkey
    LIMIT 100
    """,
)
def q05(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
        .orderBy(F.col("order_count").desc(), "c_custkey")
        .limit(100)
    )


# Q06 — semi and anti joins (IN / NOT IN subqueries).


@query(
    "q06_semi",
    oracle="""
    SELECT count(*) AS cnt
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 0)
    """,
)
def q06_semi(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    return o.join(c, o.o_custkey == c.c_custkey, "left_semi").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@query(
    "q06_anti",
    oracle="""
    SELECT count(*) AS cnt
    FROM orders
    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal > 0)
    """,
)
def q06_anti(spark, sf_dir):
    # c_custkey is non-null, so NOT IN == left-anti join.
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    return o.join(c, o.o_custkey == c.c_custkey, "left_anti").agg(
        F.count(F.lit(1)).alias("cnt")
    )


# Q07 — theta/range join: equi key + inequality residual.


@query(
    "q07",
    oracle="""
    SELECT count(*) AS cnt
    FROM lineitem l JOIN part p
      ON l.l_partkey = p.p_partkey AND l.l_quantity < p.p_size
    """,
)
def q07(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    return li.join(
        F.broadcast(p),
        (li.l_partkey == p.p_partkey) & (li.l_quantity < p.p_size),
    ).agg(F.count(F.lit(1)).alias("cnt"))


# Q08 — exact distinct (oracle-checked) and approx distinct (rows-only check:
# HLL estimates are engine-specific so no hash oracle is declared).


@query(
    "q08",
    oracle="SELECT count(DISTINCT l_partkey) AS cnt_distinct FROM lineitem",
)
def q08(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.agg(F.countDistinct("l_partkey").alias("cnt_distinct"))


@query(
    "q08_approx",
    # the HLL estimate itself is engine-specific, but its ACCURACY CONTRACT
    # is checkable: the query emits the exact count plus whether the
    # estimate landed within the documented ±5% rsd envelope, and the
    # oracle pins both — if approx_count_distinct ever drifts, this gate
    # fails rather than silently passing a rows-only check
    oracle="""
    SELECT count(DISTINCT l_partkey) AS cnt_exact, true AS within_5pct
    FROM lineitem
    """,
)
def q08_approx(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("cnt_exact"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey") - F.countDistinct("l_partkey")
            )
            <= 0.05 * F.countDistinct("l_partkey")
        ).alias("within_5pct"),
    )


# Q09 — ROLLUP grouping sets.


@query(
    "q09",
    oracle="""
    SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY 1, 2
    """,
)
def q09(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    )


# Q10 — ranking window (per-group top-k via row_number).


@query(
    "q10",
    oracle="""
    SELECT o_custkey, o_orderkey, rn FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    LIMIT 1000
    """,
)
def q10(spark, sf_dir):
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select("o_custkey", "o_orderkey", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
        .limit(1000)
    )


# Q11 — analytic window with a ROWS frame.


@query(
    "q11",
    oracle="""
    SELECT o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS running_sum
    FROM orders
    ORDER BY o_orderkey
    LIMIT 1000
    """,
)
def q11(spark, sf_dir):
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return (
        o.select(
            "o_orderkey", F.round(F.sum("o_totalprice").over(w), 2).alias("running_sum")
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


# Q12 — global top-k (Spark plans TakeOrderedAndProject: no full sort).


@query(
    "q12",
    oracle="""
    SELECT l_orderkey, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey
    LIMIT 50
    """,
)
def q12(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey")
        .limit(50)
    )


# Q13 — set operations.


@query(
    "q13_intersect",
    oracle="""
    SELECT o_custkey FROM (
      SELECT o_custkey FROM orders
      INTERSECT
      SELECT c_custkey FROM customer) t
    ORDER BY o_custkey
    LIMIT 100
    """,
)
def q13_intersect(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select("o_custkey")
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("o_custkey"))
    return o.intersect(c).orderBy("o_custkey").limit(100)


@query(
    "q13_except",
    oracle="""
    SELECT c_custkey FROM (
      SELECT c_custkey FROM customer
      EXCEPT
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995) t
    ORDER BY c_custkey
    LIMIT 100
    """,
)
def q13_except(spark, sf_dir):
    # The 1995 filter keeps the result non-empty at every SF (every customer
    # has *some* order in this data), so the oracle hash-check is non-trivial.
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1995)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.subtract(o).orderBy("c_custkey").limit(100)  # EXCEPT (distinct)


@query(
    "q13_union_all",
    oracle="""
    SELECT count(*) AS cnt FROM (
      SELECT o_custkey AS k FROM orders
      UNION ALL
      SELECT c_custkey AS k FROM customer) t
    """,
)
def q13_union_all(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    return o.unionAll(c).agg(F.count(F.lit(1)).alias("cnt"))


# Q14 — string functions.


@query(
    "q14",
    oracle="""
    SELECT p_partkey,
           upper(substr(p_name, 1, 10))      AS name_prefix,
           CAST(length(p_type) AS INTEGER)   AS type_len,
           concat(p_brand, '/', p_type)      AS brand_type
    FROM part
    WHERE p_name LIKE '%e%'
    ORDER BY p_partkey
    LIMIT 100
    """,
)
def q14(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").like("%e%"))
        .select(
            "p_partkey",
            F.upper(F.substring("p_name", 1, 10)).alias("name_prefix"),
            F.length("p_type").cast("int").alias("type_len"),
            F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        )
        .orderBy("p_partkey")
        .limit(100)
    )


# Q15 — date/timestamp field extraction (naive TIMESTAMP_NTZ on both sides).


@query(
    "q15",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER)  AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           count(*)                            AS cnt
    FROM orders
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q15(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mo"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("yr", "mo")
    )


# Q16 — math + conditional expressions.


@query(
    "q16",
    oracle="""
    SELECT l_orderkey,
           round(l_extendedprice * l_tax, 2) AS tax_amt,
           CASE WHEN l_discount > 0.05 THEN 'hi' ELSE 'lo' END AS disc_class
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber, tax_amt, disc_class
    LIMIT 100
    """,
)
def q16(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * F.col("l_tax"), 2).alias("tax_amt"),
            F.when(F.col("l_discount") > 0.05, "hi").otherwise("lo").alias("disc_class"),
        )
        # duplicate (l_orderkey, l_linenumber) pairs exist — total order
        .orderBy("l_orderkey", "l_linenumber", "tax_amt", "disc_class")
        .select("l_orderkey", "tax_amt", "disc_class")
        .limit(100)
    )


# Q19 — events aggregation (timestamps flow through min/max; truncation to
# microseconds commutes with min/max so the DuckDB CAST matches exactly).


@query(
    "q19",
    oracle="""
    SELECT user_id,
           count(*)                 AS cnt,
           min(CAST(ts AS TIMESTAMP)) AS min_ts,
           max(CAST(ts AS TIMESTAMP)) AS max_ts
    FROM events
    GROUP BY user_id
    ORDER BY cnt DESC, user_id
    LIMIT 100
    """,
)
def q19(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
        )
        .orderBy(F.col("cnt").desc(), "user_id")
        .limit(100)
    )


# Q20 — correlated scalar subquery (Catalyst decorrelates to an aggregate+join).


@query(
    "q20",
    oracle="""
    SELECT c_custkey
    FROM customer c
    WHERE c_acctbal > (SELECT avg(o_totalprice) FROM orders o
                       WHERE o.o_custkey = c.c_custkey) / 40
    ORDER BY c_custkey
    LIMIT 100
    """,
)
def q20(spark, sf_dir):
    # /40 scales the order-price average into acctbal's range so the
    # predicate is selective but non-empty at every SF.
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    avg_per_cust = o.groupBy("o_custkey").agg(F.avg("o_totalprice").alias("avg_price"))
    return (
        c.join(avg_per_cust, c.c_custkey == avg_per_cust.o_custkey)
        .filter(F.col("c_acctbal") > F.col("avg_price") / 40)
        .select("c_custkey")
        .orderBy("c_custkey")
        .limit(100)
    )
