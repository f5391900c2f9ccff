"""Event-analytics + pipeline-prep queries (round 3 widening): funnel,
cohort retention, histogram, z-score outliers, SCD2 history, document
chunking, temperature-balanced sampling.

Same contract as every other registered query: the Spark plan is pure
Catalyst (no UDFs anywhere in this module) and each query carries a DuckDB
oracle that replays the computation exactly — float-order-dependent sums are
avoided by accumulating integer cents, and hash decisions replay via
md5_number_upper.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators import curation, events, graph, layout, sampling, text
from ..tables import fan_out, load
from . import query


def _parquet_rows(sf_dir: str, name: str) -> int | None:
    """Row count of a test table from parquet footer metadata alone —
    zero data bytes, driver-side, no Spark job. Used only for SOUND size
    bounds feeding adaptive gates (both gate outcomes compute identical
    results); returns None when the layout is not a plain file."""
    import os

    try:
        import pyarrow.parquet as pq

        return pq.read_metadata(os.path.join(sf_dir, f"{name}.parquet")).num_rows
    except Exception:
        return None


def _zorder_oracle(bits: int = 8) -> str:
    """DuckDB replay of operators/layout.py::add_zorder_key for
    (l_partkey, l_suppkey): identical integer quantization (width =
    range >> bits + 1, floor division) and identical bit interleave
    (x on even bits, y on odd), generated from the same loop shape."""
    inter = " | ".join(
        f"(((qx >> {k}) & 1) << {2 * k}) | (((qy >> {k}) & 1) << {2 * k + 1})"
        for k in range(bits)
    )
    return f"""
    WITH s AS (
      SELECT CAST(min(l_partkey) AS BIGINT) AS min_x,
             CAST(max(l_partkey) AS BIGINT) AS max_x,
             CAST(min(l_suppkey) AS BIGINT) AS min_y,
             CAST(max(l_suppkey) AS BIGINT) AS max_y
      FROM lineitem
    ), q AS (
      SELECT l_orderkey, l_linenumber,
             coalesce((CAST(l_partkey AS BIGINT) - min_x)
                      // (((max_x - min_x) >> {bits}) + 1), 0) AS qx,
             coalesce((CAST(l_suppkey AS BIGINT) - min_y)
                      // (((max_y - min_y) >> {bits}) + 1), 0) AS qy
      FROM lineitem, s
    )
    SELECT l_orderkey, l_linenumber, CAST({inter} AS BIGINT) AS zkey
    FROM q
    ORDER BY l_orderkey, l_linenumber
    LIMIT 200
    """

# --- event analytics ---------------------------------------------------------


@query(
    "events_funnel",
    # each funnel stage is min-timestamp semantics: a user reaches step i
    # when an event of steps[i] happens at-or-after their step i-1 time
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts >= s1.t
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s2.t
      GROUP BY e.user_id
    )
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
             (SELECT count(*) FROM s1) AS n_users
      UNION ALL
      SELECT CAST(2 AS BIGINT), 'click', (SELECT count(*) FROM s2)
      UNION ALL
      SELECT CAST(3 AS BIGINT), 'purchase', (SELECT count(*) FROM s3)
    ) ORDER BY step
    """,
)
def events_funnel(spark, sf_dir):
    """Ordered conversion funnel view -> click -> purchase. Stage filters
    push to the scan; all joins co-partition on user_id."""
    e = load(spark, sf_dir, "events")
    out = events.funnel(e, ["view", "click", "purchase"])
    return out.select(
        F.col("step").cast("bigint").alias("step"), "event_type", "n_users"
    ).orderBy("step")


@query(
    "events_retention",
    # cohort = Monday-truncated week of first event; offsets are exact
    # multiples of 7 days so the /7 division is integral in both engines
    oracle="""
    WITH cohort AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ), active AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events
    )
    SELECT c.cohort_week,
           CAST(date_diff('day', c.cohort_week, a.wk) / 7 AS BIGINT)
             AS week_offset,
           count(DISTINCT a.user_id) AS n_users
    FROM active a JOIN cohort c ON a.user_id = c.user_id
    GROUP BY 1, 2
    ORDER BY cohort_week, week_offset
    """,
)
def events_retention(spark, sf_dir):
    """Weekly cohort retention triangle."""
    e = load(spark, sf_dir, "events")
    return events.retention(e).orderBy("cohort_week", "week_offset")


@query(
    "events_histogram",
    # exact integer-cent sums: order-independent, so partitioning can't
    # change the hash; DuckDB's SUM(BIGINT) is HUGEINT -> cast back
    oracle="""
    SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
           CAST(floor(value / 50.0) AS BIGINT) * CAST(50.0 AS DOUBLE) AS lo,
           (CAST(floor(value / 50.0) AS BIGINT) + 1) * CAST(50.0 AS DOUBLE)
             AS hi,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events
    GROUP BY 1
    ORDER BY bucket
    """,
)
def events_histogram(spark, sf_dir):
    """Fixed-width value histogram: one map-side-combinable aggregate."""
    e = load(spark, sf_dir, "events")
    return events.value_histogram(e, "value", 50.0).orderBy("bucket")


@query(
    "events_zscore",
    # stats from exact integer-cent sums; the double formula below is
    # operation-for-operation the Spark plan's, so IEEE doubles agree
    oracle="""
    WITH stats AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)
                      * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s2
      FROM events GROUP BY event_type
    ), st AS (
      SELECT event_type,
             CAST(s AS DOUBLE) / n AS mean,
             sqrt(CAST(s2 AS DOUBLE) / n
                  - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) AS std
      FROM stats
    )
    SELECT e.event_id, e.event_type,
           round((CAST(floor(e.value * 100 + 0.5) AS BIGINT) - st.mean) / st.std, 4)
             AS z
    FROM events e JOIN st ON e.event_type = st.event_type
    WHERE abs((CAST(floor(e.value * 100 + 0.5) AS BIGINT) - st.mean) / st.std) > 2.5
    ORDER BY event_id
    """,
)
def events_zscore(spark, sf_dir):
    """Per-group z-score outliers: two passes + broadcast stats, no
    full-table window."""
    e = load(spark, sf_dir, "events")
    out = events.zscore_outliers(e, "value", ["event_type"], threshold=2.5)
    return out.select(
        "event_id", "event_type", F.round("z", 4).alias("z")
    ).orderBy("event_id")


@query(
    "pipeline_scd2",
    # event_id tiebreaks equal timestamps so both engines' windows agree
    oracle="""
    WITH changes AS (
      SELECT user_id, event_type, ts, event_id
      FROM (SELECT user_id, event_type, ts, event_id,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev
            FROM events) t
      WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, event_type AS state, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to
    FROM changes
    ORDER BY user_id, valid_from
    """,
)
def pipeline_scd2(spark, sf_dir):
    """Type-2 SCD history from the event log: compress consecutive equal
    states, stamp [valid_from, valid_to) from the next change."""
    e = load(spark, sf_dir, "events")
    return events.scd2(
        e, "user_id", "event_type", "ts", tiebreakers=("event_id",)
    ).orderBy("user_id", "valid_from")


@query(
    "events_moving_window",
    # RANGE frame over microsecond epoch — DuckDB's RANGE with a BIGINT
    # ordering key replays Spark's rangeBetween exactly, ties included
    oracle="""
    SELECT event_id,
           count(*) OVER w AS n_window,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS BIGINT)
             AS sum_cents_window
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def events_moving_window(spark, sf_dir):
    """Trailing 1-hour per-user aggregate via a time-RANGE frame (exact
    under irregular spacing and timestamp ties; O(rows) two-pointer
    evaluation, one shuffle on user_id)."""
    e = load(spark, sf_dir, "events")
    out = events.sliding_time_aggregate(e, "user_id", "ts", "value", 3600)
    return out.select("event_id", "n_window", "sum_cents_window").orderBy(
        "event_id"
    )


# --- pipeline prep -----------------------------------------------------------


@query(
    "text_chunk",
    # 1-based SUBSTR with tail clamping is ANSI — the chunk bytes (and so
    # the md5) replay exactly; generate_series/sequence are both inclusive
    oracle="""
    SELECT doc_id, CAST(chunk_start AS BIGINT) AS chunk_start,
           CAST(length(substring(text, CAST(chunk_start AS INT), 200))
                AS BIGINT) AS chunk_len,
           md5(substring(text, CAST(chunk_start AS INT), 200)) AS chunk_hash
    FROM (SELECT doc_id, text,
                 unnest(generate_series(1, greatest(length(text), 1), 150))
                   AS chunk_start
          FROM documents) t
    ORDER BY doc_id, chunk_start
    """,
)
def text_chunk(spark, sf_dir):
    """Sliding-window chunking (200-char windows, 50-char overlap) as pure
    JVM sequence/explode/substring — chunking runs inside the scan stage."""
    d = load(spark, sf_dir, "documents")
    out = text.chunk_documents(d, "text", "doc_id", chunk_size=200, stride=150)
    return out.select(
        "doc_id",
        F.col("chunk_start").cast("bigint").alias("chunk_start"),
        F.col("chunk_len").cast("bigint").alias("chunk_len"),
        "chunk_hash",
    ).orderBy("doc_id", "chunk_start")


def _winnow_oracle(k: int = 8, window: int = 4) -> str:
    """DuckDB replay of operators/text.py::winnow_fingerprints: the same
    base-31 codepoint polynomial per k-gram, the same window minima (a
    ROWS frame stands in for the engine's array slice), aggregated to a
    compact per-doc contract (count / checksum / min / max of the
    distinct fingerprints)."""
    poly = " + ".join(
        f"CAST(ascii(substr(text, i + {j}, 1)) AS BIGINT) * {31 ** j}"
        for j in range(k)
    )
    return f"""
    WITH grams AS (
      SELECT doc_id, i, ({poly}) % 2147483647 AS h
      FROM (SELECT doc_id, text,
                   unnest(generate_series(1, length(text) - {k - 1})) AS i
            FROM documents
            WHERE text IS NOT NULL AND length(text) >= {k}) t
    ), wins AS (
      SELECT doc_id, i,
             min(h) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW
                          AND {window - 1} FOLLOWING) AS fp,
             count(*) OVER (PARTITION BY doc_id) AS nh
      FROM grams
    ), fps AS (
      SELECT DISTINCT doc_id, fp
      FROM wins WHERE i <= nh - {window - 1}
    )
    SELECT doc_id, count(*) AS n_fps,
           CAST(sum(fp) AS BIGINT) AS fp_sum,
           min(fp) AS fp_min, max(fp) AS fp_max
    FROM fps GROUP BY doc_id ORDER BY doc_id
    """


def _winnow_pairs_oracle(
    k: int = 8, window: int = 4, min_shared: int = 5, max_df: int = 50
) -> str:
    """Replay of operators/text.py::winnow_pairs: same fingerprints (see
    _winnow_oracle), df-capped, self-joined, thresholded."""
    poly = " + ".join(
        f"CAST(ascii(substr(text, i + {j}, 1)) AS BIGINT) * {31 ** j}"
        for j in range(k)
    )
    return f"""
    WITH grams AS (
      SELECT doc_id, i, ({poly}) % 2147483647 AS h
      FROM (SELECT doc_id, text,
                   unnest(generate_series(1, length(text) - {k - 1})) AS i
            FROM documents
            WHERE text IS NOT NULL AND length(text) >= {k}) t
    ), wins AS (
      SELECT doc_id, i,
             min(h) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW
                          AND {window - 1} FOLLOWING) AS fp,
             count(*) OVER (PARTITION BY doc_id) AS nh
      FROM grams
    ), fps AS (
      SELECT DISTINCT doc_id, fp
      FROM wins WHERE i <= nh - {window - 1}
    ), rare AS (
      SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {max_df}
    ), kept AS (
      SELECT f.doc_id, f.fp FROM fps f JOIN rare r ON f.fp = r.fp
    )
    SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_shared
    FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= {min_shared}
    ORDER BY id1, id2
    """


@query("dedup_winnow", oracle=_winnow_pairs_oracle(min_shared=15, max_df=30))
def dedup_winnow(spark, sf_dir):
    """MOSS-style near-dup pairs: >= 15 shared winnowing fingerprints
    (i.e. many independent >= 11-char substring matches), boilerplate
    fingerprints df-capped at 30 docs before the join — thresholds tuned
    so the result is discriminative (~0.1% of pairs) on this corpus."""
    d = load(spark, sf_dir, "documents")
    return text.winnow_pairs(
        d, "text", "doc_id", min_shared=15, max_df=30
    ).orderBy("id1", "id2")


def _winnow_resolve_oracle(
    k: int = 8, window: int = 4, min_shared: int = 15, max_df: int = 30
) -> str:
    """winnow_pairs edges -> recursive-CTE connected components -> keep
    each cluster's min-id doc plus all unpaired docs (the same resolution
    contract as dedup_resolve, fed by the MOSS pair generator)."""
    poly = " + ".join(
        f"CAST(ascii(substr(text, i + {j}, 1)) AS BIGINT) * {31 ** j}"
        for j in range(k)
    )
    return f"""
    WITH RECURSIVE grams AS (
      SELECT doc_id, i, ({poly}) % 2147483647 AS h
      FROM (SELECT doc_id, text,
                   unnest(generate_series(1, length(text) - {k - 1})) AS i
            FROM documents
            WHERE text IS NOT NULL AND length(text) >= {k}) t
    ), wins AS (
      SELECT doc_id, i,
             min(h) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW
                          AND {window - 1} FOLLOWING) AS fp,
             count(*) OVER (PARTITION BY doc_id) AS nh
      FROM grams
    ), fps AS (
      SELECT DISTINCT doc_id, fp
      FROM wins WHERE i <= nh - {window - 1}
    ), rare AS (
      SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {max_df}
    ), kept AS (
      SELECT f.doc_id, f.fp FROM fps f JOIN rare r ON f.fp = r.fp
    ), edges AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2
      FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING count(*) >= {min_shared}
    ), sym AS (
      SELECT id1 AS a, id2 AS b FROM edges
      UNION
      SELECT id2, id1 FROM edges
    ), reach(node, r) AS (
      SELECT a, a FROM sym
      UNION
      SELECT s.a, reach.r FROM sym s JOIN reach ON s.b = reach.node
    ), comp AS (
      SELECT node, min(r) AS component FROM reach GROUP BY node
    )
    SELECT doc_id
    FROM documents
    WHERE doc_id NOT IN (SELECT node FROM comp WHERE component <> node)
    ORDER BY doc_id
    """


@query("dedup_winnow_resolve", oracle=_winnow_resolve_oracle())
def dedup_winnow_resolve(spark, sf_dir):
    """End-to-end MOSS dedup: winnowing pairs -> connected components ->
    one canonical doc per cluster (min id), unpaired docs pass through.
    The resolution itself is a broadcast anti-join — zero corpus shuffle."""
    from ..operators import dedup

    d = load(spark, sf_dir, "documents")
    pairs = text.winnow_pairs(d, "text", "doc_id", min_shared=15, max_df=30)
    return (
        dedup.resolve_duplicates(d, pairs.select("id1", "id2"), "doc_id")
        .select("doc_id")
        .orderBy("doc_id")
    )


@query("text_winnow", oracle=_winnow_oracle())
def text_winnow(spark, sf_dir):
    """Winnowing fingerprints (MOSS): local rolling-hash minima — any
    shared substring of >= window+k-1 chars between two docs shares a
    fingerprint. Summarized per doc so the contract stays compact."""
    d = load(spark, sf_dir, "documents")
    fps = text.winnow_fingerprints(d, "text", "doc_id", k=8, window=4)
    return (
        fps.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_fps"),
            F.sum("fingerprint").alias("fp_sum"),
            F.min("fingerprint").alias("fp_min"),
            F.max("fingerprint").alias("fp_max"),
        )
        .orderBy("doc_id")
    )


@query("layout_zorder", oracle=_zorder_oracle(bits=8))
def layout_zorder(spark, sf_dir):
    """Z-order (Morton) clustering key over (l_partkey, l_suppkey): the
    multi-column layout key that makes stride min/max stats prune
    predicates on EITHER column after a one-time rewrite. Pure bigint
    projection; the min/max pass is a broadcast-sized aggregate."""
    li = load(spark, sf_dir, "lineitem")
    keyed = layout.add_zorder_key(li, ["l_partkey", "l_suppkey"], bits=8)
    return (
        keyed.select("l_orderkey", "l_linenumber", "zkey")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(200)
    )


@query(
    "sample_temperature",
    # keep rate per lang = (n_min / n_lang)^(1-alpha); the keyed-md5 keep
    # decision replays via md5_number_upper in double precision
    oracle="""
    WITH counts AS (
      SELECT lang, count(*) AS n FROM documents GROUP BY lang
    ), nm AS (
      SELECT min(n) AS nmin FROM counts
    ), rates AS (
      SELECT lang, pow(CAST(nmin AS DOUBLE) / n, 0.5) AS rate
      FROM counts, nm
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE CAST(md5_number_upper('temp|' || CAST(d.doc_id AS VARCHAR))
               AS DOUBLE) / 1.8446744073709552e19 < r.rate
    ORDER BY d.doc_id
    """,
)
def sample_temperature(spark, sf_dir):
    """Temperature-balanced corpus rebalancing over the skewed lang column
    (alpha=0.5): smallest language kept whole, larger ones thinned toward
    uniform — deterministic, shuffle-free on the corpus side."""
    d = load(spark, sf_dir, "documents")
    out = sampling.temperature_sample(d, "lang", ["doc_id"], alpha=0.5)
    return out.select("doc_id", "lang").orderBy("doc_id")


@query(
    "events_gap_fill",
    # dense per-user daily grid between first and last activity; observed
    # daily sums accumulate as integer cents so the forward fill is
    # float-order independent in both engines
    oracle="""
    WITH obs AS (
      SELECT user_id AS u, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS day_cents
      FROM events GROUP BY 1, 2
    ), span AS (
      SELECT u, min(day) AS d0, max(day) AS d1 FROM obs GROUP BY u
    ), grid AS (
      SELECT u, CAST(gs AS DATE) AS day
      FROM span, UNNEST(generate_series(CAST(d0 AS TIMESTAMP),
                                        CAST(d1 AS TIMESTAMP),
                                        INTERVAL 1 DAY)) AS t(gs)
    )
    SELECT g.u AS user_id, g.day AS day,
           last_value(o.day_cents IGNORE NULLS) OVER (
             PARTITION BY g.u ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_cents,
           o.day_cents IS NOT NULL AS is_observed
    FROM grid g LEFT JOIN obs o ON g.u = o.u AND g.day = o.day
    ORDER BY user_id, g.day
    """,
)
def events_gap_fill(spark, sf_dir):
    """Resample every user's activity to a dense daily grid and forward-fill
    the most recent observed daily total across gaps. Grid size is bounded
    by users x calendar span, never by event volume."""
    e = load(spark, sf_dir, "events")
    return events.gap_fill_daily(e).orderBy("user_id", "day")


@query(
    "text_line_dedup",
    # 12-word chunks stand in for lines (the synthetic corpus has no
    # newlines); chunks appearing in >2 documents are boilerplate and are
    # dropped before reassembly
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), c AS (
      SELECT doc_id, CAST(i AS INT) AS idx,
             array_to_string(ws[(i*12+1):(i*12+12)], ' ') AS chunk
      FROM w, UNNEST(range(CAST(ceil(len(ws) / 12.0) AS BIGINT))) AS t(i)
    ), d AS (
      SELECT chunk, count(DISTINCT doc_id) AS chunk_df FROM c GROUP BY chunk
    )
    SELECT c.doc_id,
           count(*) AS n_total,
           count(*) FILTER (WHERE chunk_df <= 2) AS n_kept,
           coalesce(string_agg(c.chunk, ' ' ORDER BY c.idx)
                      FILTER (WHERE chunk_df <= 2), '') AS clean_text
    FROM c JOIN d USING (chunk)
    GROUP BY c.doc_id
    ORDER BY doc_id
    """,
)
def text_line_dedup(spark, sf_dir):
    """RefinedWeb-style cross-corpus line dedup with document reassembly:
    drop any 12-word chunk that appears in more than 2 documents, keep the
    rest in original order. Hot boilerplate chunks stay scalar counters in
    the df pass, so no key can blow up a task."""
    docs = load(spark, sf_dir, "documents")
    return text.line_dedup(
        docs, chunk_words=12, max_df=2
    ).orderBy("doc_id")


@query(
    "text_quality_calibrated",
    # per-source top-20% cut on integer word count; the keep decision is
    # rank <= ceil(20*n/100) in integer arithmetic with doc_id tiebreak,
    # so both engines cut at exactly the same row
    oracle="""
    WITH scored AS (
      SELECT doc_id, source,
             CAST(len(list_filter(string_split(lower(text), ' '),
                                  w -> w <> '')) AS INTEGER) AS score
      FROM documents
    ), ranked AS (
      SELECT doc_id, source, score,
             CAST(row_number() OVER (
               PARTITION BY source ORDER BY score DESC, doc_id ASC
             ) AS INTEGER) AS src_rank,
             count(*) OVER (PARTITION BY source) AS n
      FROM scored
    )
    SELECT doc_id, source, score, src_rank,
           src_rank <= (20 * n + 99) // 100 AS kept
    FROM ranked
    ORDER BY doc_id
    """,
)
def text_quality_calibrated(spark, sf_dir):
    """Per-source quality calibration: keep the top 20% of each source by
    word count instead of one global threshold, so no domain is emptied
    or over-represented."""
    docs = load(spark, sf_dir, "documents")
    return (
        text.per_source_quality_rank(docs, keep_pct=20)
        .select(
            "doc_id", "source", "score",
            F.col("src_rank").cast("int").alias("src_rank"), "kept",
        )
        .orderBy("doc_id")
    )


@query(
    "entity_fuzzy_match",
    # shared-token blocking (a pair must agree on >=1 whitespace token)
    # then levenshtein verify — both engines use the same builtin
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part),
    t AS (SELECT p_name, unnest(string_split(p_name, ' ')) AS tok
          FROM names),
    cand AS (
      SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
      FROM t a JOIN t b ON a.tok = b.tok AND a.p_name < b.p_name
    )
    SELECT name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS INTEGER) AS dist
    FROM cand
    WHERE levenshtein(name_a, name_b) <= 4
    ORDER BY name_a, name_b
    """,
)
def entity_fuzzy_match(spark, sf_dir):
    """Entity-resolution fuzzy self-join over part names: distinct-first,
    token-blocked candidate pairs, edit-distance <= 4 verification."""
    p = load(spark, sf_dir, "part")
    return text.fuzzy_match_names(p, "p_name", max_distance=4).orderBy(
        "name_a", "name_b"
    )


def _pagerank_oracle(iterations: int = 3) -> str:
    """Unrolled-CTE DuckDB replay of operators/graph.py::pagerank_fixed_point:
    identical integer fixed-point formula per iteration (rank DIV degree
    messages, 15% base + 85% damped floored sum), generated for the same
    iteration count so the replay is bit-exact."""
    parts = ["""
    WITH e AS (
      SELECT DISTINCT CAST(o.o_custkey AS BIGINT) AS src,
             1000000000 + CAST(l.l_suppkey AS BIGINT) AS dst
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), sym AS (
      SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e
    ), deg AS (
      SELECT src AS node, count(*) AS deg FROM sym GROUP BY src
    ), r0 AS (
      SELECT node, CAST(1000000 AS BIGINT) AS r FROM deg
    )"""]
    for i in range(1, iterations + 1):
        parts.append(f""", r{i} AS (
      SELECT s.dst AS node,
             CAST(150000 + (85 * sum(r.r // d.deg)) // 100 AS BIGINT) AS r
      FROM sym s
      JOIN r{i - 1} r ON s.src = r.node
      JOIN deg d ON s.src = d.node
      GROUP BY s.dst
    )""")
    parts.append(f"""
    SELECT node, r AS rank_fp FROM r{iterations} ORDER BY node""")
    return "".join(parts)


@query("graph_pagerank", oracle=_pagerank_oracle(3))
def graph_pagerank(spark, sf_dir):
    """Fixed-point PageRank (3 iterations) over the customer<->supplier
    interaction graph: an iterative pregel-shaped algorithm whose integer
    arithmetic makes every iteration bit-replayable in SQL."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    # raw pair stream: the distinct shuffle removed only ~2% of rows at
    # this graph's density, so dedup is delegated to pagerank_fixed_point
    # (numpy pass on the local path, the same distinct on the
    # distributed path — optimization round 12, guide §2.4)
    edges = graph.bipartite_edges(o, l, distinct=False)
    # (customer, supplier) pairs <= lineitem rows, and the row
    # count is free from the parquet footer — a sound edge-count bound
    # that lets the small-graph gate skip its persist+count probe
    bound = _parquet_rows(sf_dir, "lineitem")
    return graph.pagerank_fixed_point(
        edges, iterations=3, edge_count_bound=bound, dedup_edges=True
    ).orderBy("node")


@query(
    "pipeline_dataset_diff",
    # v2 is derived deterministically from v1 (drop doc_id%7=0, uppercase
    # doc_id%5=0, add doc_id%11=0 under shifted ids) so both engines diff
    # the identical pair of snapshots
    oracle="""
    WITH v1 AS (SELECT doc_id, text FROM documents),
    v2 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN upper(text) ELSE text END AS text
      FROM documents WHERE doc_id % 7 <> 0
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 11 = 0
    )
    SELECT status, count(*) AS n_rows FROM (
      SELECT CASE WHEN a.doc_id IS NULL THEN 'added'
                  WHEN b.doc_id IS NULL THEN 'removed'
                  WHEN md5(a.text) <> md5(b.text) THEN 'changed'
                  ELSE 'same' END AS status
      FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id
    ) GROUP BY status ORDER BY status
    """,
)
def pipeline_dataset_diff(spark, sf_dir):
    """Snapshot diff between two dataset versions: each side reduces to
    (key, md5(payload)) in the scan, the full-outer join exchanges 16-byte
    hashes instead of payloads, and four counters summarize the delta."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    v2 = (
        d.where(F.col("doc_id") % 7 != 0)
        .withColumn(
            "text",
            F.when(F.col("doc_id") % 5 == 0, F.upper("text"))
            .otherwise(F.col("text")),
        )
        .unionAll(
            d.where(F.col("doc_id") % 11 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
    )
    return curation.dataset_diff(d, v2, "doc_id", ["text"]).orderBy("status")


@query(
    "events_gap_interpolate",
    # missing days get prev + (next-prev)*elapsed // span in integer cents
    # (floored), observed days keep their exact sum — bit-stable in both
    # engines; grid boundaries are observed so prev/next always exist
    oracle="""
    WITH obs AS (
      SELECT user_id AS u, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS day_cents
      FROM events GROUP BY 1, 2
    ), span AS (
      SELECT u, min(day) AS d0, max(day) AS d1 FROM obs GROUP BY u
    ), grid AS (
      SELECT u, CAST(gs AS DATE) AS day
      FROM span, UNNEST(generate_series(CAST(d0 AS TIMESTAMP),
                                        CAST(d1 AS TIMESTAMP),
                                        INTERVAL 1 DAY)) AS t(gs)
    ), j AS (
      SELECT g.u, g.day AS day, o.day_cents,
             last_value(o.day_cents IGNORE NULLS) OVER wb AS pv,
             last_value(CASE WHEN o.day_cents IS NOT NULL THEN g.day END
                        IGNORE NULLS) OVER wb AS pd,
             first_value(o.day_cents IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN o.day_cents IS NOT NULL THEN g.day END
                         IGNORE NULLS) OVER wf AS nd
      FROM grid g LEFT JOIN obs o ON g.u = o.u AND g.day = o.day
      WINDOW wb AS (PARTITION BY g.u ORDER BY g.day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY g.u ORDER BY g.day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT u AS user_id, day,
           CAST(coalesce(day_cents,
                pv + ((nv - pv) * date_diff('day', pd, day))
                     // date_diff('day', pd, nd)) AS BIGINT) AS filled_cents,
           day_cents IS NOT NULL AS is_observed
    FROM j
    ORDER BY user_id, day
    """,
)
def events_gap_interpolate(spark, sf_dir):
    """Resample to a dense daily grid with linear interpolation across the
    gaps (integer-cent arithmetic, floored division — exact in any
    engine)."""
    e = load(spark, sf_dir, "events")
    return events.gap_fill_interpolate(e).orderBy("user_id", "day")


@query(
    "events_changepoint",
    # classic offline CUSUM estimator, cross-multiplied by n so the whole
    # statistic is integer cents: argmax_i |n*S_i - i*S_n| per group,
    # earliest index on ties; (ts, event_id) ordering is total
    oracle="""
    WITH s AS (
      SELECT event_type, ts AS cp_ts,
             CAST(row_number() OVER w AS BIGINT) AS i,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS s_i,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
               PARTITION BY event_type) AS BIGINT) AS s_n,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ), d AS (
      SELECT event_type, cp_ts, i,
             abs(n * s_i - i * s_n) AS d_stat,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY abs(n * s_i - i * s_n) DESC, i ASC)
               AS rn
      FROM s
    )
    SELECT event_type, i AS cp_index, cp_ts, CAST(d_stat AS BIGINT) AS d_stat
    FROM d WHERE rn = 1
    ORDER BY event_type
    """,
)
def events_changepoint(spark, sf_dir):
    """Per-event-type CUSUM changepoint: the time index maximizing the
    integer cumulative-sum deviation statistic — one window sort per
    group, O(1) state, bit-exact. The operator computes d_stat in
    decimal(38,0) (overflow-safe at 100 TB); the bigint cast here is
    display-only and safe at test scale."""
    e = load(spark, sf_dir, "events")
    return (
        events.cusum_changepoint(e)
        .select(
            "event_type",
            "cp_index",
            "cp_ts",
            F.col("d_stat").cast("bigint").alias("d_stat"),
        )
        .orderBy("event_type")
    )


@query(
    "orders_itemsets",
    # frequent 2-itemsets with support >= 3 distinct orders; per-order pair
    # fanout is bounded by order size (TPC-H <= 7 lines), so candidate
    # volume is linear in lineitems, never quadratic in parts
    oracle="""
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           count(DISTINCT a.l_orderkey) AS support
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(DISTINCT a.l_orderkey) >= 3
    ORDER BY support DESC, part_a, part_b
    """,
)
def orders_itemsets(spark, sf_dir):
    """Market-basket frequent 2-itemsets: part pairs co-purchased in >= 3
    distinct orders. ONE shuffle (basket assembly by order key), then the
    pair candidates are generated map-side from each order's sorted
    distinct-part array — every order emits each pair at most once, so
    support is a plain combinable count(*), not a count-distinct. Fanout
    per order is bounded by basket size (TPC-H <= 7 lines): candidate
    volume stays linear in lineitems, never quadratic in parts. Replaces
    the earlier order-key-equi self-join + countDistinct shape (two
    shuffled scan sides and a distinct-expand agg): 2.5s -> 1.55s at
    sf0.1, value-identical."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    sets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    pairs = sets.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) ->"
                " transform(slice(ps, i + 2, size(ps)),"
                " y -> struct(x AS part_a, y AS part_b))))"
            )
        ).alias("p")
    ).select("p.part_a", "p.part_b")
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= 3)
        .orderBy(F.desc("support"), "part_a", "part_b")
    )


@query(
    "graph_triangles",
    # total triangle count is orientation-invariant, so the oracle counts
    # with plain id-ordering while the engine uses the degree-ordered
    # orientation (the O(|E|^1.5) scale shape) — both count each triangle
    # exactly once
    oracle="""
    WITH ab AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM lineitem a
      JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(DISTINCT a.l_orderkey) >= 2
    )
    SELECT count(*) AS n_triangles
    FROM ab e1
    JOIN ab e2 ON e2.pa = e1.pa AND e2.pb > e1.pb
    JOIN ab e3 ON e3.pa = e1.pb AND e3.pb = e2.pb
    """,
)
def graph_triangles(spark, sf_dir):
    """Exact triangle count of the co-purchase graph (parts co-bought in
    >= 2 orders) via operators/graph.py::triangle_count — the
    degree-ordered compact-forward algorithm, whose wedge volume is
    bounded O(|E|^1.5) on ANY graph (a 10^7-degree hub cannot go
    quadratic). Community-density primitive for affinity graphs."""
    from ..operators.graph import triangle_count

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    sets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    pairs = sets.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) ->"
                " transform(slice(ps, i + 2, size(ps)),"
                " y -> struct(x AS part_a, y AS part_b))))"
            )
        ).alias("p")
    ).select("p.part_a", "p.part_b")
    edges = (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("s_ab"))
        .where(F.col("s_ab") >= 2)
        .select(F.col("part_a").alias("src"), F.col("part_b").alias("dst"))
    )
    return triangle_count(edges)


@query(
    "events_forecast",
    # seasonal-naive baseline (prediction = same hour yesterday) evaluated
    # as exact integer MAE-ppm per event type — the forecast-eval shape:
    # hourly counts are one combinable aggregate; the 24h-lag lookup is an
    # equi-join on (type, hour) carrying |types x hours| rows (bounded by
    # calendar span, never event volume)
    oracle="""
    WITH h AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
             count(*) AS c
      FROM events GROUP BY 1, 2
    )
    SELECT a.event_type,
           count(*) AS n_hours,
           CAST(sum(abs(a.c - b.c)) AS BIGINT) AS sum_abs_err,
           CAST((sum(abs(a.c - b.c)) * 1000000) // count(*) AS BIGINT)
             AS mae_ppm
    FROM h a JOIN h b
      ON a.event_type = b.event_type AND b.hr = a.hr - INTERVAL 24 HOUR
    GROUP BY 1 ORDER BY 1
    """,
)
def events_forecast(spark, sf_dir):
    """Seasonal-naive forecast baseline evaluation: predict each hour's
    event count with the same hour 24h earlier and score per-type MAE in
    exact integer ppm — the sanity bar every real forecasting model must
    beat, computable at any scale because everything after the hourly
    pre-aggregate is calendar-bounded."""
    e = load(spark, sf_dir, "events")
    h = (
        e.select(
            "event_type",
            F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("hr"),
        )
        .groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    a = h.alias("a")
    b = h.alias("b")
    joined = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.hr") == F.col("a.hr") - F.expr("INTERVAL 24 HOURS")),
    )
    err = F.abs(F.col("a.c") - F.col("b.c"))
    return (
        joined.groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum(err).alias("sum_abs_err"),
        )
        .select(
            "event_type",
            "n_hours",
            "sum_abs_err",
            F.expr("(sum_abs_err * 1000000) DIV n_hours").alias("mae_ppm"),
        )
        .orderBy("event_type")
    )


@query(
    "orders_rules",
    # association rules over the >= 3-support 2-itemsets, both directions;
    # confidence and lift in exact integer ppm (lift cross-multiplied in
    # HUGEINT/decimal so 100 TB-scale counts cannot wrap)
    oracle="""
    WITH ab AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(DISTINCT a.l_orderkey) AS s_ab
      FROM lineitem a
      JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(DISTINCT a.l_orderkey) >= 3
    ), items AS (
      SELECT l_partkey AS part, count(DISTINCT l_orderkey) AS sup
      FROM lineitem GROUP BY 1
    ), total AS (
      SELECT count(DISTINCT l_orderkey) AS n_orders FROM lineitem
    ), sym AS (
      SELECT part_a AS ant, part_b AS cons, s_ab FROM ab
      UNION ALL
      SELECT part_b, part_a, s_ab FROM ab
    )
    SELECT ant, cons, s_ab,
           CAST((s_ab * 1000000) // ia.sup AS BIGINT) AS conf_ppm,
           CAST((CAST(s_ab AS HUGEINT) * n_orders * 1000000)
                // (CAST(ia.sup AS HUGEINT) * ic.sup) AS BIGINT) AS lift_ppm
    FROM sym
    JOIN items ia ON ia.part = sym.ant
    JOIN items ic ON ic.part = sym.cons, total
    ORDER BY conf_ppm DESC, ant, cons
    """,
)
def orders_rules(spark, sf_dir):
    """Association rules from the frequent 2-itemsets (a -> b AND b -> a):
    confidence = s(ab)/s(a) and lift = s(ab)·N / (s(a)·s(b)), both as
    exact integer ppm — the recommendation/affinity primitive on top of
    orders_itemsets. Same one-shuffle basket assembly; item supports are
    one combinable aggregate over the exploded sets (each order counts
    once by construction); the two support lookups join on the part key
    (AQE broadcasts the item table when it is small); the lift
    cross-product runs in decimal(38,0) so 10^10-order corpora cannot
    wrap int64."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    sets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    ).persist()
    pairs = sets.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) ->"
                " transform(slice(ps, i + 2, size(ps)),"
                " y -> struct(x AS part_a, y AS part_b))))"
            )
        ).alias("p")
    ).select("p.part_a", "p.part_b")
    ab = (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("s_ab"))
        .where(F.col("s_ab") >= 3)
    )
    items = (
        sets.select(F.explode("ps").alias("part"))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("sup"))
    )
    n_orders = sets.agg(F.count(F.lit(1)).alias("n_orders"))
    sym = ab.select(
        F.col("part_a").alias("ant"), F.col("part_b").alias("cons"), "s_ab"
    ).unionByName(
        ab.select(
            F.col("part_b").alias("ant"), F.col("part_a").alias("cons"), "s_ab"
        )
    )
    ia = items.select(F.col("part").alias("ant"), F.col("sup").alias("sup_a"))
    ic = items.select(F.col("part").alias("cons"), F.col("sup").alias("sup_c"))
    result = (
        sym.join(ia, "ant")
        .join(ic, "cons")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "ant",
            "cons",
            "s_ab",
            F.expr("(s_ab * 1000000) DIV sup_a").alias("conf_ppm"),
            F.expr(
                "CAST((CAST(s_ab AS DECIMAL(38,0)) * n_orders * 1000000)"
                " DIV (CAST(sup_a AS DECIMAL(38,0)) * sup_c) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.desc("conf_ppm"), "ant", "cons")
        .localCheckpoint(eager=True)
    )
    sets.unpersist()
    return result


@query(
    "events_markov",
    # first-order transition matrix over each user's time-ordered event
    # types; probability in exact parts-per-million via integer DIV
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS next_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), t AS (
      SELECT prev_type, next_type, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n,
           CAST((n * 1000000) // sum(n) OVER (PARTITION BY prev_type)
                AS BIGINT) AS prob_ppm
    FROM t
    ORDER BY prev_type, next_type
    """,
)
def events_markov(spark, sf_dir):
    """First-order Markov transition matrix of user event sequences — the
    user-journey primitive. One window lag per user, one combinable count;
    probabilities emitted as integer parts-per-million so the matrix is
    bit-exact."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    t = seq.groupBy("prev_type", "next_type").agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy("prev_type")
    return t.select(
        "prev_type",
        "next_type",
        "n",
        F.expr("n * 1000000").cast("bigint").alias("_num"),
    ).withColumn(
        "prob_ppm", F.expr("_num DIV sum(n) OVER (PARTITION BY prev_type)")
    ).select("prev_type", "next_type", "n", "prob_ppm").orderBy(
        "prev_type", "next_type"
    )


@query(
    "q44_ratio_to_parent",
    # nation revenue as exact ppm share of its region's total: integer
    # cents, integer DIV — the ratio-to-parent analytic without floats
    oracle="""
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    )
    SELECT region, nation, cents,
           CAST((cents * 1000000) // sum(cents) OVER (PARTITION BY region)
                AS BIGINT) AS share_ppm
    FROM rev
    ORDER BY region, nation
    """,
)
def q44_ratio_to_parent(spark, sf_dir):
    """Ratio-to-parent analytic: each nation's exact ppm share of its
    region's revenue. Fixed dims (nation/region) broadcast; customer GROWS
    with scale factor (150k rows/sf), so no forced broadcast there — AQE
    picks broadcast vs shuffle join by actual size. One combinable
    aggregate + one small window over the 25-row result."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(cents).alias("cents"))
    )
    return rev.withColumn(
        "share_ppm",
        F.expr("(cents * 1000000) DIV sum(cents) OVER (PARTITION BY region)"),
    ).orderBy("region", "nation")


@query(
    "events_attribution",
    # last-touch attribution: each purchase credits the latest preceding
    # click/view by the same user within 24h, else 'none'. One window pass,
    # no join; (ts, event_id) makes the order total in both engines.
    oracle="""
    WITH tagged AS (
      SELECT user_id, event_type, ts, event_id,
             last_value(CASE WHEN event_type IN ('click', 'view') THEN ts END
                        IGNORE NULLS) OVER w AS touch_ts,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN event_type END IGNORE NULLS) OVER w
               AS touch_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT CASE WHEN touch_ts IS NOT NULL
                     AND ts - touch_ts <= INTERVAL 24 HOURS
                THEN touch_type ELSE 'none' END AS attributed,
           count(*) AS conversions,
           count(DISTINCT user_id) AS users
    FROM tagged WHERE event_type = 'purchase'
    GROUP BY 1
    ORDER BY attributed
    """,
)
def events_attribution(spark, sf_dir):
    """Marketing-style last-touch attribution: purchases credited to the
    most recent click/view touch within 24 hours — one window sort per
    user carries the last touch forward, so there is NO self-join and the
    whole pass is a single shuffle."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_touch = F.col("event_type").isin("click", "view")
    tagged = e.select(
        "user_id",
        "event_type",
        "ts",
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_ts"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
    ).where(F.col("event_type") == "purchase")
    attributed = F.when(
        F.col("touch_ts").isNotNull()
        & (F.col("ts") <= F.col("touch_ts") + F.expr("INTERVAL 24 HOURS")),
        F.col("touch_type"),
    ).otherwise(F.lit("none"))
    return (
        tagged.select(attributed.alias("attributed"), "user_id")
        .groupBy("attributed")
        .agg(
            F.count(F.lit(1)).alias("conversions"),
            F.count_distinct("user_id").alias("users"),
        )
        .orderBy("attributed")
    )


@query(
    "events_rolling_median",
    # exact rolling median (x2, to stay integer) of the per-user daily
    # cents over a 7-day centered ROWS frame: both engines sort the frame
    # list and sum the two central elements — no interpolation floats
    oracle="""
    WITH obs AS (
      SELECT user_id AS u, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS day_cents
      FROM events GROUP BY 1, 2
    ), f AS (
      SELECT u, day,
             list_sort(list(day_cents) OVER (
               PARTITION BY u ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS frame
      FROM obs
    )
    SELECT u AS user_id, day,
           CAST(frame[(len(frame) + 1) // 2]
                + frame[(len(frame) + 2) // 2] AS BIGINT) AS median_x2,
           CAST(len(frame) AS INTEGER) AS frame_n
    FROM f
    ORDER BY user_id, day
    """,
)
def events_rolling_median(spark, sf_dir):
    """Exact rolling median of daily spend per user (7-day centered
    frame), reported as 2x-median so even frames stay integral. The frame
    collect is bounded at 7 elements per row — O(1) state, one window
    sort per user; the robust-rolling-statistics shape approx sketches
    can't replace when exactness is contractual."""
    e = load(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    obs = (
        e.select(F.col("user_id").alias("u"), day.alias("day"), cents.alias("c"))
        .groupBy("u", "day")
        .agg(F.sum("c").alias("day_cents"))
    )
    w = Window.partitionBy("u").orderBy("day").rowsBetween(-3, 3)
    f = obs.select(
        "u", "day", F.array_sort(F.collect_list("day_cents").over(w)).alias("frame")
    )
    n = F.size("frame")
    return f.select(
        F.col("u").alias("user_id"),
        "day",
        (
            F.element_at("frame", ((n + 1) / 2).cast("int"))
            + F.element_at("frame", ((n + 2) / 2).cast("int"))
        ).alias("median_x2"),
        n.alias("frame_n"),
    ).orderBy("user_id", "day")


@query(
    "text_novelty",
    # per-doc novelty: fraction (ppm) of its 8-grams whose FIRST occurrence
    # (min doc_id) is this doc — the corpus-diversity / memorization-risk
    # report. Duplicate grams within a doc count each occurrence, exactly
    # as the Spark plan does.
    oracle="""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
      FROM documents
    ), g AS (
      SELECT doc_id,
             array_to_string(ws[i:i+7], ' ') AS gram
      FROM w, UNNEST(range(1, greatest(len(ws) - 6, 1))) AS t(i)
      WHERE len(ws) >= 8
    ), first AS (
      SELECT gram, min(doc_id) AS first_id FROM g GROUP BY gram
    )
    SELECT g.doc_id,
           count(*) AS n_grams,
           count(*) FILTER (WHERE f.first_id = g.doc_id) AS n_novel,
           CAST((count(*) FILTER (WHERE f.first_id = g.doc_id) * 1000000)
                // count(*) AS BIGINT) AS novelty_ppm
    FROM g JOIN first f USING (gram)
    GROUP BY g.doc_id
    ORDER BY g.doc_id
    """,
)
def text_novelty(spark, sf_dir):
    """Corpus novelty report: for every document, the ppm fraction of its
    8-grams that first appear (by min doc_id) in that document.

    Skew-safe shape: NO gram-partitioned window (a hot boilerplate gram
    would put all its occurrences in one task). Instead the gram stream is
    pre-aggregated to (doc_id, gram, cnt) — map-side combinable — the
    first-occurrence table is a combinable min keyed by gram, and the two
    meet in an equi-join on gram that AQE's skew-join splits if a gram is
    hot. Every aggregate here has a partial stage; no key ever pins a
    whole task."""
    # fan the docs across cores when the scan arrives as a single
    # unsplittable file
    d = fan_out(load(spark, sf_dir, "documents"), "doc_id")
    g = text.word_ngrams(d, "text", "doc_id", n=8)
    # ONE tokenize pass (optimization round 12, guide §2.4): the per-doc
    # counts and the first-occurrence table both consume the gram stream,
    # and without a shared exchange each consumer re-evaluated the 8-gram
    # explode — two full corpus tokenizations (two Generate nodes in the
    # old plan). The explicit gram-keyed exchange over the RAW (doc_id,
    # gram) pairs is a subplan both consumers sit directly above, and its
    # columns are exactly {partition key, a column every branch consumes}
    # — nothing branch-specific column pruning could specialize away — so
    # Spark's ReuseExchange collapses the two instances: tokenize runs
    # once, the shuffle is written once and read twice. Both aggregates
    # and the gram equi-join are satisfied by this partitioning (gram is
    # a subset of each grouping key), so no further gram exchange exists.
    # Skew stays bounded: one gram contributes at most one row per
    # containing document to its partition (8-gram repeats within a doc
    # are rare), so even a gram present in EVERY document adds ~n_docs
    # rows to one partition — a few percent of a partition's share when
    # documents carry hundreds of grams — and both aggregates stream
    # (no per-gram collection anywhere); the join remains
    # AQE-skew-splittable exactly as before.
    g = g.repartition("gram")
    per_doc = g.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    first = g.groupBy("gram").agg(F.min("doc_id").alias("first_id"))
    novel_cnt = F.sum(
        F.when(F.col("first_id") == F.col("doc_id"), F.col("cnt")).otherwise(
            F.lit(0)
        )
    )
    return (
        per_doc.join(first, "gram")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_grams"),
            novel_cnt.alias("n_novel"),
            F.expr(
                "(sum(CASE WHEN first_id = doc_id THEN cnt ELSE 0 END)"
                " * 1000000) DIV sum(cnt)"
            ).alias("novelty_ppm"),
        )
        .orderBy("doc_id")
    )


@query(
    "events_cohort_ltv",
    # cumulative revenue (integer cents) per signup-week cohort across
    # week offsets — the LTV curve; offsets are exact multiples of 7 days
    oracle="""
    WITH cohort AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cw
      FROM events GROUP BY user_id
    ), rev AS (
      SELECT c.cw,
             CAST(date_diff('day', c.cw,
                            CAST(date_trunc('week', e.ts) AS DATE)) / 7
                  AS BIGINT) AS wk,
             CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events e JOIN cohort c ON e.user_id = c.user_id
      GROUP BY 1, 2
    )
    SELECT cw AS cohort_week, wk AS week_offset,
           CAST(sum(cents) OVER (PARTITION BY cw ORDER BY wk
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_cents
    FROM rev
    ORDER BY cohort_week, week_offset
    """,
)
def events_cohort_ltv(spark, sf_dir):
    """Cohort LTV curve: cumulative integer-cent revenue by signup-week
    cohort and week offset. One combinable aggregate plus a prefix sum
    over the tiny cohort x offset frame."""
    e = load(spark, sf_dir, "events")
    cw = F.date_trunc("week", F.col("ts")).cast("date")
    cohort = e.groupBy("user_id").agg(
        F.min(cw).alias("cw")
    )
    cents = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    rev = (
        e.join(cohort, "user_id")
        .groupBy(
            "cw",
            (F.datediff(cw, F.col("cw")) / 7).cast("bigint").alias("wk"),
        )
        .agg(F.sum(cents).alias("cents"))
    )
    w = (
        Window.partitionBy("cw")
        .orderBy("wk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return rev.select(
        F.col("cw").alias("cohort_week"),
        F.col("wk").alias("week_offset"),
        F.sum("cents").over(w).alias("cum_cents"),
    ).orderBy("cohort_week", "week_offset")


@query(
    "interval_join",
    # the bucketed equi-join + dedup condition must equal the PLAIN overlap
    # join — bucketing is an execution strategy, never a semantics change
    oracle="""
    WITH a AS (
      SELECT event_id AS a_id, epoch_us(ts) // 1000000 AS lo,
             epoch_us(ts) // 1000000 + 300 AS hi
      FROM events WHERE event_type = 'click'
    ),
    b AS (
      SELECT event_id AS b_id, epoch_us(ts) // 1000000 AS lo,
             epoch_us(ts) // 1000000 + 300 AS hi
      FROM events WHERE event_type = 'purchase'
    )
    SELECT a.a_id, b.b_id,
           CAST(least(a.hi, b.hi) - greatest(a.lo, b.lo) AS BIGINT) AS ovl_s
    FROM a JOIN b ON a.lo <= b.hi AND b.lo <= a.hi
    ORDER BY a_id, b_id
    """,
)
def interval_join(spark, sf_dir):
    """Interval-overlap join (operators/rangejoin.py::interval_overlap_join):
    click attention windows [ts, ts+300s] joined to purchase windows that
    overlap them. Both sides burst to 600s buckets and meet in an EQUI-join
    (never a nested loop); the max(lo)-bucket condition emits each pair
    exactly once with no distinct. Oracle is the plain quadratic join —
    bucketing must be invisible in the result."""
    from ..operators.rangejoin import interval_overlap_join

    e = load(spark, sf_dir, "events")
    sec = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    ).cast("bigint")
    a = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("a_id"), sec.alias("lo"), (sec + 300).alias("hi")
    )
    b = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("b_id"), sec.alias("lo"), (sec + 300).alias("hi")
    )
    j = interval_overlap_join(a, b, "lo", "hi", 600)
    return j.select(
        "a_id",
        F.col("b_id_r").alias("b_id"),
        (
            F.least(F.col("hi"), F.col("hi_r"))
            - F.greatest(F.col("lo"), F.col("lo_r"))
        ).cast("bigint").alias("ovl_s"),
    ).orderBy("a_id", "b_id")


@query(
    "graph_communities",
    # synchronous majority-vote label propagation, 2 rounds, unrolled:
    # (count desc, label asc) winner per node each round — the same
    # integer tie-break the operator's max(struct(cnt, -label)) computes
    oracle="""
    WITH edges AS (
      SELECT DISTINCT o_custkey AS src,
             l_suppkey + 1000000000 AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    sym AS (
      SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
    v1 AS (
      SELECT s.src AS node, l.label, count(*) AS c
      FROM sym s JOIN l0 l ON l.node = s.dst GROUP BY 1, 2
    ),
    l1 AS (
      -- symmetric edges: votes cover every node, the winner IS the state
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node
                                  ORDER BY c DESC, label) AS rn
        FROM v1) t WHERE rn = 1
    ),
    v2 AS (
      SELECT s.src AS node, l.label, count(*) AS c
      FROM sym s JOIN l1 l ON l.node = s.dst GROUP BY 1, 2
    ),
    l2 AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node
                                  ORDER BY c DESC, label) AS rn
        FROM v2) t WHERE rn = 1
    )
    SELECT node, label FROM l2 ORDER BY node
    """,
)
def graph_communities(spark, sf_dir):
    """Majority-vote label propagation (operators/graph.py::
    label_propagation), 2 synchronous rounds over the customer<->supplier
    graph — the density-based community detector, a different fixed point
    than connectivity components. Every round is one co-partitioned
    edge-state join + one (node, label) count + one integer-tie-break max,
    so the oracle replays it exactly with unrolled CTEs."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    edges = graph.bipartite_edges(o, l)
    return graph.label_propagation(edges, rounds=2).orderBy("node")
