"""Advanced relational surface: multi-level aggregation (rollup / cube /
grouping sets), exact + sketch percentiles, frame-spec windows, and the
temporal joins (as-of, bounded range).

None of these exist in the reference (SURVEY.md §2.5 "No grouping sets /
cube / rollup / approximate aggregates", §2.4 "No ... range/as-of ...
joins", §2.6 "no frame specs") — they are the built-in/near-built-in
Spark surface a complete engine exposes, each oracle-checked.

Determinism notes: every percentile here is the mergeable
approx_percentile sketch with the accuracy pin from
``functions/sketch.py`` (rank error n/acc < 0.5 — strictly tighter
than the old "accuracy >= row count", which a summary merge can defeat
by one rank), so each quantile degenerates to the exact order
statistic (== DuckDB quantile_disc) at every fixture scale while
staying a true approximate sketch at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.sketch import approx_pctl, approx_pctls
from ..operators.relational import with_global_row_number
from ..operators.temporal import asof_join, range_join_count
from ..registry import query
from ..sources import read_table

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


# --- multi-level aggregation -------------------------------------------------


@query(
    "agg_rollup",
    """
    SELECT l_returnflag,
           l_linestatus,
           CAST(grouping(l_returnflag) + grouping(l_linestatus) AS BIGINT) AS lvl,
           count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): per-group, per-flag subtotal,
    and grand total in one pass. Spark expands grouping sets BEFORE the
    shuffle, so partial aggregation still applies — the shuffle carries
    one row per (set, group), not per input row."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus").agg(
            (F.grouping("l_returnflag") + F.grouping("l_linestatus"))
            .cast("long")
            .alias("lvl"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@query(
    "agg_cube",
    """
    SELECT o_orderstatus,
           o_orderpriority,
           CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
           CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping sets in one shuffle."""
    o = read_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping("o_orderpriority").cast("long").alias("g_priority"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@query(
    "agg_grouping_sets",
    """
    SELECT event_type,
           CAST(user_id % 10 AS BIGINT) AS user_bucket,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL front door (the engine's
    exec_temp_view_sql entry, reference preprocess_and_store_parquets.py:216)
    — by-type totals, by-user-bucket totals, and the grand total without
    re-scanning."""
    read_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_type,
               CAST(user_id % 10 AS BIGINT) AS user_bucket,
               count(*) AS n,
               round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
        """
    )


# --- percentiles: exact + sketch --------------------------------------------


@query(
    "agg_percentiles",
    """
    SELECT event_type,
           round(quantile_disc(value, 0.25), 4) AS p25,
           round(quantile_disc(value, 0.50), 4) AS p50,
           round(quantile_disc(value, 0.90), 4) AS p90,
           round(quantile_disc(value, 0.50), 4) AS p50_sketch,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile profile per event type, all from the mergeable
    approx_percentile sketch (VERDICT r6 #4: the old exact percentile
    holds a value->count map ~ O(rows) for a continuous column on one
    reducer — a 100 TB cliff). Accuracy pinned via functions/sketch.py
    so every quantile degenerates to the exact discrete order statistic
    (== DuckDB quantile_disc) at fixture scale while staying a
    fixed-memory sketch at any scale — the scale path IS the test path.
    p50_sketch is kept as a distinct column for surface compatibility."""
    ev = read_table(spark, sf_dir, "events")
    # ONE sketch per group queried at all ranks (r9,
    # functions/sketch.approx_pctls — was 4 independent summaries)
    qs = approx_pctls("value", (0.25, 0.50, 0.90))
    return (
        ev.groupBy("event_type")
        .agg(qs.alias("qs"), F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            F.round(F.element_at("qs", 1), 4).alias("p25"),
            F.round(F.element_at("qs", 2), 4).alias("p50"),
            F.round(F.element_at("qs", 3), 4).alias("p90"),
            F.round(F.element_at("qs", 2), 4).alias("p50_sketch"),
            "n",
        )
    )


@query("agg_approx_distinct", None)  # HLL sketches differ across engines
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per event type. Rows-only
    check: Spark's HLL and DuckDB's produce different estimates by
    design, so no value oracle exists; tests/test_oracle.py asserts the
    estimate lands within the published 5% rsd bound of the exact count."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.05).cast("long").alias("approx_users"),
    )


# --- frame-spec windows ------------------------------------------------------


@query(
    "win_rolling_stats",
    f"""
    SELECT event_id,
           user_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS avg_4,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 2) AS cum_value,
           strftime(ts, '{_TS_FMT_DUCK}') AS ts_str
    FROM events
    """,
)
def win_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec windows (rowsBetween — absent from the reference,
    SURVEY.md §2.6): 4-row moving average and running total per user.
    One shuffle on user_id serves both frames."""
    ev = read_table(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    w4 = Window.partitionBy("user_id").orderBy(*order).rowsBetween(-3, 0)
    wcum = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w4), 4).alias("avg_4"),
        F.round(F.sum("value").over(wcum), 2).alias("cum_value"),
        F.date_format("ts", _TS_FMT_SPARK).alias("ts_str"),
    )


# --- temporal joins ----------------------------------------------------------


@query(
    "join_asof",
    f"""
    SELECT p.event_id,
           p.user_id,
           strftime(p.ts, '{_TS_FMT_DUCK}') AS purchase_ts,
           strftime(c.ts, '{_TS_FMT_DUCK}') AS last_click_ts,
           CAST(CASE WHEN c.ts IS NULL THEN NULL
                ELSE epoch_ms(p.ts) // 1000 - epoch_ms(c.ts) // 1000 END AS BIGINT)
             AS gap_sec
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest click at or
    before it. Union + last(ignorenulls) window — one shuffle on user_id,
    no range explosion (operators/temporal.py docstring has the scale
    argument). Oracle is DuckDB's native ASOF JOIN."""
    ev = read_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("click_ts"), "event_id")
        .withColumnRenamed("event_id", "click_event_id")
    )
    matched = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        payload=["click_ts"],
        tiebreak="click_event_id",
    )
    return matched.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT_SPARK).alias("purchase_ts"),
        F.date_format("click_ts", _TS_FMT_SPARK).alias("last_click_ts"),
        (F.unix_timestamp("ts") - F.unix_timestamp("click_ts"))
        .cast("long")
        .alias("gap_sec"),
    )


@query(
    "join_range_window",
    """
    SELECT p.event_id,
           p.user_id,
           count(c.event_id) AS n_clicks_10m,
           round(coalesce(sum(c.value), 0), 2) AS click_value_10m
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 10 MINUTE
     AND c.ts < p.ts
    GROUP BY p.event_id, p.user_id
    """,
)
def join_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded range join: clicks in the 10 minutes before each purchase,
    per user. The equi key keeps it a hash join (range is a residual
    filter), so the plan is the same shape at any scale; a keyless range
    join would bucketize to the range width instead."""
    ev = read_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_event_id"),
        F.col("value").alias("c_value"),
    )
    out = range_join_count(
        purchases,
        clicks.withColumnRenamed("c_user_id", "user_id"),
        on=["user_id"],
        left_ts="ts",
        right_ts="c_ts",
        lower=F.expr("INTERVAL 10 MINUTE"),
        upper=F.expr("INTERVAL 0 SECOND"),
        aggs=[
            F.count(F.col("r.c_event_id")).alias("n_clicks_10m"),
            F.round(F.coalesce(F.sum(F.col("r.c_value")), F.lit(0.0)), 2).alias(
                "click_value_10m"
            ),
        ],
    )
    return out.select("event_id", "user_id", "n_clicks_10m", "click_value_10m")


# --- skew handling -----------------------------------------------------------


@query(
    "agg_salted_skew",
    """
    SELECT l_returnflag,
           count(*) AS n,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage aggregation: groupBy(key, salt) partial -> groupBy
    (key) final. With 3 distinct l_returnflag values, a plain groupBy puts
    ~200k rows on 3 reducers; salting spreads each key over 16, then the
    final stage merges 16 tiny partials per key. Same associative result,
    verified by the plain-GROUP-BY oracle. (AQE's skew handling covers
    JOINS; salting is the aggregation-side tool, manual by design.)"""
    li = read_table(spark, sf_dir, "lineitem")
    salted = li.withColumn("__salt", F.pmod(F.col("l_orderkey"), F.lit(16)))
    partial = salted.groupBy("l_returnflag", "__salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum("l_extendedprice").alias("psum"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n"),
        F.round(F.sum("psum"), 2).alias("sum_price"),
    )


# --- scalar expression surface ----------------------------------------------


@query(
    "expr_multiformat_date",
    """
    WITH raw AS (
      SELECT o_orderkey,
             CASE CAST(o_orderkey % 3 AS INT)
               WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
               WHEN 1 THEN strftime(o_orderdate, '%m/%d/%Y %H:%M:%S')
               ELSE strftime(o_orderdate, '%d.%m.%Y %H:%M:%S')
             END AS date_str
      FROM orders
    )
    SELECT o_orderkey,
           date_str,
           strftime(coalesce(
             try_strptime(date_str, '%Y-%m-%d %H:%M:%S'),
             try_strptime(date_str, '%m/%d/%Y %H:%M:%S'),
             try_strptime(date_str, '%d.%m.%Y %H:%M:%S')
           ), '%Y-%m-%d %H:%M:%S') AS parsed
    FROM raw
    """,
)
def expr_multiformat_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-format date parsing — the engine expression behind the ES
    mapping's multi-format Date fields (reference sql_to_es_etl.py:106-109,
    format='M-yyyy||M/d/yyyy...'): coalesce over try_to_timestamp chains,
    first matching format wins, unparseable -> null (never a job abort)."""
    o = read_table(spark, sf_dir, "orders")
    fmts = ["yyyy-MM-dd HH:mm:ss", "MM/dd/yyyy HH:mm:ss", "dd.MM.yyyy HH:mm:ss"]
    raw = o.select(
        "o_orderkey",
        F.when(F.pmod("o_orderkey", F.lit(3)) == 0, F.date_format("o_orderdate", fmts[0]))
        .when(F.pmod("o_orderkey", F.lit(3)) == 1, F.date_format("o_orderdate", fmts[1]))
        .otherwise(F.date_format("o_orderdate", fmts[2]))
        .alias("date_str"),
    )
    parsed = F.coalesce(*[F.try_to_timestamp(F.col("date_str"), F.lit(f)) for f in fmts])
    return raw.select(
        "o_orderkey",
        "date_str",
        F.date_format(parsed, "yyyy-MM-dd HH:mm:ss").alias("parsed"),
    )


_ACCENTED = "ÀÁÂÃÄÅàáâãäåÇçÈÉÊËèéêëÌÍÎÏìíîïÑñÒÓÔÕÖòóôõöÙÚÛÜùúûüÝýÿ"
_FOLDED = "AAAAAAaaaaaaCcEEEEeeeeIIIIiiiiNnOOOOOoooooUUUUuuuuYyy"


@query(
    "expr_keyword_normalize",
    f"""
    SELECT n_nationkey,
           lower(strip_accents('Crème-Brûlée №' || n_name)) AS normalized
    FROM nation
    """,
)
def expr_keyword_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword normalization — lowercase + asciifolding, the ES keyword
    normalizer the reference declared in its mappings (sql_to_es_etl.py:
    102,111-120) materialized as an engine expression: translate() over
    the Latin-1/extended accent table + lower(). (Non-Latin symbols pass
    through unchanged on both engines.)"""
    nation = read_table(spark, sf_dir, "nation")
    payload = F.concat(F.lit("Crème-Brûlée №"), F.col("n_name"))
    return nation.select(
        "n_nationkey",
        F.lower(F.translate(payload, _ACCENTED, _FOLDED)).alias("normalized"),
    )


@query(
    "join_salted_skew",
    """
    WITH dim AS (
      SELECT DISTINCT event_type,
             CASE WHEN event_type IN ('purchase', 'signup') THEN 'conversion'
                  ELSE 'engagement' END AS category
      FROM events
    )
    SELECT d.category,
           count(*) AS n,
           round(sum(e.value), 2) AS sum_value
    FROM events e JOIN dim d ON e.event_type = d.event_type
    GROUP BY d.category
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi join (operators/relational.py salted_join): events has
    only 5 distinct event_type values — the textbook skewed join key,
    where a plain shuffle join puts ~20% of the table on each of 5
    reducers. Salting over 16 buckets spreads each key across 80 tasks;
    the dim replicates x16 (bounded). Identical rows to the plain join,
    proved by the unsalted oracle."""
    from ..operators.relational import salted_join

    ev = read_table(spark, sf_dir, "events")
    dim = ev.select("event_type").distinct().withColumn(
        "category",
        F.when(F.col("event_type").isin("purchase", "signup"), "conversion").otherwise(
            "engagement"
        ),
    )
    joined = salted_join(ev, dim, "event_type", salt_buckets=16, salt_src="event_id")
    return joined.groupBy("category").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@query(
    "win_ntile_chunks",
    """
    SELECT chunk,
           count(*) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc
    FROM (
      SELECT doc_id, CAST(ntile(8) OVER (ORDER BY doc_id) AS BIGINT) AS chunk
      FROM documents
    ) GROUP BY chunk
    """,
)
def win_ntile_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(k) chunking — SURVEY.md §2.6's direct alternative to the
    reference's row_number batching when the batch COUNT (not size) is
    fixed. A literal ``ntile().over(Window.orderBy(...))`` is an Exchange
    SinglePartition (all rows through one task), so the bucket id is
    instead computed from the SQL-standard ntile rule — the first
    ``n mod k`` buckets get ``n div k + 1`` rows, the rest ``n div k`` —
    applied to the scalable two-phase global row number plus a broadcast
    1-row count. Bit-identical to both engines' ntile, no global window.
    """
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    numbered = with_global_row_number(docs, ["doc_id"])
    total = docs.agg(F.count(F.lit(1)).alias("_n"))
    k = 8
    rn = F.col("row_num")
    n = F.col("_n")
    base = F.floor(n / k).cast("long")
    rem = (n % k).cast("long")
    boundary = rem * (base + 1)
    chunk = (
        F.when(rn <= boundary, F.floor((rn - 1) / (base + 1)) + 1)
        .otherwise(rem + F.floor((rn - boundary - 1) / F.greatest(base, F.lit(1))) + 1)
        .cast("long")
    )
    chunked = numbered.crossJoin(F.broadcast(total)).withColumn("chunk", chunk)
    return chunked.groupBy("chunk").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").cast("long").alias("first_doc"),
        F.max("doc_id").cast("long").alias("last_doc"),
    )


@query(
    "agg_stats_moments",
    """
    SELECT event_type,
           round(stddev_samp(value), 4) AS sd,
           round(var_samp(value), 4) AS var,
           round(covar_samp(value, CAST(user_id AS DOUBLE)), 4) AS cov_user,
           round(corr(value, CAST(user_id AS DOUBLE)), 4) AS corr_user,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/variance/covariance/correlation) —
    single-pass mergeable moments, the profiling layer a feature pipeline
    runs before normalization decisions."""
    ev = read_table(spark, sf_dir, "events")
    u = F.col("user_id").cast("double")
    return ev.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 4).alias("sd"),
        F.round(F.var_samp("value"), 4).alias("var"),
        F.round(F.covar_samp(F.col("value"), u), 4).alias("cov_user"),
        F.round(F.corr(F.col("value"), u), 4).alias("corr_user"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "win_rank_dist",
    """
    SELECT o_orderkey,
           o_orderpriority,
           CAST(rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk,
           round(percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey), 6) AS pct_rank,
           round(cume_dist() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey), 6) AS cume
    FROM orders
    WHERE o_orderkey % 20 = 0
    """,
)
def win_rank_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows (rank / percent_rank / cume_dist) per priority
    group — completes the ranking-function family beyond row_number."""
    from pyspark.sql import Window as W

    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    w_desc = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_asc = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w_desc).cast("long").alias("rnk"),
        F.round(F.percent_rank().over(w_asc), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w_asc), 6).alias("cume"),
    )


@query(
    "events_funnel",
    f"""
    WITH v AS (
      SELECT user_id, min(ts) AS v_ts FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS c_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.v_ts
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
      GROUP BY e.user_id
    )
    SELECT v.user_id,
           strftime(v.v_ts, '{_TS_FMT_DUCK}') AS view_ts,
           strftime(c.c_ts, '{_TS_FMT_DUCK}') AS click_ts,
           strftime(p.p_ts, '{_TS_FMT_DUCK}') AS purchase_ts,
           CAST(CASE WHEN p.p_ts IS NOT NULL THEN 3
                     WHEN c.c_ts IS NOT NULL THEN 2
                     ELSE 1 END AS BIGINT) AS funnel_depth
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): first view, first click
    AFTER that view, first purchase AFTER that click, per user. Three
    conditional min-aggregates chained by time constraints — each stage
    shuffles on user_id only, so the funnel reuses one partitioning."""
    ev = read_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    out = v.join(c, "user_id", "left").join(p, "user_id", "left")
    return out.select(
        "user_id",
        F.date_format("v_ts", _TS_FMT_SPARK).alias("view_ts"),
        F.date_format("c_ts", _TS_FMT_SPARK).alias("click_ts"),
        F.date_format("p_ts", _TS_FMT_SPARK).alias("purchase_ts"),
        F.when(F.col("p_ts").isNotNull(), 3)
        .when(F.col("c_ts").isNotNull(), 2)
        .otherwise(1)
        .cast("long")
        .alias("funnel_depth"),
    )


@query(
    "events_retention",
    """
    WITH firsts AS (
      SELECT user_id, min(date_trunc('week', ts)) AS cohort_week FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events
    )
    SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(datediff('week', f.cohort_week, a.active_week) AS BIGINT) AS weeks_since,
           count(DISTINCT a.user_id) AS n_users
    FROM activity a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY f.cohort_week, datediff('week', f.cohort_week, a.active_week)
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-active week, counted in
    each later week — the engagement matrix behind every retention curve.
    Two aggregates + one join, all shuffling on user_id/cohort only."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    )
    firsts = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    activity = ev.distinct().withColumnRenamed("week", "active_week")
    joined = activity.join(firsts, "user_id")
    weeks_since = F.floor(
        (F.unix_timestamp("active_week") - F.unix_timestamp("cohort_week"))
        / (7 * 24 * 3600)
    ).cast("long")
    return (
        joined.select("user_id", F.col("cohort_week"), weeks_since.alias("weeks_since"))
        .groupBy("cohort_week", "weeks_since")
        .agg(F.count_distinct("user_id").alias("n_users"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "weeks_since",
            "n_users",
        )
    )


@query(
    "win_lead_gap",
    f"""
    SELECT event_id,
           user_id,
           CAST(epoch_ms(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) // 1000
                - epoch_ms(ts) // 1000 AS BIGINT) AS gap_to_next_sec,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events
    """,
)
def win_lead_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead() — forward-looking twin of sessionize's lag(): seconds until
    the user's next event and its type (null at stream end). Same single
    shuffle on user_id as every per-user window here."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.unix_timestamp(F.lead("ts").over(w)) - F.unix_timestamp("ts"))
        .cast("long")
        .alias("gap_to_next_sec"),
        F.lead("event_type").over(w).alias("next_type"),
    )


# interleave the low 8 bits of two dimensions -> 16-bit z-value
def _zorder_sql(a: str, b: str) -> str:
    terms = []
    for i in range(8):
        terms.append(f"(CAST(floor({a} / {2**i}) AS BIGINT) % 2) * {2**(2*i)}")
        terms.append(f"(CAST(floor({b} / {2**i}) AS BIGINT) % 2) * {2**(2*i+1)}")
    return " + ".join(terms)


@query(
    "sort_zorder_cluster",
    f"""
    WITH keyed AS (
      SELECT event_id,
             user_id % 256 AS ka,
             CAST(epoch_ms(ts) // 60000 AS BIGINT) % 256 AS kb
      FROM events
    )
    SELECT CAST(floor(CAST({_zorder_sql("ka", "kb")} AS DOUBLE) / 4096) AS BIGINT) AS zbucket,
           count(*) AS n,
           CAST(min({_zorder_sql("ka", "kb")}) AS BIGINT) AS zmin,
           CAST(max({_zorder_sql("ka", "kb")}) AS BIGINT) AS zmax
    FROM keyed GROUP BY 1
    """,
)
def sort_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering key: interleave the bits of (user bucket, time
    bucket) so rows close in BOTH dimensions land in the same file when
    the table is written sorted by z-value — multi-dimensional data
    skipping for scans that filter on either column. Pure bit arithmetic
    (morton code), verified exactly; the write path is
    ``df.repartitionByRange(F.col('z')).sortWithinPartitions('z')``."""
    ev = read_table(spark, sf_dir, "events")
    ka = F.pmod("user_id", F.lit(256))
    kb = F.pmod((F.unix_millis("ts") / F.lit(60000)).cast("long"), F.lit(256))
    z = None
    for i in range(8):
        ta = (F.floor(F.col("ka") / F.lit(2**i)).cast("long") % 2) * F.lit(2 ** (2 * i))
        tb = (F.floor(F.col("kb") / F.lit(2**i)).cast("long") % 2) * F.lit(2 ** (2 * i + 1))
        z = ta + tb if z is None else z + ta + tb
    keyed = ev.select("event_id", ka.alias("ka"), kb.alias("kb")).withColumn("z", z)
    return keyed.groupBy(
        F.floor(F.col("z").cast("double") / F.lit(4096)).cast("long").alias("zbucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("z").cast("long").alias("zmin"),
        F.max("z").cast("long").alias("zmax"),
    )


@query(
    "win_first_last",
    f"""
    SELECT event_id,
           user_id,
           strftime(first_value(ts) OVER w, '{_TS_FMT_DUCK}') AS first_ts,
           strftime(last_value(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
                    '{_TS_FMT_DUCK}') AS last_ts,
           first_value(event_type) OVER w AS first_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value with explicit frames — last_value needs
    the full-partition frame (the default frame ends at CURRENT ROW, a
    classic correctness trap both engines share)."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.date_format(F.first("ts").over(w), _TS_FMT_SPARK).alias("first_ts"),
        F.date_format(F.last("ts").over(w_full), _TS_FMT_SPARK).alias("last_ts"),
        F.first("event_type").over(w).alias("first_type"),
    )


@query(
    "expr_array_ops",
    r"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN trim(lower(text)) = '' THEN []
                  ELSE string_split_regex(trim(lower(text)), '\s+') END AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           coalesce(array_to_string(
             list_sort(list_distinct(toks))[1:3], chr(31)), '') AS first3_sorted,
           CAST(len(list_filter(toks, x -> length(x) > 4)) AS BIGINT) AS n_long,
           list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS total_chars
    FROM t
    """,
)
def expr_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions in one pass — size, array_distinct,
    array_sort+slice, filter, transform+aggregate — all JVM-side codegen,
    zero explodes: the per-row collection algebra that replaces a Python
    UDF for list-shaped features."""
    docs = read_table(spark, sf_dir, "documents")
    from ..operators.text import tokenize

    toks = tokenize(F.col("text"))
    total = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    out = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.concat_ws(
            "\x1f", F.slice(F.array_sort(F.array_distinct(toks)), 1, 3)
        ).alias("first3_sorted"),
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).cast("long").alias("n_long"),
        total.alias("total_chars"),
    )
    # DuckDB list_aggregate('sum') over [] yields NULL; Spark's fold gives 0
    return out.withColumn(
        "total_chars", F.when(F.col("n") == 0, F.lit(None).cast("long")).otherwise(F.col("total_chars"))
    )


@query(
    "join_null_safe",
    """
    WITH l AS (
      SELECT c_custkey, nullif(c_mktsegment, 'MACHINERY') AS seg FROM customer
    ),
    d AS (
      SELECT DISTINCT nullif(c_mktsegment, 'MACHINERY') AS seg,
             coalesce(nullif(c_mktsegment, 'MACHINERY'), 'UNSEGMENTED') AS seg_name
      FROM customer
    )
    SELECT l.c_custkey, d.seg_name
    FROM l JOIN d ON l.seg IS NOT DISTINCT FROM d.seg
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of silently dropping — the semantics NOT IN
    and plain equi joins get wrong on nullable keys. Spark plans <=> as a
    hash join key, so it scales like any equi join."""
    cust = read_table(spark, sf_dir, "customer")
    seg = F.when(F.col("c_mktsegment") == "MACHINERY", F.lit(None)).otherwise(
        F.col("c_mktsegment")
    )
    l = cust.select("c_custkey", seg.alias("seg"))
    d = (
        cust.select(seg.alias("seg"))
        .distinct()
        .withColumn("seg_name", F.coalesce(F.col("seg"), F.lit("UNSEGMENTED")))
    )
    joined = l.join(d.withColumnRenamed("seg", "dseg"), F.col("seg").eqNullSafe(F.col("dseg")))
    return joined.select("c_custkey", "seg_name")


@query(
    "join_semi_exists",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 1995
    )
    """,
)
def join_semi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left_semi join: emit each customer at most once no
    matter how many 1995 orders match — the dedup-free way to express
    "has at least one"; the probe side short-circuits on first match."""
    cust = read_table(spark, sf_dir, "customer")
    o95 = (
        read_table(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1995)
        .select("o_custkey")
    )
    return cust.join(
        o95, cust.c_custkey == o95.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "expr_decimal_exact",
    """
    SELECT o_orderstatus,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS DECIMAL(18,2))) AS VARCHAR) AS exact_total,
           CAST(max(CAST(o_totalprice AS DECIMAL(14,2))) AS VARCHAR) AS exact_max,
           count(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def expr_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DecimalType money arithmetic: exact fixed-point sums where double
    accumulation drifts (SURVEY §1.2 lists decimal as unused by the
    reference but required of the engine). Emitted as strings so the
    oracle compares exact decimal representations, not float round-trips."""
    o = read_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(14,2)")
    return o.groupBy("o_orderstatus").agg(
        F.sum(dec).cast("decimal(18,2)").cast("string").alias("exact_total"),
        F.max(dec).cast("string").alias("exact_max"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "expr_date_arithmetic",
    """
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS due_date,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
           CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT) AS days_since_epoch_start,
           CAST(12 * (year(o_orderdate) - 1992) + (month(o_orderdate) - 1) AS BIGINT) AS months_since
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def expr_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic breadth: interval add, last_day, day-of-week,
    day diffs, month offsets — the calendar toolbox behind bucketing and
    SLA logic (all codegen'd; no UDF territory)."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        # Spark dayofweek: 1=Sunday; DuckDB dayofweek: 0=Sunday
        (F.dayofweek(d) - 1).cast("long").alias("dow"),
        F.datediff(d.cast("date"), F.lit("1992-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
        (F.lit(12) * (F.year(d) - 1992) + (F.month(d) - 1))
        .cast("long")
        .alias("months_since"),
    )


@query(
    "events_gap_median_pandas",
    """
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts)
               - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    rn AS (
      SELECT user_id, gap_us,
             row_number() OVER (PARTITION BY user_id ORDER BY gap_us) AS r,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM gaps WHERE gap_us IS NOT NULL
    ),
    m AS (
      SELECT user_id, max(n) AS n,
             sum(CASE WHEN r = (n + 1) // 2 OR r = n // 2 + 1
                      THEN gap_us ELSE 0 END) AS s,
             max(CASE WHEN (n + 1) // 2 = n // 2 + 1 THEN 2 ELSE 1 END)
                 AS mult
      FROM rn GROUP BY user_id
    )
    SELECT user_id,
           floor(CAST(s * mult AS DOUBLE) / 200.0 + 0.5) / 10000.0
               AS median_gap_s,
           CAST(n AS BIGINT) AS n_gaps
    FROM m
    """,
)
def events_gap_median_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().applyInPandas surface: per-user median inter-event gap
    computed in pandas (sort -> diff -> middle pair, Arrow-batched one
    group per call). The oracle replays it relationally (lag +
    row_number middle-pair) — proving the Python group logic against
    SQL semantics. Use this API when the per-group computation
    genuinely won't fit window functions; here it is deliberately
    simple enough to be checkable.

    Determinism (r7 sf0.1 oracle sweep): pandas' float ``median()`` in
    seconds-space vs the oracle's interpolation in µs-space disagreed
    by one ulp on 6/1500 users — enough to flip the 4th decimal after
    rounding. Both sides now take the SUM OF THE TWO MIDDLE integer-µs
    gaps (the middle gap doubled for odd counts) — an exact bigint —
    and apply one identical half-up quantization, so the median is
    engine-exact at any scale (functions/det.py doctrine).

    r8 optimization (guide §4.1/§2.3, the `api_cogroup_pandas`
    precedent): grouping the pandas stage by USER invoked Python once
    per user — 1,500 frames at sf0.1, millions at corpus scale — and
    shipped three columns of raw events across the Arrow boundary so
    each frame could re-sort and diff. Now a JVM window (lag over the
    1024-way user-id bucket, ordered user/ts/event) derives the
    integer-µs gaps BEFORE the Python boundary, and applyInPandas runs
    per BUCKET: Python is invoked at most 1024 times regardless of user
    count, receives two int64 columns (user_id, gap_us), and computes
    every user's middle-pair median in one vectorized numpy pass. The
    bucket groupBy reuses the window's exchange, so the whole query is
    one shuffle. Measured at sf0.1: 8.2s -> 3.4s, identical output."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("median_gap_s", DoubleType()),
            StructField("n_gaps", LongType()),
        ]
    )

    def med(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(columns=["user_id", "median_gap_s", "n_gaps"]).astype(
                {"user_id": "int64", "median_gap_s": "float64", "n_gaps": "int64"}
            )
        pdf = pdf.sort_values(["user_id", "gap_us"], kind="mergesort")
        uid = pdf["user_id"].to_numpy(dtype="int64")
        g = pdf["gap_us"].to_numpy(dtype="int64")
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        counts = np.diff(np.r_[starts, len(uid)])
        # middle pair per user: g[(n-1)//2] + g[n//2] (odd n doubles the
        # middle gap) — exact int64, then ONE half-up quantization
        med_x2_us = g[starts + (counts - 1) // 2] + g[starts + counts // 2]
        median_gap_s = np.floor(med_x2_us / 200.0 + 0.5) / 10000.0
        return pd.DataFrame(
            {
                "user_id": uid[starts],
                "median_gap_s": median_gap_s.astype("float64"),
                "n_gaps": counts.astype("int64"),
            }
        )

    n_buckets = 1024
    ev = read_table(spark, sf_dir, "events").select(
        F.col("user_id"),
        F.unix_micros(F.col("ts")).alias("us"),
        F.col("event_id"),
        F.pmod(F.col("user_id"), F.lit(n_buckets)).alias("bkt"),
    )
    w = Window.partitionBy("bkt").orderBy("user_id", "us", "event_id")
    gaps = (
        ev.withColumn("prev_us", F.lag("us").over(w))
        .withColumn("prev_uid", F.lag("user_id").over(w))
        .where(F.col("prev_uid") == F.col("user_id"))
        .select("bkt", "user_id", (F.col("us") - F.col("prev_us")).alias("gap_us"))
    )
    return gaps.groupBy("bkt").applyInPandas(med, schema)


@query(
    "win_range_frame",
    f"""
    SELECT event_id,
           user_id,
           count(*) OVER (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING AND CURRENT ROW)
             AS n_last_30m,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
                                  RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING AND CURRENT ROW), 2)
             AS sum_last_30m
    FROM events
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frames (value-based, vs ROWS' count-based): all events of the
    user within the trailing 30 MINUTES — rows at equal ts share one frame,
    and sparse/ dense histories get the same time semantics. The sliding
    aggregate a rate limiter or trailing-load metric actually means."""
    ev = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-30 * 60 * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_30m"),
        F.round(F.sum("value").over(w), 2).alias("sum_last_30m"),
    )


@query(
    "reshape_unpivot",
    """
    WITH wide AS (
      SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
             round(coalesce(sum(CASE WHEN event_type = 'click' THEN value END), 0), 2) AS click,
             round(coalesce(sum(CASE WHEN event_type = 'purchase' THEN value END), 0), 2) AS purchase,
             round(coalesce(sum(CASE WHEN event_type = 'view' THEN value END), 0), 2) AS view
      FROM events GROUP BY 1
    )
    SELECT user_bucket, event_type, sum_value
    FROM wide UNPIVOT (sum_value FOR event_type IN (click, purchase, view))
    """,
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long), the inverse of agg_pivot: melt per-type sum
    columns back into (type, value) rows. Pure metadata reshuffle — no
    shuffle beyond the upstream aggregate."""
    ev = read_table(spark, sf_dir, "events")
    wide = (
        ev.withColumn("user_bucket", F.pmod("user_id", F.lit(10)).cast("long"))
        .groupBy("user_bucket")
        .pivot("event_type", ["click", "purchase", "view"])
        .agg(F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 2))
        .select(
            "user_bucket",
            *[F.coalesce(F.col(t), F.lit(0.0)).alias(t) for t in ("click", "purchase", "view")],
        )
    )
    return wide.unpivot(
        ["user_bucket"], ["click", "purchase", "view"], "event_type", "sum_value"
    )


@query(
    "agg_conditional",
    """
    SELECT event_type,
           count(*) FILTER (WHERE value > 50) AS n_high,
           count(*) FILTER (WHERE value <= 50) AS n_low,
           bool_or(value > 190) AS any_extreme,
           bool_and(value >= 0) AS all_nonneg,
           round(sum(value) FILTER (WHERE value > 50), 2) AS sum_high
    FROM events GROUP BY event_type
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregates (count_if / any / every / filtered sum):
    one pass, one shuffle — the idiom that replaces N self-joins for
    N conditions."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_if(F.col("value") > 50).alias("n_high"),
        F.count_if(F.col("value") <= 50).alias("n_low"),
        F.bool_or(F.col("value") > 190).alias("any_extreme"),
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.round(F.sum(F.when(F.col("value") > 50, F.col("value"))), 2).alias("sum_high"),
    )


@query(
    "events_anomaly_zscore",
    """
    WITH stats AS (
      SELECT event_type,
             avg(value) AS mu,
             stddev_samp(value) AS sd
      FROM events GROUP BY event_type
    )
    SELECT e.event_id,
           e.event_type,
           round((e.value - s.mu) / s.sd, 4) AS z
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE abs((e.value - s.mu) / s.sd) > 3.0
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly flagging: per-type mean/stddev (tiny aggregate,
    broadcast back) -> |z| > 3 outliers. Two scans of the fact, zero
    wide shuffles — the standard screen before training-data ingestion."""
    ev = read_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    joined = ev.join(F.broadcast(stats), "event_type")
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return joined.filter(F.abs(z) > 3.0).select(
        "event_id", "event_type", F.round(z, 4).alias("z")
    )


@query(
    "expr_try_safety",
    """
    SELECT o_orderkey,
           CASE WHEN (o_orderkey % 5) = 0 THEN NULL
                ELSE round(o_totalprice / (o_orderkey % 5), 2) END AS safe_ratio,
           try_cast(CASE WHEN o_orderkey % 3 = 0 THEN 'not-a-number'
                         ELSE CAST(o_orderkey AS VARCHAR) END AS BIGINT) AS maybe_num
    FROM orders WHERE o_orderkey % 50 = 0
    """,
)
def expr_try_safety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The try_* error-safety family: try_divide and try_cast return null
    instead of failing the task — at 100 TB one malformed row must never
    abort a 10-hour job. Pair with a null-count audit to quantify what
    was tolerated (ANSI mode stays on; errors are contained per
    expression, not globally disabled)."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    return o.select(
        "o_orderkey",
        F.round(F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 5), 2).alias(
            "safe_ratio"
        ),
        F.try_to_number(
            F.when(F.col("o_orderkey") % 3 == 0, F.lit("not-a-number")).otherwise(
                F.col("o_orderkey").cast("string")
            ),
            F.lit("999999999"),
        )
        .cast("long")
        .alias("maybe_num"),
    )


# ---------------------------------------------------------------------------
# join_asof_tolerance — as-of join with a staleness bound
# ---------------------------------------------------------------------------


@query(
    "join_asof_tolerance",
    f"""
    SELECT p.event_id,
           p.user_id,
           strftime(p.ts, '{_TS_FMT_DUCK}') AS purchase_ts,
           CASE WHEN c.ts IS NULL
                     OR epoch_ms(p.ts) // 1000 - epoch_ms(c.ts) // 1000 > 3600
                THEN NULL ELSE strftime(c.ts, '{_TS_FMT_DUCK}') END
               AS last_click_ts,
           CAST(CASE WHEN c.ts IS NULL
                          OR epoch_ms(p.ts) // 1000 - epoch_ms(c.ts) // 1000 > 3600
                     THEN NULL
                     ELSE epoch_ms(p.ts) // 1000 - epoch_ms(c.ts) // 1000 END
                AS BIGINT) AS gap_sec
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance: the latest click at or
    before each purchase counts only if it is at most 1 hour old —
    matches older than the tolerance become NULL, exactly how a feature
    store refuses stale features at serving time. Same union +
    last(ignorenulls) single-shuffle plan as join_asof; the tolerance is
    a post-match null-out, never a second join.
    """
    ev = read_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("click_ts"), "event_id")
        .withColumnRenamed("event_id", "click_event_id")
    )
    matched = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        payload=["click_ts"],
        tiebreak="click_event_id",
    )
    gap = (F.unix_timestamp("ts") - F.unix_timestamp("click_ts")).cast("long")
    fresh = F.col("click_ts").isNotNull() & (gap <= 3600)
    return matched.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT_SPARK).alias("purchase_ts"),
        F.when(fresh, F.date_format("click_ts", _TS_FMT_SPARK)).alias("last_click_ts"),
        F.when(fresh, gap).alias("gap_sec"),
    )
