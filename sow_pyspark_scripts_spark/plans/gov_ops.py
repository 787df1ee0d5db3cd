"""Governance / incremental-maintenance tier: the correctness-critical
jobs around a lakehouse's tables — incremental materialized-view
maintenance that provably equals a full recompute, deletion-propagation
audits, and session-path mining for the event log.

The reference's upsert sink (`snowflake_to_es_etl.py:234-241`) is
incremental maintenance in spirit (merge-by-key instead of rebuild);
this tier does it for AGGREGATES over a JOIN, with the oracle being the
full recompute — the strongest possible check for an IVM path.

Scale notes:
- the IVM merge re-aggregates partial (custkey, sum, count) rows, never
  raw facts: the delta branch scans only the changed partition slice
  (5% of the fact), and both branches pre-aggregate to the MV grain
  BEFORE the union, so the merge shuffle carries MV-sized rows;
- the erasure audit is three broadcast semi/inner joins against the
  deletion list (subject-bounded); the transitive lineitem check routes
  through the orders key mapping — one co-partitioned join, no
  full-table distinct;
- session paths rank inside (user, day) partitions and collapse to the
  path-count rollup; the global top-10 is TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import read_table


# ---------------------------------------------------------------------------
# mv_incremental_join_agg — delta-maintained aggregate over a join
# ---------------------------------------------------------------------------

_MV_ORACLE = """
SELECT o_custkey AS custkey,
       floor(CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                           AS BIGINT)) AS DOUBLE)) / 100.0 AS revenue,
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_custkey
"""


@query("mv_incremental_join_agg", _MV_ORACLE)
def mv_incremental_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance for revenue-per-customer
    (an aggregate over the lineitem⋈orders join): the fact splits into a
    95% "already materialized" slice and a 5% "changelog" slice
    (l_orderkey % 100 < 5); each slice aggregates to the MV grain
    independently and the two partial-aggregate relations merge by
    re-aggregation — the standard IVM rule for SUM/COUNT views.

    The ORACLE is the full recompute, so the hash-match proves the
    incremental path bit-equals rebuilding from scratch (revenue is
    exact integer cents, so merge order cannot drift). At 100 TB only
    the delta branch scans new data — the old branch is in production a
    read of the stored MV — and both branches pre-aggregate before the
    union, so the merge shuffle carries MV-sized rows, not facts. Both
    branches join on the same l_orderkey=o_orderkey key and reuse one
    exchange layout under AQE."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("long")

    def branch(pred):
        return (
            li.where(pred)
            .select("l_orderkey", cents.alias("cents"))
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_custkey")
            .agg(F.sum("cents").alias("s"), F.count(F.lit(1)).alias("n"))
        )

    is_delta = F.pmod(F.col("l_orderkey"), F.lit(100)) < 5
    mv_old = branch(~is_delta)
    mv_delta = branch(is_delta)
    return (
        mv_old.unionByName(mv_delta)
        .groupBy("o_custkey")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n_items"))
        .select(
            F.col("o_custkey").alias("custkey"),
            (F.floor(F.col("s").cast("double")) / F.lit(100.0)).alias("revenue"),
            "n_items",
        )
    )


# ---------------------------------------------------------------------------
# dq_erasure_audit — deletion-propagation (right-to-be-forgotten) check
# ---------------------------------------------------------------------------

_ERASURE_ORACLE = """
WITH del AS (SELECT c_custkey FROM customer WHERE c_acctbal < -900),
o AS (
    SELECT count(*) AS n, count(DISTINCT o_custkey) AS s
    FROM orders JOIN del ON o_custkey = c_custkey
),
l AS (
    SELECT count(*) AS n, count(DISTINCT o_custkey) AS s
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN del ON o_custkey = c_custkey
)
SELECT 'customer' AS table_name,
       (SELECT count(*) FROM del) AS n_refs,
       (SELECT count(*) FROM del) AS n_subjects
UNION ALL SELECT 'orders', n, s FROM o
UNION ALL SELECT 'lineitem', n, s FROM l
"""


@query("dq_erasure_audit", _ERASURE_ORACLE)
def dq_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-propagation audit: given an erasure list (customers with
    c_acctbal < -900 standing in for right-to-be-forgotten requests),
    count the rows in each downstream table that still reference those
    subjects — directly (orders.o_custkey) and transitively (lineitem
    through its order). A zero row per table is the compliance
    sign-off; anything else is the work queue for the delete job.

    The deletion list is subject-bounded and broadcasts into every
    probe; the transitive check joins lineitem to the (orderkey ->
    custkey) mapping of affected orders only — the mapping is filtered
    BEFORE the fact join, so the big scan probes a small broadcast hash
    table. Three one-row aggregates union into the audit report."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    del_keys = cust.where(F.col("c_acctbal") < -900).select("c_custkey")
    o_hit = orders.join(
        F.broadcast(del_keys), F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "o_custkey")
    o_row = o_hit.agg(
        F.count(F.lit(1)).alias("n_refs"),
        F.countDistinct("o_custkey").alias("n_subjects"),
    ).select(F.lit("orders").alias("table_name"), "n_refs", "n_subjects")
    l_row = (
        li.join(F.broadcast(o_hit), F.col("l_orderkey") == F.col("o_orderkey"))
        .agg(
            F.count(F.lit(1)).alias("n_refs"),
            F.countDistinct("o_custkey").alias("n_subjects"),
        )
        .select(F.lit("lineitem").alias("table_name"), "n_refs", "n_subjects")
    )
    c_row = del_keys.agg(F.count(F.lit(1)).alias("n_refs")).select(
        F.lit("customer").alias("table_name"),
        "n_refs",
        F.col("n_refs").alias("n_subjects"),
    )
    return c_row.unionByName(o_row).unionByName(l_row)


# ---------------------------------------------------------------------------
# events_top_paths — most common session-opening paths
# ---------------------------------------------------------------------------

_PATHS_ORACLE = """
WITH e AS (
    SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type,
           row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                              ORDER BY ts, event_id) AS rn
    FROM events
),
p AS (
    SELECT user_id, day, string_agg(event_type, ' > ' ORDER BY rn) AS path
    FROM e WHERE rn <= 3 GROUP BY user_id, day
)
SELECT path, count(*) AS n_sessions
FROM p GROUP BY path ORDER BY n_sessions DESC, path LIMIT 10
"""


@query("events_top_paths", _PATHS_ORACLE)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-path mining: the 10 most common opening paths (first
    three event types, in order) across (user, day) sessions — the
    navigation-flow readout product teams pull from every event log,
    and the sequence complement to `events_markov_transitions`
    (aggregate transitions) and `events_funnel` (one fixed path).

    The rank window partitions by (user, day) and keeps only rn <= 3,
    so the path assembly aggregates at most 3 rows per session; path
    text is rebuilt order-exactly from sort_array(collect_list(struct))
    — no ordered-agg dependency — and the global top-10 is
    TakeOrderedAndProject over the path rollup."""
    ev = read_table(spark, sf_dir, "events")
    day = F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd")
    w = Window.partitionBy("user_id", F.col("ts").cast("date")).orderBy(
        "ts", "event_id"
    )
    e = ev.select(
        "user_id", day.alias("day"), "event_type", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") <= 3)
    p = e.groupBy("user_id", "day").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            " > ",
        ).alias("path")
    )
    return (
        p.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# events_window_funnel — ordered funnel with a time-window constraint
# ---------------------------------------------------------------------------

_WFUNNEL_ORACLE = """
WITH v AS (
    SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view'
    GROUP BY user_id
),
c AS (
    SELECT e.user_id, min(e.ts) AS t2
    FROM events e JOIN v USING (user_id)
    WHERE e.event_type = 'click' AND e.ts >= v.t1
      AND date_diff('second', v.t1, e.ts) <= 3600
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, min(e.ts) AS t3
    FROM events e JOIN c USING (user_id) JOIN v USING (user_id)
    WHERE e.event_type = 'purchase' AND e.ts >= c.t2
      AND date_diff('second', v.t1, e.ts) <= 3600
    GROUP BY e.user_id
),
depth AS (
    SELECT v.user_id,
           CASE WHEN p.user_id IS NOT NULL THEN 3
                WHEN c.user_id IS NOT NULL THEN 2
                ELSE 1 END AS d
    FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
)
SELECT CAST(d AS BIGINT) AS funnel_depth, count(*) AS n_users
FROM depth GROUP BY d
"""


@query("events_window_funnel", _WFUNNEL_ORACLE)
def events_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-constrained ordered funnel (ClickHouse windowFunnel
    semantics): view -> click -> purchase must occur IN ORDER and all
    within 3600s of the first view; report how many users reach each
    depth. The time bound is what separates a real conversion journey
    from `events_funnel`'s unordered lifetime counts.

    Three conditional first-event rollups, all shuffling on user_id
    (one exchange under AQE); each stage joins the previous stage's
    per-user anchor — the canonical decorrelation of the sequential
    EXISTS chain. Depth assignment is two broadcast-sized left joins
    over the per-user relations."""
    ev = read_table(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    within = lambda t0: (  # noqa: E731
        F.unix_timestamp(F.col("ts")) - F.unix_timestamp(t0) <= 3600
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where((F.col("ts") >= F.col("t1")) & within(F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .join(v, "user_id")
        .where((F.col("ts") >= F.col("t2")) & within(F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    depth = (
        v.join(c.select("user_id", F.lit(1).alias("has2")), "user_id", "left")
        .join(p.select("user_id", F.lit(1).alias("has3")), "user_id", "left")
        .select(
            F.when(F.col("has3").isNotNull(), 3)
            .when(F.col("has2").isNotNull(), 2)
            .otherwise(1)
            .cast("long")
            .alias("funnel_depth")
        )
    )
    return depth.groupBy("funnel_depth").agg(F.count(F.lit(1)).alias("n_users"))


# ---------------------------------------------------------------------------
# events_seq_pair_support — ordered-pair sequential pattern support
# ---------------------------------------------------------------------------

_SEQPAIR_ORACLE = """
WITH e AS (
    SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           event_type, ts, event_id
    FROM events
),
pairs AS (
    SELECT DISTINCT a.user_id, a.day, a.event_type AS ante, b.event_type AS cons
    FROM e a JOIN e b
      ON a.user_id = b.user_id AND a.day = b.day
     AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
     AND a.event_type <> b.event_type
)
SELECT ante, cons, count(*) AS support
FROM pairs GROUP BY ante, cons
ORDER BY support DESC, ante, cons LIMIT 15
"""


@query("events_seq_pair_support", _SEQPAIR_ORACLE)
def events_seq_pair_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern support (SPADE/PrefixSpan's 2-sequences): for
    each ordered event-type pair (a happens, b happens LATER in the
    same (user, day) session), the number of sessions containing the
    pattern — the 'a leads to b eventually' signal that
    `events_markov_transitions` (adjacent steps only) cannot see.

    The self-join keys on the session (user, day) so fan-out is bounded
    by per-session event counts squared — the `basket_affinity_pairs`
    bound, never a fact-wide cross join; DISTINCT collapses to one
    support vote per session before the count. Total order on (ts,
    event_id) makes 'later' deterministic under timestamp ties."""
    ev = read_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
        "event_type",
        "ts",
        "event_id",
    )
    a = e.select(
        F.col("user_id").alias("ua"), F.col("day").alias("da"),
        F.col("event_type").alias("ante"), F.col("ts").alias("ta"),
        F.col("event_id").alias("ia"),
    )
    b = e.select(
        F.col("user_id").alias("ub"), F.col("day").alias("db"),
        F.col("event_type").alias("cons"), F.col("ts").alias("tb"),
        F.col("event_id").alias("ib"),
    )
    pairs = (
        a.join(
            b,
            (F.col("ua") == F.col("ub"))
            & (F.col("da") == F.col("db"))
            & (
                (F.col("ta") < F.col("tb"))
                | ((F.col("ta") == F.col("tb")) & (F.col("ia") < F.col("ib")))
            )
            & (F.col("ante") != F.col("cons")),
        )
        .select("ua", "da", "ante", "cons")
        .distinct()
    )
    return (
        pairs.groupBy("ante", "cons")
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy(F.desc("support"), F.asc("ante"), F.asc("cons"))
        .limit(15)
    )


# ---------------------------------------------------------------------------
# agg_distinct_grouping_sets — multi-grain COUNT(DISTINCT) in one pass
# ---------------------------------------------------------------------------

_DGS_ORACLE = """
SELECT coalesce(event_type, '<all>') AS event_type,
       coalesce(strftime(CAST(ts AS DATE), '%Y-%m-%d'), '<all>') AS day,
       count(DISTINCT user_id) AS distinct_users,
       count(*) AS n_events
FROM events
GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)), ())
"""


@query("agg_distinct_grouping_sets", _DGS_ORACLE)
def agg_distinct_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user counts at three grains (per type, per day, grand
    total) in ONE query via GROUPING SETS — the audience-size dashboard
    block. COUNT(DISTINCT) under grouping sets is the expensive shape:
    Spark plans it with an Expand (one replica per grouping set +
    distinct key) followed by a two-phase aggregate, so the fact is
    still scanned once and the dedup happens in the aggregate, not a
    join of three separate queries.

    Null grain markers coalesce to '<all>' so the three grains share
    one schema in both engines."""
    ev = read_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_dgs")
    return spark.sql(
        """
        SELECT coalesce(event_type, '<all>') AS event_type,
               coalesce(date_format(CAST(ts AS DATE), 'yyyy-MM-dd'), '<all>')
                   AS day,
               count(DISTINCT user_id) AS distinct_users,
               count(*) AS n_events
        FROM events_dgs
        GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)), ())
        """
    )


# ---------------------------------------------------------------------------
# scd2_apply_snapshot — merge an incoming snapshot into SCD2 history
# ---------------------------------------------------------------------------

_SCD2_CUTOFF = "2024-01-16 00:00:00"

_SCD2_APPLY_ORACLE = f"""
WITH hist_src AS (
    SELECT user_id, event_type, ts FROM events WHERE ts < '{_SCD2_CUTOFF}'
),
marked AS (
    SELECT user_id, event_type, ts,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev_type
    FROM hist_src
),
changes AS (
    SELECT user_id, event_type, ts FROM marked
    WHERE prev_type IS NULL OR prev_type <> event_type
),
hist AS (
    SELECT user_id, event_type AS attr, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
    FROM changes
),
snap AS (
    SELECT user_id, arg_max(event_type, ts) AS attr, max(ts) AS snap_ts
    FROM (SELECT user_id, event_type, ts,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events WHERE ts >= '{_SCD2_CUTOFF}')
    WHERE rn = 1
    GROUP BY user_id
),
open_rows AS (SELECT * FROM hist WHERE valid_to IS NULL),
closed_rows AS (SELECT * FROM hist WHERE valid_to IS NOT NULL),
merged AS (
    -- history rows already closed: unchanged
    SELECT user_id, attr, valid_from, valid_to, FALSE AS is_current
    FROM closed_rows
    UNION ALL
    -- open rows whose attr matches the snapshot (or user absent from
    -- snapshot): stay open
    SELECT o.user_id, o.attr, o.valid_from, NULL, TRUE
    FROM open_rows o LEFT JOIN snap s USING (user_id)
    WHERE s.user_id IS NULL OR s.attr = o.attr
    UNION ALL
    -- open rows contradicted by the snapshot: close at snapshot ts
    SELECT o.user_id, o.attr, o.valid_from, s.snap_ts, FALSE
    FROM open_rows o JOIN snap s USING (user_id)
    WHERE s.attr <> o.attr
    UNION ALL
    -- contradicting or brand-new snapshot states: new open rows
    SELECT s.user_id, s.attr, s.snap_ts, NULL, TRUE
    FROM snap s LEFT JOIN open_rows o USING (user_id)
    WHERE o.user_id IS NULL OR o.attr <> s.attr
)
SELECT user_id, attr,
       strftime(valid_from, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
       strftime(valid_to, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
       is_current
FROM merged
"""


@query("scd2_apply_snapshot", _SCD2_APPLY_ORACLE)
def scd2_apply_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCD2 MERGE: apply an incoming per-user snapshot (latest state
    after the cutoff) to the existing dimension history (built from
    events before the cutoff): closed rows pass through, open rows that
    the snapshot confirms stay open, contradicted open rows close at
    the snapshot timestamp, and contradicting/new states insert as new
    open rows — the nightly warehouse job that `scd2_intervals` (full
    rebuild) exists to avoid at scale.

    Every relation (history, snapshot, all four merge branches) keys on
    user_id, so the merge is one exchange layout reused across the
    branches; the snapshot is one row per user (rank-1 window with a
    total (ts, event_id) order). At 100 TB the history side is a stored
    table read, and only the snapshot branch scans new data."""
    ev = read_table(spark, sf_dir, "events")
    cutoff = F.lit(_SCD2_CUTOFF).cast("timestamp")
    hist_src = ev.where(F.col("ts") < cutoff)
    w = Window.partitionBy("user_id").orderBy("ts")
    changes = (
        hist_src.select(
            "user_id", "event_type", "ts",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .where(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
        .select("user_id", "event_type", "ts")
    )
    hist = changes.select(
        "user_id",
        F.col("event_type").alias("attr"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    ws = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    snap = (
        ev.where(F.col("ts") >= cutoff)
        .select("user_id", "event_type", "ts", F.row_number().over(ws).alias("rn"))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("s_attr"), F.col("ts").alias("snap_ts"))
    )
    open_rows = hist.where(F.col("valid_to").isNull()).select(
        "user_id", "attr", "valid_from"
    )
    closed_rows = hist.where(F.col("valid_to").isNotNull())
    keep_closed = closed_rows.select(
        "user_id", "attr", "valid_from", "valid_to", F.lit(False).alias("is_current")
    )
    o_s = open_rows.join(snap, "user_id", "left")
    stay_open = o_s.where(
        F.col("s_attr").isNull() | (F.col("s_attr") == F.col("attr"))
    ).select(
        "user_id", "attr", "valid_from",
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    closed_by_snap = o_s.where(
        F.col("s_attr").isNotNull() & (F.col("s_attr") != F.col("attr"))
    ).select(
        "user_id", "attr", "valid_from",
        F.col("snap_ts").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    new_open = (
        snap.join(open_rows, "user_id", "left")
        .where(F.col("attr").isNull() | (F.col("attr") != F.col("s_attr")))
        .select(
            "user_id",
            F.col("s_attr").alias("attr"),
            F.col("snap_ts").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    merged = (
        keep_closed.unionByName(stay_open)
        .unionByName(closed_by_snap)
        .unionByName(new_open)
    )
    return merged.select(
        "user_id",
        "attr",
        F.date_format("valid_from", fmt).alias("valid_from"),
        F.date_format("valid_to", fmt).alias("valid_to"),
        "is_current",
    )


# ---------------------------------------------------------------------------
# win_interval_coalesce — merge overlapping validity intervals
# ---------------------------------------------------------------------------

_COALESCE_ORACLE = """
WITH iv AS (
    SELECT o_custkey AS cust, o_orderdate AS s, max(l_shipdate) AS e
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_custkey, o_orderkey, o_orderdate
),
marked AS (
    SELECT cust, s, e,
           CASE WHEN s > coalesce(max(e) OVER (
                    PARTITION BY cust ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    TIMESTAMP '1900-01-01')
                THEN 1 ELSE 0 END AS new_grp
    FROM iv
),
grouped AS (
    SELECT cust, s, e,
           sum(new_grp) OVER (PARTITION BY cust ORDER BY s, e
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS grp
    FROM marked
)
SELECT cust AS custkey, CAST(grp AS BIGINT) AS period_id,
       strftime(min(s), '%Y-%m-%d') AS active_from,
       strftime(max(e), '%Y-%m-%d') AS active_to,
       count(*) AS n_orders
FROM grouped GROUP BY cust, grp
"""


@query("win_interval_coalesce", _COALESCE_ORACLE)
def win_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping [order, last-ship] intervals per customer into
    maximal active periods — the interval-coalesce (gaps-and-islands
    over RANGES) primitive behind contract coverage, uptime windows,
    and entitlement math, where `events_sessionize` handles points and
    this handles spans.

    The sweep is the classic running-max trick: an interval starts a
    new group iff its start exceeds the max end seen so far; both the
    running max and the group counter are per-customer windows over the
    order-grain rollup (one exchange keyed on custkey; the rollup and
    both windows share it). Interval ends are not sorted — only the
    cummax is — which is what makes this O(n log n/customer), not a
    pairwise overlap join."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    iv = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("o_custkey").alias("cust"),
            "o_orderkey",
            F.col("o_orderdate").alias("s"),
        )
        .agg(F.max("l_shipdate").alias("e"))
        .select("cust", "s", "e")
    )
    wo = Window.partitionBy("cust").orderBy("s", "e")
    prev_max_e = F.max("e").over(wo.rowsBetween(Window.unboundedPreceding, -1))
    marked = iv.select(
        "cust", "s", "e",
        F.when(
            F.col("s")
            > F.coalesce(prev_max_e, F.lit("1900-01-01").cast("timestamp")),
            1,
        )
        .otherwise(0)
        .alias("new_grp"),
    )
    grouped = marked.select(
        "cust", "s", "e",
        F.sum("new_grp").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("grp"),
    )
    return grouped.groupBy(
        F.col("cust").alias("custkey"), F.col("grp").cast("long").alias("period_id")
    ).agg(
        F.date_format(F.min("s"), "yyyy-MM-dd").alias("active_from"),
        F.date_format(F.max("e"), "yyyy-MM-dd").alias("active_to"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# events_session_gap_sweep — sessionizer parameter sensitivity, one scan
# ---------------------------------------------------------------------------

_GAP_SWEEP_ORACLE = """
WITH g AS (
    SELECT user_id,
           date_diff('second',
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                     ts) AS gap_s
    FROM events
)
SELECT CAST(t.gap_minutes AS BIGINT) AS gap_minutes,
       sum(CASE WHEN gap_s IS NULL OR gap_s > t.gap_minutes * 60
                THEN 1 ELSE 0 END) AS n_sessions,
       floor(CAST(count(*) AS DOUBLE)
             / sum(CASE WHEN gap_s IS NULL OR gap_s > t.gap_minutes * 60
                        THEN 1 ELSE 0 END) * 1e4 + 0.5) / 1e4
           AS events_per_session
FROM g, (SELECT unnest([5, 15, 30]) AS gap_minutes) t
GROUP BY t.gap_minutes
"""


@query("events_session_gap_sweep", _GAP_SWEEP_ORACLE)
def events_session_gap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionizer parameter sweep: how many sessions (and events per
    session) fall out of a 5/15/30-minute inactivity threshold — the
    sensitivity readout that justifies the gap constant `events_sessionize`
    hard-codes, computed the one-scan way: the inter-event gap is ONE
    window pass, and each candidate threshold is just a conditional sum
    over the same gap column (3 candidates cost 3 counters, not 3
    sessionization runs).

    A session count is 1 + #(gaps exceeding the threshold) per user —
    counting session STARTS (null gap = first event) needs no island
    assembly at all when only aggregate statistics are wanted."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_s")
    )
    cand = ev.sparkSession.range(1).select(
        F.explode(F.array(F.lit(5), F.lit(15), F.lit(30))).alias("gap_minutes")
    )
    starts = F.sum(
        F.when(
            F.col("gap_s").isNull() | (F.col("gap_s") > F.col("gap_minutes") * 60), 1
        ).otherwise(0)
    )
    return (
        g.crossJoin(F.broadcast(cand))
        .groupBy(F.col("gap_minutes").cast("long").alias("gap_minutes"))
        .agg(
            starts.alias("n_sessions"),
            (
                F.floor(
                    F.count(F.lit(1)).cast("double") / starts * F.lit(1e4) + F.lit(0.5)
                )
                / F.lit(1e4)
            ).alias("events_per_session"),
        )
    )
