"""Registered event-stream analytics in BATCH form (SURVEY.md §2.11 /
§7 phase 5) — tumbling / sliding / session windows, gap sessionization,
JSON property extraction. The Structured Streaming twins of these run in
``streaming/`` over the same table with the same semantics; the batch
forms here are the oracle-checkable contracts.

The reference's closest analogs: the month-bucket incremental loop
(``preprocess_and_store_parquets.py:163`` — a manual tumbling window)
and the ES upsert sink (``snowflake_to_es_etl.py:239-240`` — a
foreachBatch merge). ``events.props`` (JSON string) replays the
semi-structured column the new engine must also support.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import read_table

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"

# Session boundary: a new session starts when the gap from the previous
# event is >= 30 minutes (strict-merge semantics matching Spark's
# session_window: an event exactly gap away does NOT merge).
_GAP_MS = 30 * 60 * 1000


@query(
    "events_tumbling_agg",
    f"""
    SELECT strftime(time_bucket(INTERVAL '10 minutes', ts), '{_TS_FMT_DUCK}') AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute windows per event type — the generalization of
    the reference's month-bucket loop to native time windows. Partial
    aggregation map-side; shuffle carries (window, type) groups only."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", _TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "events_sliding_agg",
    f"""
    WITH assigned AS (
      SELECT time_bucket(INTERVAL '5 minutes', ts) AS w, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes' AS w, value FROM events
    )
    SELECT strftime(w, '{_TS_FMT_DUCK}') AS window_start,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM assigned GROUP BY 1
    """,
)
def events_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10 min length, 5 min slide): every event lands in
    exactly two windows. Spark's window() explodes the assignment the
    same way the oracle's two-bucket UNION does."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", _TS_FMT_SPARK).alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


_SESSIONIZE_CTE = f"""
ordered AS (
  SELECT user_id, ts, event_id, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN prev_ts IS NULL OR epoch_ms(ts) - epoch_ms(prev_ts) >= {_GAP_MS}
              THEN 1 ELSE 0 END AS new_sess
  FROM ordered
),
sess AS (
  SELECT user_id, ts, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
"""


@query(
    "events_sessionize",
    f"""
    WITH {_SESSIONIZE_CTE}
    SELECT user_id,
           CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value,
           strftime(min(ts), '{_TS_FMT_DUCK}') AS session_start,
           strftime(max(ts), '{_TS_FMT_DUCK}') AS session_end
    FROM sess GROUP BY user_id, session_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization via lag + cumulative sum — the classic
    windowed-SQL formulation (one shuffle on user_id; each partition is
    processed by ordered window functions, no state store needed in
    batch). 30-minute gap."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    w_lag = Window.partitionBy("user_id").orderBy(*order)
    w_cum = Window.partitionBy("user_id").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    flagged = ev.withColumn("prev_ts", F.lag("ts").over(w_lag)).withColumn(
        "new_sess",
        F.when(
            F.col("prev_ts").isNull()
            | (F.unix_millis("ts") - F.unix_millis("prev_ts") >= _GAP_MS),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn("session_id", F.sum("new_sess").over(w_cum).cast("long"))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.date_format(F.min("ts"), _TS_FMT_SPARK).alias("session_start"),
        F.date_format(F.max("ts"), _TS_FMT_SPARK).alias("session_end"),
    )


@query(
    "events_session_window",
    f"""
    WITH {_SESSIONIZE_CTE}
    SELECT user_id,
           strftime(min(ts), '{_TS_FMT_DUCK}') AS session_start,
           count(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window operator (30-minute gap) — same
    sessions as the lag/cumsum formulation, proved by sharing its oracle.
    This is the operator whose streaming twin handles late data with
    watermarked state."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", _TS_FMT_SPARK).alias("session_start"),
            "n_events",
        )
    )


@query(
    "events_json_props",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props column (JSON string -> typed values) —
    get_json_object stays JVM-side; at scale prefer from_json with an
    explicit schema once the shape is known (single parse, pruned)."""
    ev = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).cast("long").alias("sum_k"),
        F.max(k).cast("long").alias("max_k"),
    )


@query(
    "events_props_map",
    """
    SELECT k AS prop_key,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.' || k) AS BIGINT)) AS BIGINT) AS sum_val
    FROM (SELECT props, unnest(json_keys(props)) AS k FROM events)
    GROUP BY k
    """,
)
def events_props_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: props parsed ONCE with from_json into
    map<string,bigint> (vs per-path get_json_object re-parsing), then
    exploded to (key, value) rows and aggregated per key — the schema-free
    ingestion path for semi-structured props whose keys vary by event."""
    ev = read_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return (
        ev.select(F.explode(m).alias("prop_key", "val"))
        .groupBy("prop_key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("val").cast("long").alias("sum_val"),
        )
    )


_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "agg_pivot",
    f"""
    SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
           {", ".join(f"round(coalesce(sum(CASE WHEN event_type = '{t}' THEN value END), 0), 2) AS {t}" for t in _PIVOT_TYPES)}
    FROM events GROUP BY 1
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): per user bucket, one summed column per event
    type. The pivot VALUES are declared explicitly — at scale the implicit
    form runs a distinct-scan job first and risks a column-count blowup;
    declared values keep it one pass."""
    ev = read_table(spark, sf_dir, "events")
    out = (
        ev.withColumn("user_bucket", F.pmod("user_id", F.lit(10)).cast("long"))
        .groupBy("user_bucket")
        .pivot("event_type", _PIVOT_TYPES)
        .agg(F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 2))
    )
    # pivot leaves nulls where a (bucket, type) pair never occurred
    return out.select(
        "user_bucket", *[F.coalesce(F.col(t), F.lit(0.0)).alias(t) for t in _PIVOT_TYPES]
    )


# ---------------------------------------------------------------------------
# events_dau_mau — monthly stickiness ratio (avg DAU / MAU)
# ---------------------------------------------------------------------------

_DAU_MAU_ORACLE = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS d, count(DISTINCT user_id) AS dau
    FROM events GROUP BY 1
), monthly AS (
    SELECT CAST(year(ts) * 100 + month(ts) AS BIGINT) AS ym,
           count(DISTINCT user_id) AS mau
    FROM events GROUP BY 1
), davg AS (
    SELECT CAST(year(d) * 100 + month(d) AS BIGINT) AS ym,
           avg(dau) AS avg_dau
    FROM daily GROUP BY 1
)
SELECT m.ym, round(d.avg_dau, 4) AS avg_dau, m.mau,
       round(d.avg_dau / m.mau, 6) AS stickiness
FROM monthly m JOIN davg d USING (ym)
"""


@query("events_dau_mau", _DAU_MAU_ORACLE)
def events_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly stickiness (avg daily actives / monthly actives) — the
    product-health ratio on every growth dashboard. Two distinct-count
    aggregates at different grains (day, month) over one scan each; the
    join that combines them is months × months — trivial and broadcast.
    avg_dau is rounded at 4dp (it is a ratio of exact integers), the
    stickiness ratio at 6dp.
    """
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    monthly = ev.groupBy(
        (F.year("ts") * 100 + F.month("ts")).cast("long").alias("ym")
    ).agg(F.countDistinct("user_id").alias("mau"))
    davg = daily.groupBy(
        (F.year("d") * 100 + F.month("d")).cast("long").alias("ym")
    ).agg(F.avg("dau").alias("avg_dau"))
    return (
        monthly.join(F.broadcast(davg), "ym")
        .select(
            "ym",
            F.round("avg_dau", 4).alias("avg_dau"),
            "mau",
            F.round(F.col("avg_dau") / F.col("mau"), 6).alias("stickiness"),
        )
    )


# ---------------------------------------------------------------------------
# events_peak_concurrency — sweep-line max concurrent sessions
# ---------------------------------------------------------------------------

_PEAK_ORACLE = """
WITH lagd AS (
    SELECT user_id, ts,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
    FROM events
), flag AS (
    SELECT user_id, ts,
           CASE WHEN pts IS NULL
                     OR epoch_us(ts) - epoch_us(pts) >= 1800000000
                THEN 1 ELSE 0 END AS ns
    FROM lagd
), sid AS (
    SELECT user_id, ts,
           sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS sid
    FROM flag
), sess AS (
    SELECT user_id, sid, min(ts) AS st, max(ts) AS en
    FROM sid GROUP BY 1, 2
), deltas AS (
    SELECT epoch_us(st) AS t, 1 AS d FROM sess
    UNION ALL
    SELECT epoch_us(en) AS t, -1 AS d FROM sess
), run AS (
    SELECT sum(d) OVER (ORDER BY t, d DESC ROWS UNBOUNDED PRECEDING) AS r
    FROM deltas
)
SELECT (SELECT CAST(max(r) AS BIGINT) FROM run) AS peak_concurrency,
       (SELECT count(*) FROM sess) AS n_sessions
"""

_PEAK_BUCKET_US = 3600 * 1_000_000


@query("events_peak_concurrency", _PEAK_ORACLE)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions — the capacity-planning number. Sessions
    are the 30-min-gap sessionization (same boundary rule as
    events_sessionize); each becomes a +1 delta at its start and a -1 at
    its end (closed interval: at an equal instant the +1 applies first),
    and peak concurrency is the max of the running delta sum. The
    running sum is the distributed prefix-scan pattern
    (events_lateness_audit): deltas bucket by hour, a local cumulative
    window runs inside each bucket, and per-bucket totals — a relation
    ~n/3600s rows — prefix-sum and broadcast back. Nothing data-sized
    ever passes through one task.
    """
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flag = ev.select(
        "user_id", "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                >= _GAP_MS * 1000
            ),
            1,
        ).otherwise(0).alias("ns"),
    )
    wc = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = (
        flag.withColumn("sid", F.sum("ns").over(wc))
        .groupBy("user_id", "sid")
        .agg(
            F.unix_micros(F.min("ts")).alias("st"),
            F.unix_micros(F.max("ts")).alias("en"),
        )
    )
    deltas = sess.select(F.col("st").alias("t"), F.lit(1).alias("d")).unionAll(
        sess.select(F.col("en").alias("t"), F.lit(-1).alias("d"))
    )
    deltas = deltas.withColumn("bkt", F.floor(F.col("t") / _PEAK_BUCKET_US))
    loc_w = (
        Window.partitionBy("bkt")
        .orderBy("t", F.desc("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    deltas = deltas.withColumn("run_loc", F.sum("d").over(loc_w))
    btot = deltas.groupBy("bkt").agg(F.sum("d").alias("btot"))
    pw = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    prefix = btot.select("bkt", F.sum("btot").over(pw).alias("prev"))
    run = deltas.join(F.broadcast(prefix), "bkt").select(
        (F.col("run_loc") + F.coalesce("prev", F.lit(0))).alias("r")
    )
    peak = run.agg(F.max("r").cast("bigint").alias("peak_concurrency"))
    nsess = sess.agg(F.count(F.lit(1)).alias("n_sessions"))
    return peak.join(F.broadcast(nsess))


# ---------------------------------------------------------------------------
# events_seasonality_matrix — day-of-week x hour activity heatmap
# ---------------------------------------------------------------------------


def _seasonality_oracle() -> str:
    cols = ",\n           ".join(
        f"CAST(sum(CASE WHEN hour(ts) = {h} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS h{h:02d}"
        for h in range(24)
    )
    return f"""
    SELECT CAST(isodow(ts) AS BIGINT) AS dow,
           {cols}
    FROM events GROUP BY 1
    """


@query("events_seasonality_matrix", _seasonality_oracle())
def events_seasonality_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity matrix (the traffic heatmap
    behind load forecasting and anomaly baselines). ONE hash aggregate:
    7 output rows × 24 conditional-count columns, all whole-stage
    codegen — no pivot machinery, no second pass. dow is ISO (1=Monday)
    via weekday()+1 to match DuckDB's isodow.
    """
    ev = read_table(spark, sf_dir, "events")
    aggs = [
        F.sum((F.hour("ts") == h).cast("long")).cast("bigint").alias(f"h{h:02d}")
        for h in range(24)
    ]
    return (
        ev.groupBy((F.expr("weekday(ts)") + 1).cast("bigint").alias("dow"))
        .agg(*aggs)
    )
