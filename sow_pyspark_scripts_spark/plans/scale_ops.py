"""Scale-layout operators: bucketed co-located joins and stream-stream
joins — the two mechanisms that remove the dominant shuffles from a
100 TB deployment.

Bucketing is THE Spark answer to the reference's repeated
repartition-then-join pattern (SURVEY.md §2.10 exec_repartition,
sql_to_es_etl.py:84): pay the shuffle once at write time, then every
future big-big join on the bucket key is exchange-free. The
stream-stream join generalizes the reference's batch join tier
(§2.4) to motion: two watermarked streams joined with an equality key
plus a time-range bound, which lets the state store evict rows as the
watermark advances instead of buffering either side forever.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import read_table
from ..streaming.pipeline import run_to_memory, stream_events

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"

_N_BUCKETS = 8


def _bucket_table(spark: SparkSession, df: DataFrame, name: str, key: str) -> DataFrame:
    """Write df as a bucketed+sorted external parquet table (idempotent
    overwrite) and return the bucketed relation."""
    path = os.path.join(tempfile.gettempdir(), f"spark_bucketed_{name}")
    (
        df.write.bucketBy(_N_BUCKETS, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(name)
    )
    return spark.table(name)


@query(
    "join_bucketed_colocated",
    """
    SELECT o_orderpriority,
           count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-big join with ZERO join-time shuffle: lineitem and orders are
    written once as bucketed tables (8 buckets, hashed and sorted on the
    order key), then joined bucket-to-bucket. The merge hint forces the
    sort-merge path even at fixture scale (where AQE would broadcast) so
    the plan contract can assert the property that matters at 100 TB:
    no Exchange on either join input — bucket layout replaces the
    shuffle, the reference's repartition-before-join
    (sql_to_es_etl.py:84) paid on every run becomes a one-time cost.
    """
    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    # The two bucketed-table writes are independent jobs — overlap them
    # (guide §2.6, r9): actions were only sequential because the driver
    # called them sequentially, and each write's single-digit-task tail
    # left the cluster idle.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_li = pool.submit(
            _bucket_table, spark, li, f"li_bucketed_{tag}", "l_orderkey"
        )
        f_ord = pool.submit(
            _bucket_table, spark, orders, f"ord_bucketed_{tag}", "o_orderkey"
        )
        li_b, ord_b = f_li.result(), f_ord.result()
    return (
        li_b.hint("merge")
        .join(ord_b, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@query(
    "streaming_stream_stream_join",
    f"""
    SELECT v.user_id AS user_id,
           strftime(v.ts, '{_TS_FMT_DUCK}') AS view_ts,
           strftime(p.ts, '{_TS_FMT_DUCK}') AS purchase_ts,
           round(p.value, 2) AS purchase_value
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view'
     AND p.event_type = 'purchase'
     AND p.ts >= v.ts
     AND p.ts <= v.ts + INTERVAL 30 MINUTE
    """,
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: views joined to the purchases that
    follow within 30 minutes, both sides watermarked 1 hour.

    The equality key (user_id) routes both streams to the same state
    partition; the time-range bound plus the watermarks gives the state
    store an eviction horizon — a view buffered longer than
    watermark+30min can never match again and is dropped, so state is
    bounded regardless of stream length. Drained with availableNow over
    the static fixture, which processes everything in order and thus
    drops nothing: the result is exactly the batch join, which is the
    oracle.
    """
    views = (
        stream_events(spark, sf_dir)
        .where(F.col("event_type") == "view")
        .select("user_id", F.col("ts").alias("v_ts"))
        .withWatermark("v_ts", "1 hour")
    )
    purchases = (
        stream_events(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select(
        "user_id",
        F.date_format("v_ts", _TS_FMT_SPARK).alias("view_ts"),
        F.date_format("p_ts", _TS_FMT_SPARK).alias("purchase_ts"),
        F.round("p_value", 2).alias("purchase_value"),
    )
    return run_to_memory(joined, "append", sf_dir=sf_dir)


@query(
    "streaming_stream_static_join",
    """
    SELECT 'seg' || CAST(user_id % 5 AS VARCHAR) AS tier,
           count(*) AS n_events,
           floor(CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE))
               / 100.0 AS revenue
    FROM events GROUP BY 1
    """,
)
def streaming_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against a static
    (batch) dimension — the most common production streaming join (fact
    stream x slowly-refreshed dim). The static side broadcasts into
    EVERY micro-batch with no state store at all (unlike stream-stream,
    there is nothing to buffer: the dim is a snapshot), so this plan
    has zero streaming state and survives any stream length.

    The dim here is a 5-row segment table (`exec_create_df`); the
    drained availableNow aggregate in complete mode equals the batch
    group-by, which is the oracle."""
    from ..streaming.pipeline import run_to_memory, stream_events

    tiers = spark.createDataFrame(
        [(i, f"seg{i}") for i in range(5)], "m long, tier string"
    )
    stream = stream_events(spark, sf_dir).withColumn(
        "m", F.pmod(F.col("user_id"), F.lit(5))
    )
    joined = stream.join(F.broadcast(tiers), "m")
    agg = joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.floor(
                F.sum(
                    F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                ).cast("double")
            )
            / F.lit(100.0)
        ).alias("revenue"),
    )
    return run_to_memory(agg, "complete", sf_dir=sf_dir)
