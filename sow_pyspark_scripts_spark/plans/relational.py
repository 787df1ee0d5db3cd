"""Registered relational queries — SURVEY.md §2.2-2.7 operator inventory
re-expressed over the fixture tables, each with a DuckDB oracle twin.

Conventions for oracle parity (FIXTURES.md determinism rules):
  - computed/aggregate columns aliased identically on both sides
  - integer outputs cast to BIGINT on both sides (Spark month() is int,
    DuckDB's is bigint, etc.)
  - doubles rounded (sum->2dp, avg/ratio->4dp)
  - timestamps emitted as formatted strings
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import not_like_all
from ..operators.relational import (
    cast_all_to_string,
    exclusion_anti_join,
    pad_null_columns,
    range_slice,
    top_n_per_group,
    with_chunk_ids,
)
from ..registry import query
from ..sources import read_table
from ..sources.writers import latest_by_key

# --- §2.2 projections ------------------------------------------------------


@query(
    "proj_alias_cast",
    """
    SELECT CAST(o_orderkey AS VARCHAR) AS incident_number,
           o_orderpriority AS priority,
           o_orderstatus AS status,
           CAST(o_custkey AS BIGINT) AS client_id,
           round(o_totalprice, 2) AS total_price,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS open_ts
    FROM orders
    """,
)
def proj_alias_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """proj_alias + proj_selectexpr_rename + proj_cast (sql_to_es_etl.py:86-92):
    bulk rename via selectExpr plus targeted casts."""
    return read_table(spark, sf_dir, "orders").selectExpr(
        "CAST(o_orderkey AS STRING) AS incident_number",
        "o_orderpriority AS priority",
        "o_orderstatus AS status",
        "CAST(o_custkey AS BIGINT) AS client_id",
        "round(o_totalprice, 2) AS total_price",
        "date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss') AS open_ts",
    )


@query(
    "proj_cast_all",
    """
    SELECT CAST(n_nationkey AS VARCHAR) AS n_nationkey,
           CAST(n_name AS VARCHAR) AS n_name,
           CAST(n_regionkey AS VARCHAR) AS n_regionkey
    FROM nation
    """,
)
def proj_cast_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """proj_cast_all (snowflake_to_es_etl.py:230): every column -> string,
    names preserved."""
    return cast_all_to_string(read_table(spark, sf_dir, "nation"))


@query(
    "proj_lit_null_pad",
    """
    SELECT CAST(o_orderkey AS VARCHAR) AS incident_number,
           o_orderstatus AS status,
           CAST(NULL AS VARCHAR) AS severity,
           CAST(NULL AS VARCHAR) AS priority_padded,
           CAST(NULL AS VARCHAR) AS sub_status,
           'Remedy' AS data_source
    FROM orders
    """,
)
def proj_lit_null_pad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """proj_lit_null + proj_lit_const (snowflake_to_es_etl.py:69-72):
    NULL-pad a target schema + constant source column."""
    df = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("incident_number"),
        F.col("o_orderstatus").alias("status"),
    )
    df = pad_null_columns(df, ["severity", "priority_padded", "sub_status"])
    return df.withColumn("data_source", F.lit("Remedy"))


@query(
    "proj_drop_prune",
    """
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
    FROM lineitem
    """,
)
def proj_drop_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """proj_drop (snowflake_to_es_etl.py:227-228) + proj_prune
    (preprocess_and_store_parquets.py:188): drop a column list, keep a
    narrow projection. Catalyst folds both into the scan's ReadSchema."""
    li = read_table(spark, sf_dir, "lineitem")
    dropped = li.drop("l_tax", "l_discount", "l_returnflag", "l_linestatus", "l_shipdate")
    return dropped.select(
        "l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price")
    )


# --- §2.3 filters ----------------------------------------------------------


@query(
    "filter_not_like_escape",
    r"""
    SELECT n_nationkey, n_name FROM nation
    WHERE n_name NOT LIKE '%\_1%' ESCAPE '\'
      AND n_name NOT LIKE '%\_2_' ESCAPE '\'
    """,
)
def filter_not_like_escape(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""filter_not_like (snowflake_to_es_etl.py:79-81): multi-term NOT LIKE
    with the T-SQL ``[_]`` char-class escape for a literal underscore.
    '%[_]1%' excludes NATION_1, NATION_1x; '%[_]2_' excludes NATION_2x
    (bare ``_`` stays a single-char wildcard)."""
    nation = read_table(spark, sf_dir, "nation")
    return nation.filter(
        not_like_all(F.col("n_name"), ["%[_]1%", "%[_]2_"])
    ).select("n_nationkey", "n_name")


@query(
    "filter_not_in",
    """
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    WHERE c_mktsegment NOT IN ('MACHINERY', 'BUILDING', 'NO_SUCH_SEGMENT')
    """,
)
def filter_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter_not_in (snowflake_to_es_etl.py:81-85): literal-list exclusion."""
    return (
        read_table(spark, sf_dir, "customer")
        .filter(~F.col("c_mktsegment").isin(["MACHINERY", "BUILDING", "NO_SUCH_SEGMENT"]))
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@query(
    "join_anti_exclusion",
    """
    SELECT c.c_custkey, c.c_name FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM nation n
      WHERE n.n_nationkey = c.c_nationkey AND n.n_name LIKE 'NATION\\_1%' ESCAPE '\\'
    )
    """,
)
def join_anti_exclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB formulation of filter_not_in (SURVEY.md §2.4): when the
    exclusion list is a table, NOT IN becomes a broadcast left_anti join
    (null-safe NOT EXISTS semantics, no literal list shipped in the plan)."""
    customer = read_table(spark, sf_dir, "customer")
    excluded = (
        read_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").rlike("^NATION_1"))
        .select(F.col("n_nationkey").alias("ex_key"))
    )
    return exclusion_anti_join(
        customer, F.col("c_nationkey"), F.broadcast(excluded), "ex_key"
    ).select("c_custkey", "c_name")


# --- §2.5 aggregations / distinct ------------------------------------------


@query(
    "agg_distinct",
    """
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agg_distinct (snowflake_to_es_etl.py:64): SELECT DISTINCT == hash
    aggregate on all projected columns; partial aggregation makes the
    shuffle carry only distinct values per map task."""
    return read_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "agg_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the groupBy().agg() surface the
    reference gets for free (SURVEY.md §2.5). Map-side partial aggregation
    means the shuffle carries (flag,status) groups, not rows."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_collect_batch",
    """
    WITH numbered AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY doc_id) AS row_num
      FROM documents
    )
    SELECT CAST(floor((row_num - 1) / 100) AS BIGINT) AS chunk,
           coalesce(array_to_string(
             list(CAST(doc_id AS VARCHAR) ORDER BY CAST(doc_id AS VARCHAR)),
             chr(31)), '') AS all_ids,
           count(*) AS batch_size
    FROM numbered GROUP BY 1
    """,
)
def agg_collect_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agg_collect_batch (preprocess_and_store_parquets.py:234-238): the
    reference collect()ed each 10k-row slice to the driver and rebuilt a
    one-row DataFrame of arrays. Native form: chunk column + groupBy +
    collect_list — executors build the batches, the driver never sees data.
    array_sort pins the intra-batch order for the oracle. The batch is
    emitted as a chr(31)-joined string (stable, hashable serialization of
    array<string> for any downstream harness)."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    chunked = with_chunk_ids(docs, ["doc_id"], 100)
    return chunked.groupBy("chunk").agg(
        F.concat_ws(
            "\x1f",
            F.array_sort(F.collect_list(F.col("doc_id").cast("string"))),
        ).alias("all_ids"),
        F.count(F.lit(1)).alias("batch_size"),
    )


# --- §2.6 windows / slices --------------------------------------------------


@query(
    "win_row_number_chunk",
    """
    SELECT doc_id,
           row_number() OVER (ORDER BY doc_id) AS row_num,
           CAST(floor((row_number() OVER (ORDER BY doc_id) - 1) / 100) AS BIGINT) AS chunk
    FROM documents
    """,
)
def win_row_number_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """win_row_number_global redesigned (preprocess_and_store_parquets.py:210-212):
    the reference's dummy-partition row_number serialized all rows through
    one task; here the ordering is a real sortable key so Spark
    range-partitions the sort, and chunk membership is a pure expression."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    return with_chunk_ids(docs, ["doc_id"], 100)


@query(
    "filter_range_slice",
    """
    WITH numbered AS (
      SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS row_num
      FROM documents
    )
    SELECT doc_id, row_num FROM numbered WHERE row_num > 100 AND row_num <= 200
    """,
)
def filter_range_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter_range_slice (preprocess_and_store_parquets.py:226-230): the
    reference's SQL chunk slice `where row_num > i and row_num <= i+N`."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    numbered = with_chunk_ids(docs, ["doc_id"], 100).select("doc_id", "row_num")
    return range_slice(numbered, "row_num", 100, 200)


@query(
    "win_topn_per_group",
    """
    SELECT * FROM (
      SELECT c.c_mktsegment AS segment,
             CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
             round(o.o_totalprice, 2) AS total_price,
             row_number() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rn <= 3
    """,
)
def win_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window beyond the reference's row_number (SURVEY.md §2.6
    'engine gets the full Window surface free'): top-3 orders by price per
    market segment, deterministic via orderkey tiebreak."""
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    joined = orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.round("o_totalprice", 2).alias("total_price"),
        F.col("o_totalprice"),
    )
    ranked = top_n_per_group(
        joined, ["segment"], [F.col("o_totalprice").desc(), F.col("o_orderkey")], 3
    )
    return ranked.select("segment", "o_orderkey", "total_price", "rn")


# --- §2.7 set operations ----------------------------------------------------


@query(
    "set_union_by_name",
    """
    SELECT CAST(o_orderkey AS VARCHAR) AS incident_number, o_orderpriority AS priority, 'urgent' AS tier
    FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT CAST(o_orderkey AS VARCHAR) AS incident_number, o_orderpriority AS priority, 'low' AS tier
    FROM orders WHERE o_orderpriority = '5-LOW'
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """set_union_by_name (preprocess_and_store_parquets.py:217,240):
    unionByName resolves by column NAME — the two branches deliberately
    project in different column orders."""
    orders = read_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").cast("string").alias("incident_number"),
        F.col("o_orderpriority").alias("priority"),
        F.lit("urgent").alias("tier"),
    )
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.lit("low").alias("tier"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderkey").cast("string").alias("incident_number"),
    )
    return urgent.unionByName(low)


@query(
    "set_except_intersect",
    """
    WITH y95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
         y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
    SELECT o_custkey, 'only_1995' AS bucket FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
    UNION ALL
    SELECT o_custkey, 'both' AS bucket FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)
    """,
)
def set_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops beyond the reference (SURVEY.md §2.7 'no intersect/except in
    the reference' — exposed because the engine gets them free): customers
    ordering only in 1995 vs in both 1995 and 1996."""
    orders = read_table(spark, sf_dir, "orders")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    only95 = y95.exceptAll(y96).withColumn("bucket", F.lit("only_1995"))
    both = y95.intersect(y96).withColumn("bucket", F.lit("both"))
    return only95.unionByName(both)


# --- sink semantics as queries ---------------------------------------------


@query(
    "upsert_latest_by_key",
    """
    SELECT user_id, event_type, value, ts_str FROM (
      SELECT user_id,
             event_type,
             round(value, 2) AS value,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS __rn
      FROM events
    ) WHERE __rn = 1
    """,
)
def upsert_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sink_es_upsert semantics (snowflake_to_es_etl.py:234-241): merge-by-key
    keeping the newest document per key — one hash shuffle on the key,
    AQE splits skewed keys."""
    events = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.round("value", 2).alias("value"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        "ts",
        "event_id",
    )
    out = latest_by_key(events, ["user_id"], "ts", ["event_id"])
    return out.select("user_id", "event_type", "value", "ts_str")


@query(
    "snowflake_etl_e2",
    """
    WITH src AS (
      SELECT DISTINCT
             CAST(o_orderkey AS VARCHAR) AS incident_number,
             o_orderstatus AS status,
             o_orderpriority AS priority,
             CAST(o_custkey AS VARCHAR) AS client_id,
             CAST(NULL AS VARCHAR) AS severity,
             CAST(NULL AS VARCHAR) AS sub_status,
             'Remedy' AS data_source,
             CAST(round(o_totalprice, 2) AS VARCHAR) AS total_price,
             strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS open_ts
      FROM orders
      WHERE o_orderpriority NOT IN ('5-LOW', 'NO_SUCH')
        AND o_orderstatus NOT LIKE '%X%'
    )
    SELECT incident_number, status, priority, client_id, severity,
           sub_status, data_source, total_price, open_ts
    FROM (
      SELECT *, row_number() OVER (PARTITION BY incident_number
                                   ORDER BY open_ts DESC) AS __rn
      FROM src
    ) WHERE __rn = 1
    """,
)
def snowflake_etl_e2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 end-to-end (snowflake_to_es_etl.py:64-241 re-expressed): DISTINCT
    over the projection, NOT IN / NOT LIKE exclusions, NULL padding to the
    target schema, constant source column, drop of working columns,
    cast-ALL-to-string, then latest-by-key merge — the upsert sink's
    semantics. One pipeline composing six §2 operator ids."""
    orders = read_table(spark, sf_dir, "orders")
    projected = (
        orders.filter(
            ~F.col("o_orderpriority").isin("5-LOW", "NO_SUCH")
            & ~F.col("o_orderstatus").like("%X%")
        )
        .select(
            F.col("o_orderkey").cast("string").alias("incident_number"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_custkey").cast("string").alias("client_id"),
            F.round("o_totalprice", 2).alias("total_price"),
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("open_ts"),
            F.col("o_orderdate").alias("__work_dt"),
        )
        .distinct()
    )
    padded = pad_null_columns(projected, ["severity", "sub_status"]).withColumn(
        "data_source", F.lit("Remedy")
    )
    dropped = padded.drop("__work_dt")
    stringy = cast_all_to_string(dropped)
    merged = latest_by_key(stringy, ["incident_number"], "open_ts")
    return merged.select(
        "incident_number", "status", "priority", "client_id", "severity",
        "sub_status", "data_source", "total_price", "open_ts",
    )


@query(
    "agg_shipping_priority",
    """
    SELECT CAST(l.l_orderkey AS BIGINT) AS l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def agg_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (segment filter -> 2 joins -> revenue agg -> global
    top-10): the canonical join-order test. Both filters reach their scans
    as PushedFilters; customer broadcasts; the ORDER BY+LIMIT plans as
    TakeOrderedAndProject (per-partition top-10 then merge — never a full
    global sort)."""
    c = read_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    l = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("l_orderkey").cast("long").alias("l_orderkey"), "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )
