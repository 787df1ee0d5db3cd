"""Flagship query — the reference's E1 pipeline (SQL Server -> ES index,
``sql_to_es_etl.py:54-95``) re-expressed natively over the fixture star
schema (mapping per FIXTURES.md §C):

    D_INCDNT fact            -> orders (+ per-order lineitem rollup for
                                close/resolved date analogs)
    m_org_d dim left join    -> customer
    M_PERS_D two-role join   -> nation joined twice (customer-nation role
                                and supplier-nation role) — the same
                                dimension table in two roles, exactly the
                                reference's assignee/owner pattern
                                (sql_to_es_etl.py:71-72)
    CASE DATEDIFF tat        -> resolved -> closed -> pinned-now fallback
    is_federal LIKE flag     -> c_mktsegment patterns
    month_year bucket        -> concat_ws('-', month, year), no zero-pad

Scale notes (100 TB posture):
  - the lineitem rollup is a partial-aggregable groupBy (map-side combine)
    keyed on the join key, so the fact-side shuffle is shared;
  - customer/nation/supplier are bounded dimensions -> broadcast hash
    joins, zero shuffle on the fact table for those;
  - all derived columns are codegen'd expressions; the whole plan is one
    scan + one shuffle (the rollup) + broadcast joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import is_federal_flag, month_year, tat_days
from ..session import PINNED_NOW
from ..sources import read_table


def incident_etl(spark: SparkSession, sf_dir: str, now_lit: str = PINNED_NOW) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    supplier = read_table(spark, sf_dir, "supplier")
    lineitem = read_table(spark, sf_dir, "lineitem")

    # Per-order rollup: close = last ship, resolved = first ship, plus a
    # deterministic supplier FK for the second dimension role.
    li = lineitem.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("close_dttm"),
        F.min("l_shipdate").alias("resolved_dttm"),
        F.min("l_suppkey").alias("first_suppkey"),
    )

    nat_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("assignee_nation")
    )
    nat_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("owner_nation")
    )
    supp = supplier.select("s_suppkey", "s_nationkey", F.col("s_name").alias("assignee"))

    df = (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left")
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey, "left")
        .join(F.broadcast(nat_cust), F.col("c_nationkey") == F.col("cn_key"), "left")
        .join(F.broadcast(supp), F.col("first_suppkey") == F.col("s_suppkey"), "left")
        .join(F.broadcast(nat_supp), F.col("s_nationkey") == F.col("sn_key"), "left")
    )

    return df.select(
        F.col("o_orderkey").cast("string").alias("incident_number"),
        F.col("o_orderkey").cast("string").alias("row_id"),
        F.col("o_orderpriority").alias("summary"),
        F.col("o_orderstatus").alias("status"),
        F.col("c_name").alias("client_name"),
        F.col("c_mktsegment").alias("client_mnemonic"),
        F.col("assignee"),
        F.col("assignee_nation"),
        F.col("owner_nation"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("open_date"),
        F.date_format("close_dttm", "yyyy-MM-dd").alias("close_date"),
        F.date_format("resolved_dttm", "yyyy-MM-dd").alias("last_resolved_date"),
        tat_days(F.col("o_orderdate"), F.col("resolved_dttm"), F.col("close_dttm"), now_lit).alias("tat"),
        is_federal_flag(F.col("c_mktsegment")).alias("is_federal"),
        F.lit("Remedy").alias("data_source"),
        month_year(F.col("o_orderdate")).alias("month_year"),
        F.round(F.col("o_totalprice"), 2).alias("total_price"),
    )


FLAGSHIP_ORACLE_SQL = """
WITH li AS (
  SELECT l_orderkey,
         max(l_shipdate) AS close_dttm,
         min(l_shipdate) AS resolved_dttm,
         min(l_suppkey)  AS first_suppkey
  FROM lineitem GROUP BY l_orderkey
)
SELECT CAST(o.o_orderkey AS VARCHAR)        AS incident_number,
       CAST(o.o_orderkey AS VARCHAR)        AS row_id,
       o.o_orderpriority                    AS summary,
       o.o_orderstatus                      AS status,
       c.c_name                             AS client_name,
       c.c_mktsegment                       AS client_mnemonic,
       s.s_name                             AS assignee,
       nc.n_name                            AS assignee_nation,
       ns.n_name                            AS owner_nation,
       strftime(o.o_orderdate, '%Y-%m-%d')  AS open_date,
       strftime(li.close_dttm, '%Y-%m-%d')  AS close_date,
       strftime(li.resolved_dttm, '%Y-%m-%d') AS last_resolved_date,
       CAST(CASE WHEN li.resolved_dttm IS NOT NULL THEN datediff('day', o.o_orderdate, li.resolved_dttm)
                 WHEN li.close_dttm IS NOT NULL THEN datediff('day', o.o_orderdate, li.close_dttm)
                 ELSE datediff('day', o.o_orderdate, TIMESTAMP '{now}')
            END AS BIGINT)                  AS tat,
       (c.c_mktsegment LIKE 'MACHINERY' OR c.c_mktsegment LIKE 'BUILDING')
         AND c.c_mktsegment IS NOT NULL     AS is_federal,
       'Remedy'                             AS data_source,
       concat_ws('-', month(o.o_orderdate), year(o.o_orderdate)) AS month_year,
       round(o.o_totalprice, 2)             AS total_price
FROM orders o
LEFT JOIN li ON o.o_orderkey = li.l_orderkey
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN nation nc ON c.c_nationkey = nc.n_nationkey
LEFT JOIN supplier s ON li.first_suppkey = s.s_suppkey
LEFT JOIN nation ns ON s.s_nationkey = ns.n_nationkey
""".replace("{now}", PINNED_NOW)
