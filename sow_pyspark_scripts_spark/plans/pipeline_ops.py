"""Platform-operations tier: the queries a training-data/warehouse team
runs ABOUT its pipeline, not just through it — storage quantization
quality, shuffle-skew diagnostics, privacy release gates, and accrual
accounting over fact intervals.

Extends the reference's operational posture (its scripts hand-tuned
repartition counts and flag columns — `sql_to_es_etl.py:84`,
`preprocess_and_store_parquets.py:85-87,176`) into measured, queryable
diagnostics.

Scale notes baked into each builder:
- int8 quantization needs ONE tiny aggregate (one row per embedding
  dimension — 64 rows at any corpus size) broadcast back into the flat
  scan; reconstruction errors quantize to integer picounits before the
  per-label sum so the MSE is bit-stable under any partitioning;
- the skew audit never ranks raw rows: the fact collapses to a per-key
  rollup first (one shuffle), and both the heavy-hitter pick and the
  32-bucket histogram are aggregates OVER that rollup — the two 1-row
  summaries meet in a broadcast nested loop, not a shuffle;
- l-diversity is two chained hash aggregates with shrinking keys
  (QI+band -> QI); everything after the first aggregate is bounded by
  the QI-group count, not the table size;
- revenue recognition joins the fact to a pre-aggregated ship-date
  rollup co-partitioned on the SAME key (orderkey), so AQE reuses one
  exchange; the per-month explode is a bounded sequence() fan-out
  (months between order and last ship), and cents are allocated by the
  largest-remainder rule in exact integer arithmetic — no float drift
  deciding which month gets the odd cent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import read_table


# ---------------------------------------------------------------------------
# embedding_quantize_int8 — per-dim affine int8 quantization + quality
# ---------------------------------------------------------------------------

_QUANT_ORACLE = """
WITH flat AS (
    SELECT label,
           generate_subscripts(embedding, 1) AS pos,
           CAST(unnest(embedding) AS DOUBLE) AS v
    FROM embeddings
),
stats AS (SELECT pos, min(v) AS mn, max(v) AS mx FROM flat GROUP BY pos),
q AS (
    SELECT label, v, mn, mx,
           CASE WHEN mx > mn
                THEN floor((v - mn) / ((mx - mn) / 255.0) + 0.5)
                ELSE 0.0 END AS code
    FROM flat JOIN stats USING (pos)
),
e AS (
    SELECT label,
           CAST(floor(
               (CASE WHEN mx > mn THEN code * ((mx - mn) / 255.0) + mn ELSE v END - v)
               * (CASE WHEN mx > mn THEN code * ((mx - mn) / 255.0) + mn ELSE v END - v)
               * 1e12 + 0.5) AS BIGINT) AS err_u
    FROM q
)
SELECT label,
       count(*) AS n_values,
       floor(CAST(sum(err_u) AS DOUBLE) / count(*) / 1e12 * 1e9 + 0.5) / 1e9 AS mse,
       floor(CAST(max(err_u) AS DOUBLE) / 1e12 * 1e9 + 0.5) / 1e9 AS max_sq_err
FROM e GROUP BY label
"""


@query("embedding_quantize_int8", _QUANT_ORACLE)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of the embedding column (per-dimension
    affine min/max codes) with per-label reconstruction error — the
    storage/ANN-index compression gate every vector pipeline runs before
    swapping float32 for int8 (4x smaller shuffles and index pages).

    Plan shape: one posexplode scan; the per-dimension min/max aggregate
    is one row per dimension (64 rows at ANY corpus size) and broadcasts
    back into the flat relation, so the only full-data exchange is the
    final per-label rollup. Squared errors quantize to integer picounits
    (floor(e^2*1e12+0.5)) BEFORE summation: bigint accumulation is
    associative, so the MSE is identical under any partitioning or AQE
    re-plan — and identical to the DuckDB oracle. The affine transform
    is written with the exact same operation order in both engines
    ((v-mn)/((mx-mn)/255.0)), making the IEEE-754 results bitwise equal.
    """
    emb = read_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "label", F.posexplode("embedding").alias("pos", "vf")
    ).select("label", "pos", F.col("vf").cast("double").alias("v"))
    stats = flat.groupBy("pos").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    scale = (F.col("mx") - F.col("mn")) / F.lit(255.0)
    code = F.when(
        F.col("mx") > F.col("mn"),
        F.floor((F.col("v") - F.col("mn")) / scale + F.lit(0.5)).cast("double"),
    ).otherwise(F.lit(0.0))
    dq = F.when(F.col("mx") > F.col("mn"), code * scale + F.col("mn")).otherwise(
        F.col("v")
    )
    err = dq - F.col("v")
    err_u = F.floor(err * err * F.lit(1e12) + F.lit(0.5)).cast("long")
    return (
        flat.join(F.broadcast(stats), "pos")
        .select("label", err_u.alias("err_u"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            (
                F.floor(
                    F.sum("err_u").cast("double")
                    / F.count(F.lit(1))
                    / F.lit(1e12)
                    * F.lit(1e9)
                    + F.lit(0.5)
                )
                / F.lit(1e9)
            ).alias("mse"),
            (
                F.floor(F.max("err_u").cast("double") / F.lit(1e12) * F.lit(1e9) + F.lit(0.5))
                / F.lit(1e9)
            ).alias("max_sq_err"),
        )
    )


# ---------------------------------------------------------------------------
# dq_partition_skew — would THIS key distribution survive a hash shuffle?
# ---------------------------------------------------------------------------

_SKEW_ORACLE = """
WITH keys AS (
    SELECT user_id AS k, count(*) AS c FROM events GROUP BY user_id
),
top AS (SELECT k, c FROM keys ORDER BY c DESC, k DESC LIMIT 1),
buckets AS (SELECT k % 32 AS b, sum(c) AS bc FROM keys GROUP BY 1),
g AS (SELECT sum(c) AS n_rows, count(*) AS n_keys FROM keys),
bs AS (
    SELECT max(bc) AS max_bucket_rows,
           count(*) AS n_buckets,
           sum(bc) AS tot
    FROM buckets
)
SELECT g.n_rows AS n_rows,
       g.n_keys AS n_keys,
       top.k AS top_key,
       top.c AS top_key_rows,
       floor(CAST(top.c AS DOUBLE) / g.n_rows * 1e6 + 0.5) / 1e6 AS top_key_share,
       bs.max_bucket_rows AS max_bucket_rows,
       floor(CAST(bs.max_bucket_rows AS DOUBLE) * bs.n_buckets / bs.tot * 1e6 + 0.5)
           / 1e6 AS imbalance
FROM g, bs, top
"""


@query("dq_partition_skew", _SKEW_ORACLE)
def dq_partition_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew audit for a prospective join/agg key: per-key row
    counts, the heaviest key and its share (decides whether that key
    needs salting — `join_salted_skew`), and the max/avg imbalance of a
    32-way hash partitioning (decides whether AQE skew-join thresholds
    will fire). The diagnostic a platform runs BEFORE the 100 TB join,
    replacing the reference's blind repartition(300/120/60) constants
    (`sql_to_es_etl.py:84`, `preprocess_and_store_parquets.py:176`).

    One full-data shuffle (the per-key rollup); the heavy-hitter pick is
    max(struct(count,key)) — ties break to the larger key, matching the
    oracle's ORDER BY c DESC, k DESC — and the bucket histogram
    aggregates the rollup, not the fact. The two one-row summaries and
    the one-row top pick combine via broadcast joins.
    """
    ev = read_table(spark, sf_dir, "events")
    keys = ev.groupBy(F.col("user_id").alias("k")).agg(F.count(F.lit(1)).alias("c"))
    glob = keys.agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max(F.struct(F.col("c"), F.col("k"))).alias("top"),
    ).select(
        "n_rows",
        "n_keys",
        F.col("top.k").alias("top_key"),
        F.col("top.c").alias("top_key_rows"),
    )
    buckets = keys.groupBy(F.pmod(F.col("k"), F.lit(32)).alias("b")).agg(
        F.sum("c").alias("bc")
    )
    bstats = buckets.agg(
        F.max("bc").alias("max_bucket_rows"),
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("bc").alias("tot"),
    )
    r6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    return (
        glob.crossJoin(F.broadcast(bstats))
        .select(
            "n_rows",
            "n_keys",
            "top_key",
            "top_key_rows",
            r6(F.col("top_key_rows").cast("double") / F.col("n_rows")).alias(
                "top_key_share"
            ),
            "max_bucket_rows",
            r6(
                F.col("max_bucket_rows").cast("double")
                * F.col("n_buckets")
                / F.col("tot")
            ).alias("imbalance"),
        )
    )


# ---------------------------------------------------------------------------
# dq_l_diversity — privacy release gate beyond k-anonymity
# ---------------------------------------------------------------------------

_LDIV_ORACLE = """
WITH t AS (
    SELECT c_nationkey AS nat, c_mktsegment AS seg,
           CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS band
    FROM customer
),
g AS (SELECT nat, seg, band, count(*) AS bc FROM t GROUP BY 1, 2, 3),
q AS (
    SELECT nat, seg, sum(bc) AS k, count(*) AS l_distinct, max(bc) AS top_bc
    FROM g GROUP BY 1, 2
)
SELECT nat, seg, k, l_distinct,
       floor(CAST(top_bc AS DOUBLE) / k * 1e6 + 0.5) / 1e6 AS top_band_share,
       (l_distinct >= 3) AS l_diverse
FROM q
"""


@query("dq_l_diversity", _LDIV_ORACLE)
def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-diversity per quasi-identifier group: with QI =
    (nation, market segment) and the sensitive attribute banded account
    balance, a group is safe to release only if it contains >= 3
    distinct sensitive bands AND no single band dominates — the release
    gate that catches what `dq_k_anonymity` misses (a large group whose
    members all share one sensitive value is still a disclosure).

    Two chained hash aggregates with strictly shrinking keyspace
    ((QI, band) -> QI); the second groupBy reuses the first exchange's
    hash(nat, seg, band) layout prefix under AQE. The dominance share is
    a single bigint/bigint division (exact inputs, one rounding) so the
    hash-match holds at any partitioning.
    """
    cust = read_table(spark, sf_dir, "customer")
    t = cust.select(
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / F.lit(2000.0)).cast("long").alias("band"),
    )
    g = t.groupBy("nat", "seg", "band").agg(F.count(F.lit(1)).alias("bc"))
    q = g.groupBy("nat", "seg").agg(
        F.sum("bc").alias("k"),
        F.count(F.lit(1)).alias("l_distinct"),
        F.max("bc").alias("top_bc"),
    )
    return q.select(
        "nat",
        "seg",
        "k",
        "l_distinct",
        (F.floor(F.col("top_bc").cast("double") / F.col("k") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
            "top_band_share"
        ),
        (F.col("l_distinct") >= 3).alias("l_diverse"),
    )


# ---------------------------------------------------------------------------
# agg_revenue_recognition — pro-rata accrual over the order->ship interval
# ---------------------------------------------------------------------------

_REVREC_ORACLE = """
WITH o AS (
    SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS m0
    FROM orders
),
ship AS (
    SELECT l_orderkey, CAST(date_trunc('month', max(l_shipdate)) AS DATE) AS m1
    FROM lineitem GROUP BY l_orderkey
),
j AS (
    SELECT cents, m0,
           greatest((year(m1) * 12 + month(m1)) - (year(m0) * 12 + month(m0)) + 1,
                    1) AS nm
    FROM o JOIN ship ON l_orderkey = o_orderkey
),
alloc AS (
    SELECT m0, nm, cents,
           unnest(range(0, nm)) AS i
    FROM j
)
SELECT strftime(m0 + to_months(CAST(i AS INT)), '%Y-%m') AS fiscal_month,
       count(*) AS n_allocations,
       floor(CAST(sum(cents // nm + CASE WHEN i < cents % nm THEN 1 ELSE 0 END)
                  AS DOUBLE)) / 100.0 AS recognized_revenue
FROM alloc
GROUP BY 1
"""


@query("agg_revenue_recognition", _REVREC_ORACLE)
def agg_revenue_recognition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accrual accounting over fact intervals: each order's total is
    recognized evenly across the months from order date to its LAST
    line shipment, odd cents assigned by the largest-remainder rule
    (first months get the extra cent) — so every month's ledger sums in
    exact integer cents and the whole allocation reconciles to the
    source to the cent (the `dq_reconcile_order_totals` discipline
    applied to a derived schedule).

    The ship-date rollup and the orders fact shuffle on the SAME key
    (orderkey), so the join is one co-partitioned exchange pair; the
    month explode is sequence(0, nm-1) — bounded per-row fan-out (order
    lifetimes are months, not years), never a calendar cross join.
    Integer division and pmod allocate cents deterministically; no
    double enters until the final /100 display cast.
    """
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    o = orders.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * F.lit(100) + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        F.trunc("o_orderdate", "month").alias("m0"),
    )
    ship = li.groupBy("l_orderkey").agg(
        F.trunc(F.max("l_shipdate"), "month").alias("m1")
    )
    mdiff = (F.year("m1") * 12 + F.month("m1")) - (
        F.year("m0") * 12 + F.month("m0")
    )
    j = o.join(ship, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "cents", "m0", F.greatest(mdiff + 1, F.lit(1)).alias("nm")
    )
    alloc = j.select(
        "m0",
        "nm",
        "cents",
        F.explode(F.sequence(F.lit(0), F.col("nm") - 1)).alias("i"),
    )
    cent_share = (F.col("cents") - F.pmod(F.col("cents"), F.col("nm"))) / F.col(
        "nm"
    )  # exact integer division via subtract-mod (stays long-exact)
    alloc_cents = cent_share.cast("long") + F.when(
        F.col("i") < F.pmod(F.col("cents"), F.col("nm")), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        alloc.select(
            F.date_format(F.add_months(F.col("m0"), F.col("i")), "yyyy-MM").alias(
                "fiscal_month"
            ),
            alloc_cents.alias("a"),
        )
        .groupBy("fiscal_month")
        .agg(
            F.count(F.lit(1)).alias("n_allocations"),
            (F.floor(F.sum("a").cast("double")) / F.lit(100.0)).alias(
                "recognized_revenue"
            ),
        )
    )
