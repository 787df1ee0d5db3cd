"""Optimizer-statistics / reporting tier: the ANALYZE-style table
statistics an engine keeps about its own data (equi-depth histograms),
the band-lookup non-equi join every tiering/pricing rule needs, fiscal
running totals, and the decision-tree split search that turns the SQL
engine into a feature-engineering tool.

Scale notes:
- the equi-depth histogram computes its 9 boundaries in ONE aggregate
  pass (interpolated percentiles — a fixed-size mergeable state at any
  scale) and broadcasts the 9-value array back; bucket assignment is a
  map-side array filter, so the histogram costs scan + one rollup of 10
  rows. This replaces sort-based binning (a global sort) entirely;
- the band lookup is the one join family where a broadcast NESTED LOOP
  is the right plan: the probe predicate is a pure range, the build
  side is a constant tier table, and every probe row scans 4 rows of
  build state. Never express this as a cross join + filter on two big
  sides;
- YTD totals window over the month-grain rollup (calendar-bounded),
  partitioned by year so the frame never crosses a year boundary and
  cents stay integer-exact;
- the Gini split search fans each fact row out to the 9 candidate
  splits map-side (bounded constant), aggregates integer class counts
  per (candidate, side), and the impurity argmin runs over 9 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import read_table

_DECILES = [k / 10.0 for k in range(1, 10)]


# ---------------------------------------------------------------------------
# dq_equidepth_histogram — ANALYZE-style 10-bucket equi-depth histogram
# ---------------------------------------------------------------------------

def _hist_sql() -> str:
    bounds = ",\n           ".join(
        f"floor(quantile_cont(o_totalprice, {p}) * 1e6 + 0.5) / 1e6 AS b{k}"
        for k, p in enumerate(_DECILES, start=1)
    )
    blist = ", ".join(f"b{k}" for k in range(1, 10))
    return f"""
WITH b AS (
    SELECT {bounds}
    FROM orders
),
binned AS (
    SELECT 1 + len(list_filter([{blist}], v -> o_totalprice > v)) AS bucket,
           o_totalprice AS p
    FROM orders, b
)
SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_rows,
       floor(min(p) * 100 + 0.5) / 100.0 AS min_v,
       floor(max(p) * 100 + 0.5) / 100.0 AS max_v
FROM binned GROUP BY bucket
"""


@query("dq_equidepth_histogram", _hist_sql())
def dq_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-frequency) 10-bucket histogram of order value —
    the ANALYZE statistic a cost-based optimizer keeps per column, and
    the binning a feature pipeline uses where equal-width bins
    (`text_length_histogram`) would collapse under skew.

    The 9 interpolated decile boundaries come from ONE aggregate pass
    (percentile state is fixed-size and mergeable — no global sort, no
    ntile over the full table), get rounded to 1e-6 so both engines
    compare against identical constants, and broadcast back as a 9-value
    array; bucket assignment is a map-side higher-order filter and the
    final rollup has exactly 10 rows at any data scale."""
    orders = read_table(spark, sf_dir, "orders")
    r6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    b = orders.agg(
        F.array(*[r6(F.percentile("o_totalprice", p)) for p in _DECILES]).alias("bl")
    )
    binned = orders.crossJoin(F.broadcast(b)).select(
        (
            1 + F.size(F.filter(F.col("bl"), lambda v: F.col("o_totalprice") > v))
        ).cast("long").alias("bucket"),
        F.col("o_totalprice").alias("p"),
    )
    r2 = lambda c: F.floor(c * 100 + F.lit(0.5)) / F.lit(100.0)  # noqa: E731
    return binned.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        r2(F.min("p")).alias("min_v"),
        r2(F.max("p")).alias("max_v"),
    )


# ---------------------------------------------------------------------------
# join_band_lookup — broadcast nested-loop range lookup
# ---------------------------------------------------------------------------

_TIERS = [
    ("bronze", 0.0, 50000.0),
    ("silver", 50000.0, 150000.0),
    ("gold", 150000.0, 300000.0),
    ("platinum", 300000.0, 1e18),
]


def _band_sql() -> str:
    rows = ", ".join(f"('{t}', {lo}, {hi})" for t, lo, hi in _TIERS)
    return f"""
WITH tiers(tier, lo, hi) AS (VALUES {rows})
SELECT tier, count(*) AS n_orders,
       floor(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE))
           / 100.0 AS revenue
FROM orders JOIN tiers ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY tier
"""


@query("join_band_lookup", _band_sql())
def join_band_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band lookup: assign every order to a value tier via a pure-range
    join against a constant 4-row tier table — the pricing/tiering/SLA
    bucket join that has NO equi-key. The only sane physical plan is a
    broadcast nested loop (each probe row scans 4 build rows); the
    degenerate alternatives — cross join then filter, or a sort-merge
    band join — move the fact table for a 4-row lookup.

    The tier table is a createDataFrame literal (`exec_create_df`) and
    broadcasts explicitly; revenue sums exact integer cents."""
    orders = read_table(spark, sf_dir, "orders")
    tiers = spark.createDataFrame(_TIERS, "tier string, lo double, hi double")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return (
        orders.join(
            F.broadcast(tiers),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.floor(F.sum(cents).cast("double")) / F.lit(100.0)).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# win_ytd_running_total — fiscal running totals with year reset
# ---------------------------------------------------------------------------

_YTD_ORACLE = """
WITH m AS (
    SELECT year(o_orderdate) AS yr,
           strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m') AS mo,
           sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
    FROM orders GROUP BY 1, 2
)
SELECT mo AS fiscal_month,
       floor(CAST(cents AS DOUBLE)) / 100.0 AS monthly_revenue,
       floor(CAST(sum(cents) OVER (PARTITION BY yr ORDER BY mo
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS DOUBLE)) / 100.0
           AS ytd_revenue
FROM m
"""


@query("win_ytd_running_total", _YTD_ORACLE)
def win_ytd_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-to-date running revenue by month with a reset at each fiscal
    year boundary — the finance-report staple, and the frame-reset
    pattern (`PARTITION BY year`) that a naive global cumulative window
    gets wrong.

    The fact collapses to month grain first (calendar-bounded rollup),
    so the cumulative window runs over at most 12 rows per year
    partition; cents stay integer through the window and convert to
    dollars only in the projection."""
    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.year("o_orderdate").alias("yr"),
        F.date_format(F.trunc("o_orderdate", "month"), "yyyy-MM").alias("mo"),
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("cents")
    )
    w = Window.partitionBy("yr").orderBy("mo").rowsBetween(
        Window.unboundedPreceding, 0
    )
    dollars = lambda c: F.floor(c.cast("double")) / F.lit(100.0)  # noqa: E731
    return m.select(
        F.col("mo").alias("fiscal_month"),
        dollars(F.col("cents")).alias("monthly_revenue"),
        dollars(F.sum("cents").over(w)).alias("ytd_revenue"),
    )


# ---------------------------------------------------------------------------
# ml_best_split_gini — decision-tree split search as one aggregate
# ---------------------------------------------------------------------------

def _gini_sql() -> str:
    bounds = ",\n           ".join(
        f"floor(quantile_cont(l_extendedprice, {p}) * 1e6 + 0.5) / 1e6 AS b{k}"
        for k, p in enumerate(_DECILES, start=1)
    )
    blist = ", ".join(f"b{k}" for k in range(1, 10))
    return f"""
WITH b AS (SELECT {bounds} FROM lineitem),
cand AS (SELECT unnest([{blist}]) AS split FROM b),
assigned AS (
    SELECT split, (l_extendedprice <= split) AS left_side, l_returnflag AS cls
    FROM lineitem, cand
),
cc AS (
    SELECT split, left_side, cls, count(*) AS cnt
    FROM assigned GROUP BY 1, 2, 3
),
sides AS (
    SELECT split, left_side, sum(cnt) AS ns, sum(cnt * cnt) AS ss
    FROM cc GROUP BY 1, 2
),
g AS (
    SELECT split,
           sum(ns - CAST(ss AS DOUBLE) / ns)
               / sum(ns) AS gini,
           sum(CASE WHEN left_side THEN ns ELSE 0 END) AS n_left,
           sum(CASE WHEN NOT left_side THEN ns ELSE 0 END) AS n_right
    FROM sides GROUP BY split
)
SELECT split AS best_split,
       floor(gini * 1e6 + 0.5) / 1e6 AS gini,
       n_left, n_right
FROM g ORDER BY gini ASC, split ASC LIMIT 1
"""


@query("ml_best_split_gini", _gini_sql())
def ml_best_split_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-tree split search: among the 9 price deciles, find the
    split of l_extendedprice that minimizes weighted Gini impurity of
    the return-flag classes — the inner loop of tree training (and of
    feature-binning quality checks), run as ONE scan + one bounded
    aggregate instead of 9 passes.

    Candidates come from the same one-pass percentile state as
    `dq_equidepth_histogram` and broadcast back; each fact row fans out
    to 9 (candidate, side, class) keys map-side; class counts are exact
    integers, so the impurity Σ_side (n_s - Σ_c cnt²/n_s) / n is two
    exact-input double divisions per candidate and the argmin over 9
    rows is bit-stable. The float sum over sides is a two-term add —
    commutative bitwise, partition-order-proof."""
    li = read_table(spark, sf_dir, "lineitem")
    r6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    b = li.agg(
        F.array(*[r6(F.percentile("l_extendedprice", p)) for p in _DECILES]).alias("bl")
    )
    cand = b.select(F.explode("bl").alias("split"))
    assigned = li.crossJoin(F.broadcast(cand)).select(
        "split",
        (F.col("l_extendedprice") <= F.col("split")).alias("left_side"),
        F.col("l_returnflag").alias("cls"),
    )
    cc = assigned.groupBy("split", "left_side", "cls").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    sides = cc.groupBy("split", "left_side").agg(
        F.sum("cnt").alias("ns"), F.sum(F.col("cnt") * F.col("cnt")).alias("ss")
    )
    g = sides.groupBy("split").agg(
        (
            F.sum(F.col("ns") - F.col("ss").cast("double") / F.col("ns"))
            / F.sum("ns")
        ).alias("gini"),
        F.sum(F.when(F.col("left_side"), F.col("ns")).otherwise(0)).alias("n_left"),
        F.sum(F.when(~F.col("left_side"), F.col("ns")).otherwise(0)).alias("n_right"),
    )
    return (
        g.orderBy(F.asc("gini"), F.asc("split"))
        .limit(1)
        .select(
            F.col("split").alias("best_split"),
            r6(F.col("gini")).alias("gini"),
            "n_left",
            "n_right",
        )
    )
