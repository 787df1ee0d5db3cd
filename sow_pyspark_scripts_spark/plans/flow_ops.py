"""Flow-matching tier: FIFO lot allocation (supply matched to demand
in arrival order), URL route-template classification, and bipartite
butterfly (4-cycle) counting — three operators whose naive forms are
sequential matching loops, regex loops, and quartic enumeration.

Scale notes baked into each builder:
- FIFO allocation is the classic "needs a matching loop" job made
  relational: receipts and demands each get CUMULATIVE quantity
  ranges via keyed prefix sums (per-part windows, deterministic
  tie-broken ordering), and FIFO's matching IS interval overlap of
  the two cumulative axes — a co-partitioned part-keyed join with an
  overlap predicate, allocated qty = overlap length, exact bigints.
  Per-part work is receipts+demands rows, one shuffle each side;
- route matching is the `join_ip_cidr_prefix` idea for URLs: a
  broadcast literal route table joined by rlike (bounded
  nested-loop over ~7 routes), most-specific template wins by
  arg-max on literal specificity — no per-row regex loop in Python;
- butterfly counting (4-cycles through 2 orders x 2 parts) reduces
  to Σ C(co_count, 2) over the co-occurrence pair rollup: the pair
  join is bounded by per-order basket size (array self-explode, the
  `basket_affinity_pairs` discipline), and the quartic structure
  count falls out of a hash aggregate — never 4-way joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import read_table


# ---------------------------------------------------------------------------
# agg_fifo_lot_allocation — FIFO matching as interval overlap
# ---------------------------------------------------------------------------

_FIFO_ORACLE = """
WITH receipts AS (
    SELECT l_partkey,
           ROW_NUMBER() OVER w AS rk,
           CAST(l_quantity AS BIGINT) AS q,
           COALESCE(SUM(CAST(l_quantity AS BIGINT)) OVER
               (PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey,
                l_linenumber, l_suppkey, CAST(l_quantity AS BIGINT)
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo
    FROM lineitem WHERE l_returnflag = 'N'
    WINDOW w AS (PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey,
                 l_linenumber, l_suppkey, CAST(l_quantity AS BIGINT))
),
demands AS (
    SELECT l_partkey,
           ROW_NUMBER() OVER w AS dk,
           CAST(l_quantity AS BIGINT) AS q,
           COALESCE(SUM(CAST(l_quantity AS BIGINT)) OVER
               (PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey,
                l_linenumber, l_suppkey, CAST(l_quantity AS BIGINT)
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo
    FROM lineitem WHERE l_returnflag = 'R'
    WINDOW w AS (PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey,
                 l_linenumber, l_suppkey, CAST(l_quantity AS BIGINT))
)
SELECT r.l_partkey, r.rk AS receipt_seq, d.dk AS demand_seq,
       LEAST(r.lo + r.q, d.lo + d.q) - GREATEST(r.lo, d.lo) AS qty_allocated
FROM receipts r JOIN demands d
  ON r.l_partkey = d.l_partkey
 AND r.lo < d.lo + d.q AND d.lo < r.lo + r.q
"""


@query("agg_fifo_lot_allocation", _FIFO_ORACLE)
def agg_fifo_lot_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO lot allocation: match each part's returned quantity ('R'
    lines, in ship order) against its received lots ('N' lines, in
    ship order) first-in-first-out — the costing/traceability
    primitive (which lot did this return draw down?) that is
    textbook-sequential: walk both lists with two pointers. The
    relational form: each side gets cumulative-quantity ranges
    [lo, lo+q) from a keyed prefix sum, and FIFO matching IS interval
    overlap on the cumulative axis — receipt r supplies demand d iff
    their ranges intersect, with allocated qty = overlap length
    (min(hi)-max(lo), bigint-exact). One part-keyed shuffle per side,
    a co-partitioned equi-join with the overlap predicate, zero
    iteration; per-part output is receipts+demands-1 rows max.
    Orderings are fully tie-broken (shipdate, orderkey, linenumber,
    suppkey, qty) — rows still tied are identical, hence
    interchangeable — so ranks and ranges are engine-deterministic.
    """
    li = read_table(spark, sf_dir, "lineitem")

    def side(flag):
        w = Window.partitionBy("l_partkey").orderBy(
            "l_shipdate", "l_orderkey", "l_linenumber", "l_suppkey", "q"
        )
        return (
            li.where(F.col("l_returnflag") == flag)
            .select(
                "l_partkey",
                "l_shipdate",
                "l_orderkey",
                "l_linenumber",
                "l_suppkey",
                F.col("l_quantity").cast("long").alias("q"),
            )
            .select(
                "l_partkey",
                F.row_number().over(w).alias("seq"),
                "q",
                F.coalesce(
                    F.sum("q").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                    F.lit(0),
                ).alias("lo"),
            )
        )

    r = side("N").select(
        F.col("l_partkey").alias("pk"),
        F.col("seq").cast("long").alias("receipt_seq"),
        F.col("q").alias("rq"),
        F.col("lo").alias("rlo"),
    )
    d = side("R").select(
        F.col("l_partkey").alias("dk_pk"),
        F.col("seq").cast("long").alias("demand_seq"),
        F.col("q").alias("dq"),
        F.col("lo").alias("dlo"),
    )
    return (
        r.join(
            d,
            (F.col("pk") == F.col("dk_pk"))
            & (F.col("rlo") < F.col("dlo") + F.col("dq"))
            & (F.col("dlo") < F.col("rlo") + F.col("rq")),
        )
        .select(
            F.col("pk").alias("l_partkey"),
            "receipt_seq",
            "demand_seq",
            (
                F.least(F.col("rlo") + F.col("rq"), F.col("dlo") + F.col("dq"))
                - F.greatest(F.col("rlo"), F.col("dlo"))
            ).alias("qty_allocated"),
        )
    )


# ---------------------------------------------------------------------------
# expr_url_route_match — template classification of request paths
# ---------------------------------------------------------------------------

_ROUTES = [
    (r"^/users/[0-9]+$", "user_detail", 3),
    (r"^/users/[0-9]+/orders$", "user_orders", 4),
    (r"^/users/.*$", "user_area", 1),
    (r"^/search.*$", "search", 2),
    (r"^/items/[0-9]+$", "item_detail", 3),
    (r"^/.*$", "other", 0),
]
_ROUTE_VALUES = ", ".join(
    f"('{p}', '{n}', {s})" for p, n, s in _ROUTES
)

_ROUTE_ORACLE = f"""
WITH routes(pat, route, spec) AS (VALUES {_ROUTE_VALUES}),
urls AS (
    SELECT event_id,
           CASE event_id % 5
                WHEN 0 THEN '/users/' || CAST(user_id AS VARCHAR)
                WHEN 1 THEN '/users/' || CAST(user_id AS VARCHAR) || '/orders'
                WHEN 2 THEN '/search?q=' || event_type
                WHEN 3 THEN '/items/' || CAST(event_id % 1000 AS VARCHAR)
                ELSE '/' || event_type || '/misc'
           END AS path
    FROM events
),
matched AS (
    SELECT u.event_id, u.path,
           arg_max(r.route, r.spec) AS route
    FROM urls u JOIN routes r ON regexp_matches(u.path, r.pat)
    GROUP BY 1, 2
)
SELECT route, COUNT(*) AS n FROM matched GROUP BY 1
"""


@query("expr_url_route_match", _ROUTE_ORACLE)
def expr_url_route_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route-template classification of request paths: each (synthetic)
    URL matches against a broadcast route table and the most specific
    matching template wins — the step that turns raw access logs into
    per-endpoint traffic (`expr_url_parse` decomposes URLs; this
    names them). The catch-all '/.*' route guarantees totality;
    overlapping templates ('/users/.*' vs '/users/{{id}}/orders')
    exercise specificity arg-max — the `join_ip_cidr_prefix`
    longest-prefix idea transplanted to regex space. The match is a
    bounded nested-loop join against ~6 broadcast routes evaluated
    JVM-side (rlike), never a per-row Python loop; output is the
    per-route rollup.
    """
    ev = read_table(spark, sf_dir, "events")
    urls = ev.select(
        "event_id",
        F.when(
            F.col("event_id") % 5 == 0,
            F.concat(F.lit("/users/"), F.col("user_id")),
        )
        .when(
            F.col("event_id") % 5 == 1,
            F.concat(F.lit("/users/"), F.col("user_id"), F.lit("/orders")),
        )
        .when(
            F.col("event_id") % 5 == 2,
            F.concat(F.lit("/search?q="), F.col("event_type")),
        )
        .when(
            F.col("event_id") % 5 == 3,
            F.concat(F.lit("/items/"), (F.col("event_id") % 1000)),
        )
        .otherwise(F.concat(F.lit("/"), F.col("event_type"), F.lit("/misc")))
        .alias("path"),
    )
    routes = spark.createDataFrame(_ROUTES, "pat string, route string, spec int")
    return (
        urls.join(F.broadcast(routes), F.expr("path rlike pat"))
        .groupBy("event_id", "path")
        .agg(F.max_by("route", "spec").alias("route"))
        .groupBy("route")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# graph_butterfly_count — bipartite 4-cycles without 4-way joins
# ---------------------------------------------------------------------------

_BFLY_ORACLE = """
WITH baskets AS (
    SELECT l_orderkey, list_sort(list(DISTINCT l_partkey)) AS parts
    FROM lineitem GROUP BY 1
),
pairs AS (
    SELECT p1.p AS a, p2.p AS b
    FROM baskets,
         UNNEST(parts) AS p1(p),
         UNNEST(parts) AS p2(p)
    WHERE p1.p < p2.p
),
co AS (SELECT a, b, COUNT(*) AS c FROM pairs GROUP BY 1, 2)
SELECT SUM(c * (c - 1) // 2) AS butterflies,
       SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS linked_pairs,
       COUNT(*) AS copurchase_pairs
FROM co
"""


@query("graph_butterfly_count", _BFLY_ORACLE)
def graph_butterfly_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Butterfly (bipartite 4-cycle) count over the order-part graph:
    a butterfly is two orders sharing two parts — the bipartite
    analogue of the triangle (`graph_triangle_count`) and the
    standard cohesion/spam signal for co-purchase and user-item
    graphs (dense butterfly neighborhoods = copy-paste baskets or
    bot rings). Enumerating 4-cycles is quartic; the identity
    butterflies = Σ_pairs C(co_count, 2) reduces it to the part-pair
    co-occurrence rollup: per-order baskets self-explode into pairs
    (fan-out bounded by basket size², the `basket_affinity_pairs`
    discipline), one hash aggregate counts co-occurrences, and the
    closed form sums C(c,2) — no 4-way join ever forms. Hub-skew
    note: a degenerate mega-basket inflates pair fan-out
    quadratically — cap basket size upstream (the fixture's baskets
    are bounded by order size).
    """
    li = read_table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    pairs = (
        baskets.select(F.explode("parts").alias("a"), "parts")
        .select("a", F.explode("parts").alias("b"))
        .where(F.col("a") < F.col("b"))
    )
    co = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c"))
    return co.agg(
        F.sum(F.expr("c * (c - 1) div 2")).alias("butterflies"),
        F.sum(F.when(F.col("c") >= 2, 1).otherwise(0)).alias("linked_pairs"),
        F.count(F.lit(1)).alias("copurchase_pairs"),
    )
