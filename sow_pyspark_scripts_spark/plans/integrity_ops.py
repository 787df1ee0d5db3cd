"""Operational-integrity tier: the jobs a 100 TB lake runs to PROVE two
copies of a table are identical, that a rollup can be rebuilt from
partials, and that late data is accounted for — plus the higher-order
sequential folds (EWMA) and URL surgery a web-corpus pipeline needs.

The reference validates nothing (its only instrumentation is
``show``/``count`` prints — sql_to_es_etl.py:93-95); its upsert sink
(snowflake_to_es_etl.py:234-241) just trusts Elasticsearch to converge.
This tier gives the engine the native equivalents:

- ``dq_table_checksum`` — order-insensitive table fingerprint. XOR of
  per-row md5-derived 60-bit hashes + count + min/max digest. Pure
  map + one partial-aggregating reduce: at 100 TB this is the cheapest
  possible full-table pass (no shuffle of data rows — every partition
  folds to 4 values, the final merge is 4 values per partition), and
  two sides of a replication/migration compare it without moving data.
- ``agg_incremental_merge`` — per-shard partial aggregates re-merged to
  totals. The algebraic contract (sum of sums, sum of counts, avg
  rebuilt from them at the end) is what makes hourly→daily→monthly
  rollups possible without rescanning raw data; outputs are
  all-integer (cents) so the proof "merged == direct" is exact.
- ``events_lateness_audit`` — per-event lateness against the running
  stream high-water mark (arrival order = event_id). The running max
  is a distributed prefix-scan: bucket-local window + tiny bucket-max
  prefix joined back broadcast — no single-partition global window
  (same two-phase shape as operators/relational.with_global_row_number).
- ``events_ewma_fold`` — exponentially weighted moving average per user
  WITHOUT a UDF and without a sequential fold: the recurrence
  s_k = a·x_k + (1-a)·s_{k-1} is unrolled into the closed form
  s_n = (1-a)^{n-1}·x_1 + a·Σ_{k≥2}(1-a)^{n-k}·x_k, which is one
  window pass (k, n) + one groupBy sum of per-row weighted terms —
  fully parallel, whole-stage codegen end to end.
- ``expr_url_parse`` — host/path/query-param extraction with
  ``parse_url`` (JVM expression, not regex-in-Python). The reference's
  ES analyzers do keyword surgery sink-side (sql_to_es_etl.py:102-120);
  a corpus pipeline needs it engine-side for domain-level filtering.
- ``agg_hll_partition_merge`` — DataSketches HLL: per-shard sketches
  union-merged equal the direct whole-table sketch. Mergeability is
  the scale story for COUNT(DISTINCT) — partials are a few KB per
  shard regardless of cardinality. (Sketch internals are
  implementation-specific → rows-only oracle; the equality and the
  error bound are asserted in tests/test_properties.py.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import read_table

_SEP = "\x1f"
_NULL = "\x00"


# ---------------------------------------------------------------------------
# dq_table_checksum — order-insensitive anti-entropy fingerprint
# ---------------------------------------------------------------------------
# Row signature: md5 over a canonical, type-stable rendering of every
# column (doubles → exact cents, timestamps → epoch micros, NULL → \x00
# sentinel so "NULL" the string and NULL the value differ). The first
# 15 hex chars (60 bits) become a bigint; bit_xor folds them
# order-insensitively, so the checksum is invariant under partitioning,
# shuffle order, and file layout — exactly what a cross-cluster compare
# needs. min/max of the full digest catch the (astronomically unlikely)
# xor collision and give a cheap equality witness.

_CHECKSUM_ORACLE = f"""
WITH sig AS (
    SELECT md5(concat_ws(chr(31),
        coalesce(CAST(o_orderkey AS VARCHAR), chr(0)),
        coalesce(CAST(o_custkey AS VARCHAR), chr(0)),
        coalesce(o_orderstatus, chr(0)),
        coalesce(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), chr(0)),
        coalesce(CAST(epoch_us(o_orderdate) AS VARCHAR), chr(0)),
        coalesce(o_orderpriority, chr(0)))) AS d
    FROM orders
)
SELECT count(*) AS n_rows,
       bit_xor(CAST('0x' || substr(d, 1, 15) AS BIGINT)) AS xor_sig,
       min(d) AS min_sig,
       max(d) AS max_sig
FROM sig
"""


@query("dq_table_checksum", _CHECKSUM_ORACLE)
def dq_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive fingerprint of the orders table: count + XOR of
    per-row 60-bit md5-derived hashes + min/max digest. One narrow map
    (md5 + conv, all codegen) into one partially-aggregated reduce —
    each of the N partitions emits 4 values, so the "shuffle" is N tiny
    rows. Run it on both sides of a 100 TB copy and compare one row."""
    orders = read_table(spark, sf_dir, "orders")
    rendered = [
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).cast("string"),
        F.col("o_orderpriority"),
    ]
    sig = orders.select(
        F.md5(
            F.concat_ws(_SEP, *[F.coalesce(c, F.lit(_NULL)) for c in rendered])
        ).alias("d")
    )
    return sig.agg(
        F.count("*").alias("n_rows"),
        F.bit_xor(
            F.conv(F.substring("d", 1, 15), 16, 10).cast("bigint")
        ).alias("xor_sig"),
        F.min("d").alias("min_sig"),
        F.max("d").alias("max_sig"),
    )


# ---------------------------------------------------------------------------
# agg_incremental_merge — partial shard aggregates re-merged to totals
# ---------------------------------------------------------------------------

_INCR_MERGE_ORACLE = """
WITH partials AS (
    SELECT strftime(o_orderdate, '%Y-%m') AS shard,
           o_orderpriority,
           count(*) AS part_n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS part_cents
    FROM orders
    GROUP BY 1, 2
)
SELECT o_orderpriority,
       CAST(sum(part_n) AS BIGINT) AS n_orders,
       CAST(sum(part_cents) AS BIGINT) AS total_cents,
       CAST((sum(part_cents) + sum(part_n) // 2) // sum(part_n) AS BIGINT)
           AS avg_cents
FROM partials
GROUP BY o_orderpriority
"""


@query("agg_incremental_merge", _INCR_MERGE_ORACLE)
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level reaggregation: month-shard partials (count + exact cents
    sum) merged into per-priority totals, the average rebuilt from the
    merged sums at the end — never averaged per shard. This algebraic
    shape (partials live in sum-space, ratios computed last) is what
    lets a 100 TB warehouse maintain rollups incrementally: each new
    shard is aggregated once, the merge touches only partial rows.
    All-integer output, so "merged == direct" is exact, not ≈."""
    orders = read_table(spark, sf_dir, "orders")
    partials = (
        orders.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("shard"),
            "o_orderpriority",
        ).agg(
            F.count("*").alias("part_n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "part_cents"
            ),
        )
    )
    merged = partials.groupBy("o_orderpriority").agg(
        F.sum("part_n").cast("bigint").alias("n_orders"),
        F.sum("part_cents").cast("bigint").alias("total_cents"),
    )
    return merged.select(
        "o_orderpriority",
        "n_orders",
        "total_cents",
        F.expr("CAST((total_cents + n_orders DIV 2) DIV n_orders AS BIGINT)").alias(
            "avg_cents"
        ),
    )


# ---------------------------------------------------------------------------
# events_lateness_audit — running high-water-mark lateness accounting
# ---------------------------------------------------------------------------
# Arrival order = event_id (the fixture's ingestion sequence). The
# stream-side twin is the watermark: an event is "late by L" if the max
# event-time already seen exceeds its own ts by L. The running max is a
# distributed prefix-scan: bucket by arrival range, window inside each
# bucket, prefix-max across the tiny bucket relation joined back
# broadcast — the fact table shuffles once (by bucket), never through
# one task.

_LATENESS_ORACLE = """
WITH hwm AS (
    SELECT event_type,
           max(epoch_us(ts)) OVER (
               ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - epoch_us(ts) AS late_us
    FROM events
)
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CASE WHEN late_us > 600000000 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_late,
       CAST(max(late_us) AS BIGINT) AS max_late_us
FROM hwm
GROUP BY event_type
"""

_LATE_BUCKET = 1024


@query("events_lateness_audit", _LATENESS_ORACLE)
def events_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data accounting against the running event-time high-water
    mark, in arrival order (event_id): per event type, how many events
    arrived >10 min behind the max timestamp already seen, and the worst
    lateness. The running max is two-phase — a bucket-local window over
    ``floor(event_id / 1024)`` plus a prefix max over the bucket-level
    maxima (a relation of n_rows/1024 rows, broadcast back) — so the
    prefix-scan parallelizes; this is the batch-side audit that sizes
    ``withWatermark`` delays for the streaming twins (streaming/*)."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    ev = ev.withColumn("bkt", F.floor(F.col("event_id") / _LATE_BUCKET))
    loc_w = (
        Window.partitionBy("bkt")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ev = ev.withColumn("loc_max", F.max("ts_us").over(loc_w))
    # prefix max over STRICTLY EARLIER buckets — tiny relation, safe to
    # window single-partition then broadcast back onto the fact
    bm = ev.groupBy("bkt").agg(F.max("ts_us").alias("bmax"))
    pw = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    prefix = bm.select("bkt", F.max("bmax").over(pw).alias("prev_max"))
    ev = ev.join(F.broadcast(prefix), "bkt").withColumn(
        "late_us",
        F.greatest(F.col("loc_max"), F.coalesce("prev_max", F.lit(-(1 << 62))))
        - F.col("ts_us"),
    )
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(
            F.when(F.col("late_us") > 600_000_000, 1).otherwise(0)
        ).cast("bigint").alias("n_late"),
        F.max("late_us").cast("bigint").alias("max_late_us"),
    )


# ---------------------------------------------------------------------------
# events_ewma_fold — per-user EWMA, recurrence unrolled to one window pass
# ---------------------------------------------------------------------------
# s_1 = x_1;  s_k = a·x_k + (1-a)·s_{k-1}
#   ⇒  s_n = (1-a)^(n-1)·x_1 + a·Σ_{k=2..n} (1-a)^(n-k)·x_k
# Per-row term = weight(k, n)·x_k with both k (row_number) and n
# (partition count) from ONE window pass; the fold becomes a plain sum.
# Terms are rounded to 9 dp then summed in decimal so the result is
# independent of addend order (and of pow() ulp wobble across engines).

_EWMA_ALPHA = 0.3

_EWMA_ORACLE = f"""
WITH seq AS (
    SELECT user_id, value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts) AS k,
           count(*) OVER (PARTITION BY user_id) AS n
    FROM events
),
terms AS (
    SELECT user_id,
           CAST(floor(
               (CASE WHEN k = 1
                     THEN power(1 - {_EWMA_ALPHA}, n - 1) * value
                     ELSE {_EWMA_ALPHA} * power(1 - {_EWMA_ALPHA}, n - k) * value
                END) * 1000000000 + 0.5) AS BIGINT) AS term_1e9
    FROM seq
)
SELECT user_id,
       CAST(floor(sum(term_1e9) / 1000.0 + 0.5) AS BIGINT) AS ewma_1e6
FROM terms
GROUP BY user_id
"""


@query("events_ewma_fold", _EWMA_ORACLE)
def events_ewma_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final EWMA (α=0.3) of ``value`` per user over the ts-ordered event
    sequence — the sequential recurrence unrolled into a closed-form
    weighted sum, so the "fold" is one keyed window pass plus one
    groupBy: no UDF, no collect, no per-user iteration, and every weight
    (1-α)^(n-k) < 1 so nothing overflows regardless of sequence length.
    Emitted at 1e-6 resolution as an integer (terms quantized to 1e-9
    before the exact integer sum) so cross-engine float noise is dead.
    This is the feature-engineering shape (decayed activity score) a
    behavioral model pulls from 100 TB of events."""
    w = Window.partitionBy("user_id").orderBy("ts")
    wn = Window.partitionBy("user_id")
    a = _EWMA_ALPHA
    seq = (
        read_table(spark, sf_dir, "events")
        .select("user_id", "ts", "value")
        .withColumn("k", F.row_number().over(w))
        .withColumn("n", F.count("*").over(wn))
    )
    term = F.when(
        F.col("k") == 1, F.pow(F.lit(1 - a), F.col("n") - 1) * F.col("value")
    ).otherwise(
        F.lit(a) * F.pow(F.lit(1 - a), F.col("n") - F.col("k")) * F.col("value")
    )
    terms = seq.select(
        "user_id",
        F.floor(term * 1_000_000_000 + F.lit(0.5)).cast("bigint").alias("term_1e9"),
    )
    return terms.groupBy("user_id").agg(
        F.floor(F.sum("term_1e9") / 1000.0 + F.lit(0.5))
        .cast("bigint")
        .alias("ewma_1e6")
    )


# ---------------------------------------------------------------------------
# expr_url_parse — host / path / query-param extraction, JVM-side
# ---------------------------------------------------------------------------

_URL_ORACLE = """
WITH urls AS (
    SELECT doc_id,
           'https://' || source || '.example.org/' || lang || '/doc/'
               || CAST(doc_id AS VARCHAR) || '?q=' || CAST(n_chars AS VARCHAR)
               || '&p=2' AS url
    FROM documents
)
SELECT doc_id,
       regexp_extract(url, 'https://([^/]+)/', 1) AS url_host,
       regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS url_path,
       regexp_extract(url, '[?&]q=([^&]*)', 1) AS q_param,
       regexp_extract(url, '[?&]p=([^&]*)', 1) AS p_param
FROM urls
"""


@query("expr_url_parse", _URL_ORACLE)
def expr_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured URL decomposition with ``parse_url`` (host, path, and
    individual query parameters) — the per-document provenance surgery
    (domain-level quality filters, source attribution) a web-corpus
    pipeline runs before anything else. ``parse_url`` is a JVM
    expression: the whole projection stays in whole-stage codegen, no
    Python, no regex engine in the hot path. The fixture lacks a URL
    column, so one is assembled deterministically from (source, lang,
    doc_id, n_chars) first — the operator under test is the parse."""
    docs = read_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/"),
        F.col("lang"),
        F.lit("/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("?q="),
        F.col("n_chars").cast("string"),
        F.lit("&p=2"),
    )
    with_url = docs.select("doc_id", url.alias("url"))
    return with_url.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("url_host"),
        F.parse_url("url", F.lit("PATH")).alias("url_path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("q")).alias("q_param"),
        F.parse_url("url", F.lit("QUERY"), F.lit("p")).alias("p_param"),
    )


# ---------------------------------------------------------------------------
# agg_hll_partition_merge — mergeable distinct-count sketches (rows-only)
# ---------------------------------------------------------------------------


@query("agg_hll_partition_merge", None)
def agg_hll_partition_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataSketches HLL mergeability proof: per-priority sketches of
    o_custkey union-merged vs one direct whole-table sketch vs the exact
    distinct count. Sketch union is lossless (merged estimate ==
    direct estimate, asserted in tests/test_properties.py along with a
    5% error bound vs exact), which is THE distinct-count scale path:
    at 100 TB each shard ships a ~KB sketch instead of its key set, and
    yesterday's sketches merge with today's without rescanning. Sketch
    bytes are implementation-defined → no DuckDB oracle (rows-only)."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_custkey"
    )
    orders.createOrReplaceTempView("hll_orders")
    return spark.sql(
        """
        WITH shards AS (
            SELECT o_orderpriority, hll_sketch_agg(o_custkey) AS sk
            FROM hll_orders GROUP BY o_orderpriority
        ),
        merged AS (
            SELECT hll_sketch_estimate(hll_union_agg(sk)) AS merged_estimate,
                   count(*) AS n_shards
            FROM shards
        ),
        direct AS (
            SELECT hll_sketch_estimate(hll_sketch_agg(o_custkey))
                       AS direct_estimate,
                   count(DISTINCT o_custkey) AS exact_distinct
            FROM hll_orders
        )
        SELECT CAST(m.merged_estimate AS BIGINT) AS merged_estimate,
               CAST(d.direct_estimate AS BIGINT) AS direct_estimate,
               CAST(d.exact_distinct AS BIGINT) AS exact_distinct,
               CAST(m.n_shards AS BIGINT) AS n_shards
        FROM merged m CROSS JOIN direct d
        """
    )
