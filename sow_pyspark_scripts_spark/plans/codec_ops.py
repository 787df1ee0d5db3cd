"""Platform-codec / scan-algorithm tier: snowflake-style 64-bit ID
mint + decompose (the time-sortable distributed ID scheme every
ingestion tier needs — ms timestamp, shard, sequence packed into one
BIGINT, round-tripped in-plan), a parquet file-metadata audit (the
hidden `_metadata` columns — per-file row counts without a manifest
service), geohash encoding as pure integer bit-interleaving (the
prefix-searchable location key; `join_spatial_grid` is the radius
JOIN on this family of keys, this is the KEY itself), and Kadane's
maximum-subarray as two prefix windows (the "best contiguous run"
scan algorithm, distributed: max subarray sum == max over t of
prefix_t − min prefix before t — no sequential loop survives).

Scale notes baked into each builder:
- the ID codec is bit arithmetic per row (shifts/masks compile into
  whole-stage codegen; ms<<22 stays under 2^63 until year 2109);
  round-trip equality is asserted as an output column, so the gate
  is data, not a comment;
- the metadata audit reads ONLY `_metadata.file_name` plus a count —
  column pruning means the scan touches parquet footers and one
  column's page headers, not the table; per-file rollups are how
  compaction planners (`sink_compact_small_files`) find small files
  without listing storage twice;
- geohash is 25 bit-extract terms generated ONCE (python emits the
  identical arithmetic for Spark and DuckDB) — all integer, no
  trigonometry, no UDF; micro-degree fixed-point keeps every
  intermediate exact;
- Kadane runs over the calendar-bounded day rollup: deviations are
  n-scaled EXACT integers (n·rev_t − total), both window passes are
  over the tiny rollup, and the argmax start/end recovery is a
  broadcast join back — fact touched once.
"""

from __future__ import annotations

from ..functions.pin import pin as _pin_lazy, pin_eager as _pin_eager

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import read_table

# ---------------------------------------------------------------------------
# expr_snowflake_id_codec — time-sortable distributed IDs
# ---------------------------------------------------------------------------

_SNOWFLAKE_ORACLE = """
WITH minted AS (
    SELECT event_id,
           (CAST(epoch_ms(ts) AS BIGINT) << 22)
               | ((user_id % 32) << 12)
               | (event_id % 4096) AS sid,
           CAST(epoch_ms(ts) AS BIGINT) AS ms0,
           user_id % 32 AS shard0,
           event_id % 4096 AS seq0
    FROM events
)
SELECT event_id, sid,
       sid >> 22 AS ms_part,
       (sid >> 12) & 31 AS shard_part,
       sid & 4095 AS seq_part,
       (sid >> 22 = ms0 AND (sid >> 12) & 31 = shard0
        AND sid & 4095 = seq0) AS roundtrip_ok
FROM minted
"""


@query("expr_snowflake_id_codec", _SNOWFLAKE_ORACLE)
def expr_snowflake_id_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake-style 64-bit ID codec: mint id = (epoch_ms << 22) |
    (shard << 12) | seq and decompose it back with shifts and masks,
    asserting the round-trip per row. This is the ID discipline of
    every large ingestion tier — ids sort by creation time (so
    range scans cluster recent data), embed their shard (so a
    consumer can route without a lookup — `shard_consistent_hash`
    owns the placement side), and carry a per-ms sequence (4096/ms/
    shard capacity). All pure bit arithmetic inside whole-stage
    codegen — the 22-bit shift keeps ms·2^22 under 2^63 until the
    year 2109, and both engines' `>>`/`&` agree because everything
    is non-negative BIGINT. The `roundtrip_ok` column makes the
    bijectivity claim data the oracle hash-checks, not a docstring
    promise (`expr_base62_codec` is the string-form sibling).
    """
    ev = read_table(spark, sf_dir, "events")
    ms = F.unix_millis("ts")
    shard = F.col("user_id") % 32
    seq = F.col("event_id") % 4096
    sid = (
        F.shiftleft(ms, 22)
        .bitwiseOR(F.shiftleft(shard, 12))
        .bitwiseOR(seq)
    )
    minted = ev.select(
        "event_id",
        sid.alias("sid"),
        ms.alias("ms0"),
        shard.alias("shard0"),
        seq.alias("seq0"),
    )
    ms_part = F.shiftright(F.col("sid"), 22)
    shard_part = F.shiftright(F.col("sid"), 12).bitwiseAND(F.lit(31))
    seq_part = F.col("sid").bitwiseAND(F.lit(4095))
    return minted.select(
        "event_id",
        "sid",
        ms_part.alias("ms_part"),
        shard_part.alias("shard_part"),
        seq_part.alias("seq_part"),
        (
            (ms_part == F.col("ms0"))
            & (shard_part == F.col("shard0"))
            & (seq_part == F.col("seq0"))
        ).alias("roundtrip_ok"),
    )


# ---------------------------------------------------------------------------
# src_file_metadata_audit — hidden _metadata columns per parquet file
# ---------------------------------------------------------------------------

_FILEMETA_ORACLE = """
SELECT 'documents.parquet' AS file_name, COUNT(*) AS n_rows,
       COUNT(DISTINCT doc_id) AS n_keys
FROM documents
UNION ALL
SELECT 'lineitem.parquet' AS file_name, COUNT(*) AS n_rows,
       COUNT(DISTINCT l_orderkey) AS n_keys
FROM lineitem
ORDER BY file_name
"""


@query("src_file_metadata_audit", _FILEMETA_ORACLE)
def src_file_metadata_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file audit via the hidden `_metadata` struct: file name with
    row and key counts, no manifest service and no storage re-listing
    — `_metadata.file_name` (with `file_size`, `file_modification_
    time` available in the same struct) materializes from the split
    metadata the scan already holds, so the marginal cost over a
    plain count is zero. This is how a compaction planner
    (`sink_compact_small_files`), a backfill auditor, or a
    corrupted-file bisection names FILES instead of rows — the
    per-file grain is otherwise invisible to SQL. Column pruning
    keeps the scan at one real column (the key) plus footer
    metadata; the rollup is a hash aggregate on the bounded file
    axis. The oracle pins the same counts per fixture file by name
    (one parquet per table in the fixture layout).
    """
    docs = read_table(spark, sf_dir, "documents")
    li = read_table(spark, sf_dir, "lineitem")
    d = docs.select(
        F.col("_metadata.file_name").alias("file_name"),
        F.col("doc_id").alias("key"),
    )
    l_ = li.select(
        F.col("_metadata.file_name").alias("file_name"),
        F.col("l_orderkey").alias("key"),
    )
    return (
        d.unionAll(l_)
        .groupBy("file_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("key").alias("n_keys"),
        )
        .orderBy("file_name")
    )


# ---------------------------------------------------------------------------
# expr_geohash_encode — integer bit-interleave location keys
# ---------------------------------------------------------------------------

_GH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _gh_value_sql(lon_b: str, lat_b: str) -> str:
    """The 25-bit interleave (lon takes even positions from the MSB)
    as one integer expression — emitted identically for both engines."""
    terms = [f"((({lon_b}) >> {k}) & 1) * {4 ** k}" for k in range(13)]
    terms += [f"((({lat_b}) >> {k}) & 1) * {2 * 4 ** k}" for k in range(12)]
    return " + ".join(terms)


def _geohash_oracle() -> str:
    lat_u = "(c_custkey * 7919) % 180000000"
    lon_u = "(c_custkey * 104729) % 360000000"
    lon_b = f"(({lon_u}) * 8192) // 360000000"
    lat_b = f"(({lat_u}) * 4096) // 180000000"
    v = _gh_value_sql("lon_b", "lat_b")
    chars = " || ".join(
        f"substring('{_GH_ALPHABET}', CAST((v >> {20 - 5 * j}) & 31 AS INTEGER) + 1, 1)"
        for j in range(5)
    )
    return f"""
WITH pts AS (
    SELECT c_custkey,
           ({lat_u}) - 90000000 AS lat_micro,
           ({lon_u}) - 180000000 AS lon_micro,
           {lon_b} AS lon_b,
           {lat_b} AS lat_b
    FROM customer
),
iv AS (
    SELECT c_custkey, lat_micro, lon_micro, {v} AS v FROM pts
)
SELECT c_custkey, lat_micro, lon_micro, {chars} AS geohash5
FROM iv ORDER BY c_custkey
"""


@query("expr_geohash_encode", _geohash_oracle())
def expr_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-character geohash encoding as pure integer bit-interleaving:
    micro-degree fixed-point coordinates (deterministic synthetic
    stand-ins on the same key-derived plane as `join_spatial_grid`)
    quantize to 13 longitude + 12 latitude bits, interleave
    lon-first into a 25-bit value, and emit five base32 characters —
    no floating point, no trig, no UDF, every intermediate an exact
    integer both engines compute identically (the 25 bit-extract
    terms are GENERATED once and emitted as the same arithmetic to
    Spark and DuckDB). Geohash is the key that makes geography
    range-scannable: shared prefixes = nearby cells, so a parquet
    layout sorted by this column gets data skipping for spatial
    predicates the way `sort_zorder_cluster`'s morton keys do for
    multi-dim numeric data — geohash IS morton order on (lon, lat).
    All codegen, zero shuffles.
    """
    cust = read_table(spark, sf_dir, "customer")
    lat_u = (F.col("c_custkey") * 7919) % 180000000
    lon_u = (F.col("c_custkey") * 104729) % 360000000
    pts = cust.select(
        "c_custkey",
        (lat_u - 90000000).alias("lat_micro"),
        (lon_u - 180000000).alias("lon_micro"),
        F.floor((lon_u * 8192) / 360000000).cast("long").alias("lon_b"),
        F.floor((lat_u * 4096) / 180000000).cast("long").alias("lat_b"),
    )

    def bits(col: str, spread: int, count: int) -> Column:
        acc = F.lit(0)
        for k in range(count):
            acc = acc + F.shiftright(F.col(col), k).bitwiseAND(
                F.lit(1)
            ) * F.lit(spread * 4**k)
        return acc

    iv = pts.select(
        "c_custkey",
        "lat_micro",
        "lon_micro",
        (bits("lon_b", 1, 13) + bits("lat_b", 2, 12)).alias("v"),
    )
    gh = F.concat(
        *[
            F.substring(
                F.lit(_GH_ALPHABET),
                1,
                32,
            ).substr(
                (
                    F.shiftright(F.col("v"), 20 - 5 * j).bitwiseAND(F.lit(31))
                    + 1
                ).cast("int"),
                F.lit(1),
            )
            for j in range(5)
        ]
    )
    return iv.select(
        "c_custkey", "lat_micro", "lon_micro", gh.alias("geohash5")
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# win_max_subarray_kadane — best contiguous revenue run, distributed
# ---------------------------------------------------------------------------

_KADANE_ORACLE = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day,
           SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS rev
    FROM events GROUP BY 1
),
tot AS (SELECT COUNT(*) AS n, SUM(rev) AS trev FROM daily),
dev AS (
    SELECT day, (SELECT n FROM tot) * rev - (SELECT trev FROM tot) AS d
    FROM daily
),
pfx0 AS (
    SELECT day, SUM(d) OVER (ORDER BY day) AS p FROM dev
),
pfx AS (
    SELECT day, p,
           COALESCE(MIN(p) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) AS minprev
    FROM pfx0
),
best AS (
    SELECT day AS end_day, p - LEAST(minprev, 0) AS s, minprev
    FROM pfx
    ORDER BY s DESC, end_day ASC LIMIT 1
),
start_pick AS (
    SELECT CASE WHEN b.minprev >= 0 THEN (SELECT MIN(day) FROM daily)
           ELSE (SELECT MIN(p2.day) FROM pfx p2
                 WHERE p2.day < b.end_day AND p2.p = b.minprev)
                + INTERVAL 1 DAY
           END AS sd,
           b.end_day, b.s
    FROM best b
)
SELECT strftime(sd, '%Y-%m-%d') AS start_day,
       strftime(end_day, '%Y-%m-%d') AS end_day,
       s AS max_scaled_sum,
       (SELECT n FROM tot) AS n_days
FROM start_pick
"""


@query("win_max_subarray_kadane", _KADANE_ORACLE)
def win_max_subarray_kadane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-subarray (Kadane) over daily revenue deviations — the
    single hottest contiguous revenue run relative to the period
    average. The textbook algorithm is a sequential fold; the
    distributed identity is max subarray sum = max over t of
    (prefix_t − min(0, min prefix before t)), which turns the scan
    into TWO window passes over the calendar-bounded day rollup —
    the third application of the prefix-scan discipline after
    `win_capped_running_sum` (Skorokhod reflection) and
    `dq_cusum_alarm`. Deviations are n-scaled EXACT integers
    (n·rev_t − Σrev, so "above average" needs no division), both
    prefix windows stay in BIGINT, the argmax end-day is a
    deterministic TakeOrdered(1) with a day tie-break, and the start
    day recovers by joining the winner's min-prefix value back to
    the prefix relation (earliest match; the run starts the day
    AFTER the prefix minimum). Start/end dates go out as strings,
    scaled sum and n_days as exact integers so the oracle compare
    is bit-stable.
    """
    ev = read_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(cents).alias("rev")
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    dev = daily.select(
        "day",
        (
            F.count(F.lit(1)).over(wall) * F.col("rev")
            - F.sum("rev").over(wall)
        ).alias("d"),
        F.count(F.lit(1)).over(wall).alias("n_days"),
    )
    wp = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wprev = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    pfx = dev.select(
        "day",
        "n_days",
        F.sum("d").over(wp).alias("p"),
    ).select(
        "day",
        "n_days",
        "p",
        F.coalesce(F.min("p").over(wprev), F.lit(0)).alias("minprev"),
    )
    pfx = pfx.transform(_pin_lazy)
    best = (
        pfx.select(
            F.col("day").alias("end_day"),
            "n_days",
            (F.col("p") - F.least(F.col("minprev"), F.lit(0))).alias("s"),
            "minprev",
        )
        .orderBy(F.col("s").desc(), F.col("end_day").asc())
        .limit(1)
    )
    first_day = daily.agg(F.min("day").alias("d0"))
    starts = (
        best.join(
            pfx.select(
                F.col("day").alias("mday"), F.col("p").alias("mp")
            ),
            (F.col("mday") < F.col("end_day"))
            & (F.col("mp") == F.col("minprev")),
            "left",
        )
        .groupBy("end_day", "n_days", "s", "minprev")
        .agg(F.min("mday").alias("min_match"))
        .join(F.broadcast(first_day))
    )
    # minprev >= 0 => the winning run starts at the very first day (no
    # prefix is dropped); otherwise it starts the day AFTER the prefix
    # minimum. The +1 day applies only to the latter branch.
    sd = F.when(
        F.col("minprev") >= 0, F.col("d0")
    ).otherwise(F.date_add(F.col("min_match"), 1))
    return starts.select(
        F.date_format(sd, "yyyy-MM-dd").alias("start_day"),
        F.date_format("end_day", "yyyy-MM-dd").alias("end_day"),
        F.col("s").alias("max_scaled_sum"),
        "n_days",
    )
