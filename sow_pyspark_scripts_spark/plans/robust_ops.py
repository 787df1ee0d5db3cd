"""Sampling / robust-statistics tier: the per-group reservoir sample,
robust outlier screen, Pareto share curve, and month-over-month delta
that sit next to every training-data warehouse's audit queries, plus two
corpus ops (prefix-hash dedup, unigram surprisal scoring) that extend
the dedup/quality surface (SURVEY.md §2.9 north-star tier; reference
NLP pipeline ``preprocess_and_store_parquets.py:111-160``).

Scale notes baked into each builder:
- the reservoir sample is a rank-limit window — Spark plans it as
  WindowGroupLimit, so each map task keeps only k rows per group before
  the shuffle; the order key is md5(event_id), i.e. a uniform random
  permutation that is deterministic and oracle-reproducible;
- prefix-hash dedup shuffles on a 16-byte hash of the first 64 chars —
  constant-width key regardless of document length, one shuffle;
- surprisal needs the corpus vocabulary; the vocab aggregate is tiny
  relative to the token stream, so the prob join broadcasts it back —
  the token stream itself is never shuffled twice;
- the MAD screen is two scalar aggregates (median, then median absolute
  deviation) broadcast back over the fact — no per-row sort, no
  single-partition window over data rows;
- the share curve and MoM delta aggregate to (group, month) grain
  FIRST, then window over months — thousands of rows, not billions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.sketch import approx_pctl
from ..registry import query
from ..sources import read_table


def _cents(col):
    """Exact integer cents from a 2-dp double: floor(x*100 + 0.5) — both
    engines truncate floor identically; a bare cast rounds in DuckDB but
    truncates in Spark."""
    return F.floor(col * 100.0 + F.lit(0.5)).cast("long")


# ---------------------------------------------------------------------------
# sample_reservoir_group — deterministic per-group uniform k-sample
# ---------------------------------------------------------------------------

_RESERVOIR_K = 8

_RESERVOIR_ORACLE = f"""
SELECT event_type, event_id, user_id
FROM (
    SELECT event_type, event_id, user_id,
           row_number() OVER (
               PARTITION BY event_type
               ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
           ) AS rn
    FROM events
) WHERE rn <= {_RESERVOIR_K}
"""


@query("sample_reservoir_group", _RESERVOIR_ORACLE)
def sample_reservoir_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform k-per-group sample ("reservoir" semantics, reproducible):
    order each group by md5 of the row key — a fixed pseudo-random
    permutation — and keep the first k. Unlike rand()-based sampling
    this is deterministic across retries/speculative tasks, which is
    what a 100 TB pipeline needs for debuggable samples. The rank-limit
    window compiles to WindowGroupLimit: each map task pre-prunes to k
    rows per group before the exchange, so the shuffle carries
    O(groups*k), not the table.
    """
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    return (
        events.select("event_type", "event_id", "user_id",
                      F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _RESERVOIR_K)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# dedup_prefix_hash — CCNet-style first-64-chars prefix dedup
# ---------------------------------------------------------------------------

_PREFIX_ORACLE = """
SELECT doc_id, lang, source
FROM (
    SELECT doc_id, lang, source,
           min(doc_id) OVER (
               PARTITION BY md5(substring(lower(text), 1, 64))
           ) AS keeper
    FROM documents
) WHERE doc_id = keeper
"""


@query("dedup_prefix_hash", _PREFIX_ORACLE)
def dedup_prefix_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-hash dedup (the CCNet/CommonCrawl trick): near-identical
    boilerplate pages share their opening characters, so hashing the
    first 64 lowercased chars catches them without shingling the whole
    document. Survivor = min doc_id per prefix bucket. The shuffle key
    is the 16-byte md5, constant width however long the documents get;
    one hash-partition exchange total, and the min-over-partition window
    needs no sort (unbounded frame).
    """
    docs = read_table(spark, sf_dir, "documents")
    h = F.md5(F.substring(F.lower(F.col("text")), 1, 64))
    w = Window.partitionBy(h)
    return (
        docs.select("doc_id", "lang", "source",
                    F.min("doc_id").over(w).alias("keeper"))
        .filter(F.col("doc_id") == F.col("keeper"))
        .drop("keeper")
    )


# ---------------------------------------------------------------------------
# text_unigram_surprisal — per-doc mean -ln p(token) under corpus LM
# ---------------------------------------------------------------------------

_SURPRISAL_ORACLE = """
WITH toks AS (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
    FROM documents
), vocab AS (
    SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
), tot AS (
    SELECT sum(cnt) AS n FROM vocab
)
SELECT t.doc_id,
       count(*) AS n_tokens,
       round(avg(-ln(v.cnt / tot.n)), 6) AS mean_surprisal
FROM toks t JOIN vocab v USING (tok) CROSS JOIN tot
GROUP BY t.doc_id
"""


@query("text_unigram_surprisal", _SURPRISAL_ORACLE)
def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean token surprisal (-ln p) under the corpus's own
    unigram distribution — the classic cheap perplexity proxy used to
    screen training data for gibberish (high surprisal) and boilerplate
    (low surprisal). The token stream is exploded once; the vocabulary
    aggregate (distinct tokens ≪ token occurrences) broadcasts back onto
    the stream, so the only data-sized shuffles are the vocab groupBy
    and the final per-doc aggregate. The corpus total is a one-row
    aggregate over the vocab, also broadcast.
    """
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("n"))
    scored = (
        toks.join(F.broadcast(vocab), "tok")
        .join(F.broadcast(tot))
        .select("doc_id", (-F.log(F.col("cnt") / F.col("n"))).alias("s"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("s"), 6).alias("mean_surprisal"),
    )


# ---------------------------------------------------------------------------
# dq_mad_outliers — median-absolute-deviation outlier screen
# ---------------------------------------------------------------------------

_MAD_ORACLE = """
WITH m AS (
    SELECT quantile_disc(value, 0.5) AS med FROM events
), md AS (
    SELECT quantile_disc(abs(e.value - m.med), 0.5) AS mad,
           any_value(m.med) AS med
    FROM events e CROSS JOIN m
)
SELECT e.event_type,
       count(*) AS n,
       CAST(sum(CASE WHEN abs(e.value - md.med) > 3 * 1.4826 * md.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM events e CROSS JOIN md
GROUP BY e.event_type
"""


@query("dq_mad_outliers", _MAD_ORACLE)
def dq_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen: a point is an outlier when its absolute
    deviation from the median exceeds 3 scaled MADs (1.4826 ≈ MAD→σ for
    a normal). Mean/stddev screens (events_anomaly_zscore) get dragged
    by the outliers themselves; the median pair is immune. Two scalar
    aggregates (median, then MAD — the mergeable approx_percentile
    sketch at the functions/sketch.py accuracy pin, == quantile_disc at
    fixture scale; exact percentile over a continuous column would
    buffer ~every value on one reducer, VERDICT r6 #4) each broadcast
    back over the fact as 1-row
    broadcast joins; the fact table is scanned, never sorted globally.
    """
    events = read_table(spark, sf_dir, "events")
    med = events.agg(approx_pctl("value", 0.5).alias("med"))
    mad = (
        events.join(F.broadcast(med))
        .agg(
            approx_pctl(F.abs(F.col("value") - F.col("med")), 0.5).alias("mad"),
            F.first("med").alias("med"),
        )
    )
    thr = 3.0 * 1.4826
    return (
        events.join(F.broadcast(mad))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.abs(F.col("value") - F.col("med")) > thr * F.col("mad"))
                .cast("long")
            ).alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# win_cumulative_share — running revenue share (Pareto curve) per group
# ---------------------------------------------------------------------------

_CUMSHARE_ORACLE = """
WITH monthly AS (
    SELECT o_orderpriority AS priority,
           CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
           CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
    FROM orders GROUP BY 1, 2
)
SELECT priority, ym, cents,
       round(
           CAST(sum(cents) OVER (PARTITION BY priority ORDER BY ym
                                 ROWS UNBOUNDED PRECEDING) AS DOUBLE)
           / CAST(sum(cents) OVER (PARTITION BY priority) AS DOUBLE), 6
       ) AS cum_share
FROM monthly
"""


@query("win_cumulative_share", _CUMSHARE_ORACLE)
def win_cumulative_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue share by month within each order priority —
    the Pareto/"what % of the year is booked by June" curve. Aggregates
    to (priority, month) grain FIRST (one shuffle over the fact), then
    runs both windows (running sum + partition total) over the tiny
    monthly rollup — the window sort touches thousands of rows, not the
    fact table. Integer-cents arithmetic keeps the running sums exact;
    the share divides once at the end.
    """
    orders = read_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            F.col("o_orderpriority").alias("priority"),
            (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
            .cast("long").alias("ym"),
        )
        .agg(F.sum(_cents(F.col("o_totalprice"))).alias("cents"))
    )
    w_run = (
        Window.partitionBy("priority").orderBy("ym")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("priority")
    return monthly.select(
        "priority", "ym", "cents",
        F.round(
            F.sum("cents").over(w_run).cast("double")
            / F.sum("cents").over(w_all).cast("double"), 6
        ).alias("cum_share"),
    )


# ---------------------------------------------------------------------------
# events_mom_change — month-over-month delta per event type
# ---------------------------------------------------------------------------

_MOM_ORACLE = """
WITH monthly AS (
    SELECT event_type,
           CAST(year(ts) * 100 + month(ts) AS BIGINT) AS ym,
           CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
    FROM events GROUP BY 1, 2
)
SELECT event_type, ym, cents,
       round(
           CAST(cents - lag(cents) OVER (PARTITION BY event_type ORDER BY ym)
               AS DOUBLE)
           / CAST(lag(cents) OVER (PARTITION BY event_type ORDER BY ym)
               AS DOUBLE), 6
       ) AS mom_change
FROM monthly
"""


@query("events_mom_change", _MOM_ORACLE)
def events_mom_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month relative change in event value per type — the
    dashboard delta every ops review starts with. Same two-phase shape
    as the share curve: one fact-sized shuffle down to (type, month)
    grain, then lag() over the small rollup. First month per type is
    NULL (no prior), matching SQL lag semantics exactly.
    """
    events = read_table(spark, sf_dir, "events")
    monthly = (
        events.groupBy(
            "event_type",
            (F.year("ts") * 100 + F.month("ts")).cast("long").alias("ym"),
        )
        .agg(F.sum(_cents(F.col("value"))).alias("cents"))
    )
    w = Window.partitionBy("event_type").orderBy("ym")
    prev = F.lag("cents").over(w)
    return monthly.select(
        "event_type", "ym", "cents",
        F.round(
            (F.col("cents") - prev).cast("double") / prev.cast("double"), 6
        ).alias("mom_change"),
    )


# ---------------------------------------------------------------------------
# events_rolling_distinct — exact 7-day rolling distinct users per day
# ---------------------------------------------------------------------------

_ROLLING_DISTINCT_ORACLE = """
WITH days AS (
    SELECT DISTINCT CAST(ts AS DATE) AS d FROM events
), contrib AS (
    SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
)
SELECT strftime(days.d, '%Y-%m-%d') AS day,
       count(DISTINCT contrib.user_id) AS active_users_7d
FROM days JOIN contrib
  ON contrib.d <= days.d AND contrib.d > days.d - INTERVAL '7 days'
GROUP BY days.d
"""


@query("events_rolling_distinct", _ROLLING_DISTINCT_ORACLE)
def events_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-7-day distinct active users per day — the WAU
    curve. COUNT(DISTINCT) does not compose over a sliding frame, so the
    scalable formulation replicates each (day, user) contribution into
    the ≤7 window-days it can serve (a bounded 7× fan-out of the ALREADY
    per-day-deduplicated pairs, not of raw events) and hash-aggregates
    per window-day. No range self-join, no per-day re-scan: one dedup
    shuffle + one bounded explode + one distinct-agg shuffle. Days with
    no activity in the trailing week don't appear (no left spine —
    matches the oracle's inner join).
    """
    events = read_table(spark, sf_dir, "events")
    pairs = events.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    fanned = pairs.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"), "d", "user_id"
    ).select(F.date_add("d", F.col("off")).alias("day"), "user_id")
    # only window-days that actually occur in the data (oracle joins the
    # observed-day spine); broadcast the tiny day list
    days = events.select(F.col("ts").cast("date").alias("day")).distinct()
    return (
        fanned.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("active_users_7d"))
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "active_users_7d")
    )


# ---------------------------------------------------------------------------
# events_top_trigrams — most common 3-step behavior paths
# ---------------------------------------------------------------------------

_TRIGRAM_K = 20

_TRIGRAM_ORACLE = f"""
WITH seq AS (
    SELECT user_id, event_type AS a,
           lead(event_type, 1) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS b,
           lead(event_type, 2) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS c
    FROM events
), grams AS (
    SELECT a || '>' || b || '>' || c AS path, count(*) AS n
    FROM seq WHERE b IS NOT NULL AND c IS NOT NULL
    GROUP BY 1
)
SELECT path, n FROM grams
ORDER BY n DESC, path
LIMIT {_TRIGRAM_K}
"""


@query("events_top_trigrams", _TRIGRAM_ORACLE)
def events_top_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k most frequent 3-step event paths across all users — the
    sequence-mining staple behind "what do users do right before
    converting". One shuffle keys the stream by user (the window sort is
    per-user, bounded by a user's own history); the trigram counts are a
    second hash aggregate whose keyspace is |event_types|^3 — tiny — and
    the final top-k is TakeOrderedAndProject, never a global sort of the
    counts. Ties at the cut are broken lexicographically so the result
    is deterministic.
    """
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("a"),
        F.lead("event_type", 1).over(w).alias("b"),
        F.lead("event_type", 2).over(w).alias("c"),
    ).filter(F.col("b").isNotNull() & F.col("c").isNotNull())
    grams = (
        seq.select(F.concat_ws(">", "a", "b", "c").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return grams.orderBy(F.desc("n"), "path").limit(_TRIGRAM_K)
