"""Reusable relational operator builders (SURVEY.md §2.2-2.7).

Each helper is a thin, composable DataFrame transform; the registered
queries in ``plans/relational.py`` wire them to fixture tables and
oracle SQL. Everything stays declarative so Catalyst keeps predicate
pushdown / column pruning / join planning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cast_all_to_string(df: DataFrame) -> DataFrame:
    """The reference's blanket string cast preserving column names
    (snowflake_to_es_etl.py:230)."""
    return df.select(*(F.col(c).cast("string").alias(c) for c in df.columns))


def pad_null_columns(df: DataFrame, cols: Sequence[str], dtype: str = "string") -> DataFrame:
    """Constant NULL columns padding a target schema
    (snowflake_to_es_etl.py:69-72)."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.lit(None).cast(dtype))
    return out


def exclusion_anti_join(df: DataFrame, key: Column, excluded_keys: DataFrame, excl_col: str) -> DataFrame:
    """NOT IN re-expressed as a left_anti join — the idiomatic 100 TB
    formulation when the exclusion list is a table rather than a literal
    (SURVEY.md §2.4). left_anti == NOT EXISTS semantics (null-safe,
    unlike SQL NOT IN with nulls)."""
    return df.join(excluded_keys, key == excluded_keys[excl_col], "left_anti")


_NUMERIC_PREFIXES = ("int", "bigint", "smallint", "tinyint", "long", "double", "float", "decimal")


def with_global_row_number(
    df: DataFrame,
    order_cols: Sequence[str],
    col_name: str = "row_num",
    bucket_width: int = 256,
) -> DataFrame:
    """Global sequential row id over a deterministic ordering — WITHOUT a
    single-partition window.

    The reference forced every row through ONE task via a dummy
    partition key (preprocess_and_store_parquets.py:210-212), and the
    naive ``Window.orderBy`` does the same thing (Exchange
    SinglePartition). This is the two-phase form that scales:

    1. bucket = floor(leading_key / width) — order-preserving, so
       bucket order == global order;
    2. row_number() within each bucket (one hash exchange on bucket);
    3. per-bucket counts -> running offsets via a window over the TINY
       bucket table (single partition of ~n/width rows, not n);
    4. offsets broadcast-joined back: row_num = offset + local rank.

    The bucket counts aggregate sits on top of the same hash exchange
    the local window needed (Catalyst prunes the unused window column),
    so the full table shuffles exactly once. Numeric leading keys bucket
    by value range; string keys bucket by their 2-char prefix (also
    order-preserving lexicographically — same two-phase plan, bucket
    count bounded by the prefix alphabet); other types fall back to the
    single-partition window (documented, small-data-only path).
    """
    lead = order_cols[0]
    lead_type = dict(df.dtypes)[lead]
    if lead_type == "string":
        bucket = F.substring(F.col(lead), 1, 2)
    elif not lead_type.startswith(_NUMERIC_PREFIXES):
        w = Window.orderBy(*[F.col(c) for c in order_cols])
        return df.withColumn(col_name, F.row_number().over(w).cast("long"))
    else:
        bucket = F.floor(F.col(lead) / F.lit(bucket_width)).cast("long")
    wloc = Window.partitionBy("_rn_bucket").orderBy(*[F.col(c) for c in order_cols])
    local = df.withColumn("_rn_bucket", bucket).withColumn(
        "_rn_local", F.row_number().over(wloc).cast("long")
    )
    woff = Window.orderBy("_rn_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        local.groupBy("_rn_bucket")
        .agg(F.count(F.lit(1)).alias("_rn_cnt"))
        .select(
            "_rn_bucket",
            F.coalesce(F.sum("_rn_cnt").over(woff), F.lit(0)).cast("long").alias("_rn_offset"),
        )
    )
    return (
        local.join(F.broadcast(offsets), "_rn_bucket")
        .withColumn(col_name, (F.col("_rn_offset") + F.col("_rn_local")).cast("long"))
        .drop("_rn_bucket", "_rn_local", "_rn_offset")
    )


def with_chunk_ids(
    df: DataFrame,
    order_cols: Sequence[str],
    chunk_size: int,
    row_col: str = "row_num",
    chunk_col: str = "chunk",
) -> DataFrame:
    """Deterministic chunk membership: chunk = floor((row_num-1)/size).

    Replaces the reference's driver-side 10k-row slicing loop
    (preprocess_and_store_parquets.py:204-240) with a single column
    expression over a deterministic ordering — batch membership is
    reproducible (oracle-checkable) and no data moves through the driver.
    """
    out = with_global_row_number(df, order_cols, row_col)
    return out.withColumn(
        chunk_col, F.floor((F.col(row_col) - 1) / F.lit(chunk_size)).cast("long")
    )


def with_prefix_sum(
    df: DataFrame,
    value_col: str,
    order_cols: Sequence[Column],
    bucket: Column,
    col_name: str = "cum",
) -> DataFrame:
    """Distributed running sum of ``value_col`` over a global ordering —
    WITHOUT a single-partition window (the generic form of the two-phase
    prefix-scan in ``with_global_row_number`` / events_peak_concurrency):

    1. ``bucket`` must be an ORDER-PRESERVING function of the leading
       sort key (bucket order == global order, ties stay in-bucket);
    2. local cumulative sum within each bucket (one hash exchange);
    3. per-bucket totals — a tiny relation, one row per bucket —
       prefix-sum on the driver-sized side;
    4. offsets broadcast-joined back: cum = offset + local cumsum.

    The full relation shuffles exactly once (the bucket exchange feeds
    both the local window and the totals aggregate).
    """
    wloc = (
        Window.partitionBy("_ps_bucket")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = df.withColumn("_ps_bucket", bucket).withColumn(
        "_ps_local", F.sum(value_col).over(wloc)
    )
    woff = Window.orderBy("_ps_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        local.groupBy("_ps_bucket")
        .agg(F.sum(value_col).alias("_ps_tot"))
        .select(
            "_ps_bucket",
            F.coalesce(F.sum("_ps_tot").over(woff), F.lit(0)).alias("_ps_offset"),
        )
    )
    return (
        local.join(F.broadcast(offsets), "_ps_bucket")
        .withColumn(col_name, F.col("_ps_offset") + F.col("_ps_local"))
        .drop("_ps_bucket", "_ps_local", "_ps_offset")
    )


def with_prefix_max(
    df: DataFrame,
    value_col: str,
    order_cols: Sequence[Column],
    bucket: Column,
    col_name: str = "prefix_max",
) -> DataFrame:
    """Running max of ``value_col`` over all STRICTLY PRECEDING rows of
    a global ordering (``ROWS BETWEEN UNBOUNDED PRECEDING AND 1
    PRECEDING``) — without a single-partition window; NULL for the
    first row globally, matching the window-function semantics. Same
    two-phase shape as ``with_prefix_sum``: ``bucket`` must be
    order-preserving on the leading sort key; the local exclusive
    running max combines with the running max of WHOLE preceding
    buckets via ``greatest`` (which skips NULLs), so the relation
    shuffles exactly once and the cross-bucket pass touches one row
    per bucket. The 2-D skyline reduces to exactly this scan."""
    wloc = (
        Window.partitionBy("_pm_bucket")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = df.withColumn("_pm_bucket", bucket).withColumn(
        "_pm_local", F.max(value_col).over(wloc)
    )
    woff = Window.orderBy("_pm_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        local.groupBy("_pm_bucket")
        .agg(F.max(value_col).alias("_pm_tot"))
        .select(
            "_pm_bucket",
            F.max("_pm_tot").over(woff).alias("_pm_prev"),
        )
    )
    return (
        local.join(F.broadcast(offsets), "_pm_bucket")
        .withColumn(col_name, F.greatest("_pm_local", "_pm_prev"))
        .drop("_pm_bucket", "_pm_local", "_pm_prev")
    )


def range_slice(df: DataFrame, row_col: str, lo: int, hi: int) -> DataFrame:
    """Row-number range slice (lo, hi] — the reference's chunk WHERE
    clause (preprocess_and_store_parquets.py:226-230)."""
    return df.filter((F.col(row_col) > lo) & (F.col(row_col) <= hi))


def top_n_per_group(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_by: Sequence[Column],
    n: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Rank rows within groups and keep the top n (deterministic: callers
    must include a unique tiebreaker in ``order_by``)."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= n)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    salt_src: str | None = None,
) -> DataFrame:
    """Skew-safe equi join: salt the big side, replicate the small side.

    A hash join shuffles both sides by ``key``; one hot key lands its
    entire volume on one reducer. Salting splits each key over
    ``salt_buckets`` reducers: big rows get salt = pmod(hash-ish of a
    row attribute, buckets); small rows are exploded once per salt value
    (bounded: |small| x buckets rows), and the join runs on (key, salt).
    Same rows out as the plain join — use when BOTH sides are too big to
    broadcast AND keys skew (else broadcast, or let AQE's skew-join
    splitting handle moderate skew).

    ``salt_src``: a big-side column whose values spread rows across
    salts (defaults to a monotonic id — any per-row-varying value works;
    uniformity of the salt only affects balance, never correctness).
    """
    salt = (
        F.pmod(F.col(salt_src), F.lit(salt_buckets))
        if salt_src
        else F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    big_s = big.withColumn("__salt", salt.cast("int"))
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = big_s.join(small_s, [key, "__salt"])
    return out.drop("__salt")
