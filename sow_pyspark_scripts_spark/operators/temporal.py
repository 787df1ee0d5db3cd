"""Temporal join operators: as-of join and bounded range join.

Neither appears in the reference (SURVEY.md §2.4 "No inner/semi/anti/
range/as-of joins") — they are the standard time-series operators any
event/incident engine needs, built here from shuffle-minimal primitives:

- ``asof_join``: the union + last(ignorenulls) formulation — ONE shuffle
  on the key, no range explosion, no per-row binary search. This is the
  scalable shape: a naive ``l.ts >= r.ts`` theta-join is O(n*m) per key;
  the union form is O((n+m) log(n+m)) per key and partitions by key, so
  it survives 100 TB as long as single keys fit a partition (salt the
  window by time-bucket if one key's history doesn't).
- ``range_join_count``: equi-key + bounded time-range join. With an
  equi key Spark plans a hash join with the range as residual filter —
  already scale-safe. (For KEYLESS range joins, bucketize both sides to
  the range width and join on adjacent buckets; not needed here.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"
_TIE = "__asof_tie"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join: for every left row, attach ``payload`` columns
    from the latest right row with ``right.ts <= left.ts`` and equal keys
    (inclusive match — right rows at exactly left's timestamp count).

    Left columns pass through; payload columns arrive null where no right
    row precedes. ``tiebreak`` orders right rows sharing a timestamp (pass
    a unique column for deterministic output).
    """
    lcols = left.columns
    l = (
        left.withColumn(_TS, F.col(left_ts))
        .withColumn(_SIDE, F.lit(1))
        .withColumn(_TIE, F.lit(None).cast("string"))
    )
    for p in payload:
        l = l.withColumn(p, F.lit(None).cast(right.schema[p].dataType))
    r = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        (F.col(tiebreak).cast("string") if tiebreak else F.lit("")).alias(_TIE),
        *payload,
    )
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l.unionByName(r.select(l.columns))
    # right rows sort BEFORE left rows at the same timestamp (side 0 < 1),
    # making the match inclusive; the frame up-to-current-row then carries
    # the latest preceding payload forward onto each left row.
    w = (
        Window.partitionBy(*on)
        .orderBy(_TS, _SIDE, _TIE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *lcols,
        F.col(_SIDE).alias(_SIDE),
        *[F.last(p, ignorenulls=True).over(w).alias(p) for p in payload],
    )
    return filled.filter(F.col(_SIDE) == 1).drop(_SIDE)


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: Column,
    upper: Column,
    aggs: Sequence[Column],
) -> DataFrame:
    """Bounded range join + aggregate: per left row, aggregate right rows
    of the same key whose timestamp falls in [left.ts - lower, left.ts +
    upper). Left-outer: rows with no match keep count()=0 semantics via
    the caller's coalesce/count choice of agg columns.
    """
    lk = [F.col(f"l.{k}") for k in on]
    rk = [F.col(f"r.{k}") for k in on]
    cond = lk[0] == rk[0]
    for a, b in zip(lk[1:], rk[1:]):
        cond = cond & (a == b)
    lts, rts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = cond & (rts >= lts - lower) & (rts < lts + upper)
    joined = left.alias("l").join(right.alias("r"), cond, "left")
    return joined.groupBy(*[F.col(f"l.{c}") for c in left.columns]).agg(*aggs)
