"""Scalar expression library — every derived column the reference computes,
as native Catalyst expressions (no Python UDFs).

Sources in the reference (all pushed into T-SQL/Snowflake SQL there,
native Spark columns here):
  - TAT case/datediff fallback chain: ``sql_to_es_etl.py:62-64``
  - is_federal LIKE-pattern flag:     ``sql_to_es_etl.py:65-67``
  - month-year bucket string:         ``sql_to_es_etl.py:90``,
    ``preprocess_and_store_parquets.py:102``
  - NOT LIKE with ``[_]`` escapes:    ``snowflake_to_es_etl.py:79-81``
  - empty-string -> NULL:             ``preprocess_and_store_parquets.py:201``

All are pure column expressions: they stay inside whole-stage codegen and
never leave the JVM.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def tat_days(open_col: Column, resolved_col: Column, closed_col: Column, now_lit: str) -> Column:
    """Turnaround-time days with resolved -> closed -> now fallback.

    Mirrors the reference's 3-branch CASE DATEDIFF (sql_to_es_etl.py:62-64).
    ``now_lit`` is an explicit timestamp literal instead of
    current_timestamp() so results are deterministic/oracle-checkable;
    production callers pass ``datetime.utcnow().isoformat()`` once per run.
    """
    return (
        F.when(resolved_col.isNotNull(), F.datediff(resolved_col, open_col))
        .when(closed_col.isNotNull(), F.datediff(closed_col, open_col))
        .otherwise(F.datediff(F.lit(now_lit).cast("timestamp"), open_col))
        .cast("long")
    )


def like_flag(col: Column, patterns: list[str]) -> Column:
    """CASE over LIKE patterns -> 0/1 flag, then boolean — the reference's
    is_federal shape (int flag computed in SQL, cast to boolean in Spark,
    sql_to_es_etl.py:65-67,92). ``patterns`` are SQL LIKE patterns."""
    cond = None
    for p in patterns:
        c = col.like(p)
        cond = c if cond is None else (cond | c)
    return F.when(cond, F.lit(1)).otherwise(F.lit(0)).cast("boolean")


def is_federal_flag(segment_col: Column) -> Column:
    """Fixture replay of the federal flag over c_mktsegment (FIXTURES.md C)."""
    return like_flag(segment_col, ["MACHINERY", "BUILDING"])


def month_year(date_col: Column) -> Column:
    """``concat_ws('-', month(d), year(d))`` — NO zero padding ('1-2023'),
    matching the reference exactly (sql_to_es_etl.py:90)."""
    return F.concat_ws("-", F.month(date_col), F.year(date_col))


def _sql_like_to_regex(pattern: str) -> str:
    """Translate a T-SQL/Snowflake LIKE pattern — including the ``[_]``
    character-class escape for a literal underscore — to an anchored Java
    regex. This is the subtle bit the reference relies on
    (snowflake_to_es_etl.py:79-81): in T-SQL ``'%[_]DOD[_]%'`` matches a
    literal ``_DOD_`` substring, while a bare ``_`` is a single-char
    wildcard."""
    out = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "[" and i + 2 < len(pattern) and pattern[i + 2] == "]":
            out.append(re.escape(pattern[i + 1]))  # [_] / [%] -> literal
            i += 3
        elif ch == "%":
            out.append(".*")
            i += 1
        elif ch == "_":
            out.append(".")
            i += 1
        else:
            out.append(re.escape(ch))
            i += 1
    return "^" + "".join(out) + "$"


def not_like_all(col: Column, patterns: list[str], keep_nulls: bool = False) -> Column:
    """Conjunction of NOT LIKE exclusions with ``[_]`` escape translation.

    SQL NOT LIKE is NULL-rejecting (NULL NOT LIKE p is NULL -> row dropped);
    that default is kept so semantics match the pushed-down SQL. Pass
    ``keep_nulls=True`` for the tolerant variant.
    """
    cond = None
    for p in patterns:
        c = ~col.rlike(_sql_like_to_regex(p))
        cond = c if cond is None else (cond & c)
    if keep_nulls:
        cond = cond | col.isNull()
    return cond


def empty_to_null(col: Column) -> Column:
    """Map '' -> NULL (preprocess_and_store_parquets.py:201)."""
    return F.when(col == "", F.lit(None).cast("string")).otherwise(col)
