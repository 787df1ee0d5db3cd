"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``sow_pyspark_scripts_spark``; this module is
the thin registry keyed by SURVEY.md §2 operator ids.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sow_pyspark_scripts_spark.plans import flagship
from sow_pyspark_scripts_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship.incident_etl(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Every computed/aggregate column is aliased identically in the Spark
    plan and the oracle SQL.
    """
    return registry.pinned_queries()


def oracle_sql() -> dict[str, str]:
    """ANSI SQL (DuckDB dialect) twin for each SQL-expressible query key.

    Keys absent here (vs ``queries()``) are non-SQL-expressible ops
    (LSH internals, streaming state) -> driver does rows-only checks.
    """
    return registry.resolved_oracles()
