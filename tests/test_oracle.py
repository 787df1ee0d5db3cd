"""Parametrized oracle parity: every registered query with an oracle SQL
is checked Spark-vs-DuckDB at the test scale factor — the same check the
driver runs at sf0.01. Rows-only queries are checked for rows>=0 and a
stable schema across two invocations.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from .conftest import SF_DIR, assert_oracle_match

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_registry_consistency():
    assert set(ORACLES) <= set(QUERIES)
    assert QUERIES, "no queries registered"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    assert_oracle_match(sdf, duck, ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert df.schema == QUERIES[name](spark, SF_DIR).schema


def test_approx_distinct_error_bound(spark, duck):
    """agg_approx_distinct has no value oracle (HLL sketches differ across
    engines); assert the estimate lands within the configured 5% rsd of
    the exact distinct count (3 sigma ≈ 15%, floor of 2 for tiny groups)."""
    est = {
        r["event_type"]: r["approx_users"]
        for r in QUERIES["agg_approx_distinct"](spark, SF_DIR).collect()
    }
    exact = dict(
        duck.execute(
            "SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    )
    assert set(est) == set(exact)
    for k, x in exact.items():
        assert abs(est[k] - x) <= max(2, 0.15 * x), (k, est[k], x)
