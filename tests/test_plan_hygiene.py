"""Fleet-wide physical-plan hygiene sweep: EVERY registered query's plan
is compiled (not executed) and held to the global invariants that decide
whether it survives a 100 TB cluster:

- no CartesianProduct — an O(n·m) join is always a plan bug; pairwise
  operators must bound one side (broadcast, LSH bucket, block key);
- no row-at-a-time Python UDF (BatchEvalPython) — Python in the hot
  path must cross the JVM boundary through Arrow (ArrowEvalPython /
  FlatMapGroupsInPandas / ArrowEvalPythonUDTF) or not at all.

Per-query contracts live in test_plans.py; this sweep is the backstop
that catches a regression in any query nobody wrote a contract for.
Queries with eager side effects (format round-trip writes, bucketed
table writes, streaming drains) are skipped here — each has its own
oracle/contract coverage — because building their DataFrame runs the
side effect, and this sweep must stay compile-only.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from .conftest import SF_DIR

QUERIES = entrymod.queries()

# eager side effects on build (writes / stream drains): covered elsewhere
_SKIP_PREFIXES = ("streaming_", "src_", "sink_", "join_bucketed")


def _sweep_names():
    return sorted(n for n in QUERIES if not n.startswith(_SKIP_PREFIXES))


@pytest.mark.parametrize("name", _sweep_names())
def test_plan_hygiene(spark, name):
    plan = QUERIES[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    # row-at-a-time Python is banned; Arrow-vectorized Python is allowed
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"


# Exact `percentile` over a CONTINUOUS column buffers a value->count map
# ~ O(rows) on one reducer — a 100 TB memory cliff (VERDICT r6 #4). The
# mergeable path is functions/sketch.py's approx_pctl, whose accuracy
# pin keeps every oracle exact at fixture scale. The only legitimate
# exact-percentile sites are BOUNDED-INTEGER domains, where the
# value->count state is bounded by the domain, not the row count; each
# must argue that bound in its docstring.
_EXACT_PCTL_ALLOWED = {
    "plans/insight_ops.py",  # days_to_ship: ~100 distinct day gaps
    "plans/agreement_ops.py",  # doubled l_quantity: ~100 distinct values
}


def test_no_exact_percentile_on_continuous_columns():
    import pathlib
    import re

    import sow_pyspark_scripts_spark as pkg

    root = pathlib.Path(pkg.__file__).parent
    # matches F.percentile( and expr("percentile(...")); approx_percentile /
    # percentile_approx have no word boundary before "percentile", so the
    # sketch forms never match.
    pat = re.compile(r"\bpercentile\s*\(")
    offenders = []
    for py in sorted(root.rglob("*.py")):
        rel = py.relative_to(root).as_posix()
        if rel in _EXACT_PCTL_ALLOWED:
            continue
        for i, line in enumerate(py.read_text().splitlines(), start=1):
            if pat.search(line):
                offenders.append(f"{rel}:{i}: {line.strip()}")
    assert not offenders, (
        "exact percentile outside the bounded-domain whitelist "
        "(use functions.sketch.approx_pctl):\n" + "\n".join(offenders)
    )


def test_pctl_exact_acc_covers_every_fixture_relation():
    """ADVICE r7: PCTL_EXACT_ACC guarantees oracle-exactness only while
    accuracy >= 2x the largest oracle-compared relation (rank error
    n/acc < 0.5 can never flip an order statistic). Nothing used to
    enforce that, so a fixture-scale bump (e.g. sf1 lineitem = 6M rows)
    would silently turn every sketch oracle approximate and surface as
    scattered off-by-one-rank reds. Fail HERE, at the pin, instead."""
    import glob
    import os

    import pyarrow.parquet as pq

    from sow_pyspark_scripts_spark.functions.sketch import PCTL_EXACT_ACC

    root = os.path.dirname(
        os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    )
    worst, n_max = None, 0
    for p in glob.glob(os.path.join(root, "sf*", "*.parquet")):
        n = pq.ParquetFile(p).metadata.num_rows
        if n > n_max:
            worst, n_max = p, n
    assert n_max > 0, f"no fixture parquet found under {root}"
    assert PCTL_EXACT_ACC >= 2 * n_max, (
        f"PCTL_EXACT_ACC={PCTL_EXACT_ACC} < 2x largest fixture relation "
        f"({worst}: {n_max} rows) — sketch oracles are no longer exact; "
        "raise the pin in functions/sketch.py"
    )
