"""Cross-engine determinism gates for rounded-float compares (r5).

The r3/r4 driver flake (`dedup_semantic_semdedup`): DuckDB does not pin
its parallel sum order, so a raw float ``sum(...)`` feeding a
``floor(x*1e6+0.5)`` compare can flip with thread count — builder and
judge green, driver red, two rounds running. Round 5 pinned every
vector-math aggregate to exact integer grid sums (functions/det.py);
these tests make the class un-reintroducible:

1. STATIC LINT — no oracle may contain the raw vector-math forms that
   flaked (`sqrt(sum(`, float `sum((a - b) * (a - b))`, float
   `sum(xa * xb)` over unnested components). The pinned helpers emit
   `sum(CAST(floor(...)...)` shapes, which the lint ignores.
2. DYNAMIC, CROSS-THREAD — the historically flaky family (semdedup,
   ANN tiers, drift/silhouette/kmeans) runs its oracle at DuckDB
   threads=1 AND threads=32 on the same fixture and must produce
   identical result multisets. (The full 465-oracle sweep is
   tools/oracle_thread_sweep.py; its artifact DETERMINISM_SWEEP.json
   is regenerated per round — thread_mismatches must be empty.)
3. SPARK-SIDE — the semdedup family output is identical under two
   adversarial partitionings (extends test_determinism_partitioning).
"""

from __future__ import annotations

import json
import math
import re
from pathlib import Path

import duckdb
import pytest

from sow_pyspark_scripts_spark.registry import resolved_oracles

from .conftest import SF_DIR, TABLES

REPO = Path(__file__).resolve().parent.parent

# The raw forms that actually flaked. The pinned replacements
# (cos_grid_sql / d2_grid_sql / d2r6_grid_sql / proj_sign_sql) quantize
# inside the sum, so they never match these patterns.
_BANNED = [
    # float norm inside a rounded cosine
    re.compile(r"sqrt\(\s*sum\(\s*[a-z_.]+\s*\*\s*[a-z_.]+\s*\)\s*\)", re.I),
    # float squared-distance sum rounded afterwards
    re.compile(
        r"floor\(\s*sum\(\s*\(\s*[a-z_.]+\s*-\s*[a-z_.]+\s*\)\s*\*", re.I
    ),
]


def test_no_raw_vector_math_sums_in_oracles():
    hits = []
    for name, sql in resolved_oracles().items():
        for pat in _BANNED:
            m = pat.search(sql)
            if m:
                hits.append((name, m.group(0)[:60]))
    assert not hits, f"raw float vector sums back in oracles: {hits}"


_FLAKY_FAMILY = [
    "dedup_semantic_semdedup",
    "dedup_semantic_semdedup_sharded",
    "dedup_semantic_semdedup_sharded_2fam",
    "dedup_semdedup_shard_recall",
    "similarity_topk_exact",
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "similarity_topk_ivf_multiprobe",
    "similarity_topk_pq",
    "similarity_topk_ivfpq",
    "similarity_topk_ivfadc",
    "similarity_lsh_recall",
    "similarity_pq_recall",
    "graph_knn_mutual",
    "embedding_centroid_drift",
    "embedding_pq_encode",
    "ml_silhouette_centroid",
    "ml_kmeans_lloyd",
    "similarity_rrf_fusion",
    "dedup_embedding_cosine",
    "dq_psi_drift",
    "embedding_pca_power_iter",
]


def _canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _run_at(threads: int, sql: str):
    con = duckdb.connect()
    try:
        con.execute(f"SET threads={threads}")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')"
            )
        rows = con.execute(sql).fetchall()
        return sorted(tuple(_canon(c) for c in r) for r in rows)
    finally:
        con.close()


@pytest.mark.parametrize("qname", _FLAKY_FAMILY)
def test_oracle_thread_invariant(qname):
    """Oracle result identical at DuckDB threads=1 vs threads=32 — the
    exact environment axis the driver flake lived on."""
    sql = resolved_oracles()[qname]
    assert _run_at(1, sql) == _run_at(32, sql)


def test_sweep_artifact_clean():
    """The committed full-registry sweep artifact must show zero
    thread mismatches (regenerate with tools/oracle_thread_sweep.py)."""
    p = REPO / "DETERMINISM_SWEEP.json"
    assert p.exists(), "run tools/oracle_thread_sweep.py"
    data = json.loads(p.read_text())
    assert data["thread_mismatches"] == []


def test_semdedup_spark_partitioning_stable(spark):
    """Both semdedup forms byte-identical under adversarial Spark
    partitionings + shuffle settings (the engine half of the r5 gate)."""
    import __spark_entry__ as em

    qs = em.queries()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for qname in (
            "dedup_semantic_semdedup",
            "dedup_semantic_semdedup_sharded",
            "dedup_semantic_semdedup_sharded_2fam",
        ):
            spark.conf.set("spark.sql.shuffle.partitions", "7")
            a = sorted(map(tuple, qs[qname](spark, SF_DIR).collect()))
            spark.conf.set("spark.sql.shuffle.partitions", "64")
            b = sorted(map(tuple, qs[qname](spark, SF_DIR).collect()))
            assert a == b, qname
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
