"""Scale-path contracts for the embedding-cosine family (VERDICT r1 #3).

Above MAX_BROADCAST_VECTORS the broadcast-GEMM operators must NOT
materialize the corpus on the driver:
  - ``cosine_neardup_pairs`` falls back to the SRP-bucketed DataFrame
    plan (recall subset of the exact result, per-bucket Arrow GEMM, no
    driver collect in the plan);
  - ``knn_loo_neighbors`` runs the EXACT shard-and-merge (identical
    output to the single-broadcast path).
The bound is injected small here so both routes exercise at sf0.001.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sow_pyspark_scripts_spark.operators.similarity import (
    cosine_neardup_pairs,
    knn_loo_neighbors,
    srp_buckets,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
THRESHOLD = 0.85


def _emb(spark, n=300):
    return (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .filter(F.col("vec_id") < n)
    )


def test_neardup_auto_fallback_is_recall_subset(spark):
    emb = _emb(spark)
    exact = {
        (r.va, r.vb): r.sim
        for r in cosine_neardup_pairs(emb, THRESHOLD).collect()
    }
    bucketed = {
        (r.va, r.vb): r.sim
        for r in cosine_neardup_pairs(emb, THRESHOLD, max_broadcast=10).collect()
    }
    # recall subset: every bucketed pair is an exact pair with the same sim
    assert set(bucketed) <= set(exact)
    for pair, sim in bucketed.items():
        assert abs(sim - exact[pair]) < 1e-9
    # and the documented recall semantics: the pairs the fallback keeps are
    # exactly the exact pairs whose endpoints share an SRP bucket
    b = {r.vec_id: r.bucket for r in srp_buckets(emb).collect()}
    expected = {p for p in exact if b[p[0]] == b[p[1]]}
    assert set(bucketed) == expected


def test_neardup_fallback_plan_has_no_driver_materialization(spark):
    emb = _emb(spark)
    df = cosine_neardup_pairs(emb, THRESHOLD, max_broadcast=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # bucketed route: grouped Arrow GEMM, never a pair equi-join or a
    # driver-side matrix collect
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "CartesianProduct" not in plan


def test_knn_loo_sharded_matches_single_broadcast(spark):
    emb = _emb(spark, n=120)
    single = sorted(
        (r.qid, r.rank, r.cid, r.sim) for r in knn_loo_neighbors(emb, k=3).collect()
    )
    sharded = sorted(
        (r.qid, r.rank, r.cid, r.sim)
        for r in knn_loo_neighbors(emb, k=3, max_broadcast=40).collect()
    )
    assert single == sharded
    assert len(single) > 0
