"""Scale-path contracts for the embedding-cosine family (VERDICT r1 #3,
ADVICE r2).

Above MAX_BROADCAST_VECTORS the broadcast-kernel operators must NOT
materialize the corpus on the driver:
  - ``cosine_neardup_pairs`` REFUSES to degrade silently (raises without
    ``allow_approx=True``) and with the flag runs the OR-amplified
    SRP-banded plan (recall superset of the single-band fallback, still
    a subset of exact; per-bucket Arrow kernel, no driver collect);
  - ``knn_loo_neighbors`` runs the EXACT shard-and-merge (identical
    output to the single-broadcast path) holding one live shard
    broadcast at a time.
The bound is injected small here so both routes exercise at sf0.001.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sow_pyspark_scripts_spark.operators.similarity import (
    cosine_neardup_pairs,
    knn_loo_neighbors,
    srp_buckets,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
THRESHOLD = 0.85
NUM_BANDS = 4
NUM_PLANES = 4


def _emb(spark, n=300):
    return (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .filter(F.col("vec_id") < n)
    )


def test_neardup_above_bound_requires_explicit_opt_in(spark):
    emb = _emb(spark)
    with pytest.raises(ValueError, match="allow_approx"):
        cosine_neardup_pairs(emb, THRESHOLD, max_broadcast=10)


def test_neardup_banded_fallback_is_recall_subset(spark):
    emb = _emb(spark)
    exact = {
        (r.va, r.vb): r.sim
        for r in cosine_neardup_pairs(emb, THRESHOLD).collect()
    }
    banded = {
        (r.va, r.vb): r.sim
        for r in cosine_neardup_pairs(
            emb, THRESHOLD, max_broadcast=10, allow_approx=True
        ).collect()
    }
    # recall subset: every banded pair is an exact pair with the same sim
    assert set(banded) <= set(exact)
    for pair, sim in banded.items():
        assert abs(sim - exact[pair]) < 1e-9
    # documented OR-amplification semantics: the pairs kept are exactly
    # the exact pairs whose endpoints collide in AT LEAST ONE band
    per_band = [
        {r.vec_id: r.bucket for r in srp_buckets(
            emb, NUM_PLANES, plane_offset=b * NUM_PLANES
        ).collect()}
        for b in range(NUM_BANDS)
    ]
    expected = {
        p for p in exact if any(bb[p[0]] == bb[p[1]] for bb in per_band)
    }
    assert set(banded) == expected
    # band 0 alone (the old single-band fallback) must not find MORE
    # than the OR of all bands — amplification only adds recall
    single = {p for p in exact if per_band[0][p[0]] == per_band[0][p[1]]}
    assert single <= set(banded)


def test_neardup_fallback_plan_has_no_driver_materialization(spark):
    emb = _emb(spark)
    df = cosine_neardup_pairs(emb, THRESHOLD, max_broadcast=10, allow_approx=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # banded route: grouped Arrow kernel, never a pair equi-join or a
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
