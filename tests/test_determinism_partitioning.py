"""Partitioning-independence property tests for the mean_grid family.

The round-3 driver flake (`dedup_semantic_semdedup`, VERDICT.md r3 #1):
IVF centroids computed with a raw ``avg(double)`` vary at the ulp level
with Spark's partial-aggregate merge order, and a 6dp-rounded distance
sitting on a rounding boundary then flips a cell assignment between two
otherwise identical runs. The fix pins every such mean to the
exact-integer 1e-6 grid (``functions/det.mean_grid``), making the value
independent of partitioning by construction (integer addition is
associative).

These tests are the regression harness the verdict asked for: compute
each float-aggregate-feeds-rounded-compare artifact under TWO
adversarial partitionings (input repartition(7) vs repartition(64),
i.e. different partial-aggregate merge trees) and assert the results
are IDENTICAL — not approximately equal. Before the pin, this is
exactly the test that would have caught the flake (a raw F.avg version
flips with small-but-nonzero probability per (cell, dim); across the
full sweep the expected number of chances is in the thousands).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sow_pyspark_scripts_spark.functions.det import mean_grid
from sow_pyspark_scripts_spark.sources import read_table

from .conftest import SF_DIR


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _emb(spark, n_parts):
    return read_table(spark, SF_DIR, "embeddings").repartition(n_parts)


# ---------------------------------------------------------------------------
# the primitive itself: mean_grid is merge-order-independent
# ---------------------------------------------------------------------------


def test_mean_grid_partition_independent(spark):
    """Grid mean over an adversarial float column: identical at 7 vs 64
    input partitions AND bit-identical values (exact integer sum)."""
    flat = (
        read_table(spark, SF_DIR, "embeddings")
        .select("label", F.posexplode("embedding").alias("pos", "v"))
        .select("label", "pos", F.col("v").cast("double").alias("v"))
    )
    a = _rows(
        flat.repartition(7).groupBy("label", "pos").agg(mean_grid(F.col("v")).alias("m")),
        ["label", "pos", "m"],
    )
    b = _rows(
        flat.repartition(64).groupBy("label", "pos").agg(mean_grid(F.col("v")).alias("m")),
        ["label", "pos", "m"],
    )
    assert a == b


# ---------------------------------------------------------------------------
# ivf_cells: the round-3 flake site — assignment must not move
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shuffle_parts", [7, 64])
def test_ivf_cells_assignment_stable(spark, shuffle_parts):
    """Cell assignments identical under different input partitionings
    and shuffle.partitions — the exact two-knob diff the verdict
    prescribed for the semdedup flake."""
    from sow_pyspark_scripts_spark.operators.similarity import ivf_cells

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_parts))
    try:
        _, cells_a = ivf_cells(_emb(spark, 7))
        _, cells_b = ivf_cells(_emb(spark, 64))
        assert _rows(cells_a, ["vec_id", "cell"]) == _rows(cells_b, ["vec_id", "cell"])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_ivf_centroids_bit_identical(spark):
    """Centroid VALUES (not just assignments) are identical across
    partitionings — the upstream guarantee the assignments rest on."""
    from sow_pyspark_scripts_spark.operators.similarity import ivf_cells

    cen_a, _ = ivf_cells(_emb(spark, 7))
    cen_b, _ = ivf_cells(_emb(spark, 64))
    ra = sorted((r["cent_id"], tuple(r["centroid"])) for r in cen_a.collect())
    rb = sorted((r["cent_id"], tuple(r["centroid"])) for r in cen_b.collect())
    assert ra == rb


# ---------------------------------------------------------------------------
# PQ codebook + codes: codewords feed 6dp-rounded ADC rankings
# ---------------------------------------------------------------------------


def test_pq_codebook_partition_independent(spark):
    from sow_pyspark_scripts_spark.plans.pq_common import _pq_codebook, _pq_subvecs

    cw_a = _pq_codebook(_pq_subvecs(_emb(spark, 7)))
    cw_b = _pq_codebook(_pq_subvecs(_emb(spark, 64)))
    ra = sorted((r["sub"], r["cell"], tuple(r["carr"])) for r in cw_a.collect())
    rb = sorted((r["sub"], r["cell"], tuple(r["carr"])) for r in cw_b.collect())
    assert ra == rb


# ---------------------------------------------------------------------------
# downstream consumers from the verdict's sweep list
# ---------------------------------------------------------------------------


def _q(name):
    import __spark_entry__ as em

    return em.queries()[name]


@pytest.mark.parametrize(
    "qname",
    [
        "dedup_semantic_semdedup",
        "dedup_semantic_semdedup_sharded",
        "embedding_centroid_by_group",
        "embedding_centroid_drift",
        "ml_kmeans_lloyd",
        "ml_silhouette_centroid",
        "embedding_mean_pool",
    ],
)
def test_centroid_consumers_shuffle_stable(spark, qname):
    """Full query output identical at shuffle.partitions 7 vs 64 — the
    driver-observable contract for every centroid/mean consumer the
    verdict named."""
    fn = _q(qname)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        a = sorted(map(tuple, fn(spark, SF_DIR).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "64")
        b = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b
