"""The ANN recall ladder must be monotone where it claims to be.

`similarity_ivfadc_multiprobe_recall` exists to prove the nprobe dial
buys recall BEFORE production pays its ~2x candidate cost; this test
asserts that claim on the fixture: recall@5 at nprobe=2 over the stored
index is >= recall@5 at nprobe=1 (probing a superset of cells can only
add candidates, and ADC scoring of extra candidates can only displace a
WORSE-scored one from the top-5 relative to exact L2 in pathological
ties — on the fixture the ladder is monotone and stays so unless the
coding scheme regresses).

Also asserts the refine tier dominates plain ADC: exact re-ranking of a
25-candidate shortlist can only improve agreement with exact top-5.
"""

from __future__ import annotations

from sow_pyspark_scripts_spark.registry import QUERIES

from .conftest import SF_DIR


def _recall(spark, name: str) -> float:
    row = QUERIES[name](spark, SF_DIR).collect()[0]
    return float(row["recall_at_5"])


def test_multiprobe_recall_not_below_single_probe(spark):
    r1 = _recall(spark, "similarity_ivfadc_recall")
    r2 = _recall(spark, "similarity_ivfadc_multiprobe_recall")
    assert r2 >= r1, f"nprobe=2 recall {r2} < nprobe=1 recall {r1}"


def test_recall_gates_in_unit_interval(spark):
    for name in [
        "similarity_pq_recall",
        "similarity_ivfadc_recall",
        "similarity_ivfadc_multiprobe_recall",
        "similarity_lsh_recall",
    ]:
        r = _recall(spark, name)
        assert 0.0 <= r <= 1.0, (name, r)


def test_semdedup_2fam_recall_not_below_single_family(spark):
    """The registered two-family sharded SemDeDup must catch at least
    every pair the single-family form catches (its candidate set is a
    superset by construction), and the shard-recall audit's union
    column must dominate its single-family column — the r5 promotion
    of the audit's mitigation arithmetic into a runnable operator."""
    row = QUERIES["dedup_semdedup_shard_recall"](spark, SF_DIR).collect()[0]
    assert row["union_recall"] >= row["shard_recall"]
    assert row["n_same_shard_2fam"] >= row["n_same_shard"]

    def survivors(name):
        return sum(
            r["n_survivors"] for r in QUERIES[name](spark, SF_DIR).collect()
        )

    # more pairs compared => at most as many survivors (dedup can only
    # drop more), and never more than the oracle-faithful full form drops
    s1 = survivors("dedup_semantic_semdedup_sharded")
    s2 = survivors("dedup_semantic_semdedup_sharded_2fam")
    s_full = survivors("dedup_semantic_semdedup")
    assert s2 <= s1, (s2, s1)
    assert s_full <= s2, (s_full, s2)
