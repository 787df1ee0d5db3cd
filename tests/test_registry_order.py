"""The driver's correctness gate samples the FIRST ~50 registered queries.

``registry.PINNED_FIRST`` is the 40-slot CORE of that window (the
registry reorders itself after all plan modules import); slots 41-50
ROTATE each round over the long tail (VERDICT r4 task #6) so every
registered query eventually appears in a driver CORRECTNESS row. This
test asserts the core is exactly 40 and leads, the rotation fills the
window to 50 without touching the core, the contract-critical set stays
inside the core, and everything stays oracle-checked.
"""

from sow_pyspark_scripts_spark.registry import (
    ORACLES,
    PINNED_FIRST,
    QUERIES,
    pinned_queries,
)

# The set that must sit inside the driver's 50-query sample window:
# flagship + composites, §2 primaries, the north-star dedup/similarity
# tier, and (r3, VERDICT.md #3) the data-selection / stored-ANN tier.
CONTRACT_TIER = {
    # flagship + composite pipelines (reference scripts E1/E2/E3)
    "flagship_incident_etl",
    "snowflake_etl_e2",
    "text_pipeline_e3",
    # §2 relational / projection / filter / join / window primaries
    "proj_alias_cast",
    "proj_cast_all",
    "proj_lit_null_pad",
    "proj_drop_prune",
    "filter_not_like_escape",
    "filter_not_in",
    "join_anti_exclusion",
    "agg_distinct",
    "agg_pricing_summary",
    "agg_collect_batch",
    "win_row_number_chunk",
    "filter_range_slice",
    "win_topn_per_group",
    "set_union_by_name",
    "upsert_latest_by_key",
    # §2 text/UDF primaries
    "text_normalize",
    "text_stats",
    "text_lang_id",
    "text_fingerprint",
    "tokenize_stopwords",
    "lemmatize_tokens",
    "sample_hash_split",
    # north-star dedup / similarity tier
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_incremental",
    "dedup_simhash",
    "dedup_semantic_semdedup_sharded",
    # r5: the registered two-family recall dial — flaky tier, pinned IN
    "dedup_semantic_semdedup_sharded_2fam",
    "dedup_lsh_jaccard_verify",
    "dedup_semantic_semdedup",
    "similarity_topk_exact",
    "similarity_topk_lsh",
    "dedup_embedding_cosine",
    "embedding_mean_pool",
    "corpus_curation_funnel",
    # The r3 stored-ANN tier now lives in the ROTATING slots + the
    # full-registry artifact: its queries were driver-green in rounds
    # 3-4, so their permanent window slots yield to never-yet-driver-
    # checked queries (VERDICT r4 task #6).
}


def test_pinned_window_is_50_and_leads_registry():
    assert len(PINNED_FIRST) == 40
    assert len(set(PINNED_FIRST)) == 40, "duplicate names in PINNED_FIRST"
    assert set(PINNED_FIRST) <= set(QUERIES), "pin names an unregistered query"
    # the driver consumes __spark_entry__.queries() == pinned_queries(),
    # which re-applies the pin at read time — raw QUERIES order can lag
    # when a test/user imports a plan module directly (partial-init
    # import order), so the ORDER contract is asserted on the view
    window = list(pinned_queries().keys())[:50]
    assert window[:40] == PINNED_FIRST
    # rotating slots: filled to 50, disjoint from the core, stable
    # across two reads in the same round
    assert len(window) == 50 and len(set(window)) == 50
    assert not set(window[40:]) & set(PINNED_FIRST)
    assert list(pinned_queries().keys())[:50] == window


def test_contract_tier_in_first_50():
    first_50 = set(list(pinned_queries().keys())[:50])
    missing = CONTRACT_TIER - first_50
    assert not missing, (
        f"contract-tier queries fell out of the driver's 50-query sample "
        f"window: {sorted(missing)} — fix registry.PINNED_FIRST"
    )


def test_contract_tier_all_oracle_checked():
    missing = CONTRACT_TIER - set(ORACLES)
    assert not missing, f"contract-tier queries without oracle SQL: {sorted(missing)}"


def test_registry_complete_after_pinning():
    # pinning must reorder, never drop: every oracle key is registered
    assert set(ORACLES) <= set(QUERIES)


def test_rotating_slots_prioritize_never_driver_checked():
    """ADVICE r6 / VERDICT r6 #7: the rotating 10-slice must take
    never-driver-checked ids UNCONDITIONALLY (no modular start index
    that can skip a small priority pool), cast oracles first within
    that pool, and only fill leftover slots from the rotated
    already-checked remainder."""
    from sow_pyspark_scripts_spark import registry

    window = list(pinned_queries().keys())[:50]
    rot = window[40:]
    seen = registry._ever_driver_checked()
    never = [
        k
        for k in sorted(set(QUERIES) - set(PINNED_FIRST))
        if k not in seen
    ]
    # while never-checked ids remain, every slot they can fill is theirs
    expected_never_in_slice = min(len(never), len(rot))
    got = sum(1 for k in rot if k not in seen)
    assert got == expected_never_in_slice, (rot, got, expected_never_in_slice)
    # cast oracles outrank other never-checked ids inside the slice
    never_casts = [k for k in never if k in registry._ORACLE_BIGINT_CASTS]
    if len(never_casts) >= len(rot):
        assert all(k in registry._ORACLE_BIGINT_CASTS for k in rot), rot


def test_duplicate_query_id_raises_even_same_module():
    """ADVICE r6: a genuine duplicate id must raise even when both
    registrations come from the SAME module; re-registering the
    identical function object stays benign (module re-imported under
    two names)."""
    import pytest

    from sow_pyspark_scripts_spark.registry import query

    name = "flagship_incident_etl"  # taken by a different function

    with pytest.raises(ValueError, match="duplicate query id"):
        query(name, None)(lambda spark, sf: None)

    # identical object: benign no-op re-registration
    fn = QUERIES[name]
    assert query(name, ORACLES.get(name))(fn) is fn
