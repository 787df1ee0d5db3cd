"""The driver's correctness gate samples the FIRST ~50 registered queries.

This test pins registry insertion order so that sample always covers the
contract-critical set: the flagship ETL, the E2/E3 composites, every
SURVEY.md §2 id's primary query, and the north-star dedup/similarity
tier. New modules must register AFTER these (see registry.py import
order); if this test breaks, reorder imports rather than relaxing it.
"""

from sow_pyspark_scripts_spark.registry import ORACLES, QUERIES

# The set that must sit inside the driver's 50-query sample window.
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
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "similarity_topk_exact",
    "similarity_topk_lsh",
    "dedup_embedding_cosine",
    "embedding_mean_pool",
}


def test_contract_tier_in_first_50():
    first_50 = set(list(QUERIES.keys())[:50])
    missing = CONTRACT_TIER - first_50
    assert not missing, (
        f"contract-tier queries fell out of the driver's 50-query sample "
        f"window: {sorted(missing)} — fix registry.py import order"
    )


def test_contract_tier_all_oracle_checked():
    missing = CONTRACT_TIER - set(ORACLES)
    assert not missing, f"contract-tier queries without oracle SQL: {sorted(missing)}"
