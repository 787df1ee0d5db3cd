"""The driver's correctness gate samples the FIRST ~50 registered queries.

``registry.PINNED_FIRST`` is the CORE of that window (the registry
reorders itself after all plan modules import); the remaining slots
ROTATE each round over the long tail (VERDICT r4 task #6) so every
registered query eventually appears in a driver CORRECTNESS row.

VERDICT r7 task #5 shrank the core from 40 to 8: the old §2 +
north-star core had been driver-green three consecutive rounds while
~340 queries had never had a driver row, so the core is now the three
reference composites + a five-query §2 sample and 42 slots rotate —
never-driver-checked ids first, then least-recently-checked fill
(ADVICE r7). This test asserts the core leads, the rotation fills the
window to 50 without touching the core, the contract-critical set stays
inside the core, and everything stays oracle-checked.
"""

from sow_pyspark_scripts_spark.registry import (
    ORACLES,
    PINNED_FIRST,
    QUERIES,
    pinned_queries,
)

# The set that must sit inside the driver's 50-query sample window
# PERMANENTLY: the three reference composite pipelines (E1/E2/E3 —
# which transitively exercise most of §2 in single plans) plus a §2
# sample spanning projection/cast, windowed chunking, text-normalize
# fidelity, MinHash-LSH dedup, and IVF similarity. The 32 ids retired
# from the old 40-slot core (r7 task #5) remain covered by pytest and
# the per-round full-registry artifact, and re-enter the driver window
# via the staleness-fair rotation.
CONTRACT_TIER = {
    "flagship_incident_etl",
    "snowflake_etl_e2",
    "text_pipeline_e3",
    "proj_alias_cast",
    "win_row_number_chunk",
    "text_normalize",
    "dedup_minhash_lsh",
    "similarity_topk_ivf",
}

_CORE = len(CONTRACT_TIER)  # 8


def test_pinned_window_is_50_and_leads_registry():
    assert len(PINNED_FIRST) == _CORE
    assert len(set(PINNED_FIRST)) == _CORE, "duplicate names in PINNED_FIRST"
    assert set(PINNED_FIRST) <= set(QUERIES), "pin names an unregistered query"
    # the driver consumes __spark_entry__.queries() == pinned_queries(),
    # which re-applies the pin at read time — raw QUERIES order can lag
    # when a test/user imports a plan module directly (partial-init
    # import order), so the ORDER contract is asserted on the view
    window = list(pinned_queries().keys())[:50]
    assert window[:_CORE] == PINNED_FIRST
    # rotating slots: filled to 50, disjoint from the core, stable
    # across two reads in the same round
    assert len(window) == 50 and len(set(window)) == 50
    assert not set(window[_CORE:]) & set(PINNED_FIRST)
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
    """ADVICE r6 / VERDICT r6 #7: the rotating slice must take
    never-driver-checked ids UNCONDITIONALLY (no modular start index
    that can skip a small priority pool), cast oracles first within
    that pool, and only fill leftover slots from the already-checked
    remainder — least-recently-driver-checked first (ADVICE r7)."""
    from sow_pyspark_scripts_spark import registry

    window = list(pinned_queries().keys())[:50]
    rot = window[_CORE:]
    last = registry._last_checked_round()
    never = [
        k
        for k in sorted(set(QUERIES) - set(PINNED_FIRST))
        if k not in last
    ]
    # while never-checked ids remain, every slot they can fill is theirs
    expected_never_in_slice = min(len(never), len(rot))
    got = sum(1 for k in rot if k not in last)
    assert got == expected_never_in_slice, (rot, got, expected_never_in_slice)
    # cast oracles outrank other never-checked ids inside the slice
    never_casts = [k for k in never if k in registry._ORACLE_BIGINT_CASTS]
    if len(never_casts) >= len(rot):
        assert all(k in registry._ORACLE_BIGINT_CASTS for k in rot), rot


def test_fill_slots_order_by_staleness():
    """ADVICE r7: when fewer never-checked ids remain than rotating
    slots, the leftover slots must fill with the LEAST-recently-checked
    ids (artifact-derived), not a modular slice that can skip entries.
    Simulated directly against _window with a synthetic checked map."""
    from unittest import mock

    from sow_pyspark_scripts_spark import registry

    snapshot = {k: QUERIES[k] for k in list(QUERIES)[:60]}
    names = sorted(k for k in snapshot if k not in registry.PINNED_FIRST)
    # mark EVERY non-core id checked, with staggered recency
    fake_last = {k: i % 5 for i, k in enumerate(names)}
    with mock.patch.object(
        registry, "_last_checked_round", return_value=fake_last
    ):
        window = registry._window(snapshot)
    rot = window[len([k for k in registry.PINNED_FIRST if k in snapshot]):]
    expected = sorted(names, key=lambda k: (fake_last[k], k))[: len(rot)]
    assert rot == expected, (rot[:5], expected[:5])


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
