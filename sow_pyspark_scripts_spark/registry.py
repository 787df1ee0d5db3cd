"""Query registry: SURVEY.md §2 operator id -> (Spark builder, oracle SQL).

Single source of truth consumed by ``__spark_entry__.py``, ``tests/`` and
``bench.py``. Each entry is registered with ``@query(id, oracle_sql)``;
non-SQL-expressible ops register with ``oracle=None`` (driver falls back
to rows-only checks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Importing the plan modules populates the registry.
from .plans import flagship  # noqa: E402

query("flagship_incident_etl", flagship.FLAGSHIP_ORACLE_SQL)(flagship.incident_etl)

from .plans import relational  # noqa: E402,F401
from .plans import text_pipeline  # noqa: E402,F401
from .plans import dedup_sim  # noqa: E402,F401
from .plans import events  # noqa: E402,F401
from .plans import extensions  # noqa: E402,F401
from .plans import advanced  # noqa: E402,F401
from .plans import io_formats  # noqa: E402,F401
from .plans import tpch_shapes  # noqa: E402,F401
from .plans import tpch_rest  # noqa: E402,F401
from .plans import corpus_ops  # noqa: E402,F401
from .plans import warehouse_ops  # noqa: E402,F401
from .plans import scale_ops  # noqa: E402,F401
from .plans import analytics_ops  # noqa: E402,F401
from .plans import quality_ops  # noqa: E402,F401
from .plans import integrity_ops  # noqa: E402,F401
from .plans import robust_ops  # noqa: E402,F401
from .plans import insight_ops  # noqa: E402,F401
from .plans import stats_ops  # noqa: E402,F401
from .plans import spark4_ops  # noqa: E402,F401
from .plans import pipeline_ops  # noqa: E402,F401
from .plans import rank_eval_ops  # noqa: E402,F401
from .plans import gov_ops  # noqa: E402,F401
from .plans import analyze_ops  # noqa: E402,F401
from .plans import vector_ops  # noqa: E402,F401
from .plans import alloc_ops  # noqa: E402,F401
from .plans import screening_ops  # noqa: E402,F401
from .plans import control_ops  # noqa: E402,F401
from .plans import enrich_ops  # noqa: E402,F401
from .plans import state_ops  # noqa: E402,F401
from .plans import platform_ops  # noqa: E402,F401
from .plans import curation_ops  # noqa: E402,F401
from .plans import signal_ops  # noqa: E402,F401
from .plans import tune_ops  # noqa: E402,F401
from .plans import mask_ops  # noqa: E402,F401
from .plans import guard_ops  # noqa: E402,F401
from .plans import calendar_ops  # noqa: E402,F401
from .plans import shard_ops  # noqa: E402,F401
from .plans import flow_ops  # noqa: E402,F401
from .plans import scaling_ops  # noqa: E402,F401
from .plans import depend_ops  # noqa: E402,F401
from .plans import alerting_ops  # noqa: E402,F401
from .plans import agreement_ops  # noqa: E402,F401
from .plans import rankinf_ops  # noqa: E402,F401
from .plans import tsdiag_ops  # noqa: E402,F401
from .plans import index_ops  # noqa: E402,F401
from .plans import fitdiag_ops  # noqa: E402,F401
from .plans import decision_ops  # noqa: E402,F401
from .plans import laws_ops  # noqa: E402,F401
from .plans import mlops_ops  # noqa: E402,F401
from .plans import evalmetrics_ops  # noqa: E402,F401
from .plans import seqfc_ops  # noqa: E402,F401
from .plans import commrec_ops  # noqa: E402,F401
from .plans import codec_ops  # noqa: E402,F401
from .plans import curation2_ops  # noqa: E402,F401
from .plans import dsel_ops  # noqa: E402,F401
from .plans import ann_index  # noqa: E402,F401

# Streaming twins share their batch query's oracle. Resolved LAZILY:
# reading ORACLES at import time (whether at decoration inside a plan
# module, or at the registry's tail) detonates when a user imports a
# plan module directly — the registry import chain re-enters with that
# module only partially initialized, its registrations not yet run.
_ORACLE_ALIASES = {
    "streaming_tumbling_agg": "events_tumbling_agg",
    "streaming_sliding_agg": "events_sliding_agg",
    "streaming_session_window": "events_session_window",
    # r5: per-doc DSIR weights are micro-batch-invariant, so the
    # streamed drain must reproduce the batch delta query exactly
    "streaming_dsir_score": "corpus_dsir_weights_delta",
    # r5: same argument for frozen-weight quality scoring
    "streaming_quality_score": "text_quality_classifier_delta",
}


def resolved_oracles() -> dict[str, str]:
    """ORACLES plus the streaming-twin aliases — the driver-facing view."""
    out = dict(ORACLES)
    for twin, batch in _ORACLE_ALIASES.items():
        out[twin] = ORACLES[batch]
    return out


# The driver's correctness gate samples the FIRST 50 registered queries.
# Registration order used to be a function of module import order — a
# fragile contract (tests/test_registry_order.py pinned it by breaking
# whenever a reorder pushed contract queries out of the window). This
# list makes the window EXPLICIT: exactly these 40 CORE queries lead the
# registry — the flagship + E2/E3 composites, every SURVEY.md §2
# primary, and the north-star dedup/similarity tier INCLUDING the
# historically flaky semdedup forms (deliberately pinned INTO the
# driver's window, never hidden from it). Slots 41-50 ROTATE each round
# over the long tail (VERDICT r4 task #6): 417 of 467 queries had never
# appeared in a driver CORRECTNESS row — the rotation sweeps them,
# indexed by how many CORRECTNESS_r*.json artifacts previous rounds
# left at the repo root (same convention as bench.py's rotation_index).
PINNED_FIRST = [
    "flagship_incident_etl",
    "snowflake_etl_e2",
    "text_pipeline_e3",
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
    "text_normalize",
    "text_stats",
    "text_lang_id",
    "text_fingerprint",
    "tokenize_stopwords",
    "lemmatize_tokens",
    "sample_hash_split",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_incremental",
    "dedup_simhash",
    "dedup_semantic_semdedup_sharded",
    # r5: the registered two-family recall dial joins the flaky tier in
    # the driver's window alongside both existing semdedup forms
    "dedup_semantic_semdedup_sharded_2fam",
    "dedup_lsh_jaccard_verify",
    "dedup_clusters",
    "dedup_semantic_semdedup",
    "dedup_embedding_cosine",
    "embedding_mean_pool",
    "similarity_topk_exact",
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "corpus_curation_funnel",
]

_ROTATING_SLOTS = 10


def _rotation_index() -> int:
    """How many driver CORRECTNESS artifacts previous rounds produced —
    advances the rotating window once per round, stable within one."""
    import glob
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return len(glob.glob(os.path.join(repo, "CORRECTNESS_r[0-9]*.json")))


def _window(snapshot: dict) -> list[str]:
    """The 50-name driver window: the 40-slot core + a deterministic
    rotating 10-slice of everything else (sorted for stability)."""
    core = [k for k in PINNED_FIRST if k in snapshot]
    rest = sorted(k for k in snapshot if k not in PINNED_FIRST)
    if not rest:
        return core
    start = (_rotation_index() * _ROTATING_SLOTS) % len(rest)
    rot = (rest + rest)[start : start + min(_ROTATING_SLOTS, len(rest))]
    return core + rot


def _pin_order() -> None:
    """Reorder QUERIES in place so the driver window leads. TOLERANT of
    missing names: when a user imports a plan module directly, the
    registry import chain re-enters with that module only partially
    initialized (its registrations land AFTER this runs) — raising here
    would make `import sow_pyspark_scripts_spark.plans.X` crash. The
    driver-facing view (`pinned_queries`, used by __spark_entry__)
    re-applies the pin at read time, so the sample window is correct in
    every import order; completeness is asserted by
    tests/test_registry_order.py in the normal order."""
    snapshot = dict(QUERIES)
    QUERIES.clear()
    for k in _window(snapshot):
        QUERIES[k] = snapshot[k]
    for k, fn in snapshot.items():
        if k not in QUERIES:
            QUERIES[k] = fn


_pin_order()


def pinned_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """QUERIES with the driver window leading, computed at call time —
    immune to partial-initialization import orders."""
    snapshot = dict(QUERIES)
    out = {k: snapshot[k] for k in _window(snapshot)}
    for k, fn in snapshot.items():
        if k not in out:
            out[k] = fn
    return out
