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
        # A duplicate name silently SHADOWS the earlier registration
        # (last import wins) — a dead query the artifacts still report
        # green. Caught live in r6: a re-added ml_ndcg_at_k masked the
        # original in index_ops for a whole commit. Fail at import on
        # ANY name collision unless it is the identical function object
        # (the same module imported under two names re-registers the
        # same fn — benign), so a same-module duplicate id can't hide
        # behind a __module__ comparison (ADVICE r6).
        if name in QUERIES and QUERIES[name] is not fn:
            raise ValueError(
                f"duplicate query id {name!r}: already registered by "
                f"{QUERIES[name].__module__}, re-registered by {fn.__module__}"
            )
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


# DuckDB widens sum()/product aggregates over integer inputs to HUGEINT
# (int128); Spark's equivalent aggregates stay BIGINT. The driver's
# order-insensitive value hash is TYPE-aware, so a value-identical
# result still mismatches on the int128-vs-int64 type tag (root cause of
# every round-5 driver red, VERDICT r5 "What's wrong" #1). Every oracle
# whose final projection emits a HUGEINT column therefore casts it back
# to BIGINT at assembly time — one mechanical site instead of 97 hand
# edits, so the cast cannot be forgotten per-oracle. Completeness is
# enforced by tests/test_oracle_types.py, which plans every assembled
# oracle under DuckDB and asserts no HUGEINT/UHUGEINT/DECIMAL survives.
_ORACLE_BIGINT_CASTS: dict[str, tuple[str, ...]] = {
    "tokenizer_vocab_coverage": ("k",),
    "join_ip_cidr_prefix": ("prefix_len",),
    "agg_abc_classification": ("revenue_cents",),
    "agg_fifo_lot_allocation": ("qty_allocated",),
    "agg_hodges_lehmann": ("n", "n_pairs",),
    "agg_largest_remainder": ("rev_cents", "seats",),
    "agg_new_vs_repeat_revenue": ("new_cents", "repeat_cents",),
    "agg_priority_by_flag": ("high_line_count", "low_line_count",),
    "agg_skyline_pareto": ("cost_cents", "qty",),
    "agg_variance_shard_merge": ("n",),
    "agg_weighted_median": ("total_weight",),
    "agg_yoy_growth": ("rev", "rev_prev_year",),
    "api_cogroup_pandas": ("net_cents",),
    "corpus_dataset_card": ("total_tokens", "total_bytes", "n_exact_dup_docs",),
    "corpus_domain_mix": ("tokens",),
    "corpus_inverted_index": ("cf",),
    "corpus_line_dedup": ("n_boilerplate_lines", "bytes_removed",),
    "corpus_novelty_curve": ("n_novel",),
    "corpus_token_budget_epochs": ("tokens",),
    "corpus_tokenizer_fertility": ("words", "tokens",),
    "dedup_lsh_band_tuning": ("n_bands", "colliding_buckets", "candidate_pairs",),
    "dedup_paragraph_exact": ("n_duplicates", "bytes_saved",),
    "dedup_semantic_semdedup": ("cell", "n_survivors",),
    "dedup_semantic_semdedup_sharded": ("n_survivors",),
    "dedup_semantic_semdedup_sharded_2fam": ("cell", "n_survivors",),
    "dedup_semantic_semdedup_sharded_stored": ("n_survivors",),
    "dq_control_chart_pchart": ("errs",),
    "dq_cusum_alarm": ("cusum",),
    "dq_l_diversity": ("k",),
    "dq_partition_skew": ("n_rows", "max_bucket_rows",),
    "dq_reconcile_order_totals": ("n_mismatched", "max_abs_diff_cents",),
    "dq_rule_violations": ("n_violations",),
    "dq_t_closeness": ("n_group",),
    "events_alert_hysteresis": ("alert_days", "transitions",),
    "events_bot_score_profile": ("n_events",),
    "events_bounce_rate": ("n_bounces",),
    "events_changepoint_cumdev": ("s_scaled", "s_abs",),
    "events_cohort_ltv": ("cum_revenue_cents",),
    "events_entropy_per_user": ("n_events",),
    "events_error_budget_sli": ("n_errors", "breach_days_to_date",),
    "events_fano_dispersion": ("n_bursty",),
    "events_forecast_seasonal_naive": ("abs_err_cents",),
    "events_growth_accounting": ("new_users", "retained", "resurrected",),
    "events_impossible_travel": ("n_flagged",),
    "events_retention_bitmask": ("n_active", "n_retained_7d",),
    "events_session_gap_sweep": ("n_sessions",),
    "events_srm_check": ("n_a", "n_b",),
    "events_survival_km": ("n_at_risk", "d_events",),
    "expr_array_ops": ("total_chars",),
    "expr_collation_group": ("total_chars",),
    "expr_timezone_business_hours": ("business_events", "offhours_events",),
    "expr_variant_extract": ("sum_k",),
    "graph_butterfly_count": ("butterflies", "linked_pairs",),
    "ml_auc_roc": ("n_pos", "n_neg",),
    "ml_best_split_gini": ("n_left", "n_right",),
    "ml_best_threshold_f1": ("tp", "fp", "fn",),
    "ml_calibration_bins": ("n_pos",),
    "ml_cohens_kappa": ("n",),
    "ml_confusion_lang_id": ("tp", "actual_n", "pred_n",),
    "ml_data_scaling_curve": ("k", "n_train",),
    "ml_decile_lift": ("conversions", "cum_conversions",),
    "ml_knn_classify_loo": ("n_correct",),
    "ml_lift_gains_table": ("decile", "n_pos",),
    "ml_pr_auc_binned": ("n_events", "n_pos",),
    "pack_padding_waste": ("total_tokens",),
    "pack_shards_bytes": ("shard_id", "shard_bytes",),
    "shard_consistent_hash": ("moved_in",),
    "sort_delta_encoding_benefit": ("total_bits",),
    "sql_group_by_all": ("cents",),
    "sql_parameterized": ("total_cents",),
    "sql_recursive_bom": ("sum_keys",),
    "sql_udf_scalar": ("revenue_cents",),
    "src_text_logparse": ("sum_cents",),
    "stats_anova_oneway": ("n_tot",),
    "stats_beta_binomial": ("k",),
    "stats_brown_forsythe": ("n",),
    "stats_circular_mean": ("n",),
    "stats_cochran_armitage": ("n", "n_pos",),
    "stats_cochran_q": ("g_click", "g_view", "g_purchase",),
    "stats_diff_in_diff": ("n_total",),
    "stats_kendall_tau_binned": ("n_total", "concordant", "discordant",),
    "stats_ks_distance": ("n_purchase", "n_click",),
    "stats_mann_kendall_trend": ("s_stat",),
    "stats_mann_whitney": ("n_a", "n_b", "u2_a",),
    "stats_mutual_info_binned": ("n",),
    "stats_poisson_two_rate": ("c1", "c2",),
    "stats_runs_test": ("n1", "n2", "r",),
    "stats_sprt": ("k",),
    "stats_theil_u2_forecast": ("sse_seasonal", "sse_naive",),
    "stats_wilcoxon_signed_rank": ("n",),
    "stats_wilson_interval": ("k",),
    "text_heldout_perplexity": ("n_tokens", "n_oov",),
    "text_winnowing_fingerprint": ("print_sum",),
    "tokenizer_bpe_apply": ("total_words", "total_tokens", "total_chars",),
    "tokenizer_bpe_train": ("pair_count",),
    "win_capped_running_sum": ("net_qty", "prefix_qty", "capped_balance",),
    "win_drawdown_max": ("max_drawdown_cents",),
    "win_hampel_filter": ("rev", "residual2",),
    "win_max_subarray_kadane": ("max_scaled_sum",),
}


def _cast_hugeint_to_bigint(sql: str, cols: tuple[str, ...]) -> str:
    """Wrap an oracle so its integer-aggregate columns come back BIGINT.

    ``SELECT * REPLACE`` keeps column order and names identical; the
    subquery form is valid for every oracle shape in the registry
    (plain SELECT, WITH, WITH RECURSIVE, trailing ORDER BY).
    """
    body = sql.rstrip().rstrip(";")
    rep = ", ".join(f"CAST({c} AS BIGINT) AS {c}" for c in cols)
    return f"SELECT * REPLACE ({rep}) FROM (\n{body}\n) AS __bigint_cast"


def resolved_oracles() -> dict[str, str]:
    """ORACLES plus the streaming-twin aliases, with the BIGINT casts
    applied — the driver-facing view."""
    out = {
        name: (
            _cast_hugeint_to_bigint(sql, _ORACLE_BIGINT_CASTS[name])
            if name in _ORACLE_BIGINT_CASTS
            else sql
        )
        for name, sql in ORACLES.items()
    }
    for twin, batch in _ORACLE_ALIASES.items():
        out[twin] = out[batch]
    return out


# The driver's correctness gate samples the FIRST 50 registered queries.
# Registration order used to be a function of module import order — a
# fragile contract (tests/test_registry_order.py pinned it by breaking
# whenever a reorder pushed contract queries out of the window). This
# list makes the window EXPLICIT. VERDICT r7 task #5: the old 40-slot
# §2 + north-star core had been driver-green three consecutive rounds,
# while ~340 of 483 queries had never had a driver row — at 10
# rotating slots that is a 30+ round drain. The core is therefore cut
# to the three reference composites (which transitively exercise most
# of §2 in single plans) + a five-query §2 sample spanning the
# remaining tiers (projection/cast, windowed chunking, text normalize
# fidelity, MinHash-LSH dedup, IVF similarity), and the other 42 slots
# ROTATE, never-driver-checked ids first, indexed by the
# CORRECTNESS_r*.json artifacts previous rounds left at the repo root
# (same convention as bench.py's rotation_index). The retired core ids
# stay covered by pytest + the full-registry artifact every round.
PINNED_FIRST = [
    "flagship_incident_etl",
    "snowflake_etl_e2",
    "text_pipeline_e3",
    "proj_alias_cast",
    "win_row_number_chunk",
    "text_normalize",
    "dedup_minhash_lsh",
    "similarity_topk_ivf",
]

_ROTATING_SLOTS = 42


def _last_checked_round() -> dict[str, int]:
    """For every query id that has appeared in any past driver
    CORRECTNESS artifact, the LATEST round number that checked it —
    deterministic within a round (the artifacts are fixed inputs laid
    down by previous rounds). Ids absent from the dict have never had a
    driver row."""
    import glob
    import json
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, int] = {}
    for p in glob.glob(os.path.join(repo, "CORRECTNESS_r[0-9]*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(p) as fh:
                for k in json.load(fh):
                    last[k] = max(last.get(k, rnd), rnd)
        except Exception:  # noqa: BLE001 — a corrupt artifact biases, never crashes
            pass
    return last


def _ever_driver_checked() -> set[str]:
    """Every query id that has appeared in any past driver CORRECTNESS
    artifact."""
    return set(_last_checked_round())


def _window(snapshot: dict) -> list[str]:
    """The 50-name driver window: the 40-slot core + a deterministic
    rotating 10-slice of everything else (sorted for stability).

    Rotation priority (VERDICT r5 #7 + r6 #7, ADVICE r6): the rotating
    slice takes NEVER-driver-checked ids unconditionally — BIGINT-cast
    oracles first within that pool (the 97 latent HUGEINT driver-reds
    root-caused in r5), then the rest of the never-checked remainder
    alphabetically. Because each round's driver artifact adds the slice
    it ran to the checked set, the never-checked pool self-advances by
    ``_ROTATING_SLOTS`` per round. Leftover slots fill from the
    already-checked pool by STALENESS (ADVICE r7: the old modular start
    advanced by ``_ROTATING_SLOTS`` per round even when fewer fill
    slots were consumed, skipping up to len(never) checked ids each
    round) — least-recently-driver-checked first, derived from the
    artifacts themselves, so a fill id checked this round moves to the
    back of the queue automatically and coverage of the checked pool is
    even with no index arithmetic at all."""
    core = [k for k in PINNED_FIRST if k in snapshot]
    rest = sorted(k for k in snapshot if k not in PINNED_FIRST)
    if not rest:
        return core
    last = _last_checked_round()
    never = [k for k in rest if k not in last]
    priority = [k for k in never if k in _ORACLE_BIGINT_CASTS] + [
        k for k in never if k not in _ORACLE_BIGINT_CASTS
    ]
    rot = priority[:_ROTATING_SLOTS]
    fill = _ROTATING_SLOTS - len(rot)
    if fill > 0:
        pool = sorted(
            (k for k in rest if k not in rot),
            key=lambda k: (last.get(k, -1), k),
        )
        rot = rot + pool[:fill]
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
