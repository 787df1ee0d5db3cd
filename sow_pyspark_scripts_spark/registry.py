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

# Streaming twins share their batch query's oracle. Resolved LAZILY:
# reading ORACLES at import time (whether at decoration inside a plan
# module, or at the registry's tail) detonates when a user imports a
# plan module directly — the registry import chain re-enters with that
# module only partially initialized, its registrations not yet run.
_ORACLE_ALIASES = {
    "streaming_tumbling_agg": "events_tumbling_agg",
    "streaming_sliding_agg": "events_sliding_agg",
    "streaming_session_window": "events_session_window",
}


def resolved_oracles() -> dict[str, str]:
    """ORACLES plus the streaming-twin aliases — the driver-facing view."""
    out = dict(ORACLES)
    for twin, batch in _ORACLE_ALIASES.items():
        out[twin] = ORACLES[batch]
    return out
