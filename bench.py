#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized through the noop sink (full computation, no
collect-to-driver cost in the measurement, mirroring a cluster write).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sow_pyspark_scripts_spark import registry  # noqa: E402
from sow_pyspark_scripts_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per major subsystem (joins/agg, windows, upsert,
# text, dedup, similarity, events). dedup_ngram_jaccard is excluded —
# exact pairwise verify is not a headline op at scale (LSH is).
HEADLINE = [
    "flagship_incident_etl",
    "snowflake_etl_e2",
    "agg_pricing_summary",
    "agg_shipping_priority",
    "win_topn_per_group",
    "upsert_latest_by_key",
    "text_pipeline_e3",
    "text_stats",
    "tokenize_stopwords",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_topk_exact",
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "text_tfidf",
    "dedup_embedding_cosine",
    "embedding_mean_pool",
    "events_tumbling_agg",
    "events_sessionize",
    "events_json_props",
    "events_funnel",
    "join_asof",
    "corpus_clean_filter",
    "join_volume_shipping",
    "subq_scalar_avg",
    "text_bm25_topk",
    "graph_pagerank_iter",
    "scd2_intervals",
    "pack_sequences",
    "decontam_ngram_overlap",
    "win_row_number_chunk",
    "basket_affinity_pairs",
    "agg_bitmap_distinct",
    "stats_ks_distance",
    "dq_psi_drift",
    "expr_variant_extract",
    "sql_recursive_bom",
    "embedding_quantize_int8",
    "similarity_rrf_fusion",
    "ml_map_mrr",
    "text_rake_keywords",
    "embedding_pca_power_iter",
    "feature_pit_training_matrix",
    "join_spatial_grid",
    "ml_cv_fold_ols",
    "stats_bh_fdr",
    "shard_consistent_hash",
    "graph_knn_mutual",
    "events_attribution_shapley",
    "corpus_dsir_weights",
    "similarity_topk_pq",
    "similarity_topk_ivfpq",
    "similarity_topk_ivfadc",
    # r3: stored-index ANN split — build pays the encoding once, the
    # *_stored twins read codes only (compare against the in-query
    # similarity_topk_pq/_ivfpq rows above)
    "similarity_index_build",
    "similarity_topk_pq_stored",
    "similarity_topk_ivfpq_stored",
    "similarity_topk_pq_refine_stored",
    "similarity_topk_ivfadc_stored",
    # r4: the recall knob on the read path (nprobe=2 over stored cells)
    "similarity_topk_ivfadc_multiprobe_stored",
    "embedding_pq_encode_delta",
    # r3: the runnable near-dup scale path (LSH candidates -> exact
    # Jaccard verify on candidates only)
    "dedup_lsh_jaccard_verify",
    "dedup_index_build",
    "dedup_minhash_incremental_stored",
    # r4: the cluster composites now probe the stored band index, and
    # SemDeDup's bounded-cell scale form — the round's scale-path wins,
    # tracked per round
    "dedup_cluster_keep_best",
    "corpus_curation_funnel",
    "dedup_semantic_semdedup_sharded",
    # r8: the round's two scale twins — 48-bit simhash pigeonhole
    # (4096-value bands vs 16) and the join-free day-grid interval
    # overlap (compare dedup_simhash / join-free vs the BNL original)
    "dedup_simhash_hamming_wide",
    "join_interval_overlap_grid",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _cpu_microbench(seconds: float = 10.0) -> dict[str, float]:
    """Fixed sustained-CPU workload, timed — the host-throttle canary
    (VERDICT r5 task #6). Run before AND after the bench: on a healthy
    host both numbers match the BASELINE.md reference within noise; a
    throttled boot inflates them uniformly, which attributes a 22x
    query outlier to the environment from the artifact alone.

    Two probes: single-thread float GEMM (SIMD sustained — the shape
    frequency scaling punishes first) and a 16-thread version of the
    same (package-level sustained load). Reported as seconds per fixed
    work unit, so bigger = slower host."""
    import concurrent.futures as cf
    import time as t

    import numpy as np

    a = np.ones((512, 512), dtype=np.float64) * 1.000001

    def unit(_=None, reps=40):
        x = a
        for _i in range(reps):
            x = x @ a * 1e-3
        return float(x[0, 0])

    unit(reps=5)  # page in / JIT BLAS threads
    t0 = t.perf_counter()
    unit()
    single = t.perf_counter() - t0
    t0 = t.perf_counter()
    with cf.ThreadPoolExecutor(max_workers=16) as ex:
        list(ex.map(unit, range(16)))
    multi = t.perf_counter() - t0
    return {"gemm_1t_sec": round(single, 3), "gemm_16t_sec": round(multi, 3)}


def _stage_stats_by_group(sc) -> dict[str, dict]:
    """Per-job-group stage aggregates from the UI REST API — measured
    (not guessed) evidence of what each headline query did: shuffle
    bytes moved, summed executor run time, summed stage wall, stage
    count. run-vs-wall separates compute from scheduling when a timing
    outlier needs a post-hoc diagnosis. Returns {} if unavailable."""
    import json as js
    import urllib.request

    try:
        base, app = sc.uiWebUrl, sc.applicationId
        jobs = js.load(urllib.request.urlopen(f"{base}/api/v1/applications/{app}/jobs"))
        stages = js.load(
            urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages")
        )
    except Exception:
        return {}
    stage_group: dict[int, str] = {}
    for j in jobs:
        g = j.get("jobGroup")
        if g:
            for sid in j.get("stageIds", []):
                stage_group[sid] = g
    out: dict[str, dict] = {}
    for st in stages:
        g = stage_group.get(st.get("stageId"))
        if g and st.get("status") == "COMPLETE":
            agg = out.setdefault(
                g,
                {
                    "shuffle_bytes": 0,
                    "executor_run_ms": 0,
                    "stage_wall_ms": 0,
                    "n_stages": 0,
                },
            )
            agg["shuffle_bytes"] += int(st.get("shuffleWriteBytes", 0))
            agg["executor_run_ms"] += int(st.get("executorRunTime", 0))
            try:
                sub = st.get("submissionTime")
                done = st.get("completionTime")
                if sub and done:
                    from datetime import datetime

                    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    wall = (
                        datetime.strptime(done.replace("GMT", ""), fmt[:-2])
                        - datetime.strptime(sub.replace("GMT", ""), fmt[:-2])
                    ).total_seconds()
                    agg["stage_wall_ms"] += int(wall * 1000)
            except Exception:
                pass
            agg["n_stages"] += 1
    return out


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    cpu_pre = _cpu_microbench()
    spark = get_spark(
        app_name="bench", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Steady-state methodology (JMH-style), ISOLATED per query (r3):
    # each query clears the cache, runs once unmeasured (JVM whole-stage-
    # codegen compilation, page-cache warm-up, its OWN persisted
    # intermediates), then once measured. First-run codegen latency
    # (observed 2.0s -> 0.7s on scd2_intervals by run 3) is a per-plan
    # constant that amortizes to zero over a 100 TB execution. The
    # clearCache between queries is the same honesty fix the r2 scale
    # smoke needed: without it, 120+ query runs accumulate every
    # .persist()/localCheckpoint block in one block manager —
    # CacheManager leftovers both flatter queries whose canonicalized
    # subplans match an earlier query's cache AND crowd out later
    # queries' working sets (measured: similarity_topk_ivfpq 5.5s
    # isolated vs 14.4s late in an unisolated 61-query session).
    materialize(registry.QUERIES["agg_distinct"](spark, SF_DIR))

    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    import gc

    errors: dict[str, str] = {}
    from sow_pyspark_scripts_spark.functions.pin import release_pins

    for name in HEADLINE:
        release_pins(spark)  # persist-mode pins from the previous query
        spark.catalog.clearCache()
        gc.collect()  # free localCheckpoint blocks (ContextCleaner runs on GC)
        # per-query isolation (ADVICE r3): one failing query must not
        # discard every timing already collected — record and continue
        try:
            materialize(registry.QUERIES[name](spark, SF_DIR))  # warm, unmeasured
            spark.sparkContext.setJobGroup(f"bench:{name}", name)
            t0 = time.perf_counter()
            materialize(registry.QUERIES[name](spark, SF_DIR))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — recorded, not swallowed
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
        finally:
            spark.sparkContext.setJobGroup("", "")
    total = round(
        sum(timings.values()), 3
    )  # measured passes only; warmups excluded
    wall = round(time.perf_counter() - t_all, 3)

    stage_stats = _stage_stats_by_group(spark.sparkContext)
    shuffle_mb = {
        name: round(
            stage_stats.get(f"bench:{name}", {}).get("shuffle_bytes", 0) / 1e6, 2
        )
        for name in HEADLINE
    }
    stages = {
        name: {
            k: v
            for k, v in stage_stats.get(f"bench:{name}", {}).items()
            if k != "shuffle_bytes"
        }
        for name in HEADLINE
        if f"bench:{name}" in stage_stats
    }

    # Rotating extension-tier slice (VERDICT r2 #8): the headline covers
    # ~60 of 450 registered queries; each round additionally times a
    # deterministic ROTATING slice of the rest (cold, single pass — a
    # regression tripwire, not a steady-state number), indexed by how
    # many BENCH_r*.json artifacts exist, so successive rounds sweep the
    # whole registry.
    import glob

    repo = os.path.dirname(os.path.abspath(__file__))
    rot_idx = len(glob.glob(os.path.join(repo, "BENCH_r*.json")))
    rest = sorted(set(registry.QUERIES) - set(HEADLINE))
    slice_n = 40
    start = (rot_idx * slice_n) % max(len(rest), 1)
    rotation_names = (rest + rest)[start : start + min(slice_n, len(rest))]
    rotation: dict[str, float] = {}
    for name in rotation_names:
        release_pins(spark)
        spark.catalog.clearCache()
        gc.collect()
        try:
            t0 = time.perf_counter()
            materialize(registry.QUERIES[name](spark, SF_DIR))
            rotation[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]

    cpu_post = _cpu_microbench()
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    detail = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "wall_with_warmup_sec": wall,
        # host-throttle canaries (VERDICT r5 task #6): same fixed work
        # before/after the run; compare against BASELINE.md's reference
        "cpu_microbench_pre": cpu_pre,
        "cpu_microbench_post": cpu_post,
        "queries": timings,
        "shuffle_mb": shuffle_mb,
        # per-query stage aggregates: executor_run_ms vs stage_wall_ms
        # separates compute from scheduling in post-hoc outlier triage
        "stages": stages,
        "rotation_index": rot_idx,
        "rotation": rotation,
        "errors": errors,
        "sf": sf_val,
    }
    # Full diagnostic detail goes to disk; stdout gets ONE JSON line LAST
    # (a few KB — it carries the per-query seconds map the driver
    # contract requires, r8) so tail-capture harnesses see a parseable
    # object as the final line. (ADVICE r8: the old "<200 bytes" claim
    # predated the inline queries map and is gone.)
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)
    spark.stop()
    sys.stdout.flush()
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                # per-query seconds inline (driver contract); the full
                # detail (canaries, shuffle bytes, stage aggregates,
                # rotation slice) stays in BENCH_DETAIL.json
                "queries": timings,
                "sf": sf_val,
                "n_queries": len(HEADLINE),
                "n_errors": len(errors),
                "detail": "BENCH_DETAIL.json",
            },
            separators=(",", ":"),
        )
    )
    sys.stdout.flush()


if __name__ == "__main__":
    main()
