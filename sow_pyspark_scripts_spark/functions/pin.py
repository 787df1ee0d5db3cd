"""Materialization pins for multiply-consumed intermediates.

Every plan that reuses an expensive intermediate (a cell assignment, a
band table, a per-shard top-k) needs a materialization barrier so the
subtree runs once. HOW to materialize is a deployment decision, not a
plan decision (ADVICE r4 #2):

- ``localCheckpoint`` — truncates lineage with NON-REPLICATED,
  non-fault-tolerant blocks: any executor loss (or dynamic-allocation
  decommission) after materialization fails the job with "checkpoint
  block not found" instead of recomputing. Right for ``local[*]``
  (executor loss == application loss anyway) and for bench runs, where
  it also avoids unbounded CacheManager growth across hundreds of
  queries in one session (the r3 ADVICE that moved the repo off
  ``persist()``).
- ``persist`` — MEMORY_AND_DISK cache with lineage kept: a lost block
  recomputes. The multi-executor production mode. Pinned frames are
  tracked per-session; call :func:`release_pins` when the query's
  results are consumed (bench.py does this per query) so the
  CacheManager never accumulates.
- ``checkpoint`` — reliable checkpoint (fault-tolerant AND
  lineage-truncating) to ``spark.sowps.checkpointDir``; for iterative
  plans whose lineage would otherwise explode on a real cluster.

Select with ``spark.conf.set("spark.sowps.pinMode", ...)``. When the
conf is UNSET the default is master-aware (VERDICT r5 deployment-
posture flag): ``localCheckpoint`` on a ``local[*]`` master (executor
loss is application loss there, and bench sessions need the bounded-
CacheManager property), ``persist`` on anything else — a cluster
deployment that never sets the conf gets the recompute-safe mode, not
the non-replicated-blocks one. Call sites use ``df.transform(pin)``
(or ``pin_eager``), so plan code stays chain-shaped and mode-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PINNED: dict[str, list[DataFrame]] = {}


def _default_mode(spark) -> str:
    """localCheckpoint iff the master is single-JVM local (``local`` /
    ``local[N]`` / ``local[*]``); persist otherwise. ``local-cluster[...]``
    deliberately falls to persist: it runs real executor JVMs whose loss
    discards non-replicated localCheckpoint blocks, same as any cluster
    master (ADVICE r6 — a bare startswith('local') matched it)."""
    try:
        master = spark.conf.get("spark.master", "") or ""
    except Exception:  # noqa: BLE001 — conf unreadable mid-shutdown
        master = ""
    single_jvm = master == "local" or master.startswith("local[")
    return "localCheckpoint" if single_jvm else "persist"


def _pin(df: DataFrame, eager: bool) -> DataFrame:
    spark = df.sparkSession
    mode = spark.conf.get("spark.sowps.pinMode", None) or _default_mode(spark)
    if mode == "persist":
        from pyspark import StorageLevel

        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        _PINNED.setdefault(_session_key(spark), []).append(out)
        if eager:
            out.count()
        return out
    if mode == "checkpoint":
        ckdir = spark.conf.get("spark.sowps.checkpointDir", None)
        if ckdir and spark.sparkContext.getCheckpointDir() is None:
            spark.sparkContext.setCheckpointDir(ckdir)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def _session_key(spark) -> str:
    return str(id(spark))


def pin(df: DataFrame) -> DataFrame:
    """Lazy materialization barrier — ``df.transform(pin)``."""
    return _pin(df, eager=False)


def pin_eager(df: DataFrame) -> DataFrame:
    """Eager barrier (materializes now) — ``df.transform(pin_eager)``.
    Used where the caller frees an upstream resource (a shard
    broadcast) immediately after."""
    return _pin(df, eager=True)


def release_pins(spark) -> int:
    """Unpersist every frame pinned in ``persist`` mode for this
    session since the last release. Returns the number released.
    No-op in the other modes (their blocks are owned by the frames'
    lifecycles)."""
    frames = _PINNED.pop(_session_key(spark), [])
    for df in frames:
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — session may be stopping
            pass
    return len(frames)
