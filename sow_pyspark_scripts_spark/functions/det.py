"""Cross-engine / cross-partitioning determinism helpers.

The house doctrine (SURVEY.md determinism notes; cf. the PCA iterate
re-quantization in plans/vector_ops.py) is that any float AGGREGATE
whose result feeds a rounded comparison must itself be pinned to a
fixed grid: Spark's partial-aggregate merge order varies with
partitioning and scheduling, so ``avg(double)`` can differ between two
runs at the ulp level — and a downstream ``floor(x*1e6+0.5)`` sitting
on a rounding boundary then flips (the round-3
``dedup_semantic_semdedup`` driver flake: unpinned IVF centroids).

Rounding AFTER the avg shrinks the window but does not close it (the
avg itself can land on a boundary). These helpers close it: quantize
each INPUT to an integer grid first, sum exactly (integer addition is
associative — any merge order gives the same sum), then divide once.

    mean_grid(col)      == floor(sum(floor(col*s + .5)) / count + .5) / s

Both engines compute the identical double from identical exact
integers, so the result is bit-stable under ANY partitioning, thread
count, or engine. Scale note: the integer sum is exact up to 2^63 in
Spark (long) and 2^127 in DuckDB (hugeint); the final cast-to-double
of the sum is exact up to 2^53 — at 1e6-grid embedding magnitudes
(~1e6 per element) that covers ~9e9 rows per group, beyond which
the mean is still deterministic per engine but the last ulp of the
division may differ between engines; raise the documented grid or
pre-aggregate per shard if a group ever approaches that.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quant(col: Column, scale: float = 1e6) -> Column:
    """Half-up integer grid units of ``col``: floor(col*scale + 0.5).
    Per-row, engine-identical (IEEE double multiply + floor)."""
    return F.floor(col * F.lit(float(scale)) + F.lit(0.5))


def mean_grid(col: Column, scale: float = 1e6) -> Column:
    """Aggregate: order-independent grid mean of ``col``. Inputs are
    quantized to the grid, summed EXACTLY as integers, divided once —
    no float-sum-order exposure anywhere. Use wherever a mean feeds a
    rounded comparison (centroids, codewords, recall scores)."""
    s = F.sum(quant(col, scale))
    return (
        F.floor(s.cast("double") / F.count(F.lit(1)) + F.lit(0.5))
        / F.lit(float(scale))
    )


def mean_grid_sql(v: str, scale: str = "1000000.0") -> str:
    """DuckDB oracle twin of ``mean_grid`` — the IDENTICAL arithmetic
    (exact integer sum, one division, half-up floor) so oracle and
    Spark produce bit-equal means."""
    return (
        f"floor(CAST(sum(CAST(floor({v} * {scale} + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / count(*) + 0.5) / {scale}"
    )
