"""numpy twin of the ``functions/det.py`` grid-cosine doctrine, with a
boundary-guarded fast path.

The exact-integer pair score (r5) is

    sim = floor( dot(q_a, q_b) / (sqrt(|q_a|^2) * sqrt(|q_b|^2)) * 1e6
                 + 0.5 ) / 1e6

over 1e-6-grid-quantized int64 components — bit-identical to the
oracle's ``cos_grid_sql`` under any thread count or partitioning,
because integer sums have no accumulation order. Computing it literally
costs an int64 gather + multiply-add per pair (no SIMD FMA for int64):
at a low threshold the candidate set is output-bound (26.9M pairs for
``dedup_embedding_cosine_lsh`` at 0.3 / 100x) and the integer stage was
measured ~1.6x the float GEMM it guards.

The guard here restores GEMM cost WITHOUT giving up bit-stability:

- ``fast`` is the float64 BLAS cosine of the SAME quantized source
  (rows of ``qm / sqn``). Its distance from the deterministic exact
  value is bounded by float64 reassociation + normalization error:
  |fast - exact| <= ~(d+4) * u for unit-norm rows (u = 2^-53), i.e.
  < 1e-13 for any realistic dim — call it eps.
- the rounding ``floor(x*1e6 + 0.5)`` can only disagree between two
  values within eps of each other if ``x*1e6 + 0.5`` sits within
  eps*1e6 (< 1e-7) of an integer. We use a guard band of 1e-3 scaled
  units (1e-9 in cosine units), 10^4 x the bound:
  - pairs whose scaled fast value is >= 1e-3 from every integer floor
    identically to the exact value — emit ``floor(fast*1e6+0.5)/1e6``
    directly (the same integer k, hence the same double k/1e6).
  - pairs inside the band (~0.2% at a 1e-6 grid) get the exact
    integer rescore.
  The classification itself may flip run-to-run for a pair whose exact
  scaled value lies within eps of the band edge — harmless: both
  branches provably produce the same rounded sim for any value within
  eps of the exact one, so the EMITTED sim never varies.

Precondition: callers filter ``sim >= threshold`` with threshold > 0.
Zero-norm rows score fast = 0.0 here but exact = nan (0/0, the
oracle's 0-division behavior); both fail any positive threshold, so
the discrepancy is never emitted.
"""

from __future__ import annotations

import sys

import numpy as np

# Kernel closures (applyInPandas/mapInPandas) reference this module's
# functions, but Python WORKERS don't inherit the driver's sys.path —
# a driver that imported the package via sys.path.insert (the driver
# contract runs __spark_entry__ from an arbitrary cwd) would crash
# worker-side with ModuleNotFoundError. Registering the module for
# pickle-by-value makes cloudpickle ship the function bodies inside
# the closure instead of an import reference — the same property the
# package's fully-inlined kernels get by construction.
try:  # pragma: no cover - trivially absent only without pyspark
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # noqa: BLE001 — numpy-only use stays importable
    pass

# guard band around floor(x*1e6+0.5) integer boundaries, in scaled
# (1e-6-grid) units: 1e-9 in cosine units, ~10^4 x the float64 GEMM
# error bound for unit-norm rows.
GUARD_SCALED = 1e-3


def guarded_pair_sims(
    fast_vals: np.ndarray,
    qm_a: np.ndarray,
    sqn_a: np.ndarray,
    ia: np.ndarray,
    qm_b: np.ndarray,
    sqn_b: np.ndarray,
    ib: np.ndarray,
) -> np.ndarray:
    """Rounded grid cosine for the pairs ``(ia[t], ib[t])``,
    bit-identical to the exact-integer score but gathering int64 rows
    ONLY for pairs within ``GUARD_SCALED`` of a rounding boundary.

    ``fast_vals[t]`` is the float64 GEMM cosine of the same pair
    computed from the SAME grid-quantized source (``qm / sqn`` rows);
    ``qm_*`` are the int64 grid matrices, ``sqn_*`` the float64
    sqrt-of-exact-integer norms (``sqrt(sum(qm^2))``).
    """
    scaled = fast_vals * 1e6 + 0.5
    sims = np.floor(scaled) / 1e6
    near = np.abs(scaled - np.rint(scaled)) < GUARD_SCALED
    if near.any():
        ja, jb = ia[near], ib[near]
        dot = (qm_a[ja] * qm_b[jb]).sum(axis=1).astype(np.float64)  # exact
        sims[near] = np.floor(dot / (sqn_a[ja] * sqn_b[jb]) * 1e6 + 0.5) / 1e6
    return sims
