"""functions/gridnp.guarded_pair_sims must be BIT-identical to the
pure exact-integer grid cosine for every pair — the guard band is a
performance dial, never a semantics dial. Fuzzed over random vectors
(including near-duplicate pairs engineered to sit close to rounding
boundaries) and checked against a reference that always does the
integer rescore."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sow_pyspark_scripts_spark.functions.gridnp import guarded_pair_sims


def _exact_reference(qm, sqn, ia, ib):
    dot = (qm[ia] * qm[ib]).sum(axis=1).astype(np.float64)
    return np.floor(dot / (sqn[ia] * sqn[ib]) * 1e6 + 0.5) / 1e6


def _all_pairs_check(mat):
    qm = np.floor(mat * 1e6 + 0.5).astype(np.int64)
    sqn = np.sqrt((qm * qm).sum(axis=1).astype(np.float64))
    g = np.where(sqn == 0.0, 1.0, sqn)
    matn = qm / g[:, None]
    fast = matn @ matn.T
    n = len(mat)
    ia, ib = np.nonzero(np.triu(np.ones((n, n), dtype=bool), k=1))
    nz = (sqn[ia] > 0) & (sqn[ib] > 0)  # zero-norm pairs score nan exactly
    ia, ib = ia[nz], ib[nz]
    got = guarded_pair_sims(fast[ia, ib], qm, sqn, ia, qm, sqn, ib)
    want = _exact_reference(qm, sqn, ia, ib)
    np.testing.assert_array_equal(got, want)


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=2, max_value=24),
    st.integers(min_value=2, max_value=16),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_guarded_matches_exact_random(n, d, seed):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, d)).astype(np.float64)
    _all_pairs_check(mat)


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_guarded_matches_exact_near_duplicates(seed):
    # near-identical vectors: cosines pile up just under 1.0, where
    # scaled values crowd the 1e6 boundary region
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(1, 12))
    mat = base + rng.normal(scale=1e-4, size=(16, 12))
    _all_pairs_check(mat)


def test_guarded_boundary_grid_values():
    # components ON the grid so cosines hit exactly representable
    # ratios — the adversarial neighborhood for floor(x*1e6+0.5)
    rng = np.random.default_rng(7)
    mat = rng.integers(-3, 4, size=(20, 8)).astype(np.float64) * 1e-6
    # avoid all-zero rows (zero-norm pairs are excluded by contract)
    mat[(mat == 0).all(axis=1), 0] = 1e-6
    _all_pairs_check(mat)


def test_guarded_empty_pairs():
    qm = np.ones((3, 4), dtype=np.int64)
    sqn = np.sqrt((qm * qm).sum(axis=1).astype(np.float64))
    e = np.array([], dtype=np.int64)
    out = guarded_pair_sims(np.array([], dtype=np.float64), qm, sqn, e, qm, sqn, e)
    assert out.shape == (0,)


def test_identical_vectors_score_one():
    qm = np.full((2, 6), 123456, dtype=np.int64)
    sqn = np.sqrt((qm * qm).sum(axis=1).astype(np.float64))
    ia = np.array([0]); ib = np.array([1])
    fast = np.array([1.0 + 1e-14])  # GEMM overshoot past 1.0
    out = guarded_pair_sims(fast, qm, sqn, ia, qm, sqn, ib)
    assert out[0] == pytest.approx(1.0, abs=0)
