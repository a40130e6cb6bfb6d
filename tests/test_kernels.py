"""Batched numpy kernels vs the scalar reference-order oracle.

Mirrors the reference's own kernel test strategy
(/root/reference/tests/test_whittaker.py:31-55): golden-style series,
decimal=5 assertions, plus exact integer equality after np.rint
(smooth.py:448) and bit-exact agreement between batched and scalar paths
for the fixed-lambda solver.
"""

from __future__ import annotations

import numpy as np
import pytest

from modape_spark import kernels as K
from modape_spark.constants import (
    NODATA,
    SRANGE_HIGH_CORR,
    SRANGE_LOW_CORR,
    SRANGE_NAN_CORR,
)

from . import reference_scalar as ref


def make_series(n: int, seed: int, gap_rate: float = 0.2) -> np.ndarray:
    """NDVI-like seasonal series with nodata gaps, double dtype."""
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    base = 4000 + 3500 * np.sin(2 * np.pi * t / 46.0) + rng.normal(0, 400, n)
    y = np.rint(np.clip(base, -2000, 10000))
    gaps = rng.random(n) < gap_rate
    y[gaps] = NODATA
    return y.astype(np.float64)


@pytest.fixture(scope="module")
def block():
    Y = np.stack([make_series(120, seed) for seed in range(8)])
    W = K.weights_from_nodata(Y, NODATA)
    return Y, W


def test_ws2d_matches_scalar_bitexact(block):
    Y, W = block
    Z = K.ws2d_batch(Y, 10.0, W)
    for r in range(Y.shape[0]):
        zs = ref.ws2d(Y[r], 10.0, W[r])
        assert np.array_equal(Z[r], zs), f"row {r} not bit-exact"


def test_ws2d_per_row_lambda(block):
    Y, W = block
    lams = np.array([0.1, 1.0, 10.0, 100.0, 1000.0, 5.0, 0.5, 50.0])
    Z = K.ws2d_batch(Y, lams, W)
    for r in range(Y.shape[0]):
        zs = ref.ws2d(Y[r], lams[r], W[r])
        assert np.array_equal(Z[r], zs)


def test_ws2dp_matches_scalar(block):
    Y, W = block
    Z = K.ws2dp_batch(Y, 10.0, W, 0.90)
    for r in range(Y.shape[0]):
        zs = ref.ws2dp(Y[r], 10.0, W[r], 0.90)
        np.testing.assert_array_equal(Z[r], zs)


@pytest.mark.parametrize("llas", [SRANGE_HIGH_CORR, SRANGE_LOW_CORR, SRANGE_NAN_CORR])
def test_ws2doptv_matches_scalar(block, llas):
    Y, W = block
    Z, lopt = K.ws2doptv_batch(Y, W, llas)
    for r in range(Y.shape[0]):
        zs, ls = ref.ws2doptv(Y[r], W[r], list(llas))
        # np.sum pairwise vs sequential accumulation: tolerance per contract
        np.testing.assert_almost_equal(lopt[r], ls, decimal=8)
        np.testing.assert_almost_equal(Z[r], zs, decimal=5)
        assert np.array_equal(np.rint(Z[r]), np.rint(zs))


def test_ws2doptvp_matches_scalar(block):
    Y, W = block
    Z, lopt = K.ws2doptvp_batch(Y, W, SRANGE_HIGH_CORR, 0.90)
    for r in range(Y.shape[0]):
        zs, ls = ref.ws2doptvp(Y[r], W[r], list(SRANGE_HIGH_CORR), 0.90)
        np.testing.assert_almost_equal(lopt[r], ls, decimal=8)
        np.testing.assert_almost_equal(Z[r], zs, decimal=5)
        assert np.array_equal(np.rint(Z[r]), np.rint(zs))


def test_lag1corr_matches_scalar(block):
    Y, W = block
    got = K.lag1corr_batch(Y, NODATA)
    for r in range(Y.shape[0]):
        exp = ref.lag1corr(Y[r, :-1], Y[r, 1:], NODATA)
        np.testing.assert_almost_equal(got[r], exp, decimal=12)


def test_lag1corr_all_nodata_is_nan():
    Y = np.full((2, 30), NODATA)
    got = K.lag1corr_batch(Y, NODATA)
    assert np.isnan(got).all()


def test_lag1corr_constant_series_is_nan():
    Y = np.full((1, 30), 500.0)
    got = K.lag1corr_batch(Y, NODATA)
    assert np.isnan(got).all()


def test_coverage_gate():
    Y = np.full((3, 100), NODATA)
    Y[0, :25] = 100.0  # 25% valid -> smoothed
    Y[1, :19] = 100.0  # 19% valid -> skipped
    Y[2, :20] = 100.0  # exactly 20% -> smoothed (>= semantics, smooth.py:397)
    W = K.weights_from_nodata(Y, NODATA)
    ok = K.coverage_ok(W)
    assert ok.tolist() == [True, False, True]


def test_gap_fill_replaces_nodata(block):
    """Weight-0 points get replaced by the smooth curve (gap-fill)."""
    Y, W = block
    Z = K.ws2d_batch(Y, 10.0, W)
    gaps = Y == NODATA
    assert gaps.any()
    valid_neighbours = Z[gaps]
    assert (valid_neighbours > -2500).all()  # pulled away from the sentinel


def test_ws2d_short_series_raises():
    Y = np.zeros((1, 3))
    with pytest.raises(ValueError):
        K.ws2d_batch(Y, 1.0, np.ones_like(Y))


def test_mostly_missing_rows_converge():
    """Envelope loop with rows that converge at different iterations."""
    Y = np.stack([make_series(80, s, gap_rate=g) for s, g in
                  zip(range(6), [0.0, 0.1, 0.5, 0.7, 0.3, 0.05])])
    W = K.weights_from_nodata(Y, NODATA)
    Z, lopt = K.ws2doptvp_batch(Y, W, SRANGE_NAN_CORR, 0.90)
    for r in range(Y.shape[0]):
        zs, ls = ref.ws2doptvp(Y[r], W[r], list(SRANGE_NAN_CORR), 0.90)
        np.testing.assert_almost_equal(Z[r], zs, decimal=5)
        np.testing.assert_almost_equal(lopt[r], ls, decimal=8)
