"""C fast path vs pure-numpy path: bit-exact equality.

Both execute the same per-element IEEE operation sequence (C compiled with
-fno-fast-math -ffp-contract=off), so results must be IDENTICAL, not merely
close.  If gcc were unavailable the C path silently disables and these
tests assert the fallback works.
"""

from __future__ import annotations

import importlib

import numpy as np
import pytest

import modape_spark.ckernel as ck
import modape_spark.kernels as K
from modape_spark.constants import NODATA, SRANGE_HIGH_CORR
from modape_spark.fixtures import gen_tokens_block


@pytest.fixture(scope="module")
def block():
    Y = gen_tokens_block(np.arange(64, dtype=np.int64), 120).astype(np.float64)
    W = K.weights_from_nodata(Y, NODATA)
    return Y, W


def _numpy_only(fn, *args, **kw):
    """Run fn with the C library disabled."""
    saved_lib, saved_tried = ck._lib, ck._tried
    ck._lib, ck._tried = None, True
    try:
        return fn(*args, **kw)
    finally:
        ck._lib, ck._tried = saved_lib, saved_tried


def test_clib_compiles():
    assert ck.get_lib() is not None, "gcc present but C kernel failed to build"


def test_ws2d_c_equals_numpy_bitexact(block):
    Y, W = block
    lam = np.linspace(0.1, 1000, Y.shape[0])
    zc = K.ws2d_batch(Y, lam, W)
    zn = _numpy_only(K.ws2d_batch, Y, lam, W)
    assert zc.tobytes() == zn.tobytes()


def test_ws2dp_c_equals_numpy_bitexact(block):
    Y, W = block
    zc = K.ws2dp_batch(Y, 10.0, W, 0.90)
    zn = _numpy_only(K.ws2dp_batch, Y, 10.0, W, 0.90)
    assert zc.tobytes() == zn.tobytes()


def test_ws2doptvp_c_equals_numpy_bitexact(block):
    Y, W = block
    zc, lc = K.ws2doptvp_batch(Y, W, SRANGE_HIGH_CORR, 0.90)
    zn, ln = _numpy_only(K.ws2doptvp_batch, Y, W, SRANGE_HIGH_CORR, 0.90)
    assert zc.tobytes() == zn.tobytes()
    assert lc.tobytes() == ln.tobytes()


def test_ws2doptv_c_equals_numpy_bitexact(block):
    Y, W = block
    zc, lc = K.ws2doptv_batch(Y, W, SRANGE_HIGH_CORR)
    zn, ln = _numpy_only(K.ws2doptv_batch, Y, W, SRANGE_HIGH_CORR)
    assert zc.tobytes() == zn.tobytes()
    assert lc.tobytes() == ln.tobytes()


def test_rollup_c_equals_numpy(block):
    from modape_spark.rollup import SmoothConfig, process_length_group

    Y, _ = block
    cfg = SmoothConfig(soptimize=True, p=0.9, tempint=(10, 5))
    rc = K and process_length_group(Y, 120, cfg)
    rn = _numpy_only(process_length_group, Y, 120, cfg)
    assert np.array_equal(rc.smoothed, rn.smoothed)
    assert np.array_equal(rc.interp[10], rn.interp[10])
    assert np.array_equal(rc.interp[5], rn.interp[5])
    assert rc.sopt_log10.tobytes() == rn.sopt_log10.tobytes()


def test_blocked_solver_bitexact_vs_scalar_rows():
    """The row-interleaved (SIMD-lane) C forms must reproduce the scalar
    C row loop BIT-FOR-BIT across lane remainders (R % 8), short series,
    and convergence-skewed blocks (per-lane early exit)."""
    lib = ck.get_lib()
    if lib is None:
        pytest.skip("C kernel unavailable")
    import ctypes

    rng = np.random.default_rng(20260821)
    for R, n in [(1, 16), (7, 31), (8, 742), (9, 742), (64, 120),
                 (128, 16), (33, 5936 // 8)]:
        Y = np.rint(rng.uniform(-2000, 10000, (R, n)))
        Y[rng.uniform(size=(R, n)) < 0.3] = float(NODATA)
        Y = np.ascontiguousarray(Y)
        W = K.weights_from_nodata(Y, NODATA)
        lam = np.ascontiguousarray(10.0 ** rng.uniform(-2, 4, R))
        scratch = np.empty(4 * n)
        Zs = np.empty_like(Y)
        Zb = np.empty_like(Y)
        lib.ws2d_rows(ck._dp(Y), ck._dp(lam), ck._dp(W), ck._dp(Zs),
                      ck._dp(scratch), n, R)
        assert lib.ws2d_rows_blk(ck._dp(Y), ck._dp(lam), ck._dp(W),
                                 ck._dp(Zb), n, R) == 0
        assert Zs.tobytes() == Zb.tobytes(), f"ws2d blk mismatch R={R} n={n}"

        zs = np.zeros_like(Y); wws = np.empty_like(Y)
        zb = np.zeros_like(Y); wwb = np.empty_like(Y)
        lib.envelope_rows(ck._dp(Y), ck._dp(lam), ck._dp(W),
                          ctypes.c_double(0.9), ck._dp(zs), ck._dp(wws),
                          ck._dp(scratch), n, R)
        assert lib.envelope_rows_blk(ck._dp(Y), ck._dp(lam), ck._dp(W),
                                     ctypes.c_double(0.9), ck._dp(zb),
                                     ck._dp(wwb), n, R) == 0
        assert zs.tobytes() == zb.tobytes(), f"env z mismatch R={R} n={n}"
        assert wws.tobytes() == wwb.tobytes(), f"env ww mismatch R={R} n={n}"
