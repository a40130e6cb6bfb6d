"""Rollup pipeline vs row-wise reference semantics (smooth.py:354-448)."""

from __future__ import annotations

import numpy as np

from modape_spark import kernels as K
from modape_spark.constants import NODATA, SRANGE_HIGH_CORR, SRANGE_LOW_CORR, SRANGE_NAN_CORR
from modape_spark.fixtures import gen_tokens_block
from modape_spark.grids import grid_for_length
from modape_spark.rollup import SmoothConfig, process_length_group, smooth_block, tinterpolate_block

from . import reference_scalar as ref


def block(n=64, rows=12, start=0):
    ids = np.arange(start, start + rows, dtype=np.int64)
    return gen_tokens_block(ids, n).astype(np.float64)


def test_fixed_lambda_and_gate_passthrough():
    Y = block()
    Y[3, :] = NODATA  # fully missing -> gated out
    cfg = SmoothConfig(soptimize=False, svalue=1.0)  # s = 10
    Z, sopt, covered = smooth_block(Y, cfg)
    assert not covered[3]
    assert np.array_equal(Z[3], Y[3])  # raw passthrough (smooth.py:367)
    W = K.weights_from_nodata(Y, NODATA)
    for r in np.where(covered)[0]:
        np.testing.assert_array_equal(Z[r], ref.ws2d(Y[r], 10.0, W[r]))
    assert np.isnan(sopt[covered]).all()  # no optimization -> no sopt


def test_adaptive_srange_dispatch():
    """Per-row lambda grid selection must follow lag1corr branching
    (smooth.py:406-415)."""
    Y = block(n=80, rows=20, start=100)
    cfg = SmoothConfig(soptimize=True, p=None)
    Z, sopt, covered = smooth_block(Y, cfg)
    W = K.weights_from_nodata(Y, NODATA)
    lag = K.lag1corr_batch(Y, NODATA)
    for r in np.where(covered)[0]:
        if lag[r] > 0.5:
            llas = SRANGE_HIGH_CORR
        elif lag[r] <= 0.5:
            llas = SRANGE_LOW_CORR
        else:
            llas = SRANGE_NAN_CORR
        zs, ls = ref.ws2doptv(Y[r], W[r], list(llas))
        np.testing.assert_almost_equal(Z[r], zs, decimal=5)
        np.testing.assert_almost_equal(10.0 ** sopt[r], ls, decimal=6)


def test_optvp_envelope_path():
    Y = block(n=64, rows=8, start=50)
    cfg = SmoothConfig(soptimize=True, p=0.90, srange=tuple(SRANGE_NAN_CORR))
    Z, sopt, covered = smooth_block(Y, cfg)
    W = K.weights_from_nodata(Y, NODATA)
    for r in np.where(covered)[0]:
        zs, ls = ref.ws2doptvp(Y[r], W[r], list(SRANGE_NAN_CORR), 0.90)
        np.testing.assert_almost_equal(Z[r], zs, decimal=5)


def test_sgrid_mode():
    """Fixed-from-grid: s = 10**sgrid[row] (smooth.py:430-431)."""
    Y = block(n=64, rows=6, start=7)
    sgrid = np.linspace(-1, 2, 6)
    cfg = SmoothConfig(soptimize=False, svalue=None)
    Z, _, covered = smooth_block(Y, cfg, sgrid=sgrid)
    W = K.weights_from_nodata(Y, NODATA)
    for r in np.where(covered)[0]:
        # vectorized 10**x may differ from scalar pow by 1 ulp -> contract tol
        np.testing.assert_almost_equal(Z[r], ref.ws2d(Y[r], 10.0 ** sgrid[r], W[r]), decimal=5)


def _tinterp_row(z1, n_tok, grid, nodata=NODATA):
    """Row-wise mirror of smooth.py:549-557 (_apply_tinterpolate)."""
    z2 = np.full(grid.n_daily, float(nodata))
    z2[grid.scatter_ix[-z1.size:]] = z1
    w = (z2 != nodata).astype(np.float64)
    sm = ref.ws2d(z2, 0.0001, w)
    return sm[grid.target_ix]


def test_tinterpolate_matches_rowwise():
    n = 64
    Y = block(n=n, rows=6, start=30)
    cfg = SmoothConfig(soptimize=False, svalue=1.0)
    Z, _, covered = smooth_block(Y, cfg)
    grid = grid_for_length(n, 10)
    out = tinterpolate_block(Z, covered, grid)
    for r in range(Y.shape[0]):
        if covered[r]:
            np.testing.assert_almost_equal(out[r], _tinterp_row(Z[r], n, grid), decimal=8)
        else:
            assert (out[r] == NODATA).all()


def test_process_length_group_shapes_and_rint():
    n = 128
    Y = block(n=n, rows=10, start=300)
    cfg = SmoothConfig(soptimize=True, p=0.9, tempint=(10, 5))
    res = process_length_group(Y, n, cfg)
    assert res.smoothed.shape == (10, n)
    assert res.smoothed.dtype == np.int32
    g10 = grid_for_length(n, 10)
    g5 = grid_for_length(n, 5)
    assert res.interp[10].shape == (10, g10.target_ix.size)
    assert res.interp[5].shape == (10, g5.target_ix.size)
    assert res.sopt_log10.dtype == np.float32
    # gated-out rows: all-nodata interp, 0.0 sopt (reference zero-filled sgrid)
    gated = ~res.covered
    if gated.any():
        assert (res.interp[10][gated] == NODATA).all()
        assert (res.sopt_log10[gated] == 0.0).all()


def test_nsmooth_window():
    n = 64
    Y = block(n=n, rows=4, start=70)
    cfg = SmoothConfig(soptimize=False, svalue=1.0, nsmooth=16, tempint=(10,))
    res = process_length_group(Y, n, cfg)
    assert res.smoothed.shape == (4, 16)
    # window smoothing == smoothing the slice directly
    cfg_full = SmoothConfig(soptimize=False, svalue=1.0)
    Zs, _, cov = smooth_block(Y[:, -16:], cfg_full)
    np.testing.assert_array_equal(res.smoothed, np.rint(Zs).astype(np.int32))


def test_sequences_doc_ids_do_not_truncate_beyond_12_digits(spark):
    """ids >= 10^12 must widen like f'{i:012d}', never truncate into
    colliding doc_ids (np U12-cast regression guard)."""
    from modape_spark.sources.sequences import sequences_df

    big = 10**12 + 5
    rows = sequences_df(spark, 3, partitions=1, start=big).select("doc_id").collect()
    got = sorted(r["doc_id"] for r in rows)
    assert got == [f"doc{big + j:012d}" for j in range(3)]
    assert got[0] == "doc1000000000005"


def test_kernel_fixedpoint_exactness():
    """Gapped linear ramps are exact fixed points of the full rollup
    (smooth + optimize + envelope + daily interp + rint): zero residual
    and zero second difference is the unique global minimum of the
    Whittaker objective, and with epoch 2003001 / lengths 24,40 the raw
    axis never crosses a year restart, so the dekad/pentad samples carry
    the closed form a + c*(doy - 1 - tshift).  This is the numpy-level
    pin of the driver's tier_kernel_fixedpoint DuckDB oracle."""
    import numpy as np

    from modape_spark.grids import grid_for_length
    from modape_spark.rollup import SmoothConfig, process_length_group

    cfg = SmoothConfig(soptimize=True, p=0.90, tempint=(10, 5),
                       epoch="2003001")
    for n in (24, 40):
        docs = np.arange(60)
        a = 1000 + (docs % 7) * 16
        c = docs % 5
        Y = a[:, None] + 8 * c[:, None] * np.arange(n)[None, :]
        Y = Y.astype(np.float64)
        gaps = (docs[:, None] * 7 + np.arange(n)[None, :] * 3) % 5 == 0
        Y[gaps] = -3000.0
        res = process_length_group(Y, n, cfg)
        assert res.covered.all()
        line = (a[:, None] + 8 * c[:, None] * np.arange(n)[None, :])
        assert np.array_equal(res.smoothed, line)
        for stres in (10, 5):
            doys = np.array([int(d[4:]) for d in
                             grid_for_length(n, stres, epoch="2003001")
                             .target_dates])
            exp = a[:, None] + c[:, None] * (doys[None, :] - 9)
            assert np.array_equal(res.interp[stres], exp), (n, stres)
