"""Block-level rollup pipeline: gate -> smooth -> interpolate -> round.

Pure numpy; no Spark imports.  This module is BOTH the body of the Spark
``mapInArrow`` stage (tiers.py) and the local oracle the tests compare the
cluster output against — so Spark-vs-oracle equality is exact by
construction, and correctness reduces to the kernel tests
(tests/test_kernels.py) plus the reference-semantics tests here.

Reference semantics reproduced (citations into /root/reference/):

- weights from nodata + 20% coverage gate      modape/modis/smooth.py:393-398
- adaptive lambda range via lag-1 correlation  smooth.py:403-415
- kernel dispatch (soptimize/svalue/p)          smooth.py:417-438
- temporal interpolation: scatter smoothed points onto the daily grid at
  tshift-shifted positions, re-smooth with lambda=1e-4, gather target dates
                                               smooth.py:354-365,440-446,549-557
- np.rint before integer write                  smooth.py:448
- sgrid stored as log10(s_opt)                  smooth.py:463-464
- rows failing the gate: raw passthrough in the non-interpolated tier
  (arr_smt aliases arr_raw, smooth.py:367), all-nodata in interpolated tiers
  (arr_smt pre-filled with nodata, smooth.py:356-358)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import kernels as K
from .constants import (
    COVERAGE_MIN_FRAC,
    EPOCH_JULIAN,
    NODATA,
    RTRES,
    SRANGE_HIGH_CORR,
    SRANGE_LOW_CORR,
    SRANGE_NAN_CORR,
    STRES_DEKAD,
    STRES_PENTAD,
    TINTERPOLATE_LAMBDA,
    TSHIFT,
)
from .grids import PreparedGrid, grid_for_length

__all__ = ["SmoothConfig", "smooth_block", "tinterpolate_block", "process_length_group"]


@dataclass(frozen=True)
class SmoothConfig:
    """Mirror of the modis_smooth CLI surface (scripts/modis_smooth.py:22-123)."""
    soptimize: bool = True
    svalue: float | None = None        # fixed log10(s) when not optimizing
    srange: tuple[float, ...] | None = None  # fixed lambda grid (log10)
    p: float | None = None             # asymmetric envelope value
    nodata: float = NODATA
    coverage_min_frac: float = COVERAGE_MIN_FRAC
    tempint: tuple[int, ...] = ()      # target resolutions to interpolate (5/10/...)
    nsmooth: int = 0                   # trailing raw window (0 = all)
    nupdate: int = 0                   # trailing output points to produce (0 = all)
    # per-product axis parameters (reference constants.py:72-102 product
    # table + modis_smooth --tempint-start, smooth.py:73-91):
    rtres: int = RTRES                 # raw temporal resolution (days)
    tshift: int = TSHIFT               # shift before the daily-grid scatter
    tempint_start: str | None = None   # custom target-grid start (YYYYDDD)
    epoch: str = EPOCH_JULIAN          # julian date of token position 0


# Canonical engine configurations — defined HERE (pyspark-free) so the
# driver queries, the CLI, and the no-Spark scaling control all measure
# the SAME workload by construction (a hand-copied config in the control
# could silently drift from the engine's).
CFG_ALL = SmoothConfig(soptimize=True, p=0.90,
                       tempint=(STRES_DEKAD, STRES_PENTAD))
CFG_SMOOTH = SmoothConfig(soptimize=True, p=0.90, tempint=())
CFG_FIXED = SmoothConfig(soptimize=False, svalue=1.0, tempint=(STRES_DEKAD,))


def smooth_block(
    Y: np.ndarray,
    cfg: SmoothConfig,
    sgrid: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Smooth one same-length block of rows.

    Args:
        Y: (R, n) float64 raw values (nodata sentinel included).
        cfg: smoothing configuration.
        sgrid: (R,) stored log10(s) per row, required when
            soptimize=False and svalue is None (smooth.py:430-431).

    Returns:
        (Z, sopt_log10, covered):
        Z (R, n) float64 — smoothed where covered, RAW passthrough otherwise;
        sopt_log10 (R,) float64 — log10 of optimized lambda where covered and
        optimizing (NaN otherwise / 0.0 for gated-out rows as the reference's
        zero-filled sgrid, smooth.py:162-170);
        covered (R,) bool — the 20% gate.
    """
    Y = np.ascontiguousarray(Y, dtype=np.float64)
    R, n = Y.shape
    W = K.weights_from_nodata(Y, cfg.nodata)
    covered = K.coverage_ok(W, cfg.coverage_min_frac)
    Z = Y.copy()
    sopt = np.full(R, np.nan)
    if cfg.soptimize:
        sopt[~covered] = 0.0  # reference sgrid dataset is zero-initialised
    idx = np.where(covered)[0]
    if idx.size:
        Yc, Wc = Y[idx], W[idx]
        if cfg.soptimize:
            if cfg.srange is not None:
                llas = np.asarray(cfg.srange, dtype=np.float64)
                valid = None
            else:
                # adaptive per-row grid (smooth.py:406-415), MERGED into one
                # (R, nl) matrix so the whole covered block solves in one
                # vectorized batch; short grids pad by repeating their last
                # value and the pad columns are masked out of the v-curve.
                lag = K.lag1corr_batch(Yc, cfg.nodata)
                hi = lag > 0.5
                lo = lag <= 0.5
                nan = ~(hi | lo)
                nl = max(SRANGE_HIGH_CORR.size, SRANGE_LOW_CORR.size,
                         SRANGE_NAN_CORR.size)
                llas = np.empty((idx.size, nl))
                valid = np.empty(idx.size, dtype=np.int64)
                llas[hi] = SRANGE_HIGH_CORR
                valid[hi] = SRANGE_HIGH_CORR.size
                llas[lo] = SRANGE_LOW_CORR
                valid[lo] = SRANGE_LOW_CORR.size
                nn = SRANGE_NAN_CORR.size
                llas[nan, :nn] = SRANGE_NAN_CORR
                llas[nan, nn:] = SRANGE_NAN_CORR[-1]
                valid[nan] = nn
            if cfg.p is not None:
                Zs, lopt = K.ws2doptvp_batch(Yc, Wc, llas, cfg.p, valid)
            else:
                Zs, lopt = K.ws2doptv_batch(Yc, Wc, llas, valid)
            Z[idx] = Zs
            sopt[idx] = np.log10(lopt)
        else:
            if cfg.svalue is not None:
                s = np.full(idx.size, 10.0 ** cfg.svalue)
            else:
                if sgrid is None:
                    raise ValueError("sgrid required when svalue is None and not optimizing")
                s = 10.0 ** np.asarray(sgrid, dtype=np.float64)[idx]
            if cfg.p is not None:
                Z[idx] = K.ws2dp_batch(Yc, s, Wc, cfg.p)
            else:
                Z[idx] = K.ws2d_batch(Yc, s, Wc)
    return Z, sopt, covered


def tinterpolate_block(
    Z: np.ndarray,
    covered: np.ndarray,
    grid: PreparedGrid,
    nodata: float = NODATA,
    nupdate: int = 0,
) -> np.ndarray:
    """Daily scatter -> lambda=1e-4 smooth -> target gather
    (smooth.py:549-557).

    Z rows are the smoothed values of the trailing ``Z.shape[1]`` raw dates;
    their daily positions are the tail of the full scatter map (the tshift is
    uniform).  Rows not covered yield all-nodata output
    (smooth.py:356-358,482).

    Returns (R, n_targets) float64 (not yet rounded).
    """
    R, k = Z.shape
    tix = grid.target_ix if nupdate == 0 else grid.target_ix[-nupdate:]
    out = np.full((R, tix.size), float(nodata))
    idx = np.where(covered)[0]
    if idx.size:
        daily = np.full((idx.size, grid.n_daily), float(nodata))
        daily[:, grid.scatter_ix[-k:]] = Z[idx]
        Wd = (daily != nodata).astype(np.float64)
        sm = K.ws2d_batch(daily, TINTERPOLATE_LAMBDA, Wd)
        out[idx] = sm[:, tix]
    return out


def tinterpolate_multi(
    Z: np.ndarray,
    covered: np.ndarray,
    n_tok: int,
    stres_list: tuple[int, ...],
    nodata: float = NODATA,
    nupdate: int = 0,
    rtres: int = RTRES,
    tshift: int = TSHIFT,
    epoch: str = EPOCH_JULIAN,
    start: str | None = None,
) -> dict[int, np.ndarray]:
    """Shared-daily-curve interpolation for several target grids.

    The expensive lambda=1e-4 daily smooth depends only on the raw date
    axis, NOT on the target resolution (the reference also samples every
    target grid from the same daily curve, smooth.py:549-557) — compute it
    once, gather per grid.
    """
    grids = {s: grid_for_length(n_tok, s, rtres, tshift, epoch, start)
             for s in stres_list}
    R, k = Z.shape
    idx = np.where(covered)[0]
    out = {}
    tixs = {}
    for s, g in grids.items():
        tixs[s] = g.target_ix if nupdate == 0 else g.target_ix[-nupdate:]
        out[s] = np.full((R, tixs[s].size), float(nodata))
    if idx.size and grids:
        g0 = next(iter(grids.values()))
        scat = g0.scatter_ix[-k:]
        # chunk rows so the (chunk, n_daily) scratch stays ~1 MiB and the
        # scatter -> weights -> solve -> gather passes reuse L2 instead of
        # streaming DRAM — at 32 concurrent workers the full-batch matrix
        # (6 MiB/worker) was the remaining shared-memory contention
        chunk = max(1, (1 << 20) // (8 * g0.n_daily))
        daily = np.empty((min(chunk, idx.size), g0.n_daily), dtype=np.float64)
        for lo in range(0, idx.size, chunk):
            sel = idx[lo:lo + chunk]
            d = daily[:sel.size]
            d.fill(float(nodata))
            Zc = Z[sel]
            d[:, scat] = Zc
            # weights = (daily != nodata): off-scatter positions are nodata
            # by construction, so only scatter columns can be nonzero
            Wd = np.zeros_like(d)
            Wd[:, scat] = (Zc != nodata).astype(np.float64)
            sm = K.ws2d_batch(d, TINTERPOLATE_LAMBDA, Wd)
            for s in grids:
                out[s][sel] = sm[:, tixs[s]]
    return out


@dataclass
class LengthGroupResult:
    smoothed: np.ndarray          # (R, n) int32 — rint'd, raw passthrough if gated
    sopt_log10: np.ndarray        # (R,) float32
    covered: np.ndarray           # (R,) bool
    interp: dict[int, np.ndarray] = field(default_factory=dict)  # stres -> (R, n_t) int32
    target_lengths: dict[int, int] = field(default_factory=dict)


def process_length_group(
    Y: np.ndarray,
    n_tok: int,
    cfg: SmoothConfig,
    sgrid: np.ndarray | None = None,
) -> LengthGroupResult:
    """Full rollup for one same-length block: smooth + all requested
    interpolation tiers, integer-rounded (smooth.py:448, np.rint)."""
    if cfg.nsmooth:
        if Y.shape[1] < cfg.nsmooth:
            raise ValueError(
                f"Insufficient data points for nsmooth={cfg.nsmooth}: {Y.shape[1]}"
            )
        Yw = Y[:, Y.shape[1] - cfg.nsmooth:]
    else:
        Yw = Y
    Z, sopt, covered = smooth_block(Yw, cfg, sgrid)
    res = LengthGroupResult(
        smoothed=np.rint(Z).astype(np.int32),
        sopt_log10=sopt.astype(np.float32),
        covered=covered,
    )
    if cfg.tempint:
        multi = tinterpolate_multi(Z, covered, n_tok, tuple(cfg.tempint),
                                   cfg.nodata, cfg.nupdate,
                                   cfg.rtres, cfg.tshift, cfg.epoch,
                                   cfg.tempint_start)
        for stres, vals in multi.items():
            res.interp[stres] = np.rint(vals).astype(np.int32)
            res.target_lengths[stres] = vals.shape[1]
    return res
