"""Golden-vector regression tests (mirror of the reference's
tests/test_whittaker.py:31-55 strategy: a pinned 742-point series with
expected outputs for every kernel, asserted at decimal=5 + exact integers).

The fixture (tests/data/kernel_golden.parquet) is REFERENCE-ANCHORED: the
y/w inputs and every expected float output (z_*, sopt_*, lag1corr) are
copied verbatim from the reference's own golden pickle
(/root/reference/modape/data/MXD_testdata.pkl, the fixture of
/root/reference/tests/test_whittaker.py). Only the integer tier columns
(smoothed_int/dekad_int/pentad_int) are engine outputs, pinned as
regression anchors. Regenerate with scripts/regen_kernel_golden.py.
tests/test_golden_reference.py additionally loads the pickle directly so
the correctness chain does not depend on the parquet copy.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from modape_spark import kernels as K
from modape_spark.constants import NODATA, SRANGE_HIGH_CORR
from modape_spark.rollup import SmoothConfig, process_length_group

FIXTURE = os.path.join(os.path.dirname(__file__), "data", "kernel_golden.parquet")


@pytest.fixture(scope="module")
def golden():
    row = pd.read_parquet(FIXTURE).iloc[0]
    return {k: (np.asarray(v) if hasattr(v, "__len__") else v)
            for k, v in row.items()}


def test_golden_series_shape(golden):
    assert golden["y"].shape == (742,)
    assert golden["lag1corr"] == pytest.approx(0.9478564478181846, abs=1e-12)


def test_golden_ws2d(golden):
    Y = golden["y"][None, :]
    W = golden["w"][None, :]
    z = K.ws2d_batch(Y, 10.0, W)[0]
    np.testing.assert_almost_equal(z, golden["z_ws2d"], decimal=5)
    assert np.array_equal(np.rint(z), np.rint(golden["z_ws2d"]))


def test_golden_ws2doptv(golden):
    Y, W = golden["y"][None, :], golden["w"][None, :]
    z, s = K.ws2doptv_batch(Y, W, SRANGE_HIGH_CORR)
    np.testing.assert_almost_equal(z[0], golden["z_ws2dvc"], decimal=5)
    assert s[0] == pytest.approx(golden["sopt_ws2dvc"], abs=1e-9)


def test_golden_ws2doptvp(golden):
    Y, W = golden["y"][None, :], golden["w"][None, :]
    z, s = K.ws2doptvp_batch(Y, W, SRANGE_HIGH_CORR, 0.90)
    np.testing.assert_almost_equal(z[0], golden["z_ws2dvcp"], decimal=5)
    assert s[0] == pytest.approx(golden["sopt_ws2dvcp"], abs=1e-9)


def test_golden_ws2dp(golden):
    Y, W = golden["y"][None, :], golden["w"][None, :]
    z = K.ws2dp_batch(Y, float(golden["sopt_ws2dvcp"]), W, 0.90)[0]
    np.testing.assert_almost_equal(z, golden["z_ws2dp"], decimal=5)


def test_golden_lag1corr(golden):
    got = K.lag1corr_batch(golden["y"][None, :], NODATA)[0]
    assert got == pytest.approx(golden["lag1corr"], abs=1e-12)


def test_golden_full_rollup_exact_ints(golden):
    """The per-row token invariant: tier integer arrays EXACTLY equal."""
    cfg = SmoothConfig(soptimize=True, p=0.9, tempint=(10, 5))
    res = process_length_group(golden["y"][None, :], 742, cfg)
    assert np.array_equal(res.smoothed[0], golden["smoothed_int"])
    assert np.array_equal(res.interp[10][0], golden["dekad_int"])
    assert np.array_equal(res.interp[5][0], golden["pentad_int"])
    # reference DateHelper counts for this axis (epoch 2002185)
    assert golden["dekad_int"].shape == (581,)
    assert golden["pentad_int"].shape == (1161,)
