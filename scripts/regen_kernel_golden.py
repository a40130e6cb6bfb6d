"""Regenerate tests/data/kernel_golden.parquet from the reference's own
golden pickle (/root/reference/modape/data/MXD_testdata.pkl — the fixture
used by /root/reference/tests/test_whittaker.py:16-55).

Provenance of each fixture column:
- y, w, z_ws2d, z_ws2dp, z_ws2dvc, sopt_ws2dvc, z_ws2dvcp, sopt_ws2dvcp,
  lag1corr: copied VERBATIM from the reference pickle (reference-anchored
  expected values, NOT produced by this engine).
- smoothed_int, dekad_int, pentad_int: this engine's full-tier outputs on
  the pickle's y (engine regression anchors; the float kernels underneath
  are the ones validated against the pickle at decimal=5).

Run: python scripts/regen_kernel_golden.py
"""

from __future__ import annotations

import os
import pickle
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from modape_spark.rollup import SmoothConfig, process_length_group  # noqa: E402

PKL = "/root/reference/modape/data/MXD_testdata.pkl"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                   "kernel_golden.parquet")


def main() -> None:
    with open(PKL, "rb") as fh:
        d = pickle.load(fh)
    y = np.asarray(d["y"], dtype=np.float64)
    cfg = SmoothConfig(soptimize=True, p=0.9, tempint=(10, 5))
    res = process_length_group(y[None, :], len(y), cfg)
    row = {
        "y": y,
        "w": np.asarray(d["w"], dtype=np.float64),
        "z_ws2d": np.asarray(d["z_ws2d"], dtype=np.float64),
        "z_ws2dvc": np.asarray(d["z_ws2dvc"], dtype=np.float64),
        "sopt_ws2dvc": float(d["sopt_ws2dvc"]),
        "z_ws2dvcp": np.asarray(d["z_ws2dvcp"], dtype=np.float64),
        "sopt_ws2dvcp": float(d["sopt_ws2dvcp"]),
        "z_ws2dp": np.asarray(d["z_ws2dp"], dtype=np.float64),
        "lag1corr": float(d["lag1corr"]),
        "smoothed_int": res.smoothed[0],
        "dekad_int": res.interp[10][0],
        "pentad_int": res.interp[5][0],
    }
    pd.DataFrame([row]).to_parquet(OUT, index=False)
    print("wrote", OUT)
    print("dekad shape", res.interp[10][0].shape,
          "pentad shape", res.interp[5][0].shape)


if __name__ == "__main__":
    main()
