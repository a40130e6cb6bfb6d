"""CSV time-series surface (S11): the csv_smooth debug path.

Mirror of /root/reference/modape/scripts/csv_smooth.py:76-146 — a CSV with
one series per column is smoothed and written back with `Sopt`/`logSopt`
rows appended.  Columns become rows (melt) so the same rollup kernel path
applies; this is a debug/QA surface, not a scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..kernels import weights_from_nodata, ws2d_batch, ws2doptv_batch
from ..constants import SRANGE_NAN_CORR


def smooth_csv(in_path: str, out_path: str, svalue: float | None = None,
               nodata: float = 0.0, srange=None) -> pd.DataFrame:
    """Smooth every column of a CSV; append Sopt/logSopt rows
    (csv_smooth.py:119-126).  Pure pandas/numpy — local debug tool."""
    df = pd.read_csv(in_path)
    series_cols = [c for c in df.columns if pd.api.types.is_numeric_dtype(df[c])]
    Y = df[series_cols].to_numpy(dtype=np.float64).T  # rows = series
    W = weights_from_nodata(Y, nodata)
    if svalue is not None:
        s = 10.0 ** svalue
        Z = ws2d_batch(Y, s, W)
        sopt = np.full(Y.shape[0], s)
    else:
        llas = np.asarray(srange if srange is not None else SRANGE_NAN_CORR)
        Z, sopt = ws2doptv_batch(Y, W, llas)
    out = pd.DataFrame(Z.T, columns=series_cols)
    for extra_name, vals in (("Sopt", sopt), ("logSopt", np.log10(sopt))):
        row = {c: v for c, v in zip(series_cols, vals)}
        row["_label"] = extra_name
        out = pd.concat([out, pd.DataFrame([row])], ignore_index=True)
    out.to_csv(out_path, index=False)
    return out
