"""Engine constants.

Mirrors the reference's product constants where our semantics depend on
them (citations into /root/reference/):

- nodata sentinel -3000 and VIM valid range (-2000, 10000):
  modape/modis/collect.py:302-311, modape/constants.py:61-70
- raw temporal resolution 8 days, tshift 8, Aqua epoch "2002185":
  modape/constants.py:72-102, modape/modis/collect.py:177-187
- coverage gate 20%: modape/modis/smooth.py:397-398
- adaptive V-curve lambda ranges by lag-1 autocorrelation:
  modape/modis/smooth.py:406-415
- daily interpolation lambda 1e-4: modape/modis/smooth.py:553-555
"""

from __future__ import annotations

import numpy as np

NODATA: float = -3000.0
VALID_RANGE: tuple[int, int] = (-2000, 10000)

RTRES: int = 8           # raw temporal resolution (days between tokens)
TSHIFT: int = 8          # shift applied before daily-grid scatter
EPOCH_JULIAN: str = "2002185"  # julian date of token position 0

COVERAGE_MIN_FRAC: float = 0.2
TINTERPOLATE_LAMBDA: float = 0.0001

# Per-product temporal axis parameters (reference constants.py TEMPORAL_DICT,
# :72-102): raw resolution, pre-scatter shift, and — where the reference
# pins one — the epoch (min_date).  'mux' products interleave into a
# combined axis (MOD13+MYD13 -> MXD13, incremental.interleave_sources).
TEMPORAL_DICT: dict[str, dict] = {
    "VNP13": {"rtres": 8, "tshift": 8, "mux": "VNP", "epoch": "2012017"},
    "MXD13": {"rtres": 8, "tshift": 8, "epoch": "2002185"},
    # the 16-day single-satellite products mux into the MXD 8-day axis in
    # the reference; standalone use needs an epoch ON the 16-day tvec grid
    # (day 177 = 1 + 16*11; day 185 is not representable at rtres=16)
    "MOD13": {"rtres": 16, "tshift": 8, "mux": "MXD", "epoch": "2002177"},
    "MYD13": {"rtres": 16, "tshift": 8, "mux": "MXD", "epoch": "2002177"},
    "MOD11": {"rtres": 8, "tshift": 4},
    "MYD11": {"rtres": 8, "tshift": 4},
}

# Physical encoding per product subdataset (reference PRODUCT_SDS_DICT,
# constants.py:61-70): valid value range + the multi-sentinel nodata set
# that sources.ingest.ingest_reclass collapses to min(nodata_values).
PRODUCT_SDS: dict[str, dict] = {
    "VNP13A2_NDVI": {"value_range": (-10000, 10000),
                     "nodata_values": (-15000, -13000)},
    "MXD13A2_NDVI": {"value_range": (-2000, 10000),
                     "nodata_values": (-3000,)},
}


def temporal_params(product: str) -> dict:
    """Resolve (rtres, tshift, epoch) for a product code prefix, e.g.
    'MOD13A2' -> MOD13 row.  Unknown products get the engine defaults."""
    for key, row in TEMPORAL_DICT.items():
        if product.upper().startswith(key):
            return {"rtres": row["rtres"], "tshift": row["tshift"],
                    "epoch": row.get("epoch", EPOCH_JULIAN)}
    return {"rtres": RTRES, "tshift": TSHIFT, "epoch": EPOCH_JULIAN}

# Adaptive lambda-search grids (log10 s), chosen per row by lag1corr
# (smooth.py:406-415).  round(2) applied exactly as the reference does.
SRANGE_HIGH_CORR = np.arange(-2, 1.2, 0.2).round(2)   # lag1corr > 0.5
SRANGE_LOW_CORR = np.arange(0, 3.2, 0.2).round(2)     # lag1corr <= 0.5
SRANGE_NAN_CORR = np.arange(-1, 1.2, 0.2).round(2)    # lag1corr is NaN

# Default asymmetric-envelope p value used by the reference E2E test
# (tests/test_cli.py:653) and docs.
DEFAULT_P: float = 0.90

# Default fixed lambda used by golden kernel test (tests/test_whittaker.py:37)
DEFAULT_FIXED_LAMBDA: float = 10.0

# Tier names (raw -> smoothed -> dekad -> pentad), per BASELINE.json
TIER_RAW = "raw"
TIER_SMOOTHED = "smoothed"
TIER_DEKAD = "dekad"
TIER_PENTAD = "pentad"

# target-grid temporal resolutions (smooth.py / utils.py semantics)
STRES_DEKAD = 10
STRES_PENTAD = 5
