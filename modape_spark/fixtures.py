"""Deterministic synthetic ``sequences`` table (FIXTURES.md §1).

Input shape per BASELINE.json input_hint:
``(doc_id string, tokens array<int32>, n_tok int32, source string)`` —
one row = one reference "pixel time series" (a row of the (npixels, T)
datacube, /root/reference/modape/modis/collect.py:278-287).

Generation is STATELESS: every value is a pure function of
(seed, row_id, position) via a splitmix64-style integer hash, vectorized
with numpy.  This makes generation identical regardless of Spark
partitioning, parallelism, or batch boundaries — the property the
oracle-equality and resume tests rely on — and costs no shuffle (each
``spark.range`` partition generates its own rows).

Value model (mirrors the reference's NDVI fixtures,
tests/test_modis.py:75-131 and the MXD golden series):
  seasonal sinusoid (46-step year period) + hash-noise, clipped to the VIM
  valid range [-2000, 10000] (collect.py:302-306), int32, with nodata
  sentinel -3000 injected at hashed gap positions; per-row gap rate in
  [0, 0.95] so a tail of rows fails the 20% coverage gate
  (smooth.py:397-398).  Lengths: 85% rows 742 (golden length), minority 16 /
  64 / 128.  ``source`` is Zipf-skewed with one hot key holding ~50% of rows
  to exercise salted repartitioning.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "SOURCES",
    "LENGTHS",
    "row_lengths",
    "row_sources",
    "gen_tokens_block",
    "local_sequences",
    "n_rows_for_sf",
]

SEED = 42
SOURCES = ["web", "books", "code", "wiki", "news",
           "social", "academic", "legal", "forum", "misc"]
# cumulative percent thresholds for the zipf-ish source split (hot key: web 50%)
_SOURCE_CUM = np.array([50, 65, 75, 83, 89, 93, 96, 98, 99.5, 100.0])
LENGTHS = {742: 85, 16: 5, 64: 5, 128: 5}  # length -> percent


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — public-domain integer hash (Steele et al.)."""
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        x ^= x >> np.uint64(30)
        x = (x * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
        x ^= x >> np.uint64(27)
        x = (x * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
        x ^= x >> np.uint64(31)
    return x


_M64 = (1 << 64) - 1


def _u01(ids: np.ndarray, stream: int, pos: np.ndarray | int = 0) -> np.ndarray:
    """Uniform [0,1) from (seed, stream, id, pos); wraparound intentional."""
    base = np.uint64((stream * 0xD1B54A32D192ED03 + SEED * 0x8CB92BA72F3D8DD7) & _M64)
    with np.errstate(over="ignore"):
        h = _splitmix64(
            ids.astype(np.uint64)
            + base
            + (np.asarray(pos, dtype=np.uint64) * np.uint64(0x2545F4914F6CDD1D))
        )
    return h.astype(np.float64) / 18446744073709551616.0


def row_lengths(ids: np.ndarray) -> np.ndarray:
    u = _u01(ids, stream=1) * 100.0
    out = np.full(ids.size, 742, dtype=np.int32)
    out[(u >= 85) & (u < 90)] = 16
    out[(u >= 90) & (u < 95)] = 64
    out[u >= 95] = 128
    return out


def row_sources(ids: np.ndarray) -> np.ndarray:
    u = _u01(ids, stream=2) * 100.0
    k = np.searchsorted(_SOURCE_CUM, u, side="right")
    k = np.minimum(k, len(SOURCES) - 1)
    return np.array(SOURCES, dtype=object)[k]


def gen_tokens_block(ids: np.ndarray, n: int) -> np.ndarray:
    """(R, n) int32 token block for rows that all share length n."""
    R = ids.size
    mean = 2000.0 + 4000.0 * _u01(ids, 3)            # per-row level
    amp = 1000.0 + 3000.0 * _u01(ids, 4)             # per-row amplitude
    phase = _u01(ids, 5) * 46.0                      # per-row phase
    gap_rate = _u01(ids, 6) * 0.95                   # per-row gap rate [0,0.95)
    k = np.arange(n, dtype=np.float64)
    # hash noise, sd ~= 400 (uniform; one hash stream — generation sits on
    # the same hot path as the kernel, so it stays cheap)
    u1 = _u01(ids[:, None], 7, np.arange(n)[None, :] + 1)
    noise = (u1 - 0.5) * 1386.0
    vals = mean[:, None] + amp[:, None] * np.sin(
        2 * np.pi * (k[None, :] + phase[:, None]) / 46.0
    ) + noise
    tokens = np.rint(np.clip(vals, -2000, 10000)).astype(np.int32)
    gaps = _u01(ids[:, None], 9, np.arange(n)[None, :] + 1) < gap_rate[:, None]
    tokens[gaps] = -3000
    return tokens


def local_sequences(n_rows: int, start: int = 0) -> dict[str, np.ndarray]:
    """Local (driver-side) generation for tests and oracles.

    Returns dict of columns; tokens is an object array of int32 arrays.
    """
    ids = np.arange(start, start + n_rows, dtype=np.int64)
    lens = row_lengths(ids)
    srcs = row_sources(ids)
    tokens = np.empty(n_rows, dtype=object)
    for n in np.unique(lens):
        sel = np.where(lens == n)[0]
        block = gen_tokens_block(ids[sel], int(n))
        for j, r in enumerate(sel):
            tokens[r] = block[j]
    return {
        "doc_id": np.array([f"doc{i:012d}" for i in ids], dtype=object),
        "tokens": tokens,
        "n_tok": lens.astype(np.int32),
        "source": srcs,
    }


def n_rows_for_sf(sf: float) -> int:
    """SF -> row count: 1e6 rows/SF (sf0.001->1k, sf0.01->10k, sf0.1->100k)."""
    return max(64, int(round(sf * 1_000_000)))
