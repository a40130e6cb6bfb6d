"""Temporal grids and index maps for gap-fill interpolation and rollups.

From-scratch port of the reference's date handling semantics
(/root/reference/modape/utils.py):

- ``fromjulian``  (utils.py:161-171)  parse YYYYDDD julian strings
- ``tvec``        (utils.py:173-187)  N-day grid per calendar year
- ``pentvec``     (utils.py:189-206)  pentad grid: days 3,8,13,18,23,28/month
- ``dekvec``      (utils.py:208-222)  dekad grid: days 5,15,25/month
- ``DateGrid``    (utils.py:64-135)   daily grid + target grid + index maps
                  (the reference's DateHelper), plus the tshift scatter map
                  of smooth.py:362-365.

Grids depend only on the raw date axis — for our sequences table the axis is
fully determined by (epoch, rtres, n_tok), so grids are computed once per
distinct series length and broadcast/cached; no per-row date work happens on
the hot path.
"""

from __future__ import annotations

import datetime
from functools import lru_cache

import numpy as np

from .constants import EPOCH_JULIAN, RTRES, TSHIFT

__all__ = ["fromjulian", "tojulian", "tvec", "pentvec", "dekvec",
           "DateGrid", "raw_dates_for_length", "grid_for_length"]


def fromjulian(x: str) -> datetime.date:
    """Parse YYYYDDD julian string (utils.py:161-171)."""
    return datetime.datetime.strptime(x, "%Y%j").date()


def tojulian(d: datetime.date) -> str:
    return d.strftime("%Y%j")


def tvec(yr: int, step: int) -> list[str]:
    """MODIS-like date vector for one year with given day step
    (utils.py:173-187)."""
    start = fromjulian(f"{yr}001")
    ndays = (fromjulian(f"{yr + 1}001") - start).days
    return [tojulian(start + datetime.timedelta(x)) for x in range(0, ndays, step)]


def pentvec(yr: int) -> list[str]:
    """Pentad grid, fixed days 3,8,13,18,23,28 per month (utils.py:189-206)."""
    out = []
    for m in range(1, 13):
        for d in (3, 8, 13, 18, 23, 28):
            try:
                out.append(tojulian(datetime.date(yr, m, d)))
            except ValueError:
                pass
    return out


def dekvec(yr: int) -> list[str]:
    """Dekad grid, fixed days 5,15,25 per month (utils.py:208-222).

    Note the reference builds this day-major ([05 x months, 15 x months,
    25 x months]); order only matters pre-sort and DateGrid sorts, so we
    keep the same construction for parity.
    """
    return [
        tojulian(datetime.date(yr, m, d))
        for d in (5, 15, 25)
        for m in range(1, 13)
    ]


class DateGrid:
    """Daily grid, target grid and index maps (utils.py:64-135).

    Args:
        rawdates: julian YYYYDDD strings of the raw axis, ascending.
        rtres: raw temporal resolution in days.
        stres: target temporal resolution (5=pentad, 10=dekad, other=N-day).
        tshift: day shift applied to raw dates before the daily scatter
            (smooth.py:362-365).
        start: optional custom start date (YYYYDDD) for the target grid.
    """

    def __init__(self, rawdates: list[str], rtres: int, stres: int,
                 tshift: int = 0, start: str | None = None):
        self.rawdates = list(rawdates)
        self.rtres = int(rtres)
        self.stres = int(stres)
        self.tshift = int(tshift)

        if start:
            stop = tojulian(fromjulian(rawdates[-1]) + datetime.timedelta(rtres))
            tdiff = (fromjulian(stop) - fromjulian(rawdates[0])).days
            d0 = fromjulian(rawdates[0])
            self.daily = [tojulian(d0 + datetime.timedelta(x)) for x in range(tdiff + 1)]
            if start not in self.daily:
                raise ValueError(
                    f"tempint start {start!r} outside the raw axis "
                    f"[{self.daily[0]}..{self.daily[-1]}]"
                )
            self.target = self.daily[self.daily.index(start)::stres]
        else:
            yrmin = int(min(x[:4] for x in rawdates))
            yrmax = int(max(x[:4] for x in rawdates))
            daily_tmp = [y for x in range(yrmin, yrmax + 2) for y in tvec(x, 1)]
            stop = tojulian(fromjulian(rawdates[-1]) + datetime.timedelta(rtres))
            self.daily = daily_tmp[daily_tmp.index(rawdates[0]):daily_tmp.index(stop) + 1]

            if stres != rtres:
                if stres == 5:
                    target_tmp = [y for x in range(yrmin, yrmax + 1) for y in pentvec(x)]
                elif stres == 10:
                    target_tmp = [y for x in range(yrmin, yrmax + 1) for y in dekvec(x)]
                else:
                    target_tmp = [y for x in range(yrmin, yrmax + 1) for y in tvec(x, stres)]
                target_tmp.sort()
                tset = set(target_tmp)
                start_target = next(sd for sd in self.daily if sd in tset)
                stop_target = next(sd for sd in reversed(self.daily) if sd in tset)
                self.target = target_tmp[
                    target_tmp.index(start_target):target_tmp.index(stop_target) + 1
                ]
            else:
                self.target = list(rawdates)

        self._daily_pos = {d: i for i, d in enumerate(self.daily)}
        self.target_length = len(self.target)

    def target_indices(self, nupdate: int = 0) -> np.ndarray:
        """Indices of (trailing nupdate) target dates within the daily grid
        (utils.py:128-135, getDIX)."""
        sel = self.target[-nupdate:] if nupdate else self.target
        return np.array([self._daily_pos[x] for x in sel], dtype=np.int64)

    def scatter_indices(self) -> np.ndarray:
        """Daily-grid positions of tshift-shifted raw dates
        (smooth.py:362-365)."""
        out = []
        for rd in self.rawdates:
            shifted = tojulian(fromjulian(rd) + datetime.timedelta(self.tshift))
            out.append(self._daily_pos[shifted])
        return np.array(out, dtype=np.int64)

    @property
    def n_daily(self) -> int:
        return len(self.daily)


def raw_dates_for_length(n_tok: int, epoch: str = EPOCH_JULIAN,
                         rtres: int = RTRES) -> list[str]:
    """Raw date axis for a sequence of n_tok points.

    MODIS-composite convention (utils.py:173-187, tvec): the rtres-day grid
    restarts at day 001 of every calendar year, so year boundaries carry a
    short 4-5 day step.  Position 0 sits at ``epoch``; subsequent positions
    follow the per-year grid.  (This is what makes the reference's 742-date
    axis 2002177..2018217 span 5893 daily points, tests/test_utils.py:22-33.)
    """
    yr = int(epoch[:4])
    out: list[str] = []
    while len(out) < n_tok:
        v = tvec(yr, rtres)
        if not out:
            v = v[v.index(epoch):]
        out.extend(v)
        yr += 1
    return out[:n_tok]


@lru_cache(maxsize=512)
def grid_for_length(n_tok: int, stres: int, rtres: int = RTRES,
                    tshift: int = TSHIFT,
                    epoch: str = EPOCH_JULIAN,
                    start: str | None = None) -> "PreparedGrid":
    """Cached, numpy-ready grid bundle for one (n_tok, stres) combination.

    All hot-path consumers (tiers.py mapInArrow batches) go through this
    cache — one grid computation per distinct series length per executor,
    amortized to zero at scale.  ``start`` is the reference's custom
    interpolation start (utils.py:79-83 / modis_smooth --tempint-start):
    the target grid becomes every ``stres``-th daily date from ``start``.
    """
    rawdates = raw_dates_for_length(n_tok, epoch, rtres)
    g = DateGrid(rawdates, rtres, stres, tshift, start)
    return PreparedGrid(
        n_daily=g.n_daily,
        scatter_ix=g.scatter_indices(),
        target_ix=g.target_indices(),
        target_dates=tuple(g.target),
    )


class PreparedGrid:
    """Immutable numpy view of a DateGrid for kernel batches."""

    __slots__ = ("n_daily", "scatter_ix", "target_ix", "target_dates")

    def __init__(self, n_daily: int, scatter_ix: np.ndarray,
                 target_ix: np.ndarray, target_dates: tuple[str, ...]):
        self.n_daily = n_daily
        self.scatter_ix = scatter_ix
        self.target_ix = target_ix
        self.target_dates = target_dates
