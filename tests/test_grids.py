"""Date-grid tests mirroring /root/reference/tests/test_utils.py:22-45.

The reference asserts: for the 742-date MXD axis (8-day, 2002177..2018217),
the daily grid has 5893 entries and the dekad target grid 580 entries, and
daily[getDIX()] == target.
"""

from __future__ import annotations

import datetime

import numpy as np

from modape_spark.grids import (
    DateGrid,
    dekvec,
    fromjulian,
    grid_for_length,
    pentvec,
    raw_dates_for_length,
    tojulian,
    tvec,
)


def mxd_axis():
    return raw_dates_for_length(742, epoch="2002177")


def test_fromjulian():
    assert fromjulian("2002185") == datetime.date(2002, 7, 4)
    assert tojulian(datetime.date(2002, 7, 4)) == "2002185"


def test_tvec_lengths():
    assert len(tvec(2002, 1)) == 365
    assert len(tvec(2004, 1)) == 366  # leap
    assert len(tvec(2002, 8)) == 46
    assert tvec(2002, 8)[0] == "2002001"


def test_pentvec_dekvec():
    assert len(pentvec(2002)) == 72
    assert len(dekvec(2002)) == 36
    assert sorted(dekvec(2002))[0] == "2002005"
    # Feb 28 present even in non-leap years (ValueError guard)
    assert "2002059" in pentvec(2002)


def test_dategrid_reference_numbers():
    raw = mxd_axis()
    assert raw[-1] == "2018217"
    g = DateGrid(raw, rtres=8, stres=10, tshift=8)
    assert len(g.daily) == 5893
    assert g.target_length == 580
    # daily[target_ix] == target (tests/test_utils.py:33)
    tix = g.target_indices()
    assert [g.daily[i] for i in tix] == g.target


def test_dategrid_pentad():
    raw = mxd_axis()
    g = DateGrid(raw, rtres=8, stres=5, tshift=8)
    assert g.target_length > 580  # pentads denser than dekads
    tix = g.target_indices()
    assert [g.daily[i] for i in tix] == g.target


def test_scatter_monotonic_and_shifted():
    raw = mxd_axis()
    g = DateGrid(raw, rtres=8, stres=10, tshift=8)
    six = g.scatter_indices()
    assert six.shape == (742,)
    assert (np.diff(six) > 0).all()  # strictly increasing
    assert set(np.diff(six)) <= {5, 6, 8}  # 8-day, short step at year ends
    # first raw date 2002177 shifted by 8 -> 2002185, position 8 in daily
    assert g.daily[six[0]] == "2002185"


def test_target_indices_nupdate_tail():
    raw = mxd_axis()
    g = DateGrid(raw, rtres=8, stres=10, tshift=8)
    full = g.target_indices()
    tail = g.target_indices(nupdate=3)
    assert np.array_equal(tail, full[-3:])


def test_grid_for_length_cache():
    p1 = grid_for_length(742, 10)
    p2 = grid_for_length(742, 10)
    assert p1 is p2  # lru cache hit
    assert p1.target_ix.size > 0
    assert p1.scatter_ix.size == 742
    # window scatter = tail of full scatter (uniform shift)
    assert np.array_equal(p1.scatter_ix[-16:], p1.scatter_ix[742 - 16:])


def test_raw_dates_epoch():
    rd = raw_dates_for_length(4)
    assert rd == ["2002185", "2002193", "2002201", "2002209"]


def test_dategrid_custom_start():
    raw = raw_dates_for_length(46)  # one year
    g = DateGrid(raw, rtres=8, stres=10, tshift=8, start=raw[0])
    assert g.target[0] == raw[0]
    assert all(
        (fromjulian(b) - fromjulian(a)).days == 10
        for a, b in zip(g.target, g.target[1:])
    )
