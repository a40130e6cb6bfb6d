"""Scalar (one-series-at-a-time) Whittaker implementations, TEST ORACLE ONLY.

Plain-Python re-derivation of the recurrences in
/root/reference/modape/_whittaker.pyx (ws2d :67-107, ws2dp :162-214,
ws2doptv :216-293, ws2doptvp :296-423, lag1corr :22-65), kept deliberately
sequential so the batched numpy kernels in modape_spark.kernels can be
cross-checked for identical per-element operation order.  Never used on the
Spark hot path.
"""

from __future__ import annotations

import math

import numpy as np


def lag1corr(d1, d2, nd):
    M = len(d1)
    s1 = s2 = 0.0
    sub = 0
    for i in range(M):
        if d1[i] != nd and d2[i] != nd:
            s1 += d1[i]
            s2 += d2[i]
        else:
            sub += 1
    cnt = M - sub
    if cnt == 0:
        return float("nan")
    m1 = s1 / cnt
    m2 = s2 / cnt
    v1 = v2 = cx = 0.0
    for i in range(M):
        if d1[i] != nd and d2[i] != nd:
            v1 += (d1[i] - m1) ** 2
            v2 += (d2[i] - m2) ** 2
            cx += d1[i] * d2[i]
    std1 = (v1 / cnt) ** 0.5
    std2 = (v2 / cnt) ** 0.5
    cm = cx / cnt
    denom = std1 * std2
    if denom == 0.0:
        return float("nan")
    return (cm - m1 * m2) / denom


def ws2d(y, lmda, w):
    n = len(y)
    m = n - 1
    z = [0.0] * n
    d = [0.0] * n
    c = [0.0] * n
    e = [0.0] * n

    d[0] = w[0] + lmda
    c[0] = (-2 * lmda) / d[0]
    e[0] = lmda / d[0]
    z[0] = w[0] * y[0]
    d[1] = w[1] + 5 * lmda - d[0] * (c[0] * c[0])
    c[1] = (-4 * lmda - d[0] * c[0] * e[0]) / d[1]
    e[1] = lmda / d[1]
    z[1] = w[1] * y[1] - c[0] * z[0]
    for i in range(2, m - 1):
        i1, i2 = i - 1, i - 2
        d[i] = w[i] + 6 * lmda - (c[i1] * c[i1]) * d[i1] - (e[i2] * e[i2]) * d[i2]
        c[i] = (-4 * lmda - d[i1] * c[i1] * e[i1]) / d[i]
        e[i] = lmda / d[i]
        z[i] = w[i] * y[i] - c[i1] * z[i1] - e[i2] * z[i2]
    i1, i2 = m - 2, m - 3
    d[m - 1] = w[m - 1] + 5 * lmda - (c[i1] * c[i1]) * d[i1] - (e[i2] * e[i2]) * d[i2]
    c[m - 1] = (-2 * lmda - d[i1] * c[i1] * e[i1]) / d[m - 1]
    z[m - 1] = w[m - 1] * y[m - 1] - c[i1] * z[i1] - e[i2] * z[i2]
    i1, i2 = m - 1, m - 2
    d[m] = w[m] + lmda - (c[i1] * c[i1]) * d[i1] - (e[i2] * e[i2]) * d[i2]
    z[m] = (w[m] * y[m] - c[i1] * z[i1] - e[i2] * z[i2]) / d[m]
    z[m - 1] = z[m - 1] / d[m - 1] - c[m - 1] * z[m]
    for i in range(m - 2, -1, -1):
        z[i] = z[i] / d[i] - c[i] * z[i + 1] - e[i] * z[i + 2]
    return np.array(z)


def _envelope(y, lmda, w, p, z):
    """<=10 asymmetric iterations from starting z; returns (z, ww)."""
    m = len(y)
    p1 = 1 - p
    ww = [0.0] * m
    for _ in range(10):
        for j in range(m):
            wa = p if y[j] > z[j] else p1
            ww[j] = w[j] * wa
        znew = ws2d(y, lmda, ww)
        tmp = 0.0
        for j in range(m):
            tmp += abs(znew[j] - z[j])
        if tmp == 0.0:
            break
        z = znew
    return z, ww


def ws2dp(y, lmda, w, p):
    z = np.zeros(len(y))
    z, ww = _envelope(y, lmda, w, p, z)
    return ws2d(y, lmda, ww)


def _fit_pen(y, w, z):
    m = len(y)
    fit = 0.0
    for i in range(m):
        fit += (w[i] * (y[i] - z[i])) ** 2
    fit = math.log(fit)
    d1 = [z[i + 1] - z[i] for i in range(m - 1)]
    pen = 0.0
    for i in range(m - 2):
        pen += (d1[i + 1] - d1[i]) ** 2
    pen = math.log(pen)
    return fit, pen


def _vcurve_pick(fits, pens, llas):
    nl1 = len(llas) - 1
    step = llas[1] - llas[0]
    v = []
    lamids = []
    for i in range(nl1):
        v.append(
            math.sqrt((fits[i + 1] - fits[i]) ** 2 + (pens[i + 1] - pens[i]) ** 2)
            / (math.log(10) * step)
        )
        lamids.append((llas[i] + llas[i + 1]) / 2)
    k = 0
    vmin = v[0]
    for i in range(1, nl1):
        if v[i] < vmin:
            vmin = v[i]
            k = i
    return 10 ** lamids[k]


def ws2doptv(y, w, llas):
    fits, pens = [], []
    for lla in llas:
        z = ws2d(y, 10 ** lla, w)
        f, pe = _fit_pen(y, w, z)
        fits.append(f)
        pens.append(pe)
    lopt = _vcurve_pick(fits, pens, llas)
    return ws2d(y, lopt, w), lopt


def ws2doptvp(y, w, llas, p):
    fits, pens = [], []
    z = np.zeros(len(y))
    ww = None
    for lla in llas:
        z, ww = _envelope(y, 10 ** lla, w, p, z)
        f, pe = _fit_pen(y, w, z)
        fits.append(f)
        pens.append(pe)
    lopt = _vcurve_pick(fits, pens, llas)
    z = np.zeros(len(y))
    z, ww = _envelope(y, lopt, w, p, z)
    return ws2d(y, lopt, ww), lopt
