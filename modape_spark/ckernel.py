"""Optional C fast path for the Whittaker solver core.

The numpy batched kernel (kernels.py) dispatches ~16 numpy ops per
time-step; at n=742 that is ~12k dispatches per solve and the kernel
becomes dispatch/memory bound.  This module compiles a tiny C row-solver at
first use (gcc is present in the image; nothing is installed) and loads it
with ctypes.  The C code executes the IDENTICAL per-element operation
sequence as kernels.ws2d_batch / _envelope_iterate — compiled with
``-fno-fast-math -ffp-contract=off`` so every double op rounds exactly like
numpy's — and tests/test_ckernel.py asserts bit-equality between the two
paths.  If compilation fails for any reason the engine silently keeps the
pure-numpy path.

Row-major layout: each row's working set (y, w, d, c, e, z ~ 36 KiB at
n=742) is L1/L2-resident, so the C path also slashes memory traffic —
the property the multi-worker scaling depends on.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_C_SOURCE = r"""
#include <math.h>
#include <stdlib.h>

/* Whittaker 2nd-order banded LDL^T solve for one row.
   Identical element-op order to the engine's numpy kernel (and the
   recurrence of the reference implementation it re-derives):
   d/c/e forward factorization, z forward substitution, back substitution.
   Caller provides workspace wd/wc/we of length n. */
static void ws2d_row(const double* y, double lam, const double* w,
                     double* z, double* wd, double* wc, double* we, long n)
{
    long m = n - 1, i;
    double lam2n = -2.0 * lam, lam4n = -4.0 * lam;
    double lam5 = 5.0 * lam, lam6 = 6.0 * lam;

    for (i = 0; i < n; i++) z[i] = w[i] * y[i];

    wd[0] = w[0] + lam;
    wc[0] = lam2n / wd[0];
    we[0] = lam / wd[0];
    wd[1] = w[1] + lam5 - wd[0] * (wc[0] * wc[0]);
    wc[1] = (lam4n - wd[0] * wc[0] * we[0]) / wd[1];
    we[1] = lam / wd[1];
    z[1] -= wc[0] * z[0];
    for (i = 2; i < m - 1; i++) {
        wd[i] = w[i] + lam6 - (wc[i-1] * wc[i-1]) * wd[i-1] - (we[i-2] * we[i-2]) * wd[i-2];
        wc[i] = (lam4n - wd[i-1] * wc[i-1] * we[i-1]) / wd[i];
        we[i] = lam / wd[i];
        z[i] -= wc[i-1] * z[i-1];
        z[i] -= we[i-2] * z[i-2];
    }
    wd[m-1] = w[m-1] + lam5 - (wc[m-2] * wc[m-2]) * wd[m-2] - (we[m-3] * we[m-3]) * wd[m-3];
    wc[m-1] = (lam2n - wd[m-2] * wc[m-2] * we[m-2]) / wd[m-1];
    z[m-1] -= wc[m-2] * z[m-2];
    z[m-1] -= we[m-3] * z[m-3];
    wd[m] = w[m] + lam - (wc[m-1] * wc[m-1]) * wd[m-1] - (we[m-2] * we[m-2]) * wd[m-2];
    z[m] = (z[m] - wc[m-1] * z[m-1] - we[m-2] * z[m-2]) / wd[m];
    z[m-1] = z[m-1] / wd[m-1] - wc[m-1] * z[m];
    for (i = m - 2; i >= 0; i--)
        z[i] = z[i] / wd[i] - wc[i] * z[i+1] - we[i] * z[i+2];
}

/* Solve R rows: Y/W/Z row-major (R x n), lam per row. */
void ws2d_rows(const double* Y, const double* lam, const double* W,
               double* Z, double* work, long n, long R)
{
    long r;
    for (r = 0; r < R; r++) {
        ws2d_row(Y + r * n, lam[r], W + r * n, Z + r * n,
                 work, work + n, work + 2 * n, n);
    }
}

/* Asymmetric-envelope loop for R rows (<=10 iterations, per-row exact
   early exit).  z/ww updated in place; z must hold the starting curve.
   Matches kernels._envelope_iterate semantics:
     wa = p if y > z else 1-p; ww = w*wa; znew = solve; stop when
     sum|znew - z| == 0 (z keeps its pre-iteration value on the stopping
     pass, which equals znew anyway); ww retains the stopping iteration's
     weights for the caller's final solve. */
void envelope_rows(const double* Y, const double* lam, const double* W,
                   double p, double* z, double* ww, double* work,
                   long n, long R)
{
    double p1 = 1.0 - p;
    long r, i, it;
    double* znew = work + 3 * (size_t)n;
    for (r = 0; r < R; r++) {
        const double* y = Y + r * n;
        const double* w = W + r * n;
        double* zr = z + r * n;
        double* wwr = ww + r * n;
        for (it = 0; it < 10; it++) {
            for (i = 0; i < n; i++)
                wwr[i] = w[i] * (y[i] > zr[i] ? p : p1);
            ws2d_row(y, lam[r], wwr, znew, work, work + n, work + 2 * n, n);
            double delta = 0.0;
            for (i = 0; i < n; i++)
                delta += fabs(znew[i] - zr[i]);
            if (delta == 0.0)
                break;
            for (i = 0; i < n; i++) zr[i] = znew[i];
        }
    }
}


/* --- blocked (row-interleaved) solver forms ---------------------------
   Lanes of MODAPE_BS rows run the IDENTICAL per-row operation sequence
   side by side in a transposed (time-major) layout, so the compiler
   auto-vectorizes the recurrence ACROSS rows — the time recurrence is
   sequential per row, but rows are independent, and the scalar form left
   the divide units idle waiting on each step's division latency.
   Per-lane results are bit-identical to ws2d_row/envelope_rows: the same
   IEEE add/mul/div sequence per row (no reassociation, and the build pins
   -ffp-contract=off so no FMA merging), and SIMD lanes round exactly like
   scalar ops.  Pad lanes (block tail past R) run on benign inputs
   (y=0, w=1, lam=1) and are discarded. */
#define MODAPE_BS 8

static void ws2d_block(const double* yt, const double* lamv,
                       const double* wt, double* zt,
                       double* wd, double* wc, double* we, long n)
{
    enum { BS = MODAPE_BS };
    long m = n - 1, i; int j;
    double lam2n[BS], lam4n[BS], lam5[BS], lam6[BS];
    for (j = 0; j < BS; j++) {
        lam2n[j] = -2.0 * lamv[j]; lam4n[j] = -4.0 * lamv[j];
        lam5[j] = 5.0 * lamv[j];   lam6[j] = 6.0 * lamv[j];
    }
    for (i = 0; i < n; i++)
        for (j = 0; j < BS; j++)
            zt[i*BS+j] = wt[i*BS+j] * yt[i*BS+j];
    for (j = 0; j < BS; j++) {
        wd[0*BS+j] = wt[0*BS+j] + lamv[j];
        wc[0*BS+j] = lam2n[j] / wd[0*BS+j];
        we[0*BS+j] = lamv[j] / wd[0*BS+j];
        wd[1*BS+j] = wt[1*BS+j] + lam5[j] - wd[0*BS+j] * (wc[0*BS+j] * wc[0*BS+j]);
        wc[1*BS+j] = (lam4n[j] - wd[0*BS+j] * wc[0*BS+j] * we[0*BS+j]) / wd[1*BS+j];
        we[1*BS+j] = lamv[j] / wd[1*BS+j];
        zt[1*BS+j] -= wc[0*BS+j] * zt[0*BS+j];
    }
    for (i = 2; i < m - 1; i++) {
        const double* wci1 = wc + (i-1)*BS; const double* wei2 = we + (i-2)*BS;
        const double* wdi1 = wd + (i-1)*BS; const double* wdi2 = wd + (i-2)*BS;
        const double* wei1 = we + (i-1)*BS;
        double* wdi = wd + i*BS; double* wci = wc + i*BS; double* wei = we + i*BS;
        double* zi = zt + i*BS;
        const double* zi1 = zt + (i-1)*BS; const double* zi2 = zt + (i-2)*BS;
        const double* wi = wt + i*BS;
        for (j = 0; j < BS; j++) {
            wdi[j] = wi[j] + lam6[j] - (wci1[j] * wci1[j]) * wdi1[j]
                                     - (wei2[j] * wei2[j]) * wdi2[j];
            wci[j] = (lam4n[j] - wdi1[j] * wci1[j] * wei1[j]) / wdi[j];
            wei[j] = lamv[j] / wdi[j];
            zi[j] -= wci1[j] * zi1[j];
            zi[j] -= wei2[j] * zi2[j];
        }
    }
    for (j = 0; j < BS; j++) {
        wd[(m-1)*BS+j] = wt[(m-1)*BS+j] + lam5[j]
            - (wc[(m-2)*BS+j] * wc[(m-2)*BS+j]) * wd[(m-2)*BS+j]
            - (we[(m-3)*BS+j] * we[(m-3)*BS+j]) * wd[(m-3)*BS+j];
        wc[(m-1)*BS+j] = (lam2n[j] - wd[(m-2)*BS+j] * wc[(m-2)*BS+j] * we[(m-2)*BS+j])
                         / wd[(m-1)*BS+j];
        zt[(m-1)*BS+j] -= wc[(m-2)*BS+j] * zt[(m-2)*BS+j];
        zt[(m-1)*BS+j] -= we[(m-3)*BS+j] * zt[(m-3)*BS+j];
        wd[m*BS+j] = wt[m*BS+j] + lamv[j]
            - (wc[(m-1)*BS+j] * wc[(m-1)*BS+j]) * wd[(m-1)*BS+j]
            - (we[(m-2)*BS+j] * we[(m-2)*BS+j]) * wd[(m-2)*BS+j];
        zt[m*BS+j] = (zt[m*BS+j] - wc[(m-1)*BS+j] * zt[(m-1)*BS+j]
                      - we[(m-2)*BS+j] * zt[(m-2)*BS+j]) / wd[m*BS+j];
        zt[(m-1)*BS+j] = zt[(m-1)*BS+j] / wd[(m-1)*BS+j] - wc[(m-1)*BS+j] * zt[m*BS+j];
    }
    for (i = m - 2; i >= 0; i--) {
        double* zi = zt + i*BS;
        const double* zi1 = zt + (i+1)*BS; const double* zi2 = zt + (i+2)*BS;
        const double* wdi = wd + i*BS; const double* wci = wc + i*BS;
        const double* wei = we + i*BS;
        for (j = 0; j < BS; j++)
            zi[j] = zi[j] / wdi[j] - wci[j] * zi1[j] - wei[j] * zi2[j];
    }
}

/* Blocked ws2d over R rows.  Returns 0 ok, -1 on alloc failure (caller
   falls back to the scalar path). */
long ws2d_rows_blk(const double* Y, const double* lam, const double* W,
                   double* Z, long n, long R)
{
    enum { BS = MODAPE_BS };
    size_t plane = (size_t)n * BS;
    double* buf = (double*)malloc(plane * 6 * sizeof(double));
    double lamv[BS];
    long r0, i; int j;
    if (!buf) return -1;
    {
        double* yt = buf;            double* wt = buf + plane;
        double* zt = buf + 2*plane;  double* wd = buf + 3*plane;
        double* wc = buf + 4*plane;  double* we = buf + 5*plane;
        for (r0 = 0; r0 < R; r0 += BS) {
            int B = (int)((R - r0 < BS) ? (R - r0) : BS);
            for (j = 0; j < B; j++) lamv[j] = lam[r0+j];
            for (j = B; j < BS; j++) lamv[j] = 1.0;
            for (i = 0; i < n; i++) {
                for (j = 0; j < B; j++) {
                    yt[i*BS+j] = Y[(r0+j)*n + i];
                    wt[i*BS+j] = W[(r0+j)*n + i];
                }
                for (j = B; j < BS; j++) { yt[i*BS+j] = 0.0; wt[i*BS+j] = 1.0; }
            }
            ws2d_block(yt, lamv, wt, zt, wd, wc, we, n);
            for (i = 0; i < n; i++)
                for (j = 0; j < B; j++)
                    Z[(r0+j)*n + i] = zt[i*BS+j];
        }
    }
    free(buf);
    return 0;
}

/* Blocked asymmetric-envelope loop: identical per-lane semantics to
   envelope_rows (per-row exact early exit; converged lanes stop
   updating z/ww but keep riding the block's remaining solves with their
   results discarded).  Returns 0 ok, -1 on alloc failure. */
long envelope_rows_blk(const double* Y, const double* lam, const double* W,
                       double p, double* z, double* ww, long n, long R)
{
    enum { BS = MODAPE_BS };
    double p1 = 1.0 - p;
    size_t plane = (size_t)n * BS;
    double* buf = (double*)malloc(plane * 8 * sizeof(double));
    double lamv[BS]; int active[BS];
    long r0, i; int j, it;
    if (!buf) return -1;
    {
        double* yt  = buf;            double* wt  = buf + plane;
        double* zt  = buf + 2*plane;  double* wwt = buf + 3*plane;
        double* wd  = buf + 4*plane;  double* wc  = buf + 5*plane;
        double* we  = buf + 6*plane;  double* znt = buf + 7*plane;
        for (r0 = 0; r0 < R; r0 += BS) {
            int B = (int)((R - r0 < BS) ? (R - r0) : BS);
            int n_active = B;
            for (j = 0; j < B; j++) { lamv[j] = lam[r0+j]; active[j] = 1; }
            for (j = B; j < BS; j++) { lamv[j] = 1.0; active[j] = 0; }
            for (i = 0; i < n; i++) {
                for (j = 0; j < B; j++) {
                    yt[i*BS+j] = Y[(r0+j)*n + i];
                    wt[i*BS+j] = W[(r0+j)*n + i];
                    zt[i*BS+j] = z[(r0+j)*n + i];
                    wwt[i*BS+j] = 1.0;  /* overwritten on iteration 0 */
                }
                for (j = B; j < BS; j++) {
                    yt[i*BS+j] = 0.0; wt[i*BS+j] = 1.0; zt[i*BS+j] = 0.0;
                    wwt[i*BS+j] = 1.0;
                }
            }
            for (it = 0; it < 10 && n_active > 0; it++) {
                for (i = 0; i < n; i++)
                    for (j = 0; j < BS; j++) {
                        double wnew = wt[i*BS+j]
                            * (yt[i*BS+j] > zt[i*BS+j] ? p : p1);
                        /* converged lanes retain their stopping
                           iteration's ww (envelope_rows contract) */
                        wwt[i*BS+j] = active[j] ? wnew : wwt[i*BS+j];
                    }
                ws2d_block(yt, lamv, wwt, znt, wd, wc, we, n);
                for (j = 0; j < BS; j++) {
                    double delta = 0.0;
                    if (!active[j]) continue;
                    for (i = 0; i < n; i++)
                        delta += fabs(znt[i*BS+j] - zt[i*BS+j]);
                    if (delta == 0.0) { active[j] = 0; n_active--; }
                    else for (i = 0; i < n; i++) zt[i*BS+j] = znt[i*BS+j];
                }
            }
            for (i = 0; i < n; i++)
                for (j = 0; j < B; j++) {
                    z[(r0+j)*n + i]  = zt[i*BS+j];
                    ww[(r0+j)*n + i] = wwt[i*BS+j];
                }
        }
    }
    free(buf);
    return 0;
}

/* --- delta-of-delta bitstream decoder (compression.py format) ---------
   Buckets: '0' | '10'+7b(-63) | '110'+9b(-255) | '1110'+12b(-2047) |
   '11110'+36b zigzag.  Mirrors compression.decode_dod bit-for-bit; the
   read path of the compact tier tables.  Returns 0 ok, -1 on overrun.
   rd_bits is bounded by nbits: positions past the buffer read as 0 and
   never index it, so a corrupt/truncated payload cannot over-read the
   heap mid-code — the post-code pos > nbits check then reports -1. */
static long long rd_bits(const unsigned char* buf, long* pos, int nb,
                         long nbits)
{
    long long v = 0; long p = *pos; int k;
    for (k = 0; k < nb; k++) {
        v = (v << 1) | (p < nbits ? ((buf[p >> 3] >> (7 - (p & 7))) & 1) : 0);
        p++;
    }
    *pos = p; return v;
}

long dod_decode_stream(const unsigned char* buf, long nbytes,
                       long long first, long long* out, long n)
{
    long long prev = first, prev_d = 0, dod, u;
    long pos = 0, nbits = nbytes * 8, i;
    out[0] = first;
    for (i = 1; i < n; i++) {
        if (pos >= nbits) return -1;
        if (rd_bits(buf, &pos, 1, nbits) == 0) dod = 0;
        else if (rd_bits(buf, &pos, 1, nbits) == 0) dod = rd_bits(buf, &pos, 7, nbits) - 63;
        else if (rd_bits(buf, &pos, 1, nbits) == 0) dod = rd_bits(buf, &pos, 9, nbits) - 255;
        else if (rd_bits(buf, &pos, 1, nbits) == 0) dod = rd_bits(buf, &pos, 12, nbits) - 2047;
        else {
            rd_bits(buf, &pos, 1, nbits);    /* trailing 0 of '11110' */
            u = rd_bits(buf, &pos, 36, nbits);
            dod = (u >> 1) ^ -(u & 1);       /* unzigzag */
        }
        if (pos > nbits) return -1;
        prev_d += dod;
        prev += prev_d;
        out[i] = prev;
    }
    return 0;
}

/* --- delta-of-delta encoder (mirror of compression.encode_dod) --------
   Encodes R same-length rows (row-major int64, length n) into out with
   ``stride`` bytes reserved per row, zero-padded to a byte boundary like
   np.packbits; lens[r] = bytes written for row r.  Byte-identical to the
   numpy encoder (tests/test_compression.py asserts it).  Returns 0 ok,
   -1 if any |dod| >= 2^34 (the python encoder's range check). */
long dod_encode_rows(const long long* V, long R, long n,
                     unsigned char* out, long stride, long long* lens)
{
    long r, i;
    for (r = 0; r < R; r++) {
        const long long* v = V + r * n;
        unsigned char* o = out + r * stride;
        unsigned long long acc = 0;
        int nacc = 0;
        long nb_out = 0;
        long long prev_d = 0;
        for (i = 1; i < n; i++) {
            long long d = v[i] - v[i-1];
            long long dod = d - prev_d;
            unsigned long long code; int nb;
            prev_d = d;
            if (dod == 0) { code = 0; nb = 1; }
            else if (dod >= -63 && dod <= 64) {
                code = (2ULL << 7) | (unsigned long long)(dod + 63); nb = 9; }
            else if (dod >= -255 && dod <= 256) {
                code = (6ULL << 9) | (unsigned long long)(dod + 255); nb = 12; }
            else if (dod >= -2047 && dod <= 2048) {
                code = (14ULL << 12) | (unsigned long long)(dod + 2047); nb = 16; }
            else {
                unsigned long long z;
                if (dod >= (1LL << 34) || dod <= -(1LL << 34)) return -1;
                z = ((unsigned long long)dod << 1)
                    ^ (unsigned long long)(dod >> 63);
                code = (30ULL << 36) | (z & ((1ULL << 36) - 1)); nb = 41; }
            /* nacc <= 7 here and nb <= 41, so acc never overflows 64 */
            acc = (acc << nb) | code;
            nacc += nb;
            while (nacc >= 8) {
                o[nb_out++] = (unsigned char)((acc >> (nacc - 8)) & 0xFF);
                nacc -= 8;
            }
        }
        if (nacc)
            o[nb_out++] = (unsigned char)((acc << (8 - nacc)) & 0xFF);
        lens[r] = nb_out;
    }
    return 0;
}

/* --- batched payload decoder (compact tier read path) -----------------
   R complete payloads (13-byte header + bitstream, compression.py
   format) concatenated in buf; boffs[r]..boffs[r+1] delimit payload r.
   ooffs[r] gives the output start for row r, precomputed by the caller
   from the payload headers; the header n is re-validated against
   ooffs[r+1]-ooffs[r].  One call decodes the whole Arrow batch.
   Returns 0 ok, -(r+1) for the first bad row (magic/length/overrun). */
long dod_decode_rows(const unsigned char* buf, const long long* boffs,
                     const long long* ooffs, long R, long long* out)
{
    long r, k;
    for (r = 0; r < R; r++) {
        const unsigned char* p = buf + boffs[r];
        long nbytes = (long)(boffs[r+1] - boffs[r]);
        long long n, first;
        long long* o = out + ooffs[r];
        if (nbytes < 5 || p[0] != 0xD0) return -(r+1);
        n = ((long long)p[1] << 24) | ((long long)p[2] << 16)
          | ((long long)p[3] << 8) | p[4];
        if (n != ooffs[r+1] - ooffs[r]) return -(r+1);
        if (n == 0) continue;
        if (nbytes < 13) return -(r+1);
        first = 0;
        for (k = 0; k < 8; k++) first = (first << 8) | p[5 + k];
        o[0] = first;
        if (n == 1) continue;
        if (dod_decode_stream(p + 13, nbytes - 13, first, o, (long)n) != 0)
            return -(r+1);
    }
    return 0;
}

/* --- per-row-position batched positional decode -------------------------
   For each payload, walk the first ks[r] codes WITHOUT materializing the
   prefix and emit only value #ks[r] (1-based; ks[r] < 1 => NULL row,
   skipped).  valid[r]=0 with no error when the stored array is shorter
   than ks[r] (NULL export contract).  The per-row POSITION VECTOR is what
   lets a calendar-date export over a mixed-length table resolve every
   length's (different) grid position in ONE scan instead of one filtered
   scan per distinct length; the scalar (constant-position) export goes
   through this same walk with a constant vector — one decoder, never two
   to keep in sync.  Returns 0 ok, -(r+1) first bad row. */
long dod_value_at_rows_vec(const unsigned char* buf, const long long* boffs,
                           long R, const long long* ks, long long* out,
                           unsigned char* valid)
{
    long r, i;
    for (r = 0; r < R; r++) {
        const unsigned char* p = buf + boffs[r];
        long nbytes = (long)(boffs[r+1] - boffs[r]);
        long long k = ks[r];
        long long n, first, prev, prev_d, dod, u;
        long pos, nbits;
        valid[r] = 0;
        if (k < 1) continue;   /* date not on this row's grid: NULL */
        if (nbytes < 5 || p[0] != 0xD0) return -(r+1);
        n = ((long long)p[1] << 24) | ((long long)p[2] << 16)
          | ((long long)p[3] << 8) | p[4];
        if (k > n) continue;   /* past the array: NULL */
        if (nbytes < 13) return -(r+1);
        first = 0;
        for (i = 0; i < 8; i++) first = (first << 8) | p[5 + i];
        prev = first; prev_d = 0;
        pos = 0; nbits = (nbytes - 13) * 8;
        for (i = 1; i < k; i++) {
            const unsigned char* s = p + 13;
            if (pos >= nbits) return -(r+1);
            if (rd_bits(s, &pos, 1, nbits) == 0) dod = 0;
            else if (rd_bits(s, &pos, 1, nbits) == 0)
                dod = rd_bits(s, &pos, 7, nbits) - 63;
            else if (rd_bits(s, &pos, 1, nbits) == 0)
                dod = rd_bits(s, &pos, 9, nbits) - 255;
            else if (rd_bits(s, &pos, 1, nbits) == 0)
                dod = rd_bits(s, &pos, 12, nbits) - 2047;
            else {
                rd_bits(s, &pos, 1, nbits);
                u = rd_bits(s, &pos, 36, nbits);
                dod = (u >> 1) ^ -(u & 1);
            }
            if (pos > nbits) return -(r+1);
            prev_d += dod;
            prev += prev_d;
        }
        out[r] = prev;
        valid[r] = 1;
    }
    return 0;
}

/* --- PNG scanline unfilter (multimodal.py decode path) ----------------
   raw: inflated IDAT, h scanlines of (1 filter byte + w samples).
   All five RFC 2083 filters; the Average and Paeth recurrences are
   intra-row sequential and were the decoder's interpreted-Python
   hotspot.  Returns 0 ok, -1 on an unknown filter type. */
long png_unfilter(const unsigned char* raw, long h, long w,
                  unsigned char* px)
{
    long y, x;
    const unsigned char* prev = 0;
    for (y = 0; y < h; y++) {
        const unsigned char* fl = raw + y * (w + 1) + 1;
        unsigned char* row = px + y * w;
        int ft = raw[y * (w + 1)];
        switch (ft) {
        case 0:
            for (x = 0; x < w; x++) row[x] = fl[x];
            break;
        case 1: {
            unsigned char a = 0;
            for (x = 0; x < w; x++) { a = (unsigned char)(fl[x] + a); row[x] = a; }
            break; }
        case 2:
            for (x = 0; x < w; x++)
                row[x] = (unsigned char)(fl[x] + (prev ? prev[x] : 0));
            break;
        case 3: {
            int a = 0;
            for (x = 0; x < w; x++) {
                int b = prev ? prev[x] : 0;
                a = (fl[x] + ((a + b) >> 1)) & 0xFF;
                row[x] = (unsigned char)a;
            }
            break; }
        case 4:
            for (x = 0; x < w; x++) {
                int a = x ? row[x - 1] : 0;
                int b = prev ? prev[x] : 0;
                int c = (x && prev) ? prev[x - 1] : 0;
                int p = a + b - c;
                int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
                int pred = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
                row[x] = (unsigned char)((fl[x] + pred) & 0xFF);
            }
            break;
        default:
            return -1;
        }
        prev = row;
    }
    return 0;
}
"""

# -O3 -march=native: enables auto-vectorization of the blocked solver's
# row lanes on this host's ISA.  Exactness is NOT traded away: -fno-fast-math
# keeps IEEE semantics, -ffp-contract=off forbids FMA merging, and SIMD
# add/mul/div round identically to their scalar forms — per-row results are
# bit-equal under any lane width (asserted by tests/test_ckernel.py).  The
# .so is compiled at first use on the machine that runs it, so native is
# always the running host's ISA.
_CFLAGS = ["-O3", "-march=native", "-fno-fast-math", "-ffp-contract=off",
           "-fPIC", "-shared"]

_lib = None
_tried = False


def _host_isa_tag() -> str:
    """Host CPU feature string folded into the .so cache key: with
    -march=native the binary is host-specific, and a cached build reused
    on a CPU lacking those extensions would SIGILL (CDLL load itself
    succeeds, so no fallback would trigger).  The cpuinfo flags line
    changes exactly when the ISA does; absence degrades to a
    platform-machine tag."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return line
    except OSError:
        pass
    import platform

    return platform.machine()


def _build() -> str | None:
    cache = os.path.join(tempfile.gettempdir(), "modape_spark_ckernel")
    os.makedirs(cache, exist_ok=True)
    tag = hashlib.sha256((_C_SOURCE + " ".join(_CFLAGS)
                          + _host_isa_tag()).encode()).hexdigest()[:16]
    so_path = os.path.join(cache, f"ws2d_{tag}.so")
    if os.path.exists(so_path):
        return so_path
    src = os.path.join(cache, f"ws2d_{tag}.c")
    tmp_so = so_path + f".tmp{os.getpid()}"
    try:
        with open(src, "w") as f:
            f.write(_C_SOURCE)
        subprocess.run(["gcc", *_CFLAGS, src, "-o", tmp_so, "-lm"],
                       check=True, capture_output=True, timeout=120)
        os.replace(tmp_so, so_path)  # atomic: concurrent workers race safely
        return so_path
    except Exception:
        return None


def get_lib():
    """Compile-once, load-once.  Returns None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("MODAPE_SPARK_NO_CKERNEL"):
        return None
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        dp = ctypes.POINTER(ctypes.c_double)
        lib.ws2d_rows.argtypes = [dp, dp, dp, dp, dp, ctypes.c_long, ctypes.c_long]
        lib.ws2d_rows.restype = None
        lib.envelope_rows.argtypes = [dp, dp, dp, ctypes.c_double, dp, dp, dp,
                                      ctypes.c_long, ctypes.c_long]
        lib.envelope_rows.restype = None
        lib.ws2d_rows_blk.argtypes = [dp, dp, dp, dp,
                                      ctypes.c_long, ctypes.c_long]
        lib.ws2d_rows_blk.restype = ctypes.c_long
        lib.envelope_rows_blk.argtypes = [dp, dp, dp, ctypes.c_double, dp, dp,
                                          ctypes.c_long, ctypes.c_long]
        lib.envelope_rows_blk.restype = ctypes.c_long
        lib.dod_decode_stream.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_long, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong), ctypes.c_long]
        lib.dod_decode_stream.restype = ctypes.c_long
        lib.dod_encode_rows.argtypes = [
            ctypes.POINTER(ctypes.c_longlong), ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_long,
            ctypes.POINTER(ctypes.c_longlong)]
        lib.dod_encode_rows.restype = ctypes.c_long
        lib.dod_decode_rows.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_longlong), ctypes.c_long,
            ctypes.POINTER(ctypes.c_longlong)]
        lib.dod_decode_rows.restype = ctypes.c_long
        lib.dod_value_at_rows_vec.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_longlong), ctypes.c_long,
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_ubyte)]
        lib.dod_value_at_rows_vec.restype = ctypes.c_long
        lib.png_unfilter.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_ubyte)]
        lib.png_unfilter.restype = ctypes.c_long
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def ws2d_rows_c(Y: np.ndarray, lam: np.ndarray, W: np.ndarray,
                Z: np.ndarray, work: np.ndarray) -> None:
    """Blocked (row-SIMD) solve; bit-identical scalar row loop as the
    fallback when the blocked form cannot allocate its transpose
    scratch."""
    lib = get_lib()
    R, n = Y.shape
    if lib.ws2d_rows_blk(_dp(Y), _dp(lam), _dp(W), _dp(Z), n, R) != 0:
        lib.ws2d_rows(_dp(Y), _dp(lam), _dp(W), _dp(Z), _dp(work), n, R)


def envelope_rows_c(Y: np.ndarray, lam: np.ndarray, W: np.ndarray, p: float,
                    z: np.ndarray, ww: np.ndarray, work: np.ndarray) -> None:
    lib = get_lib()
    R, n = Y.shape
    if lib.envelope_rows_blk(_dp(Y), _dp(lam), _dp(W), ctypes.c_double(p),
                             _dp(z), _dp(ww), n, R) != 0:
        lib.envelope_rows(_dp(Y), _dp(lam), _dp(W), ctypes.c_double(p),
                          _dp(z), _dp(ww), _dp(work), n, R)


def png_unfilter_c(raw: bytes, h: int, w: int) -> np.ndarray | None:
    """Unfilter PNG scanlines in C.  None when the lib is unavailable
    (callers keep the pure-Python path); raises on an unknown filter."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(raw, dtype=np.uint8)
    px = np.empty((h, w), dtype=np.uint8)
    up = ctypes.POINTER(ctypes.c_ubyte)
    rc = lib.png_unfilter(buf.ctypes.data_as(up), h, w,
                          px.ctypes.data_as(up))
    if rc != 0:
        raise ValueError(f"unknown filter (rc={rc})")
    return px
