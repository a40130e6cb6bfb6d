#!/usr/bin/env python
"""No-Spark multiprocess scaling control for the rollup kernel.

Runs the identical kernel workload (process_length_group on 128-row
blocks of the synthetic fixture, the same Arrow-batch shape the engine
feeds) through a plain multiprocessing pool at several worker counts and
prints rows/sec per level plus pairwise efficiencies.  This isolates the
HOST's ability to scale pure compute from everything Spark adds (scan,
Arrow feed, scheduling): if this control is sub-0.8 between N and 4N,
the shortfall is the machine (burst/power budget), not the engine.

Usage: python scripts/kernel_scaling_control.py [--rows 100000]
       [--workers 1,8,32]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = 128


def _work(args):
    start, n_rows = args
    # CFG_ALL comes from the pyspark-free rollup module — the SAME
    # object the engine runs, so the control cannot drift from the
    # workload it claims to mirror (entry_queries would pull the full
    # pyspark import into every spawned worker)
    from modape_spark.compression import encode_dod_rows
    from modape_spark.constants import STRES_DEKAD, STRES_PENTAD
    from modape_spark.fixtures import gen_tokens_block, row_lengths
    from modape_spark.rollup import CFG_ALL, process_length_group

    ids = np.arange(start, start + n_rows, dtype=np.int64)
    lens = row_lengths(ids)
    done = 0
    for n in np.unique(lens):
        sel = ids[lens == n]
        for lo in range(0, sel.size, BATCH):
            blk = gen_tokens_block(sel[lo:lo + BATCH], int(n))
            res = process_length_group(blk.astype(np.float64), int(n),
                                       CFG_ALL)
            # mirror the full UDF body: compression encode included
            encode_dod_rows(res.smoothed)
            for st in (STRES_DEKAD, STRES_PENTAD):
                if st in res.interp:
                    encode_dod_rows(res.interp[st])
            done += blk.shape[0]
    return done


def _steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def run_level(workers: int, total_rows: int) -> float:
    chunk = max(total_rows // (workers * 3), 256)
    tasks = [(s, min(chunk, total_rows - s))
             for s in range(0, total_rows, chunk)]
    with mp.get_context("spawn").Pool(workers, initializer=_warm) as pool:
        # warm-up OUTSIDE the timed window: spin every worker through a
        # real task so module imports + ckernel dlopen (per-process
        # one-time costs) don't land in the measurement — same protocol
        # as the Spark bench's full-width UDF warm-up
        pool.map(_work, [(10**9 + 512 * i, 256) for i in range(workers)])
        s0, t0 = _steal(), time.time()
        n = sum(pool.map(_work, tasks))
        dt, sj = time.time() - t0, _steal() - s0
    thr = n / dt
    print(json.dumps({"workers": workers, "rows": n,
                      "seconds": round(dt, 2),
                      "rows_per_sec": round(thr, 1),
                      "steal_jiffies": sj}), flush=True)
    return thr


def _warm():
    # initializer runs ONCE per spawned worker before it takes any task,
    # so every per-process one-time cost (module imports, ckernel
    # build/dlopen) is guaranteed paid outside the timed window — the
    # warm-up map alone cannot guarantee per-worker coverage (a fast
    # worker can steal a second warm task while a slow one still spawns)
    import modape_spark.compression  # noqa: F401
    import modape_spark.fixtures  # noqa: F401
    import modape_spark.rollup  # noqa: F401
    from modape_spark.ckernel import get_lib
    get_lib()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100000)
    ap.add_argument("--workers", default="1,8,32")
    args = ap.parse_args()
    levels = [int(w) for w in args.workers.split(",")]
    thr = {w: run_level(w, args.rows) for w in levels}
    for a, b in zip(levels, levels[1:]):
        eff = thr[b] / (thr[a] * (b / a))
        print(json.dumps({"pair": f"{a}->{b}",
                          "efficiency": round(eff, 3)}), flush=True)


if __name__ == "__main__":
    main()
