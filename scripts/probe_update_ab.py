#!/usr/bin/env python
"""Interleaved A/B: full rematerialization vs the incremental update path.

When a batch of new tokens lands, the engine has two ways to refresh the
stored tiers:

  A (baseline)   rematerialize the whole compact store from the updated
                 raw table (what a user without incremental machinery
                 must do);
  B (incremental) windowed forward rollup (nsmooth=16, nupdate=4 — the
                 kernel touches only the trailing window per key) +
                 update_tier_compact splice into the three stored tier
                 tables (decode matched payloads, splice, C re-encode,
                 stage-and-swap write-back).

Both end states carry the updated tier data on disk.  Samples are
interleaved in one window (cross-window wall clock on this burstable
host is noise-dominated) and each carries its hypervisor-steal evidence.
B's advantage compounds at deployment scale: its kernel cost is
O(nsmooth) per key instead of O(n_tok), and with retention-trimmed raw
(retention.py) its scan shrinks too, while A's grows with history.

Usage: python scripts/probe_update_ab.py [--cores 32] [--samples 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_scaling import StealMeter, raw_table  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--samples", type=int, default=3,
                    help="samples PER path, interleaved")
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--fraction", type=float, default=1.0,
                    help="fraction of keys the update batch touches "
                         "(deployment batches are sparse: one granule "
                         "lands for one tile, not for every key)")
    args = ap.parse_args()

    from modape_spark.entry_queries import CFG_ALL
    from modape_spark.incremental import incremental_rollup
    from modape_spark.session import get_spark
    from modape_spark.tiers import (
        apply_tier_compact_update,
        materialize_rollup,
        rollup_dataframe,
        update_tier_compact,  # noqa: F401 (documented entry point)
        write_tier_tables,
    )

    raw_path = raw_table(args.rows)
    spark = get_spark(app_name=f"modape-update-ab-{args.cores}",
                      cores=args.cores,
                      shuffle_partitions=max(args.cores, 8))
    raw = spark.read.parquet(raw_path)
    # worker warm-up outside every timed window
    rollup_dataframe(raw.sample(0.005), CFG_ALL).count()

    # fixture (untimed): the PRE-update tier stores B splices into
    base = tempfile.mkdtemp(prefix="modape_updab_base_", dir="/dev/shm")
    materialize_rollup(raw, f"{base}/comb", CFG_ALL, n_buckets=32,
                       pre_bucketed=True, store="compact")
    tiers0 = write_tier_tables(spark, f"{base}/comb", f"{base}/tiers",
                               compact=True)

    out: dict[str, list] = {"full": [], "incremental": []}
    try:
        for i in range(args.samples):
            order = (("full", "incremental") if i % 2 == 0
                     else ("incremental", "full"))
            for path in order:
                tmp = tempfile.mkdtemp(prefix=f"modape_updab_{path}_",
                                       dir="/dev/shm")
                try:
                    if path == "full":
                        with StealMeter() as sm:
                            t0 = time.time()
                            materialize_rollup(
                                raw, f"{tmp}/out", CFG_ALL, n_buckets=32,
                                pre_bucketed=True, store="compact")
                            dt = time.time() - t0
                    else:
                        # fresh copies of the stores (untimed setup)
                        tiers = {}
                        for t, d in tiers0.items():
                            tiers[t] = f"{tmp}/{t}"
                            shutil.copytree(d, tiers[t])
                        from pyspark.sql import functions as F
                        touched = raw
                        if args.fraction < 1.0:
                            m = max(int(round(1 / args.fraction)), 1)
                            touched = raw.filter(
                                F.pmod(F.xxhash64("doc_id"), F.lit(m)) == 0)
                        with StealMeter() as sm:
                            t0 = time.time()
                            tail = incremental_rollup(
                                touched, nsmooth=16, nupdate=4, cfg=CFG_ALL)
                            tail.write.parquet(f"{tmp}/tail")
                            tail_df = spark.read.parquet(f"{tmp}/tail")
                            for t in ("smoothed", "dekad", "pentad"):
                                apply_tier_compact_update(
                                    spark, tiers[t], t, tail_df, 4)
                            dt = time.time() - t0
                    out[path].append({"seconds": round(dt, 3),
                                      "steal_pct": sm.steal_pct})
                finally:
                    shutil.rmtree(tmp, ignore_errors=True)
    finally:
        spark.stop()
        shutil.rmtree(base, ignore_errors=True)

    def med(xs: list[float]) -> float:
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    result = {
        "cores": args.cores,
        "n_sequences": args.rows,
        "touched_fraction": args.fraction,
        "samples_per_path": args.samples,
        "median_seconds": {k: round(med([s["seconds"] for s in v]), 3)
                           for k, v in out.items()},
        "min_seconds": {k: round(min(s["seconds"] for s in v), 3)
                        for k, v in out.items()},
        "speedup_median": round(
            med([s["seconds"] for s in out["full"]])
            / med([s["seconds"] for s in out["incremental"]]), 2),
        "samples": out,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/update_ab_results.jsonl", "a") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
