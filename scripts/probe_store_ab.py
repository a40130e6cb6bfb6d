#!/usr/bin/env python
"""Interleaved A/B: full vs compact store on the 32-wide materialize leg.

The compact store (tiers.COMPACT_ROLLUP_SCHEMA) was built to shrink the
two fixed per-job costs the width-32 scaling decomposition pinned
(BENCH/BASELINE.md: Arrow out-feed + parquet encode/commit) by never
letting the plain integer arrays cross the Arrow boundary or reach the
writer.  Cross-window wall-clock comparisons on this burstable host are
noise-dominated (narrow-leg swings of 3x at ~0 steal), so this probe
interleaves full/compact samples in ONE window at ONE width and also
reports the deterministic quantity — bytes written — which no hypervisor
can perturb.

Usage: python scripts/probe_store_ab.py [--cores 32] [--samples 4]
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


def dir_bytes(path: str) -> int:
    return sum(os.path.getsize(os.path.join(dp, f))
               for dp, _, fs in os.walk(path) for f in fs
               if f.endswith(".parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--samples", type=int, default=4,
                    help="samples PER store form, interleaved")
    ap.add_argument("--rows", type=int, default=100_000)
    args = ap.parse_args()

    from modape_spark.entry_queries import CFG_ALL
    from modape_spark.session import get_spark
    from modape_spark.tiers import materialize_rollup, rollup_dataframe

    raw_path = raw_table(args.rows)
    raw_bytes = dir_bytes(raw_path)
    split = max(raw_bytes // (3 * args.cores), 1 << 20)
    spark = get_spark(app_name=f"modape-store-ab-{args.cores}",
                      cores=args.cores,
                      shuffle_partitions=max(args.cores, 8),
                      extra_conf={
                          "spark.sql.files.maxPartitionBytes": str(split),
                          "spark.sql.files.openCostInBytes": "0",
                      })
    raw = spark.read.parquet(raw_path)
    # worker warm-up outside every timed window
    rollup_dataframe(raw.sample(0.005), CFG_ALL).count()

    out: dict[str, list] = {"full": [], "compact": []}
    bytes_out: dict[str, int] = {}
    try:
        for i in range(args.samples):
            # alternate starting side so neither form owns the early slots
            order = ("full", "compact") if i % 2 == 0 else ("compact", "full")
            for store in order:
                tmp = tempfile.mkdtemp(prefix=f"modape_ab_{store}_",
                                       dir="/dev/shm")
                try:
                    with StealMeter() as sm:
                        t0 = time.time()
                        materialize_rollup(raw, f"{tmp}/out", CFG_ALL,
                                           n_buckets=32, pre_bucketed=True,
                                           store=store)
                        dt = time.time() - t0
                    out[store].append(
                        {"seconds": round(dt, 3),
                         "steal_pct": sm.steal_pct})
                    bytes_out[store] = dir_bytes(f"{tmp}/out")
                finally:
                    shutil.rmtree(tmp, ignore_errors=True)
    finally:
        spark.stop()

    def med(xs: list[float]) -> float:
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    result = {
        "cores": args.cores,
        "n_sequences": args.rows,
        "samples_per_form": args.samples,
        "median_seconds": {k: round(med([s["seconds"] for s in v]), 3)
                           for k, v in out.items()},
        "min_seconds": {k: round(min(s["seconds"] for s in v), 3)
                        for k, v in out.items()},
        "bytes_written": bytes_out,
        "bytes_ratio_compact_vs_full": round(
            bytes_out["compact"] / bytes_out["full"], 3),
        "samples": out,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/store_ab_results.jsonl", "a") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps(result))
    shutil.rmtree(os.path.dirname(raw_path), ignore_errors=True)


if __name__ == "__main__":
    main()
