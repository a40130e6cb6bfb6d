#!/usr/bin/env python
"""Two-parallelism scaling study (north_rule evidence).

Runs the SAME multi-tier rollup on the SAME input at local[N] and local[4N]
(sandbox stand-in for N vs 4N executors), reports throughput at both and the
scaling efficiency  eff = throughput_4N / (4 * throughput_N)  (BASELINE.md
protocol), and appends the result to BENCH/scaling_results.jsonl.

Usage: python bench_scaling.py [--low 8] [--high 32] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_sample(cores: int, n_rows: int) -> float:
    """One fresh-session wall-clock sample of the rollup materialization."""
    from modape_spark.entry_queries import CFG_ALL
    from modape_spark.session import get_spark
    from modape_spark.sources.sequences import sequences_df
    from modape_spark.tiers import materialize_rollup

    spark = get_spark(app_name=f"modape-scaling-{cores}", cores=cores,
                      shuffle_partitions=max(cores, 8))
    tmp = tempfile.mkdtemp(prefix=f"modape_scale_{cores}_")
    try:
        # warm-up excluded from the measured run
        sequences_df(spark, 512).count()
        t0 = time.time()
        materialize_rollup(sequences_df(spark, n_rows), f"{tmp}/out",
                           CFG_ALL, n_buckets=max(cores, 8))
        return time.time() - t0
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


def run_once(cores_low: int, cores_high: int, n_rows: int) -> tuple[float, float]:
    """Interleaved best-of-2 per level (high, low, low, high).

    The sandbox host burst-throttles: whatever runs later in a sequence
    sees depleted CPU credits, so a fixed order systematically biases one
    level.  Interleaving gives each level one early and one late sample;
    best-of each measures the engine, not the hypervisor.
    """
    t_high = min(run_sample(cores_high, n_rows), float("inf"))
    t_low = run_sample(cores_low, n_rows)
    t_low = min(t_low, run_sample(cores_low, n_rows))
    t_high = min(t_high, run_sample(cores_high, n_rows))
    return t_low, t_high


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                       "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from modape_spark.entry_queries import sf_of
    from modape_spark.fixtures import n_rows_for_sf

    sf = sf_of(args.sf_dir)
    n_rows = n_rows_for_sf(sf)

    t_low, t_high = run_once(args.low, args.high, n_rows)
    thr_low = n_rows / t_low
    thr_high = n_rows / t_high
    factor = args.high / args.low
    eff = thr_high / (factor * thr_low)
    result = {
        "sf": sf,
        "n_sequences": n_rows,
        "cores_low": args.low,
        "cores_high": args.high,
        "seconds_low": round(t_low, 3),
        "seconds_high": round(t_high, 3),
        "throughput_low_seq_per_sec": round(thr_low, 1),
        "throughput_high_seq_per_sec": round(thr_high, 1),
        "scaling_efficiency": round(eff, 3),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling_results.jsonl", "a") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
