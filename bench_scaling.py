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


def _stat_snap() -> list[int]:
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]


class StealMeter:
    """Hypervisor-steal evidence across the measured window (/proc/stat
    col 8): if the host throttles mid-run, the recorded sample says so."""

    def __enter__(self):
        self._a = _stat_snap()
        return self

    def __exit__(self, *exc):
        b = _stat_snap()
        d = [y - x for x, y in zip(self._a, b)]
        tot = sum(d) or 1
        self.steal_pct = round(100.0 * d[7] / tot, 2)
        self.busy_pct = round(100.0 * (tot - d[3] - d[4]) / tot, 2)
        return False


SAMPLES: list[dict] = []   # per-sample evidence for the jsonl record


_RAW_CACHE: dict[int, str] = {}


def raw_table(n_rows: int) -> str:
    """Materialize the raw pre-tokenized table ONCE (outside all timed
    windows).  The north-rule job reads an existing table of sequences —
    synthesis is fixture setup, not part of the measured rollup."""
    if n_rows not in _RAW_CACHE:
        from modape_spark.session import get_spark
        from modape_spark.sources.sequences import sequences_df

        base = os.environ.get("SCALE_RAW_DIR", "/dev/shm")
        path = tempfile.mkdtemp(prefix=f"modape_raw_{n_rows}_", dir=base)
        spark = get_spark(app_name="modape-scaling-setup", cores=32)
        # the catalog's canonical layout: bucket-partitioned on doc_id (the
        # 10^12-row Iceberg table shape), several files per bucket so every
        # core count gets even scan splits
        from modape_spark.tiers import with_bucket
        from pyspark.sql import functions as F

        with_bucket(sequences_df(spark, n_rows), 32) \
            .withColumn("_salt", F.pmod(F.xxhash64("doc_id"), F.lit(6))) \
            .repartition(192, F.col("bucket"), F.col("_salt")) \
            .drop("_salt") \
            .write.mode("overwrite").partitionBy("bucket") \
            .parquet(f"{path}/raw")
        spark.stop()
        _RAW_CACHE[n_rows] = f"{path}/raw"
    return _RAW_CACHE[n_rows]


def run_sample(cores: int, n_rows: int, store: str = "full") -> float:
    """One fresh-session wall-clock sample of the rollup materialization."""
    from modape_spark.entry_queries import CFG_ALL
    from modape_spark.session import get_spark
    from modape_spark.tiers import materialize_rollup

    raw_path = raw_table(n_rows)
    # kernel cost per input byte is enormous (V-curve solves), so scan
    # splits must be far below the 128 MB default for even CPU utilization
    raw_bytes = sum(os.path.getsize(os.path.join(dp, f))
                    for dp, _, fs in os.walk(raw_path)
                    for f in fs if f.endswith(".parquet"))
    split = max(raw_bytes // (3 * cores), 1 << 20)
    spark = get_spark(app_name=f"modape-scaling-{cores}", cores=cores,
                      shuffle_partitions=max(cores, 8),
                      extra_conf={
                          "spark.sql.files.maxPartitionBytes": str(split),
                          "spark.sql.files.openCostInBytes": "0",
                      })
    tmp = tempfile.mkdtemp(prefix=f"modape_scale_{cores}_", dir="/dev/shm")
    try:
        raw = spark.read.parquet(raw_path)
        # warm-up excluded from the measured run: spin EVERY python worker
        # through the real UDF (module imports + cached ckernel load are
        # per-worker one-time costs, like executor JIT warmup on a cluster)
        from modape_spark.tiers import rollup_dataframe

        rollup_dataframe(raw.sample(0.005), CFG_ALL).count()
        with StealMeter() as sm:
            t0 = time.time()
            # n_buckets FIXED across parallelism levels: identical work
            # (same output layout) at N and 4N, so the ratio measures
            # scaling, not differing write plans.  pre_bucketed: the input
            # is the catalog's bucket layout -> zero-shuffle materialize.
            materialize_rollup(raw, f"{tmp}/out", CFG_ALL, n_buckets=32,
                               pre_bucketed=True, store=store)
            dt = time.time() - t0
        SAMPLES.append({"cores": cores, "seconds": round(dt, 3), "store": store,
                        "steal_pct": sm.steal_pct, "busy_pct": sm.busy_pct})
        return dt
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


def run_once(cores_low: int, cores_high: int, n_rows: int,
             samples: int = 2, store: str = "full") -> tuple[float, float]:
    """Interleaved best-of-N per level (high/low alternating).

    The sandbox host has noisy-neighbor DRAM/CPU contention (same-config
    samples vary up to 1.7x with ~0 steal), so a fixed order biases one
    level.  Alternating gives each level early and late samples; best-of
    each measures the engine, not the neighbors.
    """
    t_low = t_high = float("inf")
    for i in range(samples):
        if i % 2 == 0:
            t_high = min(t_high, run_sample(cores_high, n_rows, store))
            t_low = min(t_low, run_sample(cores_low, n_rows, store))
        else:
            t_low = min(t_low, run_sample(cores_low, n_rows, store))
            t_high = min(t_high, run_sample(cores_high, n_rows, store))
    return t_low, t_high


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                       "/root/testdata/sf0.1"))
    ap.add_argument("--samples", type=int, default=2,
                    help="samples per parallelism level (interleaved)")
    ap.add_argument("--rows", type=int, default=None,
                    help="override row count (amortization studies)")
    ap.add_argument("--store", choices=("full", "compact"), default="full",
                    help="rollup output layout: 'compact' emits only dod "
                         "payloads (halves the Arrow out-feed + written "
                         "bytes — the fixed costs pinned by the width-32 "
                         "decomposition)")
    args = ap.parse_args()

    from modape_spark.entry_queries import sf_of
    from modape_spark.fixtures import n_rows_for_sf

    sf = sf_of(args.sf_dir)
    n_rows = args.rows or n_rows_for_sf(sf)

    with StealMeter() as sm:
        t_low, t_high = run_once(args.low, args.high, n_rows, args.samples,
                                 args.store)
    thr_low = n_rows / t_low
    thr_high = n_rows / t_high
    factor = args.high / args.low
    eff = thr_high / (factor * thr_low)
    result = {
        "sf": sf,
        "store": args.store,
        "n_sequences": n_rows,
        "cores_low": args.low,
        "cores_high": args.high,
        "seconds_low": round(t_low, 3),
        "seconds_high": round(t_high, 3),
        "throughput_low_seq_per_sec": round(thr_low, 1),
        "throughput_high_seq_per_sec": round(thr_high, 1),
        "scaling_efficiency": round(eff, 3),
        "window_steal_pct": sm.steal_pct,
        "window_busy_pct": sm.busy_pct,
        "samples": SAMPLES,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling_results.jsonl", "a") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps(result))
    for p in _RAW_CACHE.values():
        shutil.rmtree(os.path.dirname(p), ignore_errors=True)


if __name__ == "__main__":
    main()
