#!/usr/bin/env python
"""Decompose the 32-wide materialize residual (round-4 VERDICT item 4).

For a fixed prepared input, measures at one width:
  t_full    — materialize_rollup end-to-end (write + commit)
  t_compute — identical pipeline, count-only sink (no write/commit)
  t_feed    — scan + Arrow drain only (no kernel)
under varying scan-task counts (waves of the core width), plus optional
commit-protocol conf overrides.  Steal recorded per sample.

Usage: python scripts/probe_residual.py [--rows 100000] [--cores 32]
       [--waves 1,2,3,6] [--commit-v2]
"""
from __future__ import annotations

import argparse, json, os, sys, tempfile, time, shutil

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def stat():
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--waves", default="1,2,3,6")
    ap.add_argument("--commit-v2", action="store_true")
    args = ap.parse_args()

    from modape_spark.session import get_spark
    from modape_spark.sources.sequences import sequences_df
    from modape_spark.tiers import materialize_rollup, rollup_dataframe, with_bucket
    from modape_spark.rollup import CFG_ALL
    from pyspark.sql import functions as F

    extra = {}
    if args.commit_v2:
        extra["spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version"] = "2"
        extra["spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs"] = "false"
    spark = get_spark(app_name="probe-residual", cores=args.cores,
                      shuffle_partitions=args.cores, extra_conf=extra)
    tmp = tempfile.mkdtemp(prefix="modape_probe_")
    n_buckets = args.cores
    raw_dir = f"{tmp}/raw"
    with_bucket(sequences_df(spark, args.rows), n_buckets) \
        .withColumn("_salt", F.pmod(F.xxhash64("doc_id"), F.lit(6))) \
        .repartition(6 * n_buckets, F.col("bucket"), F.col("_salt")) \
        .drop("_salt") \
        .write.mode("overwrite").partitionBy("bucket").parquet(raw_dir)
    raw_bytes = sum(os.path.getsize(os.path.join(dp, f))
                    for dp, _, fs in os.walk(raw_dir)
                    for f in fs if f.endswith(".parquet"))
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    raw = spark.read.parquet(raw_dir)
    rollup_dataframe(raw.sample(0.01), CFG_ALL).count()  # warm workers

    results = []
    for wave in [int(w) for w in args.waves.split(",")]:
        spark.conf.set("spark.sql.files.maxPartitionBytes",
                       str(max(raw_bytes // (wave * args.cores), 1 << 20)))
        raw = spark.read.parquet(raw_dir)
        ntasks = raw.rdd.getNumPartitions()
        for kind in ("full", "compute"):
            a = stat(); t0 = time.time()
            if kind == "full":
                materialize_rollup(raw, f"{tmp}/out", CFG_ALL,
                                   n_buckets=n_buckets, pre_bucketed=True)
            else:
                rollup_dataframe(raw, CFG_ALL).select(F.count("*")).collect()
            dt = time.time() - t0; b = stat()
            d = [y - x for x, y in zip(a, b)]
            r = {"waves": wave, "ntasks": ntasks, "kind": kind,
                 "sec": round(dt, 3),
                 "steal": round(100 * d[7] / max(sum(d), 1), 2),
                 "busy": round(100 * (sum(d) - d[3] - d[4]) / max(sum(d), 1), 1)}
            results.append(r)
            print(json.dumps(r), flush=True)
            time.sleep(10)
    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
