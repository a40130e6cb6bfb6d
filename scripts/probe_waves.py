#!/usr/bin/env python
"""Interleaved scan-split (wave) study for the 32-wide materialize."""
from __future__ import annotations
import json, os, sys, tempfile, time, shutil
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

def stat():
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]

def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    from modape_spark.session import get_spark
    from modape_spark.sources.sequences import sequences_df
    from modape_spark.tiers import materialize_rollup, rollup_dataframe, with_bucket
    from modape_spark.rollup import CFG_ALL
    from pyspark.sql import functions as F
    extra = {
      "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
      "spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs": "false",
    }
    spark = get_spark(app_name="probe-waves", cores=32,
                      shuffle_partitions=32, extra_conf=extra)
    tmp = tempfile.mkdtemp(prefix="modape_probe_")
    n_buckets = 32
    raw_dir = f"{tmp}/raw"
    with_bucket(sequences_df(spark, rows), n_buckets) \
        .withColumn("_salt", F.pmod(F.xxhash64("doc_id"), F.lit(6))) \
        .repartition(6 * n_buckets, F.col("bucket"), F.col("_salt")) \
        .drop("_salt") \
        .write.mode("overwrite").partitionBy("bucket").parquet(raw_dir)
    raw_bytes = sum(os.path.getsize(os.path.join(dp, f))
                    for dp, _, fs in os.walk(raw_dir)
                    for f in fs if f.endswith(".parquet"))
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    raw0 = spark.read.parquet(raw_dir)
    rollup_dataframe(raw0.sample(0.005), CFG_ALL).count()
    k = 0
    for rep in range(2):
        for target in (32, 48, 64, 96):
            spark.conf.set("spark.sql.files.maxPartitionBytes",
                           str(int(raw_bytes / target * 1.02)))
            raw = spark.read.parquet(raw_dir)
            nt = raw.rdd.getNumPartitions()
            k += 1
            a = stat(); t0 = time.time()
            materialize_rollup(raw, f"{tmp}/out{k}", CFG_ALL,
                               n_buckets=n_buckets, pre_bucketed=True)
            dt = time.time() - t0; b = stat()
            d = [y - x for x, y in zip(a, b)]
            print(json.dumps({"rep": rep, "target": target, "ntasks": nt,
                  "sec": round(dt, 3),
                  "steal": round(100 * d[7] / max(sum(d), 1), 2),
                  "busy": round(100 * (sum(d) - d[3] - d[4]) / max(sum(d), 1), 1)}),
                  flush=True)
            shutil.rmtree(f"{tmp}/out{k}", ignore_errors=True)
            time.sleep(15)
    spark.stop(); shutil.rmtree(tmp, ignore_errors=True)

if __name__ == "__main__":
    main()
