#!/usr/bin/env python
"""Interleaved A/B of write-path variants for the 32-wide materialize.
Fresh output dir per sample; per-sample steal; cooldowns between."""
from __future__ import annotations
import json, os, sys, tempfile, time, shutil
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

def stat():
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]

def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    commit_v2 = "--commit-v2" in sys.argv
    from modape_spark.session import get_spark
    from modape_spark.sources.sequences import sequences_df
    from modape_spark.tiers import materialize_rollup, rollup_dataframe, with_bucket
    from modape_spark.rollup import CFG_ALL
    from pyspark.sql import functions as F
    extra = {}
    if commit_v2:
        extra["spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version"] = "2"
        extra["spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs"] = "false"
    spark = get_spark(app_name="probe-commit", cores=32,
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
    spark.conf.set("spark.sql.files.maxPartitionBytes",
                   str(max(raw_bytes // 96, 1 << 20)))
    raw = spark.read.parquet(raw_dir)
    rollup_dataframe(raw.sample(0.01), CFG_ALL).count()
    k = 0
    for rep in range(3):
        for kind in ("compute", "full"):
            k += 1
            a = stat(); t0 = time.time()
            if kind == "full":
                materialize_rollup(raw, f"{tmp}/out{k}", CFG_ALL,
                                   n_buckets=n_buckets, pre_bucketed=True)
            else:
                rollup_dataframe(raw, CFG_ALL).select(F.count("*")).collect()
            dt = time.time() - t0; b = stat()
            d = [y - x for x, y in zip(a, b)]
            print(json.dumps({"rep": rep, "kind": kind, "sec": round(dt, 3),
                  "steal": round(100 * d[7] / max(sum(d), 1), 2),
                  "busy": round(100 * (sum(d) - d[3] - d[4]) / max(sum(d), 1), 1),
                  "commit_v2": commit_v2}), flush=True)
            shutil.rmtree(f"{tmp}/out{k}", ignore_errors=True)
            time.sleep(12)
    spark.stop(); shutil.rmtree(tmp, ignore_errors=True)

if __name__ == "__main__":
    main()
