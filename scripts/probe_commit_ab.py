#!/usr/bin/env python
"""Interleaved A/B: default vs v2 committer (+no _SUCCESS) for the full
materialize at one width.  Separate SparkSessions per variant since the
hadoop conf is session-fixed; variants alternate so host windows hit both."""
from __future__ import annotations
import json, os, sys, tempfile, time, shutil
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

def stat():
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 32

from modape_spark.session import get_spark
from modape_spark.sources.sequences import sequences_df
from modape_spark.tiers import materialize_rollup, rollup_dataframe, with_bucket
from modape_spark.rollup import CFG_ALL
from pyspark.sql import functions as F

def build_raw(spark, tmp):
    raw_dir = f"{tmp}/raw"
    with_bucket(sequences_df(spark, ROWS), CORES) \
        .withColumn("_salt", F.pmod(F.xxhash64("doc_id"), F.lit(6))) \
        .repartition(6 * CORES, F.col("bucket"), F.col("_salt")) \
        .drop("_salt") \
        .write.mode("overwrite").partitionBy("bucket").parquet(raw_dir)
    return raw_dir

def session(variant):
    extra = {}
    if variant == "v2":
        extra["spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version"] = "2"
        extra["spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs"] = "false"
    return get_spark(app_name=f"ab-{variant}", cores=CORES,
                     shuffle_partitions=CORES, extra_conf=extra)

tmp = tempfile.mkdtemp(prefix="modape_ab_", dir="/dev/shm")
results = []
for rep in range(3):
    for variant in ("default", "v2"):
        spark = session(variant)
        raw_dir = build_raw(spark, tmp)
        raw_bytes = sum(os.path.getsize(os.path.join(dp, f))
                        for dp, _, fs in os.walk(raw_dir)
                        for f in fs if f.endswith(".parquet"))
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        spark.conf.set("spark.sql.files.maxPartitionBytes",
                       str(max(raw_bytes // (3 * CORES), 1 << 20)))
        raw = spark.read.parquet(raw_dir)
        rollup_dataframe(raw.sample(0.005), CFG_ALL).count()
        time.sleep(8)
        a = stat(); t0 = time.time()
        materialize_rollup(raw, f"{tmp}/out", CFG_ALL, n_buckets=CORES,
                           pre_bucketed=True)
        dt = time.time() - t0; b = stat()
        d = [y - x for x, y in zip(a, b)]
        r = {"rep": rep, "variant": variant, "sec": round(dt, 3),
             "steal": round(100 * d[7] / max(sum(d), 1), 2),
             "busy": round(100 * (sum(d) - d[3] - d[4]) / max(sum(d), 1), 1)}
        results.append(r)
        print(json.dumps(r), flush=True)
        shutil.rmtree(f"{tmp}/out", ignore_errors=True)
        spark.stop()
        time.sleep(10)
shutil.rmtree(tmp, ignore_errors=True)
