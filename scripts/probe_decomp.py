#!/usr/bin/env python
"""Residual decomposition at one width: feed (scan+Arrow drain), compute
(kernel, count sink), full (materialize write), full_nodict (write with
parquet dictionary encoding off — DoD payloads are unique binaries, the
dictionary attempt is pure waste).  Interleaved reps, per-sample steal.

Usage: python scripts/probe_decomp.py <cores> [rows] [reps]
"""
from __future__ import annotations
import json, os, sys, tempfile, time, shutil
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

def stat():
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]

CORES = int(sys.argv[1])
ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 2

from modape_spark.session import get_spark
from modape_spark.sources.sequences import sequences_df
from modape_spark.tiers import materialize_rollup, rollup_dataframe, with_bucket
from modape_spark.rollup import CFG_ALL
from pyspark.sql import functions as F

def drain_arrow(batches):
    import pyarrow as pa
    total = 0
    for b in batches:
        tok = b.column(b.schema.names.index("tokens"))
        flat = tok.values.to_numpy(zero_copy_only=True)
        total += int(flat[:: max(1, flat.size // 8)].sum()) & 0x7FFFFFFF
        total += b.num_rows
    yield pa.RecordBatch.from_arrays([pa.array([total], type=pa.int64())],
                                     names=["n"])

spark = get_spark(app_name=f"decomp-{CORES}", cores=CORES,
                  shuffle_partitions=max(CORES, 8))
tmp = tempfile.mkdtemp(prefix="modape_decomp_", dir="/dev/shm")
n_buckets = max(CORES, 8)
raw_dir = f"{tmp}/raw"
with_bucket(sequences_df(spark, ROWS), n_buckets) \
    .withColumn("_salt", F.pmod(F.xxhash64("doc_id"), F.lit(6))) \
    .repartition(6 * n_buckets, F.col("bucket"), F.col("_salt")) \
    .drop("_salt") \
    .write.mode("overwrite").partitionBy("bucket").parquet(raw_dir)
raw_bytes = sum(os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(raw_dir)
                for f in fs if f.endswith(".parquet"))
spark.conf.set("spark.sql.files.openCostInBytes", "0")
spark.conf.set("spark.sql.files.maxPartitionBytes",
               str(max(raw_bytes // (3 * CORES), 1 << 20)))
raw = spark.read.parquet(raw_dir)
rollup_dataframe(raw.sample(0.005), CFG_ALL).count()
print(json.dumps({"setup": True, "cores": CORES,
                  "ntasks": raw.rdd.getNumPartitions()}), flush=True)
time.sleep(20)

def full_write(out, nodict):
    rolled = with_bucket(rollup_dataframe(raw, CFG_ALL), n_buckets)
    w = rolled.write.mode("overwrite") \
        .option("partitionOverwriteMode", "dynamic") \
        .option("compression", "snappy")
    if nodict:
        w = w.option("parquet.enable.dictionary", "false")
    w.partitionBy("bucket").parquet(out)

k = 0
for rep in range(REPS):
    for kind in ("feed", "compute", "full", "full_nodict"):
        k += 1
        a = stat(); t0 = time.time()
        if kind == "feed":
            raw.mapInArrow(drain_arrow, "n long").agg(F.sum("n")).collect()
        elif kind == "compute":
            rollup_dataframe(raw, CFG_ALL).select(F.count("*")).collect()
        else:
            full_write(f"{tmp}/out{k}", nodict=(kind == "full_nodict"))
        dt = time.time() - t0; b = stat()
        d = [y - x for x, y in zip(a, b)]
        print(json.dumps({"cores": CORES, "rep": rep, "kind": kind,
              "sec": round(dt, 3),
              "steal": round(100 * d[7] / max(sum(d), 1), 2),
              "busy": round(100 * (sum(d) - d[3] - d[4]) / max(sum(d), 1), 1)}),
              flush=True)
        shutil.rmtree(f"{tmp}/out{k}", ignore_errors=True)
        time.sleep(15)
spark.stop(); shutil.rmtree(tmp, ignore_errors=True)
