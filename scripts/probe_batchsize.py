#!/usr/bin/env python
"""Feed-only cost vs Arrow batch size at one width (decoupling feed
granularity from the 128-row kernel block)."""
from __future__ import annotations
import json, os, sys, tempfile, time, shutil
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

def stat():
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 32
ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

from modape_spark.session import get_spark
from modape_spark.sources.sequences import sequences_df
from modape_spark.tiers import with_bucket
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

spark = get_spark(app_name="probe-bs", cores=CORES, shuffle_partitions=CORES)
tmp = tempfile.mkdtemp(prefix="modape_bs_", dir="/dev/shm")
raw_dir = f"{tmp}/raw"
with_bucket(sequences_df(spark, ROWS), CORES) \
    .withColumn("_salt", F.pmod(F.xxhash64("doc_id"), F.lit(6))) \
    .repartition(6 * CORES, F.col("bucket"), F.col("_salt")) \
    .drop("_salt").write.mode("overwrite").partitionBy("bucket").parquet(raw_dir)
raw_bytes = sum(os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(raw_dir)
                for f in fs if f.endswith(".parquet"))
spark.conf.set("spark.sql.files.openCostInBytes", "0")
spark.conf.set("spark.sql.files.maxPartitionBytes",
               str(max(raw_bytes // (3 * CORES), 1 << 20)))
raw = spark.read.parquet(raw_dir)
raw.mapInArrow(drain_arrow, "n long").agg(F.sum("n")).collect()  # warm
time.sleep(10)
for rep in range(2):
    for bs in (128, 512, 2048, 8192):
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(bs))
        a = stat(); t0 = time.time()
        raw.mapInArrow(drain_arrow, "n long").agg(F.sum("n")).collect()
        dt = time.time() - t0; b = stat()
        d = [y - x for x, y in zip(a, b)]
        print(json.dumps({"rep": rep, "batch": bs, "sec": round(dt, 3),
              "steal": round(100 * d[7] / max(sum(d), 1), 2)}), flush=True)
        time.sleep(6)
spark.stop(); shutil.rmtree(tmp, ignore_errors=True)
