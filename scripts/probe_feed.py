#!/usr/bin/env python
"""Probe the scan+Arrow-feed cost of the rollup hot path in isolation.

Round-2 finding (BENCH/BASELINE.md): feeding the 100k-row token table
through mapInPandas cost a fixed ~3 s that did not scale from 8 to 32
cores — per-row numpy-object materialization of the list column in the
pandas conversion.  The mapInArrow path receives the list column as one
contiguous values buffer + offsets, so this probe measures the residual:
scan -> Arrow batches -> drain (touch the buffers, no kernel), at two
parallelism levels.

Usage: python scripts/probe_feed.py [--rows 100000] [--cores 8,32]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def drain_arrow(batches):
    import numpy as np
    import pyarrow as pa

    total = 0
    for b in batches:
        tok = b.column(b.schema.names.index("tokens"))
        flat = tok.values.to_numpy(zero_copy_only=True)
        total += int(flat[:: max(1, flat.size // 8)].sum()) & 0x7FFFFFFF
        total += b.num_rows
    yield pa.RecordBatch.from_arrays(
        [pa.array([total], type=pa.int64())], names=["n"])


def drain_pandas(pdfs):
    import numpy as np
    import pandas as pd

    total = 0
    for pdf in pdfs:
        for t in pdf["tokens"].to_numpy():
            a = np.asarray(t)
            total += int(a[:: max(1, a.size // 8)].sum()) & 0x7FFFFFFF
        total += len(pdf)
    yield pd.DataFrame({"n": [total]})


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--cores", default="8,32")
    args = ap.parse_args()
    levels = [int(c) for c in args.cores.split(",")]

    from modape_spark.session import get_spark
    from modape_spark.sources.sequences import sequences_df
    from modape_spark.tiers import with_bucket
    from pyspark.sql import functions as F

    base = tempfile.mkdtemp(prefix="probe_feed_", dir="/dev/shm")
    spark = get_spark(app_name="probe-setup", cores=32)
    with_bucket(sequences_df(spark, args.rows), 32) \
        .withColumn("_salt", F.pmod(F.xxhash64("doc_id"), F.lit(6))) \
        .repartition(192, F.col("bucket"), F.col("_salt")).drop("_salt") \
        .write.mode("overwrite").partitionBy("bucket").parquet(f"{base}/raw")
    spark.stop()

    raw_bytes = sum(os.path.getsize(os.path.join(dp, f))
                    for dp, _, fs in os.walk(f"{base}/raw")
                    for f in fs if f.endswith(".parquet"))
    results = []
    try:
        for cores in levels:
            split = max(raw_bytes // (3 * cores), 1 << 20)
            spark = get_spark(app_name=f"probe-{cores}", cores=cores,
                              extra_conf={
                                  "spark.sql.files.maxPartitionBytes": str(split),
                                  "spark.sql.files.openCostInBytes": "0"})
            raw = spark.read.parquet(f"{base}/raw") \
                .select("doc_id", "tokens", "n_tok", "source")
            for label, run in (
                ("arrow", lambda: raw.mapInArrow(drain_arrow, "n long")),
                ("pandas", lambda: raw.mapInPandas(drain_pandas, "n long")),
            ):
                run().count()  # warm-up: spin workers, cache imports
                t0 = time.time()
                run().count()
                dt = time.time() - t0
                results.append((cores, label, dt))
                print(f"cores={cores:3d} {label:7s} feed={dt:6.2f}s",
                      flush=True)
            spark.stop()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print(results)


if __name__ == "__main__":
    main()
