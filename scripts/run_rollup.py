#!/usr/bin/env python
"""spark-submit entry point (north_star deployment shape):

    python scripts/make_pyfiles.py                       # build the zip
    spark-submit --py-files dist/modape_spark.zip \
        scripts/run_rollup.py --n-rows 100000 --out /data/tiers

On a cluster, replace master via spark-submit flags; the job code is
identical (no local-mode assumptions in the pipeline).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-rows", type=int, default=100_000)
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=32)
    args = ap.parse_args()

    # import AFTER spark-submit has distributed --py-files
    from pyspark.sql import SparkSession

    from modape_spark.rollup import SmoothConfig
    from modape_spark.sources.sequences import sequences_df
    from modape_spark.tiers import materialize_rollup

    spark = SparkSession.builder.appName("modape-rollup").getOrCreate()
    cfg = SmoothConfig(soptimize=True, p=0.90, tempint=(10, 5))
    t0 = time.time()
    materialize_rollup(sequences_df(spark, args.n_rows), args.out, cfg,
                       n_buckets=args.buckets)
    print(json.dumps({
        "rows": args.n_rows,
        "seconds": round(time.time() - t0, 2),
        "seq_per_sec": round(args.n_rows / (time.time() - t0), 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
