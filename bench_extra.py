#!/usr/bin/env python
"""Round-6 optimization measurement harness (bench.py stays FROZEN).

Per-query isolation with the noop sink (guide §1.4), per-attempt steal
annotation, and .explain("formatted") capture for plan evidence.

Usage:
  python bench_extra.py [--queries q1,q2,...] [--repeats N]
                        [--plans-dir plans/r06] [--plans-suffix before]
                        [--json OUT.json]

Queries named like the bench: tier_all_materialize, tier_fixed_lambda_q25,
incremental_forward_q25, docs_minhash_lsh, emb_knn_brute,
events_sessionize, tpch_pricing_summary.  Any other name is looked up in
the declared-query registry (__spark_entry__.queries()) and timed with a
noop sink at full SF.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _stat():
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]


def steal_window(fn):
    a = _stat()
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    b = _stat()
    d = [y - x for x, y in zip(a, b)]
    return out, round(dt, 3), round(100 * d[7] / max(sum(d), 1), 2)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="bench")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--plans-suffix", default="before")
    ap.add_argument("--json", default=None)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    sf_dir = args.sf_dir
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from modape_spark.entry_queries import (
        CFG_ALL,
        q_incremental_forward,
        q_tier_fixed_lambda,
        sf_of,
    )
    from modape_spark.fixtures import n_rows_for_sf
    from modape_spark.operators.dedup import q_minhash_lsh
    from modape_spark.operators.relational import q_pricing_summary, q_sessionize
    from modape_spark.operators.similarity import q_knn_brute
    from modape_spark.session import get_spark
    from modape_spark.sources.sequences import sequences_df
    from modape_spark.tiers import materialize_rollup, rollup_dataframe, with_bucket

    from pyspark.sql import functions as F

    sf = sf_of(sf_dir)
    n_rows = n_rows_for_sf(sf)
    spark = get_spark(app_name="modape-bench-extra", cores=cpus,
                      shuffle_partitions=max(cpus, 8))

    tmp = tempfile.mkdtemp(prefix="modape_bx_")
    n_buckets = max(cpus, 8)
    raw = None

    def setup_raw():
        nonlocal raw
        if raw is not None:
            return raw
        raw_dir = f"{tmp}/raw"
        with_bucket(sequences_df(spark, n_rows), n_buckets) \
            .withColumn("_salt", F.pmod(F.xxhash64("doc_id"), F.lit(6))) \
            .repartition(6 * n_buckets, F.col("bucket"), F.col("_salt")) \
            .drop("_salt") \
            .write.mode("overwrite").partitionBy("bucket").parquet(raw_dir)
        raw_bytes = sum(os.path.getsize(os.path.join(dp, f))
                        for dp, _, fs in os.walk(raw_dir)
                        for f in fs if f.endswith(".parquet"))
        spark.conf.set("spark.sql.files.maxPartitionBytes",
                       str(max(raw_bytes // (3 * cpus), 1 << 20)))
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        raw = spark.read.parquet(raw_dir)
        # warm python workers through the real UDF
        rollup_dataframe(raw.sample(0.005), CFG_ALL).count()
        return raw

    def headline():
        r = setup_raw()
        out = f"{tmp}/combined"
        materialize_rollup(r, out, CFG_ALL, n_buckets=n_buckets,
                           pre_bucketed=True, store="compact")

    import contextlib

    import modape_spark.entry_queries as EQ
    q_rows = max(n_rows // 4, 64)

    @contextlib.contextmanager
    def quarter_rows():
        saved = EQ.n_rows_for_sf
        EQ.n_rows_for_sf = lambda sf: q_rows
        try:
            yield
        finally:
            EQ.n_rows_for_sf = saved

    def quarter(fn, outdir):
        with quarter_rows():
            fn(spark, sf_dir).write.mode("overwrite").parquet(outdir)

    BENCH = {
        "tier_all_materialize": headline,
        "tier_fixed_lambda_q25":
            lambda: quarter(q_tier_fixed_lambda, f"{tmp}/fixed"),
        "incremental_forward_q25":
            lambda: quarter(q_incremental_forward, f"{tmp}/incr"),
        "docs_minhash_lsh": lambda: q_minhash_lsh(spark, sf_dir).count(),
        "emb_knn_brute": lambda: q_knn_brute(spark, sf_dir).count(),
        "events_sessionize": lambda: q_sessionize(spark, sf_dir).count(),
        "tpch_pricing_summary":
            lambda: q_pricing_summary(spark, sf_dir).count(),
    }

    def plan_df(name):
        """DataFrame whose plan to capture, for plan-capturable entries."""
        if name == "tier_all_materialize":
            return rollup_dataframe(setup_raw(), CFG_ALL, store="compact")
        if name == "tier_fixed_lambda_q25":
            with quarter_rows():
                return q_tier_fixed_lambda(spark, sf_dir)
        if name == "incremental_forward_q25":
            with quarter_rows():
                return q_incremental_forward(spark, sf_dir)
        import __spark_entry__ as E
        reg = E.queries()
        if name in BENCH and name not in reg:
            return None
        return reg[name](spark, sf_dir)

    if args.queries == "bench":
        names = list(BENCH)
    else:
        names = [q.strip() for q in args.queries.split(",") if q.strip()]

    results = {}
    for name in names:
        if name in BENCH:
            fn = BENCH[name]
        else:
            import __spark_entry__ as E
            qf = E.queries()[name]
            fn = (lambda qf=qf: noop(qf(spark, sf_dir)))
        attempts = []
        for i in range(args.repeats):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} attempt {i}")
            _, dt, st = steal_window(fn)
            attempts.append({"seconds": dt, "steal_pct": st})
            spark.sparkContext.setJobDescription(None)
        results[name] = attempts
        best = min(a["seconds"] for a in attempts)
        print(f"{name}: best={best} attempts={attempts}", flush=True)
        if args.plans_dir:
            try:
                df = plan_df(name)
                if df is not None:
                    os.makedirs(args.plans_dir, exist_ok=True)
                    p = os.path.join(
                        args.plans_dir, f"{name}_{args.plans_suffix}.txt")
                    with open(p, "w") as f:
                        f.write(df._sc._jvm.PythonSQLUtils.explainString(
                            df._jdf.queryExecution(), "formatted"))
            except Exception as exc:  # plan capture must not kill timing
                print(f"plan capture failed for {name}: {exc}", flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps({k: min(a["seconds"] for a in v)
                      for k, v in results.items()}))
    spark.stop()
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
