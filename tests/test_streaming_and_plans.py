"""Incremental-batch streaming driver, salting plans, CSV surface, and
plan-level pushdown assertions."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from modape_spark.plans.partitioning import salted_repartition, skewed_group_agg
from modape_spark.rollup import SmoothConfig
from modape_spark.sources.csv_series import smooth_csv
from modape_spark.sources.sequences import sequences_df
from modape_spark.streaming.incremental_batch import run_incremental_batch
from modape_spark.tiers import rollup_dataframe


def test_run_incremental_batch_cycle(spark, tmp_path):
    cfg = SmoothConfig(soptimize=False, svalue=1.0, tempint=(10,))
    raw = sequences_df(spark, 30).filter(F.col("n_tok") >= 64)
    raw = raw.withColumn("tokens", F.slice("tokens", 1, 20)) \
             .withColumn("n_tok", F.lit(20).cast("int"))
    tiers = {"smoothed": rollup_dataframe(raw, cfg).select("doc_id", "smoothed")}

    batches_dir = str(tmp_path / "landing")
    processed_dir = str(tmp_path / "processed")
    rows = raw.select("doc_id").collect()
    batch = spark.createDataFrame(
        [(r["doc_id"], "b1", 1, [500, 600], 20) for r in rows],
        "doc_id string, batch_id string, proc_ts long, "
        "tokens_suffix array<int>, start_offset int",
    )
    batch.write.parquet(batches_dir)

    out = run_incremental_batch(spark, raw, batches_dir, processed_dir,
                                nsmooth=16, nupdate=1, cfg=cfg,
                                existing_tiers=tiers)
    assert out["n_batches"] == 1
    assert out["updated_raw"].select(F.max("n_tok")).first()[0] == 22
    merged = out["merged_tiers"]["smoothed"]
    assert merged.count() == raw.count()

    # idempotent drain: batch already processed -> no-op
    out2 = run_incremental_batch(spark, out["updated_raw"], batches_dir,
                                 processed_dir, cfg=cfg)
    assert out2["n_batches"] == 0


def test_salted_repartition_spreads_hot_key(spark):
    df = sequences_df(spark, 200)
    out = salted_repartition(df, "source", 8)
    # hot key 'web' (~50% of rows) must span multiple partitions
    pid = out.filter(F.col("source") == "web") \
             .select(F.spark_partition_id().alias("p")).distinct().count()
    assert pid > 1
    assert out.count() == 200


def test_skewed_group_agg_matches_plain(spark):
    df = sequences_df(spark, 300)
    plain = {r["source"]: (r["rows"], r["toks"]) for r in
             df.groupBy("source").agg(F.count("*").alias("rows"),
                                      F.sum("n_tok").alias("toks")).collect()}
    salted = {r["source"]: (r["rows"], r["toks"]) for r in
              skewed_group_agg(
                  df, "source",
                  partial_aggs=[(F.count("*"), "rows"), (F.sum("n_tok"), "toks")],
                  aggs=[(F.sum("rows"), "rows"), (F.sum("toks"), "toks")],
              ).collect()}
    assert plain == salted


def test_csv_smooth_roundtrip(tmp_path):
    t = np.arange(60)
    df = pd.DataFrame({
        "s1": 100 + 10 * np.sin(t / 5.0),
        "s2": 50 + 5 * np.cos(t / 3.0),
    })
    inp = str(tmp_path / "in.csv")
    outp = str(tmp_path / "out.csv")
    df.to_csv(inp, index=False)
    out = smooth_csv(inp, outp, svalue=1.0)
    assert "_label" in out.columns
    assert list(out["_label"].dropna()) == ["Sopt", "logSopt"]
    back = pd.read_csv(outp)
    assert len(back) == 62  # 60 points + 2 appended rows


def test_parquet_filter_pushdown(spark, tmp_path):
    """The coverage/bucket predicates must reach the parquet scan."""
    p = str(tmp_path / "t")
    sequences_df(spark, 100).write.parquet(p)
    df = spark.read.parquet(p).filter(F.col("source") == "web") \
                              .select("doc_id", "n_tok")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(source), EqualTo(source,web)]" in plan \
        or "PushedFilters" in plan
    # column pruning: tokens not read
    explain = spark.sql("select doc_id from parquet.`" + p + "`")
    txt = explain._jdf.queryExecution().executedPlan().toString()
    assert "tokens" not in txt.split("ReadSchema")[-1][:200]


def test_pair_queries_not_quadratic(spark):
    """The simhash-pairs and embedding-neardup queries must generate
    candidates through equi-joins (band / grid-cell buckets), never a
    cartesian or non-equi nested-loop self-join (VERDICT r01 items 3-4)."""
    from modape_spark.operators.dedup import q_simhash_pairs
    from modape_spark.operators.similarity import q_neardup

    sf = "/root/testdata/sf0.001"
    for fn in (q_simhash_pairs, q_neardup):
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, fn.__name__
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__


def test_rollup_hot_path_plan_shape(spark, tmp_path):
    """The materialize hot path must stay scan -> MapInArrow with NO
    exchange anywhere (the 10^12-row plan shape: N independent pipelines
    per executor; BENCH/PLANS.md).  Pins both the Arrow boundary and the
    zero-shuffle property against regressions."""
    from pyspark.sql import functions as F

    from modape_spark.entry_queries import CFG_ALL
    from modape_spark.sources.sequences import sequences_df
    from modape_spark.tiers import rollup_dataframe, with_bucket

    raw_dir = str(tmp_path / "raw")
    with_bucket(sequences_df(spark, 200), 4).write.mode("overwrite") \
        .partitionBy("bucket").parquet(raw_dir)
    raw = spark.read.parquet(raw_dir)

    rolled = with_bucket(rollup_dataframe(raw, CFG_ALL), 4)
    plan = rolled._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan
    assert "MapInPandas" not in plan
    assert "Exchange" not in plan  # kernel pass is shuffle-free
    # the pre_bucketed write path adds nothing above this plan, so the
    # whole materialize job is scan -> kernel -> write with no exchange


def test_bucketed_sig_store_join_has_no_exchange(spark):
    """The bucketed signature store's candidate self-join must read both
    sides bucket-aligned: no Exchange anywhere below the SortMergeJoin
    (the post-join pair aggregation is the only shuffle left).  Broadcast
    is disabled so the planner cannot sidestep the bucketed-join path
    being asserted."""
    from modape_spark.operators.dedup import q_minhash_lsh_bucketed

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = q_minhash_lsh_bucketed(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    assert "SelectedBucketsCount" in plan          # bucket metadata honored
    assert "hashpartitioning(band" not in plan     # no exchange on join keys
    # exactly the two post-join exchanges (pair agg + final orderBy) remain
    join_part = plan[plan.index("SortMergeJoin"):]
    assert "Exchange" not in join_part


def test_export_guard_plan_shape(spark, tmp_path):
    """The round-5 known-lengths guard must cost zero extra scans and
    zero shuffles of the big side: the range-export plan is ONE parquet
    scan + two BroadcastHashJoins whose only Exchanges are the tiny-dim
    broadcasts (BENCH/PLANS.md round-5 hardening note, pinned here)."""
    from modape_spark.rollup import SmoothConfig
    from modape_spark.sources.sequences import sequences_df
    from modape_spark.tiers import export_tier_range, materialize_rollup

    out = str(tmp_path / "gplan")
    materialize_rollup(sequences_df(spark, 120, partitions=2), out,
                       SmoothConfig(soptimize=False, svalue=1.0,
                                    tempint=(10,)),
                       n_buckets=4)
    df = export_tier_range(spark, out, "dekad", "2002185", "2002365")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert plan.count("BroadcastHashJoin") == 2
    # every Exchange is a broadcast of a tiny dim; no shuffle Exchange
    import re
    exchanges = re.findall(r"(\w*Exchange\w*)", plan)
    assert exchanges and all("Broadcast" in e for e in exchanges), exchanges
    # the guard itself is present and rides the scan side
    assert "raise_error" in plan and "lengths sidecar" in plan


def test_decontaminate_plan_broadcasts_eval_side(spark):
    """The eval n-gram side of the decontamination join must broadcast
    (it is always tiny relative to the training corpus), so the training
    explode is never shuffled on the n-gram key: no SortMergeJoin, no
    hashpartitioning on g below the join."""
    from modape_spark.operators.decontaminate import q_decontaminate

    df = q_decontaminate(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    join_part = plan[: plan.index("BroadcastHashJoin")]
    assert "hashpartitioning(g" not in join_part
