"""Checkpointed resumable runs (north_rule: per-partition lineage + metrics,
resumable from checkpoint)."""

from __future__ import annotations

from modape_spark.lineage import (
    bucket_lineage,
    input_fingerprint,
    resume_plan,
    run_with_checkpoints,
)
from modape_spark.rollup import SmoothConfig
from modape_spark.sources.sequences import sequences_df

CFG = SmoothConfig(soptimize=False, svalue=1.0, tempint=(10,))


def test_fingerprint_partition_invariant(spark):
    a = input_fingerprint(sequences_df(spark, 80, partitions=2), 8).collect()
    b = input_fingerprint(sequences_df(spark, 80, partitions=9), 8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_run_and_full_resume(spark, tmp_path):
    raw = sequences_df(spark, 80, partitions=4)
    out = str(tmp_path / "tiers")
    lin = str(tmp_path / "lineage")
    m1 = run_with_checkpoints(spark, raw, out, lin, CFG, n_buckets=8, n_groups=3)
    assert m1["processed_buckets"] == 8
    assert m1["skipped_buckets"] == 0
    assert spark.read.parquet(out).count() == 80
    # rerun on identical input: everything skipped, output intact
    m2 = run_with_checkpoints(spark, raw, out, lin, CFG, n_buckets=8, n_groups=3)
    assert m2["processed_buckets"] == 0
    assert m2["skipped_buckets"] == 8
    assert spark.read.parquet(out).count() == 80


def test_resume_recomputes_changed_input(spark, tmp_path):
    out = str(tmp_path / "tiers")
    lin = str(tmp_path / "lineage")
    raw1 = sequences_df(spark, 60, partitions=3)
    run_with_checkpoints(spark, raw1, out, lin, CFG, n_buckets=8, n_groups=2)
    # grow the table: fingerprints change for buckets that gained rows
    raw2 = sequences_df(spark, 90, partitions=3)
    todo, _ = resume_plan(spark, raw2, lin, 8)
    assert todo  # at least one bucket dirty
    m = run_with_checkpoints(spark, raw2, out, lin, CFG, n_buckets=8, n_groups=2)
    assert m["processed_buckets"] == len(todo)
    assert spark.read.parquet(out).count() == 90
    # and now clean
    todo2, _ = resume_plan(spark, raw2, lin, 8)
    assert todo2 == []


def test_bucket_lineage_metrics(spark, tmp_path):
    from modape_spark.tiers import rollup_dataframe, with_bucket

    rolled = with_bucket(rollup_dataframe(sequences_df(spark, 60), CFG), 8)
    lin = bucket_lineage(rolled).collect()
    assert sum(r["rows"] for r in lin) == 60
    assert all(r["payload_fingerprint"] is not None for r in lin)
