"""store="compact" rollup: the kernel pass that emits ONLY dod payloads.

Contract: the compact-store path produces byte-identical tier values to
the full path (decode(compact.dod) == full.plain for every row), the
combined layout equals COMPACT_ROLLUP_SCHEMA, and invalid combinations
fail loudly.  Reference analogue: the datacube stores one canonical form
and derives exports from it (modape/modis/smooth.py write path); here
the canonical long-retention form is the compressed payload itself.
"""

from __future__ import annotations

import pytest

from modape_spark.compression import decode_dod
from modape_spark.rollup import SmoothConfig
from modape_spark.sources.sequences import sequences_df
from modape_spark.tiers import (
    COMPACT_ROLLUP_SCHEMA,
    materialize_rollup,
    read_tier_compact,
    rollup_dataframe,
    write_tier_tables,
)

N_ROWS = 160
CFG = SmoothConfig(soptimize=True, p=0.90, tempint=(10, 5))


@pytest.fixture(scope="module")
def raw(spark):
    return sequences_df(spark, N_ROWS, partitions=5)


def test_compact_schema_and_values_match_full(spark, raw):
    compact = rollup_dataframe(raw, CFG, store="compact")
    assert compact.schema.simpleString() == (
        f"struct<{COMPACT_ROLLUP_SCHEMA.replace(', ', ',').replace(' ', ':')}>"
    )
    full = {r["doc_id"]: r for r in rollup_dataframe(raw, CFG).collect()}
    got = compact.collect()
    assert len(got) == N_ROWS
    for r in got:
        f = full[r["doc_id"]]
        assert r["n_tok"] == f["n_tok"]
        assert r["covered"] == f["covered"]
        assert r["sopt_log10"] == f["sopt_log10"]
        for tier in ("smoothed", "dekad", "pentad"):
            assert list(decode_dod(bytes(r[f"{tier}_dod"]))) == f[tier], tier


def test_compact_materialize_roundtrip(spark, raw, tmp_path):
    comb = str(tmp_path / "comb")
    materialize_rollup(raw, comb, CFG, n_buckets=4, store="compact")
    stored = spark.read.parquet(comb)
    assert "smoothed" not in stored.columns and "smoothed_dod" in stored.columns
    tiers = write_tier_tables(spark, comb, str(tmp_path / "t"), compact=True)
    full = {r["doc_id"]: r for r in rollup_dataframe(raw, CFG).collect()}
    for tier in ("smoothed", "dekad", "pentad"):
        back = read_tier_compact(spark, tiers[tier], tier).collect()
        assert len(back) == N_ROWS
        for r in back:
            assert r[tier] == full[r["doc_id"]][tier], tier


def test_compact_invalid_combinations(spark, raw, tmp_path):
    with pytest.raises(ValueError, match="compress=True"):
        rollup_dataframe(raw, CFG, compress=False, store="compact")
    with pytest.raises(ValueError, match="full.*compact"):
        rollup_dataframe(raw, CFG, store="sparse")
    comb = str(tmp_path / "comb")
    materialize_rollup(raw.limit(8), comb, CFG, n_buckets=2, store="compact")
    with pytest.raises(ValueError, match="compact=True"):
        write_tier_tables(spark, comb, str(tmp_path / "t"), compact=False)


def test_compact_rollup_plan_zero_exchange_and_pruned_output(spark, tmp_path):
    """The compact kernel pass keeps the 10^12-row plan shape (scan ->
    MapInArrow, zero Exchange) AND its Arrow out-feed schema carries only
    the dod payloads — the plain list columns are absent from the plan's
    output, so the halved out-feed is pinned at the plan level, not just
    observed in bench samples (BENCH/BASELINE.md round-5 addendum 2)."""
    from modape_spark.sources.sequences import sequences_df
    from modape_spark.tiers import rollup_dataframe, with_bucket

    raw_dir = str(tmp_path / "raw")
    with_bucket(sequences_df(spark, 200), 4).write.mode("overwrite") \
        .partitionBy("bucket").parquet(raw_dir)
    raw = spark.read.parquet(raw_dir)

    rolled = with_bucket(rollup_dataframe(raw, CFG, store="compact"), 4)
    plan = rolled._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan
    assert "Exchange" not in plan
    cols = set(rolled.columns)
    assert {"smoothed_dod", "dekad_dod", "pentad_dod"} <= cols
    assert not {"smoothed", "dekad", "pentad"} & cols
