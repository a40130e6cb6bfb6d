"""Retention trim (retention.py): bounded raw storage with the logical
date axis preserved — and the invariant that windowed forward runs are
bit-identical on trimmed and full tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modape_spark.constants import STRES_DEKAD
from modape_spark.incremental import append_suffixes, incremental_rollup
from modape_spark.retention import retention_stats, retention_trim
from modape_spark.rollup import CFG_FIXED, SmoothConfig
from modape_spark.sources.sequences import sequences_df
from modape_spark.tiers import rollup_dataframe

KEEP = 64


def test_trim_preserves_logical_length(spark):
    raw = sequences_df(spark, 400)
    t = retention_trim(raw, KEEP)
    rows = t.select(
        "n_tok", F.size("tokens").alias("phys")).collect()
    assert all(r["phys"] == min(r["n_tok"], KEEP) for r in rows)
    # trimmed rows keep the SUFFIX: last token unchanged vs the full table
    full = {r["doc_id"]: r for r in
            raw.select("doc_id", F.element_at("tokens", -1)
                       .alias("last_tok")).collect()}
    got = {r["doc_id"]: r for r in
           t.select("doc_id", F.element_at("tokens", -1)
                    .alias("last_tok")).collect()}
    assert all(got[d]["last_tok"] == full[d]["last_tok"] for d in full)


def test_full_smooth_on_trimmed_table_raises(spark):
    raw = retention_trim(sequences_df(spark, 200), KEEP)
    with pytest.raises(Exception, match="trimmed rows|windowed config"):
        rollup_dataframe(raw, CFG_FIXED).select(F.count("*")).collect()


@pytest.mark.parametrize("keep", [KEEP, 14])
def test_windowed_forward_identical_trimmed_vs_full(spark, keep):
    """keep_tail >= nsmooth: the forward run reads only the trailing
    window, so trimming history cannot change a single output value.
    keep=14 is the exact boundary: after the 2-token append the physical
    tail is 16 == nsmooth — the minimum retention that stays exact."""
    cfg = SmoothConfig(soptimize=True, p=0.90, tempint=(STRES_DEKAD,))
    full = sequences_df(spark, 300).persist()
    full.count()

    def forward(init):
        batches = init.select(
            "doc_id", F.lit("b").alias("batch_id"),
            F.lit(1).cast("long").alias("proc_ts"),
            F.col("tokens_tail").alias("tokens_suffix"),
            F.col("n_tok").cast("int").alias("start_offset"))
        upd = append_suffixes(init.drop("tokens_tail"), batches)
        return incremental_rollup(upd, nsmooth=16, nupdate=1, cfg=cfg) \
            .select("doc_id", "n_tok", "covered", "smoothed", "dekad")

    init = (full
            .withColumn("tokens_tail", F.expr("slice(tokens, n_tok - 1, 2)"))
            .withColumn("tokens", F.expr("slice(tokens, 1, n_tok - 2)"))
            .withColumn("n_tok", (F.col("n_tok") - 2).cast("int")))
    t_init = retention_trim(
        init.select("doc_id", "tokens", "n_tok", "source", "tokens_tail"),
        keep)
    want = {r["doc_id"]: r for r in forward(init).collect()}
    got = {r["doc_id"]: r for r in forward(t_init).collect()}
    full.unpersist()
    assert set(want) == set(got)
    for d, w in want.items():
        g = got[d]
        assert g["n_tok"] == w["n_tok"]                  # logical length
        assert g["covered"] == w["covered"]
        assert list(g["smoothed"]) == list(w["smoothed"])  # bit-identical
        assert list(g["dekad"]) == list(w["dekad"])


def test_append_advances_logical_length_on_trimmed(spark):
    raw = sequences_df(spark, 100).filter(F.col("n_tok") == 742)
    trimmed = retention_trim(raw, KEEP)
    batches = trimmed.select(
        "doc_id", F.lit("b").alias("batch_id"),
        F.lit(1).cast("long").alias("proc_ts"),
        F.expr("array(1, 2, 3)").alias("tokens_suffix"),
        F.col("n_tok").cast("int").alias("start_offset"))
    upd = append_suffixes(trimmed, batches)
    row = upd.select("n_tok", F.size("tokens").alias("phys")).first()
    assert row["n_tok"] == 745           # logical: 742 + 3
    assert row["phys"] == KEEP + 3       # physical: suffix appended to tail


def test_retention_stats_accounting(spark):
    raw = sequences_df(spark, 500)
    stats = {r["source"]: r for r in retention_stats(raw, KEEP).collect()}
    manual = raw.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("n_tok").alias("raw"),
        F.sum(F.least(F.col("n_tok"), F.lit(KEEP))).alias("kept")).collect()
    for m in manual:
        s = stats[m["source"]]
        assert s["n_docs"] == m["n"]
        assert s["raw_points"] == m["raw"]
        assert s["kept_points"] == m["kept"]
        assert s["trimmed_points"] == m["raw"] - m["kept"]
