"""E2E mirror of the reference's golden integration test
(/root/reference/tests/test_cli.py:609-858,
test_collect_smooth_export_import_sgrid):

  collect init -> V-curve optimize init run (sgrid initialised)
  -> sgrid export / re-import
  -> forward incremental run (nsmooth=16, nupdate=1, tempint=10) consuming
     the imported sgrid
  -> tier tail merge
  -> results pinned by sha256 (the reference pins SHA1 of its rasters)
  -> state teardown + sgrid re-import reproduces the identical hash.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import functions as F

from modape_spark.incremental import append_suffixes, incremental_rollup, merge_tier_tail
from modape_spark.rollup import SmoothConfig
from modape_spark.sources.sequences import sequences_df
from modape_spark.tiers import rollup_dataframe

KEEP = 44       # ~ one year of 8-day steps before the forward batch
N_DOCS = 30

# sha256 over the sorted merged dekad tier after the forward step.
# Pinned from the first validated run; any numeric/semantic drift in future
# rounds fails here (like the reference's golden SHA1s).
PINNED_DEKAD_SHA = "0f7fcc5d2936e43a9a3a48723de742493b640c2ff934a8affbfe400d6e660e03"


def _tier_hash(rows: dict[str, list[int]]) -> str:
    h = hashlib.sha256()
    for doc_id in sorted(rows):
        h.update(doc_id.encode())
        h.update(np.asarray(rows[doc_id], dtype=np.int64).tobytes())
    return h.hexdigest()


def _pipeline(spark) -> str:
    # 1. collect init
    full = sequences_df(spark, N_DOCS).filter(F.col("n_tok") >= 64)
    init = (
        full.withColumn("tokens_full", F.col("tokens"))
        .withColumn("tokens", F.slice("tokens", 1, KEEP))
        .withColumn("n_tok", F.lit(KEEP).cast("int"))
    )
    cfg_init = SmoothConfig(soptimize=True, p=0.90, tempint=(10,))
    init_roll = rollup_dataframe(init.drop("tokens_full"), cfg_init)
    stored_dekad = init_roll.select("doc_id", "dekad")
    # 2. sgrid export
    sgrid = init_roll.select("doc_id", "sopt_log10").collect()
    sgrid_df = spark.createDataFrame(
        [(r["doc_id"], float(r["sopt_log10"])) for r in sgrid],
        "doc_id string, sopt_log10 float",
    )
    # 3. forward batch: next 2 true tokens per doc
    batches = init.select(
        "doc_id",
        F.lit("fwd").alias("batch_id"),
        F.lit(1).cast("long").alias("proc_ts"),
        F.expr(f"slice(tokens_full, {KEEP + 1}, 2)").alias("tokens_suffix"),
        F.lit(KEEP).cast("int").alias("start_offset"),
    )
    updated = append_suffixes(init.drop("tokens_full"), batches)
    # 4. forward run with IMPORTED sgrid (fixed-from-grid, smooth.py:430)
    with_state = updated.join(sgrid_df, "doc_id")
    cfg_fwd = SmoothConfig(soptimize=False, svalue=None, p=0.90, tempint=(10,))
    tail = incremental_rollup(with_state, nsmooth=16, nupdate=1, cfg=cfg_fwd)
    merged = merge_tier_tail(stored_dekad, tail.select("doc_id", "dekad", "dekad_total"),
                             "dekad", nupdate=1, total_col="dekad_total")
    rows = {r["doc_id"]: list(r["dekad"]) for r in merged.collect()}
    assert all(len(v) > 0 for v in rows.values())
    return _tier_hash(rows)


def test_e2e_forward_step_pinned(spark):
    h = _pipeline(spark)
    assert h == PINNED_DEKAD_SHA, f"tier hash drifted: {h}"


def test_e2e_reimport_reproduces(spark):
    """Teardown + re-run from scratch (fresh lineage, fresh state export)
    reproduces the identical tier bytes — the reference's re-import
    verification (tests/test_cli.py:822-858)."""
    assert _pipeline(spark) == _pipeline(spark)


def test_e2e_sgrid_export_destroy_reimport(spark, tmp_path):
    """Full mirror of the reference E2E's sgrid loop
    (tests/test_cli.py:609-858): init with soptimize -> export sgrid state
    -> forward run A -> DESTROY the smooth state on disk -> re-import the
    sgrid from its export -> rebuild the archive fixed-from-grid ->
    forward run B. The re-imported sgrid must hash-equal its export
    (reference step 7's sha1 assert) and both the rebuilt stored tier and
    the forward-merged tier must equal the never-destroyed run's."""
    import shutil

    from modape_spark.tiers import materialize_rollup

    full = sequences_df(spark, N_DOCS).filter(F.col("n_tok") >= 64)
    init = (
        full.withColumn("tokens_full", F.col("tokens"))
        .withColumn("tokens", F.slice("tokens", 1, KEEP))
        .withColumn("n_tok", F.lit(KEEP).cast("int"))
    )
    init_raw = init.drop("tokens_full")
    tiers_dir = str(tmp_path / "tiers")
    materialize_rollup(init_raw, tiers_dir,
                       SmoothConfig(soptimize=True, p=0.90, tempint=(10,)),
                       n_buckets=4)

    # export the sgrid state to its own table (reference: sgrid GeoTIFF)
    sgrid_dir = str(tmp_path / "sgrid_export")
    spark.read.parquet(tiers_dir).select("doc_id", "sopt_log10") \
        .write.parquet(sgrid_dir)

    def sgrid_hash() -> str:
        rows = spark.read.parquet(sgrid_dir).collect()
        h = hashlib.sha256()
        for r in sorted(rows, key=lambda r: r["doc_id"]):
            h.update(r["doc_id"].encode())
            h.update(np.float32(r["sopt_log10"]).tobytes())
        return h.hexdigest()

    exported_hash = sgrid_hash()

    def stored_dekad_rows(state_dir: str) -> dict:
        return {r["doc_id"]: list(r["dekad"])
                for r in spark.read.parquet(state_dir)
                .select("doc_id", "dekad").collect()}

    def forward(state_dir: str) -> dict:
        stored = spark.read.parquet(state_dir).select("doc_id", "dekad")
        sgrid_df = spark.read.parquet(sgrid_dir)
        batches = init.select(
            "doc_id",
            F.lit("fwd").alias("batch_id"),
            F.lit(1).cast("long").alias("proc_ts"),
            F.expr(f"slice(tokens_full, {KEEP + 1}, 2)").alias("tokens_suffix"),
            F.lit(KEEP).cast("int").alias("start_offset"),
        )
        updated = append_suffixes(init_raw, batches)
        with_state = updated.join(sgrid_df, "doc_id")
        cfg_fwd = SmoothConfig(soptimize=False, svalue=None, p=0.90,
                               tempint=(10,))
        tail = incremental_rollup(with_state, nsmooth=16, nupdate=1,
                                  cfg=cfg_fwd)
        merged = merge_tier_tail(
            stored, tail.select("doc_id", "dekad", "dekad_total"),
            "dekad", nupdate=1, total_col="dekad_total")
        return {r["doc_id"]: list(r["dekad"]) for r in merged.collect()}

    original_stored = stored_dekad_rows(tiers_dir)
    run_a = forward(tiers_dir)

    shutil.rmtree(tiers_dir)  # destroy the smooth state (reference step 6)

    # re-import sgrid and rebuild the archive fixed-from-grid (step 7)
    assert sgrid_hash() == exported_hash
    rebuilt_dir = str(tmp_path / "tiers_rebuilt")
    sgrid_df = spark.read.parquet(sgrid_dir)
    materialize_rollup(init_raw.join(sgrid_df, "doc_id"), rebuilt_dir,
                       SmoothConfig(soptimize=False, svalue=None, p=0.90,
                                    tempint=(10,)),
                       n_buckets=4)
    # the rebuilt stored tier reproduces the destroyed one exactly
    assert stored_dekad_rows(rebuilt_dir) == original_stored

    # forward run in the same fashion (step 8): identical merged tier
    run_b = forward(rebuilt_dir)
    assert _tier_hash(run_a) == _tier_hash(run_b)
    assert run_a == run_b
