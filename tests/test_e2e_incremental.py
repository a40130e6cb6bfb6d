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
