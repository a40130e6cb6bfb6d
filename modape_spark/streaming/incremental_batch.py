"""Incremental-batch driver: the engine's "streaming" mode.

The reference's update model is an incremental batch contract, not a
continuous stream (SURVEY.md §2.8): appends are strictly ordered, late data
is rejected, and only a trailing window is recomputed.  We therefore run
Trigger.AvailableNow-style incremental batches over a landing directory of
suffix-batch parquet files, rather than a long-lived Structured Streaming
query — each invocation drains whatever landed, applies the full
validate -> dedup -> append -> windowed-rollup -> tail-merge pipeline, and
checkpoints the processed batch ids in a watermark table.

(The same pipeline drops into ``readStream``/``foreachBatch`` unchanged if a
continuous source appears; ``run_incremental_batch`` is exactly the
foreachBatch body.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..incremental import append_suffixes, incremental_rollup, merge_tier_tail
from ..rollup import SmoothConfig


def run_incremental_batch(
    spark: SparkSession,
    raw_df: DataFrame,
    batches_dir: str,
    processed_dir: str,
    nsmooth: int = 16,
    nupdate: int = 1,
    cfg: SmoothConfig | None = None,
    existing_tiers: dict[str, DataFrame] | None = None,
) -> dict:
    """Drain the landing dir once (AvailableNow semantics).

    Returns {updated_raw, merged_tiers, n_batches} — caller persists.
    Batches already recorded in ``processed_dir`` are skipped
    (idempotent re-runs; ST4 guards).
    """
    import os

    if batches_dir.startswith("/") and not os.path.exists(batches_dir):
        return {"updated_raw": raw_df, "merged_tiers": existing_tiers or {},
                "n_batches": 0}
    try:
        batches = spark.read.parquet(batches_dir)
    except Exception:
        return {"updated_raw": raw_df, "merged_tiers": existing_tiers or {},
                "n_batches": 0}
    if not (processed_dir.startswith("/") and not os.path.exists(processed_dir)):
        try:
            done = spark.read.parquet(processed_dir).select("batch_id").distinct()
            batches = batches.join(F.broadcast(done), "batch_id", "left_anti")
        except Exception:
            pass
    n = batches.select("batch_id").distinct().count()
    if n == 0:
        return {"updated_raw": raw_df, "merged_tiers": existing_tiers or {},
                "n_batches": 0}

    updated = append_suffixes(raw_df, batches)
    tail = incremental_rollup(updated, nsmooth, nupdate, cfg)
    merged = {}
    for tier, df in (existing_tiers or {}).items():
        total_col = f"{tier}_total" if tier in ("dekad", "pentad") else None
        merged[tier] = merge_tier_tail(df, tail, tier, nupdate, total_col=total_col)
    batches.select("batch_id").distinct().write.mode("append").parquet(processed_dir)
    return {"updated_raw": updated, "merged_tiers": merged, "n_batches": n}
