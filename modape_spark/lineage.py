"""Per-partition lineage + metrics, and checkpointed resumable runs.

north_rule: "resumable from checkpoint with per-partition lineage +
metrics".  The reference's analogues are the `.collected` sha256 tracefile
(scripts/modis_collect.py:275-291), the `last_collected`/`last_smoothed`
idempotency guards (smooth.py:522-546) and the lastrun/processingtimestamp
attrs (smooth.py:484-513).

Design:
- The unit of lineage is the doc_id hash bucket (tiers.with_bucket) — the
  same unit as the tier tables' partition layout, so a resume check prunes
  whole parquet partitions.
- ``bucket_lineage`` computes, per bucket, (rows, covered rows, an
  order-insensitive content fingerprint, value-count metrics).  The
  fingerprint sums 32-bit row hashes into a 64-bit accumulator —
  commutative, so it is independent of partitioning and row order, and safe
  under ANSI arithmetic for < 2^31 rows per bucket.
- ``run_with_checkpoints`` processes buckets in groups; after each group it
  appends that group's lineage rows.  A restarted run recomputes the input
  fingerprint (cheap: no kernel work) and skips every bucket whose
  fingerprint already matches — kill the job anywhere and rerun; completed
  groups are never re-smoothed.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .rollup import SmoothConfig
from .tiers import materialize_rollup, with_bucket

__all__ = ["input_fingerprint", "bucket_lineage", "run_with_checkpoints", "resume_plan"]


def input_fingerprint(raw_df: DataFrame, n_buckets: int) -> DataFrame:
    """Per-bucket content fingerprint of the INPUT (doc_id + tokens)."""
    return (
        with_bucket(raw_df, n_buckets)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("rows"),
            F.sum(
                F.pmod(F.xxhash64("doc_id", "tokens"), F.lit(2**32))
            ).alias("fingerprint"),
        )
    )


def bucket_lineage(rolled: DataFrame, n_buckets: int | None = None) -> DataFrame:
    """Per-bucket metrics of a rollup OUTPUT (expects a bucket column)."""
    df = rolled if "bucket" in rolled.columns else with_bucket(rolled, n_buckets)
    return df.groupBy("bucket").agg(
        F.count("*").alias("rows"),
        F.sum(F.col("covered").cast("long")).alias("covered_rows"),
        F.sum(
            F.pmod(F.xxhash64("doc_id", "smoothed"), F.lit(2**32))
        ).alias("payload_fingerprint"),
        F.avg("sopt_log10").alias("mean_sopt_log10"),
    )


def resume_plan(
    spark: SparkSession,
    raw_df: DataFrame,
    lineage_dir: str,
    n_buckets: int,
) -> tuple[list[int], DataFrame]:
    """Buckets still to process = all buckets minus those whose recorded
    input fingerprint matches the current input."""
    current = input_fingerprint(raw_df, n_buckets)
    import os

    if lineage_dir.startswith("/") and not os.path.exists(lineage_dir):
        return list(range(n_buckets)), current  # first run, nothing recorded
    try:
        done = spark.read.parquet(lineage_dir)
    except Exception:
        return list(range(n_buckets)), current
    # latest lineage row per bucket wins (re-runs append)
    done = done.groupBy("bucket").agg(
        F.expr("max_by(input_fingerprint, ts)").alias("fp_done")
    )
    # broadcast: lineage is n_buckets rows
    j = current.join(F.broadcast(done), "bucket", "left")
    todo = [
        r["bucket"]
        for r in j.filter(
            F.col("fp_done").isNull() | (F.col("fp_done") != F.col("fingerprint"))
        ).select("bucket").collect()
    ]
    return sorted(todo), current


def run_with_checkpoints(
    spark: SparkSession,
    raw_df: DataFrame,
    out_dir: str,
    lineage_dir: str,
    cfg: SmoothConfig | None = None,
    n_buckets: int = 32,
    n_groups: int = 4,
    compress: bool = True,
) -> dict:
    """Checkpointed materialization: bucket groups run as separate jobs;
    each completed group commits its tier partitions + lineage rows.

    Returns run metrics {processed_buckets, skipped_buckets, seconds}.
    """
    t0 = time.time()
    todo, current_fp = resume_plan(spark, raw_df, lineage_dir, n_buckets)
    skipped = n_buckets - len(todo)
    fp_map = {r["bucket"]: (r["rows"], r["fingerprint"]) for r in current_fp.collect()}
    groups = [todo[i::n_groups] for i in range(n_groups)]
    for g in groups:
        if not g:
            continue
        # dynamic partition overwrite (session.py sets partitionOverwriteMode)
        # makes a re-run of a half-written group idempotent: only the group's
        # bucket partitions are replaced.
        materialize_rollup(
            raw_df, out_dir, cfg, n_buckets=n_buckets, compress=compress,
            mode="overwrite", bucket_filter=g,
        )
        now = time.time()
        rows = [
            (int(b), int(fp_map.get(b, (0, 0))[0]), int(fp_map.get(b, (0, 0))[1]),
             float(now - t0), float(now))
            for b in g
        ]
        spark.createDataFrame(
            rows,
            "bucket int, rows long, input_fingerprint long, "
            "elapsed_sec double, ts double",
        ).write.mode("append").parquet(lineage_dir)
    # Every bucket-filtered write is PARTIAL, so none of them may seed the
    # lengths sidecar (tiers._merge_meta_or_invalidate create=False — an
    # under-covering sidecar would break exports).  Here, once ALL groups
    # have committed, the table IS fully covered: seed the sidecar from
    # one column-pruned distinct scan if it is still missing, so the
    # checkpointed build path keeps the no-probe export optimization.
    if todo:
        import os

        from .tiers import _META_FILE, write_table_meta

        if not os.path.exists(os.path.join(out_dir, _META_FILE)):
            write_table_meta(spark, out_dir)
    return {
        "processed_buckets": len(todo),
        "skipped_buckets": skipped,
        "seconds": time.time() - t0,
    }
