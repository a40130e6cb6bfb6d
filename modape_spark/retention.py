"""Retention enforcement for the raw tier (the north rule's "retention
engine" leg): once history is materialized into the smoothed/dekad/pentad
tiers, the raw table no longer needs full token history — only the
trailing window the incremental forward contract reads.

``retention_trim`` rewrites each sequence to its last ``keep_tail``
tokens while ``n_tok`` KEEPS the logical series length — the date-axis
identity everything else is derived from (grids.py maps position k of an
n_tok-long series to a julian date, so the logical length must survive
the trim).  The kernel core accepts the (physical suffix, logical
length) pair natively (tiers._rollup_core) and refuses any non-windowed
smooth over a trimmed row, so a trimmed table can never silently produce
a wrong full-history smooth.

Invariant (tests/test_retention.py + the ``retention_forward`` driver
entry): an append + windowed forward rollup over the TRIMMED table is
bit-identical to the same run over the FULL table whenever
``keep_tail >= nsmooth`` — the reference's own forward semantics
(smooth.py:305,336-352) read exactly the trailing nsmooth points.

Scale shape: the trim is a pure per-row projection (no shuffle, no UDF);
on the bucketed catalog layout it rewrites buckets in place exactly like
any other copy-on-write maintenance pass.  At 10^12 sequences with
n_tok 742 and keep_tail 64, the raw tier shrinks ~11x while remaining
fully update-capable; complete history stays reconstructable from the
smoothed tier + its delta-of-delta payloads (compression.py).

The reference has no retention analogue (HDF5 cubes keep all raw
history); this operator is engine-added per the north rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["retention_trim", "retention_stats"]


def retention_trim(raw_df: DataFrame, keep_tail: int) -> DataFrame:
    """Project each sequence to its trailing ``keep_tail`` tokens.

    ``n_tok`` is preserved as the LOGICAL length; rows already at or
    below ``keep_tail`` are untouched.  ``keep_tail`` must cover the
    forward window (callers assert keep_tail >= their nsmooth).
    """
    keep = int(keep_tail)
    if keep <= 0:
        raise ValueError(f"keep_tail must be positive, got {keep_tail}")
    return raw_df.withColumn(
        "tokens",
        F.when(
            F.col("n_tok") > keep,
            F.expr(f"slice(tokens, n_tok - {keep} + 1, {keep})"),
        ).otherwise(F.col("tokens")),
    )


def retention_stats(raw_df: DataFrame, keep_tail: int) -> DataFrame:
    """Per-source retention accounting for a trim at ``keep_tail``:
    docs, logical points, physically kept points, trimmed points.
    One map-side-combined aggregation; integer-exact."""
    keep = int(keep_tail)
    return (
        raw_df.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_tok").cast("long")).alias("raw_points"),
            F.sum(F.least(F.col("n_tok"), F.lit(keep)).cast("long"))
            .alias("kept_points"),
            F.sum(F.greatest(F.col("n_tok") - keep, F.lit(0)).cast("long"))
            .alias("trimmed_points"),
        )
        .orderBy("source")
    )
