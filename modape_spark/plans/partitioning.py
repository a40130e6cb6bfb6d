"""Physical-plan levers: salting, skew-safe aggregation, pushdown checks.

north_rule: "partitioning / shuffle / skew handled explicitly".  The
sequences table's `source` column is Zipf-skewed by construction (one key
holds ~50% of rows, fixtures.py) — any shuffle keyed by it alone creates a
straggler task at cluster scale.  Remedies, in preference order:

1. Don't shuffle: the rollup hot path is mapInArrow (row-local) and never
   keys by source.
2. Two-phase (salted) aggregation for metric rollups keyed by a hot column:
   partial agg on (key, salt) then final agg on key — the classic map-side
   combine made explicit when the aggregate isn't algebraic for Catalyst.
3. AQE skew-join splitting (enabled in session.py) as the runtime backstop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(df: DataFrame, key: str, num_partitions: int,
                       salt_buckets: int = 16) -> DataFrame:
    """Repartition by (key, salt) so a hot key spreads over salt_buckets
    partitions.  Salt is a deterministic row hash, not a random number, so
    re-runs are stable (lineage/resume contract)."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[c for c in df.columns if c != key]),
                        F.lit(salt_buckets)).cast("int")
    )
    return salted.repartition(num_partitions, F.col(key), F.col("_salt")).drop("_salt")


def skewed_group_agg(df: DataFrame, key: str, aggs: list, salt_buckets: int = 16,
                     partial_aggs: list | None = None) -> DataFrame:
    """Two-phase aggregation over a skewed key.

    ``partial_aggs``/``aggs`` are (expr, alias) stages; for algebraic
    aggregates (sum/count/min/max) pass the partial stage and the merge
    stage.  Example:

        skewed_group_agg(df, "source",
            partial_aggs=[(F.count("*"), "cnt"), (F.sum("n_tok"), "toks")],
            aggs=[(F.sum("cnt"), "rows"), (F.sum("toks"), "total_tokens")])
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64("doc_id") if "doc_id" in df.columns
                        else F.monotonically_increasing_id(),
                        F.lit(salt_buckets)).cast("int")
    )
    partial = salted.groupBy(key, "_salt").agg(
        *[e.alias(a) for e, a in (partial_aggs or aggs)]
    )
    return partial.groupBy(key).agg(*[e.alias(a) for e, a in aggs])


def ordered_result(df: DataFrame, *cols: str) -> DataFrame:
    """Globally ordered driver-check projection WITHOUT the range-sampling
    pass.  ``orderBy`` plans a RangePartitioning exchange whose partitioner
    SAMPLES the sort key by executing the whole child plan once more —
    when the child is an unmaterialized kernel pipeline (mapInArrow, no
    exchange below the Sort) that is a full second kernel pass (measured:
    48 vs 24 gen+kernel tasks, 2.4x wall on tier_fixed_lambda at sf0.1).
    A single-partition shuffle of the NARROW result rows plus an
    in-partition sort yields the identical global order with the pipeline
    executed exactly once.

    Only for driver-collected check projections (compact checksum rows,
    ~row-count x few columns): the final sort is one task over the small
    result, while the avoided sampling pass scales with the FULL kernel
    cost.  Production tier writes never collect ordered output."""
    return df.repartition(1).sortWithinPartitions(*cols)


def explain_scan_pushdown(df: DataFrame) -> str:
    """Formatted plan text, for asserting PushedFilters/ReadSchema in tests
    and for plan review during development."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )
