"""Thin table catalog: Iceberg when available, parquet-directory fallback.

SURVEY §1 maps the reference's HDF5 datacubes onto Iceberg tables; this
sandbox image ships no Iceberg runtime jar, so the catalog detects the
Iceberg SparkCatalog at runtime and otherwise provides the same contract on
parquet directories:

- ``upsert``: MERGE INTO on Iceberg; on parquet, an idempotent
  copy-on-write rewrite of the affected bucket partitions (the same
  granularity Iceberg's copy-on-write MERGE rewrites).
- ``append``: plain append either way.
- bucket layout (pmod(xxhash64(doc_id), N)) is the partition spec in both
  backends, so state joins stay co-located and resume pruning works
  unchanged.

Iceberg jar requirement: the MERGE branch needs
``org.apache.iceberg:iceberg-spark-runtime-4.0_2.13`` on the classpath and
a catalog conf such as ``spark.sql.catalog.ice=org.apache.iceberg.spark.
SparkCatalog``.  This sandbox ships no such jar, so the MERGE statement is
validated by Spark's SQL parser in tests (tests/test_catalog.py) rather
than executed; the parquet path provides the executed coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tiers import (_invalidate_meta, _merge_meta_or_invalidate,
                    _observe_lengths, with_bucket)

__all__ = ["TableCatalog", "merge_upsert_sql"]


def merge_upsert_sql(target: str, source_view: str, key: str,
                     columns: list[str]) -> str:
    """The Iceberg MERGE INTO text for an upsert: matched rows replaced
    column-by-column, unmatched inserted.  Pure function so the generated
    SQL is unit-testable without an Iceberg runtime."""
    sets = ", ".join(f"{c} = s.{c}" for c in columns if c != key)
    return (
        f"MERGE INTO {target} t\n"
        f"USING {source_view} s ON t.{key} = s.{key}\n"
        f"WHEN MATCHED THEN UPDATE SET {sets}\n"
        f"WHEN NOT MATCHED THEN INSERT *"
    )


class TableCatalog:
    def __init__(self, spark: SparkSession, base: str, n_buckets: int = 32):
        self.spark = spark
        self.base = base.rstrip("/")
        self.n_buckets = n_buckets
        self.iceberg_catalog = self._detect_iceberg()

    def _detect_iceberg(self) -> str | None:
        """Name of a configured Iceberg catalog, or None."""
        try:
            confs = self.spark.sparkContext.getConf().getAll()
        except Exception:
            return None
        for k, v in confs:
            if k.startswith("spark.sql.catalog.") and "iceberg" in v.lower():
                return k.split(".", 3)[3]
        return None

    # -- identity ---------------------------------------------------------
    def path(self, name: str) -> str:
        if self.iceberg_catalog:
            return f"{self.iceberg_catalog}.modape.{name}"
        return f"{self.base}/{name}"

    def read(self, name: str) -> DataFrame:
        if self.iceberg_catalog:
            return self.spark.read.format("iceberg").load(self.path(name))
        return self.spark.read.parquet(self.path(name))

    # -- writes -----------------------------------------------------------
    def _observe_write(self, df: DataFrame, create: bool = True):
        """Sidecar maintenance for parquet-path writes: tier-shaped
        tables (those with an n_tok column) keep their lengths sidecar
        current via the write job's own observation; any other failure
        mode deletes the sidecar (missing => the exports' exact distinct
        probe; STALE is the only state that could drop rows, and the
        export guard would then raise).  Returns (df, after_write).

        ``create=False`` for PARTIAL writes (append/upsert): a sidecar is
        only merged when one already exists.  Seeding one from a partial
        batch on a table that predates the sidecar feature would list
        only the batch's lengths and fail every export of a pre-existing
        length (ADVICE r5 #1); absent, readers keep the exact
        distinct-probe fallback."""
        if "n_tok" not in df.columns:
            return df, _invalidate_meta
        df, obs = _observe_lengths(df)
        return df, lambda d: _merge_meta_or_invalidate(d, obs, create=create)

    def create(self, name: str, df: DataFrame) -> None:
        df = with_bucket(df, self.n_buckets)
        if self.iceberg_catalog:
            df.writeTo(self.path(name)).partitionedBy(F.col("bucket")) \
                .createOrReplace()
        else:
            # create replaces the table: any old sidecar is for the OLD
            # data — drop it first, then merge the observed lengths in
            _invalidate_meta(self.path(name))
            df, after = self._observe_write(df)
            df.repartition(self.n_buckets, F.col("bucket")) \
                .write.mode("overwrite").partitionBy("bucket") \
                .parquet(self.path(name))
            after(self.path(name))

    def append(self, name: str, df: DataFrame) -> None:
        df = with_bucket(df, self.n_buckets)
        if self.iceberg_catalog:
            df.writeTo(self.path(name)).append()
        else:
            df, after = self._observe_write(df, create=False)
            df.repartition(self.n_buckets, F.col("bucket")) \
                .write.mode("append").partitionBy("bucket") \
                .parquet(self.path(name))
            after(self.path(name))

    def upsert(self, name: str, updates: DataFrame, key: str = "doc_id") -> None:
        """MERGE INTO semantics: rows matching on ``key`` are replaced,
        new rows inserted.

        Iceberg: a real MERGE INTO.  Parquet: copy-on-write rewrite of only
        the bucket partitions that contain updates (dynamic partition
        overwrite), exactly the file-granularity Iceberg's CoW MERGE would
        rewrite.
        """
        updates = with_bucket(updates, self.n_buckets)
        if self.iceberg_catalog:
            updates.createOrReplaceTempView("_modape_updates")
            self.spark.sql(merge_upsert_sql(
                self.path(name), "_modape_updates", key, updates.columns))
            return
        target = self.read(name)
        touched = [r["bucket"] for r in
                   updates.select("bucket").distinct().collect()]
        existing = target.filter(F.col("bucket").isin(touched))
        keep = existing.join(updates.select(key), key, "left_anti")
        merged = keep.unionByName(updates.select(keep.columns))
        merged, after = self._observe_write(merged, create=False)
        # per-write dynamic overwrite: only touched buckets are replaced
        merged.repartition(len(touched), F.col("bucket")) \
            .write.mode("overwrite") \
            .option("partitionOverwriteMode", "dynamic") \
            .partitionBy("bucket").parquet(self.path(name))
        after(self.path(name))
