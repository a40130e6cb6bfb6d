"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship: full multi-tier Whittaker rollup at sf0.001.
queries()     -> every implemented operator from SURVEY.md §2 + the
                 training-data-pipeline suite (dedup/similarity/text/
                 multimodal/relational).
oracle_sql()  -> DuckDB ANSI SQL oracles for every SQL-expressible query;
                 the Whittaker tier queries are sequential banded-solver
                 kernels (not SQL-expressible) and carry rows-only checks —
                 their hard gate is tests/ (scalar-order oracle + exact
                 Spark-vs-local equality).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: materialize all retention tiers (smoothed/dekad/pentad) for
    the synthetic sequences table at sf0.001 and return per-row tier
    checksums."""
    from modape_spark import entry_queries

    return entry_queries.q_tier_dekad(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from modape_spark import entry_queries
    from modape_spark.operators import all_queries

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(entry_queries.QUERIES)
    out.update(all_queries())
    return out


def oracle_sql() -> dict[str, str]:
    from modape_spark import entry_queries
    from modape_spark.operators import all_oracles

    out: dict[str, str] = {}
    out.update(entry_queries.ORACLES)
    out.update(all_oracles())
    return out
