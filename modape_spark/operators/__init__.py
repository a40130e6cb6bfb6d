"""Training-data-pipeline operators over the driver tables.

Each module exposes ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL on the same
parquet views).  __spark_entry__.py aggregates them.
"""

from . import dedup, granules, multimodal, relational, similarity, text  # noqa: F401


def all_queries():
    out = {}
    for m in (text, dedup, similarity, relational, multimodal, granules):
        out.update(m.QUERIES)
    return out


def all_oracles():
    out = {}
    for m in (text, dedup, similarity, relational, multimodal, granules):
        out.update(m.ORACLES)
    return out
