"""Training-data-pipeline operators over the driver tables.

Each module exposes ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL on the same
parquet views).  __spark_entry__.py aggregates them.
"""

from . import (  # noqa: F401
    decontaminate,
    dedup,
    granules,
    multimodal,
    relational,
    sampling,
    similarity,
    text,
)

_MODULES = (text, dedup, similarity, relational, multimodal, granules,
            sampling, decontaminate)


def all_queries():
    out = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def all_oracles():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
