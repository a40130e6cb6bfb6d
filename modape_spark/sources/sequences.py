"""Distributed source for the synthetic ``sequences`` table.

Spark analogue of the reference's granule ingest (modis_collect,
/root/reference/modape/modis/collect.py) with the driver-synthesized input
mandated by BASELINE.json: each ``spark.range`` partition generates its own
rows via the stateless hash in fixtures.py, so the table is identical for
any partition count — generation is embarrassingly parallel, shuffle-free,
and reproducible (the property the resume/oracle tests rely on).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..fixtures import gen_tokens_block, local_sequences, row_lengths, row_sources

SEQUENCES_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def _gen_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids = pdf["id"].to_numpy(dtype=np.int64)
        lens = row_lengths(ids)
        srcs = row_sources(ids)
        tokens = np.empty(ids.size, dtype=object)
        for n in np.unique(lens):
            sel = np.where(lens == n)[0]
            block = gen_tokens_block(ids[sel], int(n))
            for j, r in enumerate(sel):
                tokens[r] = block[j]
        yield pd.DataFrame(
            {
                "doc_id": [f"doc{i:012d}" for i in ids],
                "tokens": tokens,
                "n_tok": lens,
                "source": srcs,
            }
        )


def sequences_df(
    spark: SparkSession,
    n_rows: int,
    partitions: int | None = None,
    start: int = 0,
) -> DataFrame:
    """Synthesize the sequences table as a distributed DataFrame."""
    if partitions is None:
        cores = spark.sparkContext.defaultParallelism
        # ~3 task waves per core slot keep the straggler tail short while
        # tasks stay >= ~1024 rows — fewer, fuller tasks beat many small
        # ones here (measured 8.0 s vs 10.7 s at 25k rows: per-task python
        # feed overhead outweighs the extra parallelism)
        partitions = max(1, min(3 * cores, max(n_rows // 1024, 1)))
    rng = spark.range(start, start + n_rows, 1, partitions)
    return rng.mapInPandas(_gen_partition, SEQUENCES_SCHEMA)


def sequences_local_pandas(n_rows: int, start: int = 0) -> pd.DataFrame:
    """Driver-side identical copy, for oracle comparisons in tests."""
    cols = local_sequences(n_rows, start)
    return pd.DataFrame(cols)
