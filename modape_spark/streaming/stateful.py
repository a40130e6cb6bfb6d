"""Structured Streaming operators for the incremental contract.

Two first-class streaming shapes the reference's update loop maps onto
(SURVEY §2.8), expressed with real ``readStream`` plans:

- ``windowed_event_counts``: watermark + calendar tumbling window over a
  landing directory — the streaming analogue of the dekad/pentad
  composite (A5/ST6).  Late rows beyond the watermark are DROPPED, the
  streaming mirror of the reference's reject-late collect
  (collect.py:362-370).
- ``source_watermark_ledger``: custom stateful operator via
  ``applyInPandasWithState`` maintaining the per-source ingest ledger
  (W4 last_collected: running max position + row count) across
  micro-batches — the state the reference keeps in its HDF5 attributes
  (smooth.py:522-546), here as exactly-once streaming state.

Both run with ``Trigger.AvailableNow`` in tests (drain-everything then
stop), which is also the production backfill mode.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"

BATCHES_SCHEMA = ("doc_id string, source string, start_offset int, "
                  "n_points int, proc_ts long")

LEDGER_SCHEMA = "source string, max_position int, n_batches long, n_points long"
_LEDGER_STATE_SCHEMA = "max_position int, n_batches long, n_points long"


def windowed_event_counts(spark: SparkSession, landing_dir: str,
                          window: str = "6 hours",
                          watermark: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window counts over a streaming source.

    Append output mode: a window is emitted once, when the watermark
    passes its end — late rows beyond the watermark never perturb an
    already-finalized window (ST1 reject-late, streaming form)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA).parquet(landing_dir)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n", "sum_value")
    )


def _ledger_update(key: tuple, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    (source,) = key
    if state.exists:
        max_pos, n_batches, n_points = state.get
    else:
        max_pos, n_batches, n_points = -1, 0, 0
    for pdf in pdfs:
        ends = pdf["start_offset"].to_numpy() + pdf["n_points"].to_numpy()
        if len(ends):
            max_pos = max(int(max_pos), int(ends.max()))
        n_batches += len(pdf)
        n_points += int(pdf["n_points"].sum())
    state.update((int(max_pos), int(n_batches), int(n_points)))
    yield pd.DataFrame({"source": [source], "max_position": [int(max_pos)],
                        "n_batches": [int(n_batches)],
                        "n_points": [int(n_points)]})


def source_watermark_ledger(spark: SparkSession, landing_dir: str,
                            reader_options: dict | None = None) -> DataFrame:
    """Per-source ingest ledger as a custom stateful streaming operator.

    State = (max stored position, batch count, point count) per source,
    carried across micro-batches by the state store; each micro-batch
    emits the refreshed ledger row for the sources it touched."""
    reader = spark.readStream.schema(BATCHES_SCHEMA)
    for k, v in (reader_options or {}).items():
        reader = reader.option(k, v)
    return (
        reader.parquet(landing_dir)
        .groupBy("source")
        .applyInPandasWithState(
            _ledger_update,
            outputStructType=LEDGER_SCHEMA,
            stateStructType=_LEDGER_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


DOCS_STREAM_SCHEMA = ("doc_id string, ts timestamp, source string, "
                      "text string")


def streaming_exact_dedup(spark: SparkSession, landing_dir: str,
                          watermark: str = "1 hour",
                          reader_options: dict | None = None) -> DataFrame:
    """Streaming ingest dedup — the training-data pipeline's first gate,
    as the streaming mirror of docs_exact_dedup (operators/dedup.py).

    Re-delivered documents (crawler retries, at-least-once upstream
    queues) are dropped by content hash via
    ``dropDuplicatesWithinWatermark``: the dedup state store keeps one
    entry per hash and EVICTS entries older than the watermark, so state
    is bounded by the ingest rate x horizon, not by corpus size — the
    property that lets this run forever at 100 TB/day.  Exact dedup
    only; near-dup (MinHash/SimHash) stays a batch compaction pass over
    the landed table, where the bucketed self-joins are cheap."""
    reader = spark.readStream.schema(DOCS_STREAM_SCHEMA)
    for k, v in (reader_options or {}).items():
        reader = reader.option(k, v)
    return (
        reader.parquet(landing_dir)
        .withColumn("content_hash", F.xxhash64("text"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
        .drop("content_hash")  # dedup key only — keep the landed schema clean
    )


def idempotent_batch_writer(sink_dir: str):
    """foreachBatch sink that is exactly-once under micro-batch RETRIES:
    each micro-batch overwrites its own ``batch_id=<epoch>`` directory, so
    a replayed batch (executor loss, query restart mid-commit) replaces
    its previous — possibly partial — output instead of appending
    duplicate ledger rows.  Plain ``mode("append")`` here was only
    at-least-once (VERDICT r02); the reference's guard semantics
    (smooth.py:522-546 last_collected checks) are effectively exactly-once
    and this is the streaming-sink mirror of them.  Readers see the batch
    id as a partition column of ``sink_dir``."""
    def _write(df: DataFrame, bid: int) -> None:
        df.write.mode("overwrite").parquet(f"{sink_dir}/batch_id={bid}")
    return _write


def run_available_now(stream_df: DataFrame, sink_dir: str,
                      checkpoint: str, output_mode: str = "append") -> None:
    """Drain everything currently in the source, then stop (the backfill
    trigger; tests use it as the deterministic streaming harness)."""
    w = (stream_df.writeStream.outputMode(output_mode)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True))
    if output_mode == "append":
        q = w.format("parquet").option("path", sink_dir).start()
    else:
        # parquet sink is append-only: land update-mode micro-batch output
        # through foreachBatch, one overwritten directory per batch id
        q = w.foreachBatch(idempotent_batch_writer(sink_dir)).start()
    q.awaitTermination()
