"""Structured Streaming surface: the suffix-batch pipeline running under a
real ``readStream`` -> ``foreachBatch`` -> ``Trigger.AvailableNow`` query.

The engine's production incremental mode is the batch driver
(streaming/incremental_batch.py — the reference's contract is incremental
batch, SURVEY §2.8); this test proves the same pipeline drops into Spark
Structured Streaming unchanged when a continuous source exists.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modape_spark.incremental import dedup_batches
from modape_spark.sources.sequences import sequences_df

BATCH_SCHEMA = ("doc_id string, batch_id string, proc_ts long, "
                "tokens_suffix array<int>, start_offset int")


def test_streaming_available_now_drain(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    raw = sequences_df(spark, 20).filter(F.col("n_tok") >= 64) \
        .withColumn("tokens", F.slice("tokens", 1, 20)) \
        .withColumn("n_tok", F.lit(20).cast("int"))
    rows = raw.select("doc_id").collect()
    # two micro-batch files, second supersedes the first (higher proc_ts)
    spark.createDataFrame(
        [(r["doc_id"], "b1", 1, [100, 101], 20) for r in rows], BATCH_SCHEMA
    ).write.parquet(landing)
    spark.createDataFrame(
        [(r["doc_id"], "b2", 2, [200, 201], 20) for r in rows], BATCH_SCHEMA
    ).write.mode("append").parquet(landing)

    stream = (
        spark.readStream.schema(BATCH_SCHEMA).parquet(landing)
    )

    def handle(batch_df, batch_id):
        # the exact batch pipeline: dedup-by-latest then persist winners
        dedup_batches(batch_df).write.mode("append").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    n_docs = raw.count()
    # latest proc_ts wins within the drained batch set
    winners = dedup_batches(got)
    assert winners.count() == n_docs
    assert set(r["batch_id"] for r in
               winners.select("batch_id").distinct().collect()) == {"b2"}

    # second AvailableNow run drains nothing new (checkpointed offsets)
    q2 = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == got.count()
