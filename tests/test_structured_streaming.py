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


def test_watermarked_tumbling_window_drops_late(spark, tmp_path):
    """Streaming A5/ST6: watermark + tumbling window; a row arriving
    beyond the watermark after its window finalized is dropped
    (collect.py:362-370 reject-late, streaming form)."""
    import datetime as dt

    from modape_spark.streaming.stateful import (
        EVENTS_SCHEMA,
        run_available_now,
        windowed_event_counts,
    )

    landing = str(tmp_path / "landing")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    base = dt.datetime(2024, 1, 1)

    def rows(*specs):
        return spark.createDataFrame(
            [(i, base + dt.timedelta(hours=h), 1, et, 1.0)
             for i, (h, et) in enumerate(specs)], EVENTS_SCHEMA)

    # batch 1: two windows' worth + an event far ahead (advances watermark)
    rows((0, "click"), (1, "click"), (7, "view"), (30, "tick")) \
        .write.mode("append").parquet(landing)
    run_available_now(windowed_event_counts(spark, landing), sink, ckpt)
    # batch 2: a LATE click for the long-finalized first window
    rows((2, "click")).write.mode("append").parquet(landing)
    run_available_now(windowed_event_counts(spark, landing), sink, ckpt)

    got = {(r["window_start"].hour, r["event_type"]): r["n"]
           for r in spark.read.parquet(sink).collect()}
    # first window finalized with 2 clicks; the late third click dropped
    assert got[(0, "click")] == 2
    assert got[(6, "view")] == 1
    assert (0, "tick") not in got


def test_stateful_source_ledger_across_microbatches(spark, tmp_path):
    """W4/ST4 as applyInPandasWithState: the per-source ledger carries
    state across micro-batches (second drain resumes from the state
    store, not from zero)."""
    from modape_spark.streaming.stateful import (
        BATCHES_SCHEMA,
        run_available_now,
        source_watermark_ledger,
    )

    landing = str(tmp_path / "landing")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [("d1", "web", 0, 100, 1), ("d2", "web", 0, 40, 1),
         ("d3", "lab", 0, 10, 1)], BATCHES_SCHEMA) \
        .write.mode("append").parquet(landing)
    run_available_now(source_watermark_ledger(spark, landing), sink, ckpt,
                      output_mode="update")
    spark.createDataFrame(
        [("d1", "web", 100, 7, 2)], BATCHES_SCHEMA) \
        .write.mode("append").parquet(landing)
    run_available_now(source_watermark_ledger(spark, landing), sink, ckpt,
                      output_mode="update")

    rows = spark.read.parquet(sink).collect()
    latest = {}
    for r in rows:  # last emission per source wins (update mode)
        if r["source"] not in latest or r["n_batches"] > latest[r["source"]]["n_batches"]:
            latest[r["source"]] = r
    web = latest["web"]
    assert web["max_position"] == 107      # 100 + 7, carried across drains
    assert web["n_batches"] == 3
    assert web["n_points"] == 147
    assert latest["lab"]["max_position"] == 10


def test_update_sink_idempotent_under_replay(spark, tmp_path):
    """ST4: replaying a micro-batch (retry after a mid-commit failure)
    must not duplicate ledger rows — the batch-id directory is
    overwritten, not appended."""
    from modape_spark.streaming.stateful import idempotent_batch_writer

    sink = str(tmp_path / "sink")
    write = idempotent_batch_writer(sink)
    ledger = spark.createDataFrame(
        [("web", 107, 3, 147), ("lab", 10, 1, 10)],
        "source string, max_position int, n_batches long, n_points long")
    write(ledger, 0)
    write(ledger, 0)          # replay of the SAME micro-batch
    write(ledger.limit(1), 1)  # a later batch lands separately
    got = spark.read.parquet(sink)
    assert got.count() == 3   # 2 (batch 0, once) + 1 (batch 1)
    assert got.filter("batch_id = 0").count() == 2


def test_streaming_exact_dedup_bounded_state(spark, tmp_path):
    """Re-delivered documents are dropped by content hash across
    micro-batch files; distinct texts all survive exactly once."""
    import datetime as dt

    from modape_spark.streaming.stateful import (
        DOCS_STREAM_SCHEMA,
        run_available_now,
        streaming_exact_dedup,
    )

    landing = str(tmp_path / "docs_landing")
    out_dir = str(tmp_path / "docs_out")
    ckpt = str(tmp_path / "docs_ckpt")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    rows1 = [(f"d{i}", t0, "web", f"unique text number {i}") for i in range(6)]
    rows1.append(("d0_dup", t0, "mirror", "unique text number 0"))  # in-batch dup
    spark.createDataFrame(rows1, DOCS_STREAM_SCHEMA).write.parquet(landing)
    # second file: one re-delivery of d3's text, two fresh docs
    rows2 = [("d3_dup", t0 + dt.timedelta(minutes=5), "mirror",
              "unique text number 3"),
             ("d6", t0 + dt.timedelta(minutes=5), "web", "unique text number 6"),
             ("d7", t0 + dt.timedelta(minutes=6), "web", "unique text number 7")]
    spark.createDataFrame(rows2, DOCS_STREAM_SCHEMA).write.mode("append") \
        .parquet(landing)

    # one file per micro-batch: the re-delivery in file 2 must be dropped
    # by STATE carried from file 1's batch, not by in-batch dedup
    stream = streaming_exact_dedup(spark, landing,
                                   reader_options={"maxFilesPerTrigger": "1"})
    run_available_now(stream, out_dir, ckpt)

    got = spark.read.parquet(out_dir)
    texts = [r["text"] for r in got.collect()]
    assert sorted(texts) == sorted(f"unique text number {i}" for i in range(8))
    # cross-batch: the first delivery wins (state store), deterministic
    ids = {r["text"]: r["doc_id"] for r in got.collect()}
    assert ids["unique text number 3"] == "d3"
    assert ids["unique text number 0"] in ("d0", "d0_dup")  # in-batch tie


def test_restart_resume_matches_uninterrupted(spark, tmp_path):
    """ST4 crash-recovery: a query KILLED mid-stream (foreachBatch raises
    during the second micro-batch, before its commit) and restarted
    against the same checkpoint must replay the uncommitted batch from
    the committed state-store version and finish with a ledger identical
    to an uninterrupted run — extends the replay test from batch retries
    to full query restarts."""
    from pyspark.errors import StreamingQueryException

    from modape_spark.streaming.stateful import (
        BATCHES_SCHEMA,
        idempotent_batch_writer,
        run_available_now,
        source_watermark_ledger,
    )

    landing = str(tmp_path / "landing")
    # three files -> three micro-batches under maxFilesPerTrigger=1
    spark.createDataFrame(
        [("d1", "web", 0, 100, 1), ("d3", "lab", 0, 10, 1)],
        BATCHES_SCHEMA).coalesce(1).write.mode("append").parquet(landing)
    spark.createDataFrame(
        [("d2", "web", 100, 40, 2)],
        BATCHES_SCHEMA).coalesce(1).write.mode("append").parquet(landing)
    spark.createDataFrame(
        [("d4", "web", 140, 7, 3), ("d5", "lab", 10, 5, 3)],
        BATCHES_SCHEMA).coalesce(1).write.mode("append").parquet(landing)

    def final_ledger(sink_dir):
        rows = spark.read.parquet(sink_dir).collect()
        latest = {}
        for r in rows:  # update mode: highest n_batches per source wins
            if (r["source"] not in latest
                    or r["n_batches"] > latest[r["source"]]["n_batches"]):
                latest[r["source"]] = r
        return {s: (r["max_position"], r["n_batches"], r["n_points"])
                for s, r in latest.items()}

    opts = {"maxFilesPerTrigger": "1"}
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    inner = idempotent_batch_writer(sink)
    armed = {"on": True}

    def crashing(df, bid):
        if bid >= 1 and armed["on"]:
            armed["on"] = False
            raise RuntimeError("injected crash before batch commit")
        inner(df, bid)

    def start(writer):
        return (source_watermark_ledger(spark, landing, opts)
                .writeStream.outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .foreachBatch(writer).start())

    q = start(crashing)
    with pytest.raises(StreamingQueryException):
        q.awaitTermination()
    q2 = start(inner)          # same checkpoint: resumes at the failed batch
    q2.awaitTermination(120)

    # uninterrupted control run with its own sink + checkpoint
    sink2, ckpt2 = str(tmp_path / "sink2"), str(tmp_path / "ckpt2")
    run_available_now(source_watermark_ledger(spark, landing, opts),
                      sink2, ckpt2, output_mode="update")

    got, want = final_ledger(sink), final_ledger(sink2)
    assert got == want
    assert got["web"] == (147, 3, 147)
    assert got["lab"] == (15, 2, 15)
