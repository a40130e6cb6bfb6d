"""Tier/kernel queries for the driver contract (__spark_entry__.py).

These run the Whittaker rollup engine on the deterministic synthetic
sequences table (fixtures.py), sized by the sf of the given data dir.  The
kernels are not SQL-expressible (sequential banded recurrences), so these
entries carry no oracle_sql — the driver records rows-only checks; the
hard correctness gate for the kernels lives in tests/ (scalar-order oracle,
exact tier equality, reference-count grids).

Outputs are compact, deterministic projections (checksums + heads), stable
across partitioning and parallelism.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .compression import decode_dod
from .constants import STRES_DEKAD, STRES_PENTAD
from .fixtures import n_rows_for_sf
from .incremental import append_suffixes, incremental_rollup
from .rollup import CFG_ALL, CFG_FIXED, CFG_SMOOTH, SmoothConfig
from .sources.sequences import sequences_df
from .tiers import rollup_dataframe


# -- session-lifetime resource tracking -------------------------------------
# Entry queries return LAZY DataFrames the driver collects later, so
# (a) persist()ed inputs cannot be unpersisted inside the query that made
# them — they are released at the START of the next entry query instead
# (by then the previous result has been materialized; and even if not,
# unpersist only costs recompute, never correctness), and
# (b) temp directories a returned DataFrame reads from live until
# interpreter exit (deleting them would break the lazy read).
_CACHED: list = []
_TMP_DIRS: list = []

import atexit as _atexit  # noqa: E402
import shutil as _shutil  # noqa: E402

_atexit.register(lambda: [_shutil.rmtree(d, ignore_errors=True)
                          for d in _TMP_DIRS])


def _track_cache(df: DataFrame) -> DataFrame:
    _CACHED.append(df.persist())
    return df


def _release_caches() -> None:
    while _CACHED:
        try:
            _CACHED.pop().unpersist()
        except Exception:
            pass


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.01


def _raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sequences_df(spark, n_rows_for_sf(sf_of(sf_dir)))


def _checksum(col: str) -> F.Column:
    return F.expr(f"aggregate({col}, 0L, (acc, v) -> acc + v)")


def q_tier_smoothed(spark: SparkSession, sf_dir: str) -> DataFrame:
    rolled = rollup_dataframe(_raw(spark, sf_dir), CFG_SMOOTH)
    return rolled.select(
        "doc_id", "source", "n_tok", "covered",
        F.round(F.col("sopt_log10").cast("double"), 4).alias("sopt_log10_r"),
        _checksum("smoothed").alias("smoothed_sum"),
        F.element_at("smoothed", 1).alias("first_val"),
        F.element_at("smoothed", -1).alias("last_val"),
    ).orderBy("doc_id")


def q_tier_dekad(spark: SparkSession, sf_dir: str) -> DataFrame:
    rolled = rollup_dataframe(_raw(spark, sf_dir), CFG_ALL)
    return rolled.select(
        "doc_id", "n_tok", "covered",
        F.size("dekad").alias("n_points"),
        _checksum("dekad").alias("dekad_sum"),
        F.element_at("dekad", -1).alias("last_val"),
    ).orderBy("doc_id")


def q_tier_pentad(spark: SparkSession, sf_dir: str) -> DataFrame:
    rolled = rollup_dataframe(_raw(spark, sf_dir), CFG_ALL)
    return rolled.select(
        "doc_id", "n_tok", "covered",
        F.size("pentad").alias("n_points"),
        _checksum("pentad").alias("pentad_sum"),
        F.element_at("pentad", -1).alias("last_val"),
    ).orderBy("doc_id")


def q_tier_fixed_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed lambda=10 smoothing (the golden-test configuration,
    /root/reference/tests/test_whittaker.py:37)."""
    rolled = rollup_dataframe(_raw(spark, sf_dir), CFG_FIXED)
    return rolled.select(
        "doc_id", "covered",
        _checksum("smoothed").alias("smoothed_sum"),
        _checksum("dekad").alias("dekad_sum"),
    ).orderBy("doc_id")


_RT_SCHEMA = "doc_id string, ok int, raw_bytes long, dod_bytes long"


def _roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # deliberately the PURE-PYTHON decoder (not the batched C reader):
    # the payloads were written by the C encoder, so an independent
    # implementation closes the loop — a shared C bug cannot self-verify.
    # 2% sample; throughput is irrelevant here.
    for pdf in batches:
        oks, rb, db = [], [], []
        for sm, blob in zip(pdf["smoothed"], pdf["smoothed_dod"]):
            arr = np.asarray(sm, dtype=np.int64)
            dec = decode_dod(bytes(blob))
            oks.append(int(np.array_equal(dec, arr)))
            rb.append(arr.size * 4)
            db.append(len(blob))
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "ok": oks, "raw_bytes": rb, "dod_bytes": db}
        )


def q_compress_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode(encode(x)) == x on a deterministic 2% sample (north_rule
    token-array equality); also reports the compression ratio."""
    raw = _raw(spark, sf_dir).filter(F.pmod(F.xxhash64("doc_id"), F.lit(50)) == 0)
    rolled = rollup_dataframe(raw, CFG_SMOOTH)
    rt = rolled.select("doc_id", "smoothed", "smoothed_dod").mapInPandas(
        _roundtrip, _RT_SCHEMA
    )
    return rt.agg(
        F.count("*").alias("n_rows"),
        F.sum("ok").alias("n_exact"),
        F.sum("raw_bytes").alias("raw_bytes"),
        F.sum("dod_bytes").alias("dod_bytes"),
    )


def q_incremental_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2E forward step (tests/test_cli.py:646-658 shape): split the last 2
    tokens off as an update batch, append, run nsmooth=16/nupdate=1.

    The synthetic source is PERSISTED before the split: append validation
    (one agg + one batch count, incremental.py:99-109) plus the final
    kernel pass are three actions over the same lineage, and without the
    cache each one regenerated the tokens from scratch (mapInPandas
    source) — measured 22.1 s vs 7.0 s at sf0.1/4 in the round-2 driver
    bench.  On a real deployment the source is a stored table and this is
    a non-issue; the cache is the local-synthesis analogue of that table.
    """
    _release_caches()
    full = _track_cache(_raw(spark, sf_dir))
    full.count()  # eager: validate's broadcast job + agg job otherwise race
    # to build the cache and each regenerates its partitions
    init = (
        full.withColumn("tokens_full", F.col("tokens"))
        .withColumn("tokens", F.expr("slice(tokens, 1, n_tok - 2)"))
        .withColumn("n_tok", (F.col("n_tok") - 2).cast("int"))
    )
    batches = init.select(
        "doc_id",
        F.lit("fwd").alias("batch_id"),
        F.lit(1).cast("long").alias("proc_ts"),
        F.expr("slice(tokens_full, n_tok + 1, 2)").alias("tokens_suffix"),
        F.col("n_tok").cast("int").alias("start_offset"),
    )
    updated = append_suffixes(init.drop("tokens_full"), batches)
    tail = incremental_rollup(updated, nsmooth=16, nupdate=1,
                              cfg=SmoothConfig(soptimize=True, p=0.90, tempint=(STRES_DEKAD,)))
    return tail.select(
        "doc_id", "covered",
        _checksum("smoothed").alias("window_sum"),
        F.element_at("smoothed", -1).alias("last_val"),
        F.size("dekad").alias("dekad_points"),
    ).orderBy("doc_id")


def q_lineage_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """north_rule resumability, driver-visible: run a checkpointed
    materialization twice on identical input; the rerun must skip every
    bucket via lineage fingerprints.  Returns one row of counters."""
    import shutil
    import tempfile

    from .lineage import run_with_checkpoints

    raw = sequences_df(spark, min(n_rows_for_sf(sf_of(sf_dir)), 2000))
    tmp = tempfile.mkdtemp(prefix="modape_resume_")
    try:
        m1 = run_with_checkpoints(spark, raw, f"{tmp}/t", f"{tmp}/lin",
                                  CFG_FIXED, n_buckets=8, n_groups=2)
        m2 = run_with_checkpoints(spark, raw, f"{tmp}/t", f"{tmp}/lin",
                                  CFG_FIXED, n_buckets=8, n_groups=2)
        rows_out = spark.read.parquet(f"{tmp}/t").count()
        return spark.createDataFrame(
            [(m1["processed_buckets"], m2["processed_buckets"],
              m2["skipped_buckets"], rows_out)],
            "first_run_buckets int, rerun_processed int, "
            "rerun_skipped int, rows long",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_compact_readback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compact (dod-only) tier table round trip under the driver's
    rows/schema check: materialize the combined rollup, write the dekad
    tier in the compact layout, reconstruct the arrays through the
    compiled C bit reader (read_tier_compact) and probe position 1 via
    the prefix decoder (export_compact_slice).  Every row self-verifies
    against the plain arrays; the returned counters must satisfy
    n_rows == n_array_exact == n_slice_exact (north_rule token-array
    equality through encode -> disk -> decode)."""
    import tempfile

    from .tiers import (
        export_compact_slice,
        materialize_rollup,
        read_tier_compact,
        tier_view,
        write_tier_tables,
    )

    raw = sequences_df(spark, min(n_rows_for_sf(sf_of(sf_dir)), 2000))
    # the returned aggregation is LAZY and reads the tier parquet below, so
    # the directory must outlive this call — tracked for atexit cleanup
    tmp = tempfile.mkdtemp(prefix="modape_compact_")
    _TMP_DIRS.append(tmp)
    comb = f"{tmp}/comb"
    materialize_rollup(raw, comb, CFG_FIXED, n_buckets=8)
    compact = write_tier_tables(spark, comb, f"{tmp}/tiers",
                                tiers=("dekad",), compact=True)["dekad"]
    plain = tier_view(spark, comb, "dekad").select(
        "doc_id", F.col("dekad").alias("arr_plain"))
    back = read_tier_compact(spark, compact, "dekad").select(
        "doc_id", F.col("dekad").alias("arr_c"))
    sl = export_compact_slice(spark, compact, "dekad", 1).select(
        "doc_id", F.col("value").alias("v1"))
    j = plain.join(back, "doc_id").join(sl, "doc_id")
    return j.agg(
        F.count("*").alias("n_rows"),
        F.sum((F.col("arr_plain") == F.col("arr_c")).cast("long"))
         .alias("n_array_exact"),
        F.sum(F.try_element_at("arr_plain", F.lit(1))
              .eqNullSafe(F.col("v1")).cast("long"))
         .alias("n_slice_exact"),
        F.sum(_checksum("arr_c")).alias("compact_checksum"),
    )


def q_sgrid_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST5 fixed-from-sgrid forward run (smooth.py:430-431): materialize
    the optimizing run's sopt state (the sgrid), then re-run with
    soptimize=False, svalue=None consuming the stored per-key lambda via
    the state join (J6; on disk both sides live in the same doc_id-hash
    bucket layout so the join is co-located — tests/test_tiers_spark.py
    covers the disk form).  Per-row checksum parity with the optimizing
    run's smoothed output is emitted as ``parity_ok``/``checksum_delta``.

    Precision contract: the sgrid is stored as float32 — exactly the
    reference's sgrid dataset dtype (smooth.py:166) — so the forward
    lambda differs from the optimizing run's float64 lambda by ~1e-7
    relative, which can flip an np.rint half-boundary by one integer
    step on rare rows (measured 2/4000 at sf0.01, |delta| = 1).  The
    reference's own sgrid re-runs carry the identical rounding;
    tests/test_entry.py pins the tolerance."""
    _release_caches()
    raw = _track_cache(sequences_df(
        spark, min(n_rows_for_sf(sf_of(sf_dir)), 4000)))
    first = _track_cache(rollup_dataframe(raw, CFG_SMOOTH).select(
        "doc_id", "covered",
        F.col("sopt_log10"),
        _checksum("smoothed").alias("sum_opt"),
    ))
    state = first.select("doc_id", "sopt_log10")
    forward = rollup_dataframe(
        raw.join(state, "doc_id"),
        SmoothConfig(soptimize=False, svalue=None, p=0.90, tempint=()),
    ).select("doc_id", _checksum("smoothed").alias("sum_fixed"))
    return (
        first.join(forward, "doc_id")
        .select(
            "doc_id", "covered",
            F.round(F.col("sopt_log10").cast("double"), 4)
             .alias("sopt_log10_r"),
            "sum_opt", "sum_fixed",
            (F.col("sum_fixed") - F.col("sum_opt")).alias("checksum_delta"),
            (F.col("sum_opt") == F.col("sum_fixed")).alias("parity_ok"),
        )
        .orderBy("doc_id")
    )


QUERIES = {
    "tier_smoothed_optvp": q_tier_smoothed,
    "lineage_resume": q_lineage_resume,
    "tier_dekad": q_tier_dekad,
    "tier_pentad": q_tier_pentad,
    "tier_fixed_lambda": q_tier_fixed_lambda,
    "compress_roundtrip": q_compress_roundtrip,
    "incremental_forward": q_incremental_forward,
    "tier_compact_readback": q_compact_readback,
    "tier_sgrid_forward": q_sgrid_forward,
}

# non-SQL-expressible (sequential banded solver) -> no oracle entries
ORACLES: dict[str, str] = {}
