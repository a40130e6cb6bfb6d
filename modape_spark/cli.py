"""Command-line surface mirroring the reference's scripts
(/root/reference/modape/scripts/: modis_collect, modis_smooth,
modis_window, modis_info, csv_smooth) — a reference user's workflows map
1:1 onto these subcommands, executed on Spark:

    python -m modape_spark collect --n-rows 10000 --out /data/raw
    python -m modape_spark smooth  --raw /data/raw --out /data/tiers \
        [--svalue 1.0 | --soptimize] [--pvalue 0.9] [--tempint 10 5] \
        [--nsmooth 16 --nupdate 1] [--lineage /data/lineage]
    python -m modape_spark update  --tiers /data/compact_tiers \
        --tail /data/tail --nupdate 4
    python -m modape_spark window  --tiers /data/tiers --tier dekad \
        --position 5 --out /data/export
    python -m modape_spark info    --tiers /data/tiers
    python -m modape_spark csv     --input in.csv --output out.csv --svalue 1

Designed for ``spark-submit --py-files modape_spark.zip`` (north_star
deployment shape): everything importable, no module-level Spark state.
"""

from __future__ import annotations

import argparse
import json
import sys

from .constants import RTRES, TSHIFT


def _spark(args):
    from .session import get_spark

    return get_spark(app_name=f"modape-{args.cmd}", cores=args.cores)


def cmd_collect(args) -> int:
    """modis_collect analogue: materialize/append the raw sequences table."""
    from .sources.sequences import sequences_df

    spark = _spark(args)
    df = sequences_df(spark, args.n_rows)
    df.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"rows": args.n_rows, "out": args.out}))
    return 0


def cmd_smooth(args) -> int:
    """modis_smooth analogue: materialize all retention tiers."""
    from .rollup import SmoothConfig
    from .lineage import run_with_checkpoints
    from .tiers import materialize_rollup

    spark = _spark(args)
    raw = spark.read.parquet(args.raw)
    axis = {"rtres": args.rtres, "tshift": args.tshift}
    if args.product:
        from .constants import temporal_params
        resolved = temporal_params(args.product)
        # explicit flags win over the product table
        axis = {
            "rtres": args.rtres if args.rtres != RTRES else resolved["rtres"],
            "tshift": (args.tshift if args.tshift != TSHIFT
                       else resolved["tshift"]),
            "epoch": resolved["epoch"],
        }
    srange = None
    if args.srange is not None:
        # reference semantics (modis_smooth.py:196-203): (smin, smax,
        # sstep) -> np.arange(smin, smax + sstep, sstep).round(2);
        # `is not None` (not truthiness) so an empty --srange is an
        # arity error, not a silent default-optimizing run
        import numpy as np

        if len(args.srange) != 3:
            print("smooth: --srange expects SMIN SMAX SSTEP",
                  file=sys.stderr)
            return 2
        smin, smax, sstep = args.srange
        srange = tuple(np.arange(smin, smax + sstep, sstep).round(2))
    if args.sgrid:
        # reference --sgrid (modis_smooth.py:169-190): consume a
        # previously exported lambda grid; fixed-from-sgrid forward run
        # via the sopt_log10 state join (J6)
        from pyspark.sql import functions as F

        sg = spark.read.parquet(args.sgrid).select(
            "doc_id", F.col("value").alias("sopt_log10"))
        # LEFT join + explicit missing-state check: an inner join would
        # silently drop raw rows absent from the grid (the append
        # validators' rejection style, incremental.validate_append)
        raw = raw.join(sg, "doc_id", "left")
        # select BEFORE collect so the validation job's scan prunes to
        # (doc_id, sopt_log10) and never reads the wide token arrays
        missing = raw.filter(F.col("sopt_log10").isNull()) \
            .select("doc_id").limit(5)
        bad = [r["doc_id"] for r in missing.collect()]
        if bad:
            print(f"smooth: --sgrid is missing lambda state for some raw "
                  f"rows (e.g. {bad}); export a complete sgrid first",
                  file=sys.stderr)
            return 2
        args.soptimize = False
        args.svalue = None
    cfg = SmoothConfig(
        soptimize=(args.soptimize or args.svalue is None)
        and args.sgrid is None,
        svalue=args.svalue,
        srange=srange,
        p=args.pvalue,
        tempint=tuple(args.tempint),
        nsmooth=args.nsmooth,
        nupdate=args.nupdate,
        tempint_start=args.tempint_start,
        **axis,
    )
    if args.lineage:
        metrics = run_with_checkpoints(spark, raw, args.out, args.lineage,
                                       cfg, n_buckets=args.buckets)
    else:
        materialize_rollup(raw, args.out, cfg, n_buckets=args.buckets)
        metrics = {"processed_buckets": args.buckets}
    print(json.dumps(metrics))
    return 0


def cmd_update(args) -> int:
    """Splice a windowed forward-run tail (smooth --nsmooth/--nupdate
    output) INTO stored tier tables — the reference's in-place nupdate
    write (io.py:189-202 xoffset).  Works on compact (dod-only) AND
    plain tier tables; on a plain layout both the value arrays and the
    payloads are spliced so the two representations never diverge.  The
    tail itself must be a full-store rollup (plain arrays): a
    compact-store tail has no values to splice and is rejected."""
    from .tiers import apply_tier_compact_update

    spark = _spark(args)
    tail = spark.read.parquet(args.tail)
    # validate EVERY selected tier's required columns up front: failing
    # inside the apply loop left the store partially updated (earlier
    # tiers already spliced and directory-swapped) on an error that was
    # knowable before touching anything (ADVICE r5 #2; re-running after a
    # fix is idempotent, but the intermediate state was surprising)
    for tier in args.select:
        need = [tier] + ([f"{tier}_total"] if tier != "smoothed" else [])
        missing = [c for c in need + ["doc_id", "n_tok"]
                   if c not in tail.columns]
        if missing:
            print(f"update: tail table lacks {missing} for tier {tier}; "
                  "materialize the tail with the default (full) store",
                  file=sys.stderr)
            return 2
    for tier in args.select:
        try:
            apply_tier_compact_update(
                spark, f"{args.tiers}/{tier}", tier, tail, args.nupdate)
        except ValueError as exc:
            print(f"update: {exc}", file=sys.stderr)
            return 2
    print(json.dumps({"updated": list(args.select),
                      "nupdate": args.nupdate}))
    return 0


def cmd_window(args) -> int:
    """modis_window analogue: per-position export of one tier.

    --clip-valid VMIN VMAX applies the reference's export-time valid-range
    clip (window.py:382-384); --compact reads a dod-only compact tier
    table via the prefix decoder instead of plain arrays."""
    if args.sgrid:
        # reference --sgrid (modis_window.py:37): export the stored
        # lambda grid instead of tier data; date/position modes unused
        from pyspark.sql import functions as F

        spark = _spark(args)
        df = spark.read.parquet(args.tiers).select(
            "doc_id", "source", F.col("sopt_log10").alias("value"))
        if args.filter_source:
            df = df.filter(F.col("source") == args.filter_source)
        df.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"sgrid": True, "rows": df.count(),
                          "out": args.out}))
        return 0
    n_modes = sum(x is not None for x in
                  (args.position, args.date, args.begin_date))
    if n_modes != 1 or (args.begin_date is None) != (args.end_date is None):
        print("window: exactly one of --position / --date / "
              "--begin-date+--end-date is required", file=sys.stderr)
        return 2
    spark = _spark(args)
    clip = tuple(args.clip_valid) if args.clip_valid else None
    axis = None
    if args.product:
        from .constants import temporal_params
        axis = temporal_params(args.product)
    if args.begin_date is not None:
        if args.begin_date > args.end_date:
            print(f"window: --begin-date {args.begin_date} is after "
                  f"--end-date {args.end_date}", file=sys.stderr)
            return 2
        if args.compact:
            from .tiers import export_compact_range
            sl = export_compact_range(spark, args.tiers, args.tier,
                                      args.begin_date, args.end_date,
                                      clip_valid=clip, axis=axis)
        else:
            from .tiers import export_tier_range
            sl = export_tier_range(spark, args.tiers, args.tier,
                                   args.begin_date, args.end_date,
                                   clip_valid=clip, axis=axis)
        if args.filter_source:
            sl = sl.filter(sl.source == args.filter_source)
        sl.write.mode("overwrite").partitionBy("date").parquet(args.out)
        print(json.dumps({"tier": args.tier,
                          "begin_date": args.begin_date,
                          "end_date": args.end_date,
                          "rows": sl.count(), "out": args.out,
                          "clip_valid": list(clip) if clip else None}))
        return 0
    if args.date is not None:
        if args.compact:
            from .tiers import export_compact_date
            sl = export_compact_date(spark, args.tiers, args.tier,
                                     args.date, clip_valid=clip, axis=axis)
        else:
            from .tiers import export_tier_date
            sl = export_tier_date(spark, args.tiers, args.tier, args.date,
                                  clip_valid=clip, axis=axis)
    elif args.compact:
        from .tiers import export_compact_slice
        sl = export_compact_slice(spark, args.tiers, args.tier,
                                  args.position, clip_valid=clip)
    else:
        from .tiers import export_tier_slice
        sl = export_tier_slice(spark, args.tiers, args.tier, args.position,
                               clip_valid=clip)
    if args.filter_source:
        sl = sl.filter(sl.source == args.filter_source)
    sl.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"tier": args.tier, "position": args.position,
                      "date": args.date,
                      "rows": sl.count(), "out": args.out,
                      "compact": bool(args.compact),
                      "clip_valid": list(clip) if clip else None}))
    return 0


def cmd_split(args) -> int:
    """Split the combined rollup into standalone tier tables; --compact
    keeps only the delta-of-delta payloads (read back with
    tiers.read_tier_compact / `window --compact`)."""
    from .tiers import write_tier_tables

    spark = _spark(args)
    out = write_tier_tables(spark, args.tiers, args.out,
                            tiers=tuple(args.select), compact=args.compact)
    print(json.dumps({"tables": out, "compact": bool(args.compact)}))
    return 0


def cmd_info(args) -> int:
    """modis_info analogue: table shape + per-bucket lineage metrics."""
    from pyspark.sql import functions as F

    from .lineage import bucket_lineage

    spark = _spark(args)
    df = spark.read.parquet(args.tiers)
    summary = {
        "rows": df.count(),
        "columns": df.columns,
        "covered_rows": df.filter(F.col("covered")).count() if "covered" in df.columns else None,
    }
    if "bucket" in df.columns and "smoothed" in df.columns:
        summary["buckets"] = bucket_lineage(df).count()
    if "n_tok" in df.columns:
        # reference modis_info date report (modis_info.py:28-34,65-67):
        # start/end of the raw axis + last collected, per distinct length
        # (lengths sidecar when present — no job; distinct probe fallback)
        from .grids import raw_dates_for_length
        from .tiers import table_lengths

        lengths = sorted(table_lengths(spark, args.tiers, df))
        summary["date_axis"] = {
            str(n): {"start_date": raw_dates_for_length(n)[0],
                     "last_collected": raw_dates_for_length(n)[-1]}
            for n in lengths
        }
    print(json.dumps(summary))
    return 0


def cmd_retention(args) -> int:
    """Raw-tier retention pass (retention.py): rewrite the raw table to
    the trailing --keep tokens per sequence (logical n_tok preserved for
    the date axis; windowed forward runs stay bit-identical for
    keep >= nsmooth).  Prints the per-source accounting."""
    from .retention import retention_stats, retention_trim

    spark = _spark(args)
    raw = spark.read.parquet(args.raw)
    trimmed = retention_trim(raw, args.keep)
    # lengths sidecar rides the write (logical n_tok survives the trim —
    # it IS the date-axis identity exports resolve against)
    from .tiers import _invalidate_meta, _merge_meta_or_invalidate, _observe_lengths
    _invalidate_meta(args.out)
    trimmed, obs = _observe_lengths(trimmed)
    w = trimmed.write.mode("overwrite")
    if "bucket" in trimmed.columns:
        # catalog layout in -> catalog layout out: the trim is a per-row
        # projection, so the bucket co-partitioning survives for free and
        # downstream state joins stay co-located
        w = w.partitionBy("bucket")
    w.parquet(args.out)
    _merge_meta_or_invalidate(args.out, obs)
    stats = retention_stats(spark.read.parquet(args.out), args.keep).collect()
    print(json.dumps({
        "keep": args.keep, "out": args.out,
        "sources": {r["source"]: {"n_docs": r["n_docs"],
                                  "raw_points": r["raw_points"],
                                  "kept_points": r["kept_points"],
                                  "trimmed_points": r["trimmed_points"]}
                    for r in stats},
    }))
    return 0


def cmd_decontaminate(args) -> int:
    """Benchmark-decontamination pass (operators/decontaminate.py):
    write the training corpus minus eval docs and minus docs sharing any
    5-word n-gram with the eval slice; prints the partition counters
    (n_in = n_eval + n_contaminated + n_clean, observed on the write
    job — no separate count jobs)."""
    from .operators.decontaminate import write_clean_corpus

    spark = _spark(args)
    counters = write_clean_corpus(spark, args.docs, args.out)
    print(json.dumps(counters))
    return 0


def cmd_csv(args) -> int:
    """csv_smooth analogue (local, no Spark)."""
    from .sources.csv_series import smooth_csv

    out = smooth_csv(args.input, args.output, svalue=args.svalue,
                     nodata=args.nodata)
    print(json.dumps({"series": len(out.columns) - 1, "out": args.output}))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="modape_spark")
    p.add_argument("--cores", default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("collect")
    c.add_argument("--n-rows", type=int, required=True)
    c.add_argument("--out", required=True)
    c.set_defaults(fn=cmd_collect)

    s = sub.add_parser("smooth")
    s.add_argument("--raw", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--svalue", type=float, default=None)
    s.add_argument("--soptimize", action="store_true")
    s.add_argument("--srange", type=float, nargs="*", default=None,
                   metavar="S", help="SMIN SMAX SSTEP: fixed log10-lambda "
                   "search grid for the V-curve (reference --srange)")
    s.add_argument("--sgrid", default=None,
                   help="parquet dir of a previously exported lambda grid "
                        "(window --sgrid output); smooth fixed-from-grid")
    s.add_argument("--pvalue", type=float, default=None)
    s.add_argument("--tempint", type=int, nargs="*", default=[10, 5])
    s.add_argument("--nsmooth", type=int, default=0)
    s.add_argument("--nupdate", type=int, default=0)
    # per-product axis knobs (reference modis_smooth --tempint-start and
    # constants.py:72-102 per-product tshift/rtres)
    s.add_argument("--tempint-start", dest="tempint_start", default=None)
    s.add_argument("--tshift", type=int, default=TSHIFT)
    s.add_argument("--rtres", type=int, default=RTRES)
    s.add_argument("--product", default=None,
                   help="resolve rtres/tshift/epoch from the per-product "
                        "table (reference TEMPORAL_DICT), e.g. MOD11A2")
    s.add_argument("--buckets", type=int, default=32)
    s.add_argument("--lineage", default=None)
    s.set_defaults(fn=cmd_smooth)

    w = sub.add_parser("window")
    w.add_argument("--tiers", required=True)
    w.add_argument("--tier", default="dekad")
    w.add_argument("--position", type=int, default=None)
    w.add_argument("--date", default=None,
                   help="julian YYYYDDD calendar date (modis_window "
                        "contract); resolved per length to a grid "
                        "position, NULL where the grid lacks the date")
    w.add_argument("--begin-date", dest="begin_date", default=None,
                   help="julian YYYYDDD range start: one date="
                        " partition per in-range target date")
    w.add_argument("--end-date", dest="end_date", default=None)
    w.add_argument("--sgrid", action="store_true",
                   help="export the stored lambda grid (sopt_log10) "
                        "instead of tier data (reference --sgrid)")
    w.add_argument("--filter-source", dest="filter_source", default=None,
                   help="restrict the export to one source (reference "
                        "--filter-product analogue)")
    w.add_argument("--product", default=None,
                   help="resolve the date axis (rtres/tshift/epoch) from "
                        "the per-product table — must match the product "
                        "the table was smoothed with")
    w.add_argument("--out", required=True)
    w.add_argument("--clip-valid", dest="clip_valid", type=int, nargs=2,
                   default=None, metavar=("VMIN", "VMAX"))
    w.add_argument("--compact", action="store_true",
                   help="read a dod-only compact tier table")
    w.set_defaults(fn=cmd_window)

    t = sub.add_parser("split", help="split combined rollup into per-tier "
                       "tables (retention boundaries differ per tier)")
    t.add_argument("--tiers", required=True, help="combined rollup dir")
    t.add_argument("--out", required=True)
    t.add_argument("--select", nargs="*",
                   default=["smoothed", "dekad", "pentad"])
    t.add_argument("--compact", action="store_true",
                   help="store only the dod payloads (long-retention layout)")
    t.set_defaults(fn=cmd_split)

    u = sub.add_parser("update", help="splice a windowed forward-run tail "
                       "into stored tier tables (in-place nupdate write; "
                       "compact or plain layout)")
    u.add_argument("--tiers", required=True,
                   help="base dir of tier tables (split output, compact "
                        "or plain: one subdir per tier)")
    u.add_argument("--tail", required=True,
                   help="combined windowed rollup dir (smooth with "
                        "--nsmooth/--nupdate, default full store)")
    u.add_argument("--nupdate", type=int, required=True,
                   help="trailing points to splice (must match the tail "
                        "run's --nupdate)")
    u.add_argument("--select", nargs="*",
                   default=["smoothed", "dekad", "pentad"])
    u.set_defaults(fn=cmd_update)

    r = sub.add_parser("retention", help="trim raw sequences to their "
                       "trailing window once history is tiered")
    r.add_argument("--raw", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--keep", type=int, required=True,
                   help="tokens to keep per sequence (>= the forward "
                        "nsmooth window)")
    r.set_defaults(fn=cmd_retention)

    i = sub.add_parser("info")
    i.add_argument("--tiers", required=True)
    i.set_defaults(fn=cmd_info)

    dc = sub.add_parser("decontaminate",
                        help="write the corpus minus eval docs and minus "
                             "eval-n-gram-contaminated docs")
    dc.add_argument("--docs", required=True,
                    help="directory holding documents.parquet")
    dc.add_argument("--out", required=True)
    dc.set_defaults(fn=cmd_decontaminate)

    v = sub.add_parser("csv")
    v.add_argument("--input", required=True)
    v.add_argument("--output", required=True)
    v.add_argument("--svalue", type=float, default=None)
    v.add_argument("--nodata", type=float, default=0.0)
    v.set_defaults(fn=cmd_csv)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
