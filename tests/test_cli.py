"""CLI surface (mirrors the reference's modis_* scripts, SURVEY §3)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*argv):
    out = subprocess.run(
        [sys.executable, "-m", "modape_spark", "--cores", "4", *argv],
        cwd=REPO, capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_cli_collect_smooth_window_info(tmp_path):
    raw = str(tmp_path / "raw")
    tiers = str(tmp_path / "tiers")
    export = str(tmp_path / "exp")

    r = run_cli("collect", "--n-rows", "80", "--out", raw)
    assert r["rows"] == 80

    r = run_cli("smooth", "--raw", raw, "--out", tiers,
                "--svalue", "1.0", "--tempint", "10", "--buckets", "4")
    assert r["processed_buckets"] == 4

    r = run_cli("window", "--tiers", tiers, "--tier", "dekad",
                "--position", "1", "--out", export)
    assert r["rows"] == 80

    r = run_cli("info", "--tiers", tiers)
    assert r["rows"] == 80
    assert "covered_rows" in r


def test_cli_csv(tmp_path):
    t = np.arange(50)
    pd.DataFrame({"a": 10 + np.sin(t / 4.0)}).to_csv(tmp_path / "in.csv", index=False)
    r = run_cli("csv", "--input", str(tmp_path / "in.csv"),
                "--output", str(tmp_path / "out.csv"), "--svalue", "1")
    assert r["series"] == 1


@pytest.mark.slow
def test_spark_submit_pyfiles(tmp_path):
    """north_star deployment shape: spark-submit --py-files."""
    zip_out = subprocess.run(
        [sys.executable, "scripts/make_pyfiles.py"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.strip()
    assert zip_out.endswith("modape_spark.zip")
    out = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
         "--py-files", zip_out,
         "scripts/run_rollup.py", "--n-rows", "64",
         "--out", str(tmp_path / "tiers"), "--buckets", "4"],
        cwd=REPO, capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["rows"] == 64


def test_cli_split_compact_and_window(tmp_path):
    """collect -> smooth -> split --compact -> window --compact/--clip-valid
    end-to-end through the argparse surface; compact export equals plain."""
    import duckdb

    from modape_spark.cli import main

    raw, tiers = str(tmp_path / "raw"), str(tmp_path / "tiers")
    split, exp, exp2 = (str(tmp_path / p) for p in ("split", "e1", "e2"))
    assert main(["collect", "--n-rows", "40", "--out", raw]) == 0
    assert main(["smooth", "--raw", raw, "--out", tiers,
                 "--svalue", "1.0", "--tempint", "10", "--buckets", "4"]) == 0
    assert main(["split", "--tiers", tiers, "--out", split,
                 "--select", "dekad", "--compact"]) == 0
    assert main(["window", "--tiers", f"{split}/dekad", "--tier", "dekad",
                 "--position", "2", "--out", exp, "--compact",
                 "--clip-valid", "0", "150"]) == 0
    assert main(["window", "--tiers", tiers, "--tier", "dekad",
                 "--position", "2", "--out", exp2,
                 "--clip-valid", "0", "150"]) == 0
    con = duckdb.connect()
    a = dict(con.execute(f"select doc_id, value from '{exp}/*.parquet'").fetchall())
    b = dict(con.execute(f"select doc_id, value from '{exp2}/*.parquet'").fetchall())
    assert a == b and len(a) == 40


def test_cli_retention_then_windowed_smooth(tmp_path):
    """retention subcommand: trims the raw table (accounting reported),
    and a windowed forward smooth over the trimmed table still runs and
    covers every row (keep >= nsmooth)."""
    from modape_spark.cli import main

    raw = str(tmp_path / "raw")
    trimmed = str(tmp_path / "trimmed")
    tiers = str(tmp_path / "tiers")
    assert main(["collect", "--n-rows", "60", "--out", raw]) == 0
    assert main(["retention", "--raw", raw, "--out", trimmed,
                 "--keep", "64"]) == 0
    assert main(["smooth", "--raw", trimmed, "--out", tiers,
                 "--svalue", "1.0", "--tempint", "10", "--buckets", "4",
                 "--nsmooth", "16", "--nupdate", "1"]) == 0
    import duckdb
    con = duckdb.connect()
    n = con.execute(
        f"select count(*) from parquet_scan('{trimmed}/*.parquet')"
    ).fetchone()[0]
    assert n == 60
    phys, logical = con.execute(
        f"select max(len(tokens)), max(n_tok) "
        f"from parquet_scan('{trimmed}/*.parquet')").fetchone()
    assert phys == 64 and logical == 742


def test_cli_window_by_date(tmp_path):
    from modape_spark.cli import main

    raw = str(tmp_path / "raw")
    tiers = str(tmp_path / "tiers")
    exp = str(tmp_path / "exp")
    assert main(["collect", "--n-rows", "40", "--out", raw]) == 0
    assert main(["smooth", "--raw", raw, "--out", tiers,
                 "--svalue", "1.0", "--tempint", "10", "--buckets", "4"]) == 0
    assert main(["window", "--tiers", tiers, "--tier", "dekad",
                 "--date", "2002186", "--out", exp]) == 0
    # exactly one of --position/--date
    assert main(["window", "--tiers", tiers, "--tier", "dekad",
                 "--out", exp]) == 2
    assert main(["window", "--tiers", tiers, "--tier", "dekad",
                 "--position", "1", "--date", "2002186", "--out", exp]) == 2
    import duckdb
    n = duckdb.connect().execute(
        f"select count(*), count(value) from parquet_scan('{exp}/*.parquet')"
    ).fetchone()
    assert n[0] == 40 and n[1] == 40


def test_cli_window_date_range(tmp_path):
    from modape_spark.cli import main

    raw = str(tmp_path / "raw")
    tiers = str(tmp_path / "tiers")
    exp = str(tmp_path / "exp")
    assert main(["collect", "--n-rows", "30", "--out", raw]) == 0
    assert main(["smooth", "--raw", raw, "--out", tiers,
                 "--svalue", "1.0", "--tempint", "10", "--buckets", "4"]) == 0
    assert main(["window", "--tiers", tiers, "--tier", "dekad",
                 "--begin-date", "2002186", "--end-date", "2002215",
                 "--out", exp]) == 0
    import os
    dates = sorted(d for d in os.listdir(exp) if d.startswith("date="))
    assert dates == ["date=2002186", "date=2002196", "date=2002206"]
    # --begin-date without --end-date rejected
    assert main(["window", "--tiers", tiers, "--tier", "dekad",
                 "--begin-date", "2002186", "--out", exp]) == 2


def test_cli_window_sgrid_and_source_filter(tmp_path):
    from modape_spark.cli import main

    raw = str(tmp_path / "raw")
    tiers = str(tmp_path / "tiers")
    exp1 = str(tmp_path / "sg")
    exp2 = str(tmp_path / "flt")
    assert main(["collect", "--n-rows", "40", "--out", raw]) == 0
    assert main(["smooth", "--raw", raw, "--out", tiers,
                 "--tempint", "10", "--buckets", "4"]) == 0   # optimizing
    assert main(["window", "--tiers", tiers, "--sgrid",
                 "--out", exp1]) == 0
    assert main(["window", "--tiers", tiers, "--tier", "dekad",
                 "--position", "1", "--filter-source", "web",
                 "--out", exp2]) == 0
    import duckdb
    con = duckdb.connect()
    n_sg = con.execute(
        f"select count(*) from parquet_scan('{exp1}/*.parquet')").fetchone()[0]
    assert n_sg == 40
    srcs = con.execute(
        f"select distinct source from parquet_scan('{exp2}/*.parquet')"
    ).fetchall()
    assert srcs == [("web",)]


def test_cli_smooth_srange_and_sgrid_import(tmp_path):
    """Reference modis_smooth --srange and --sgrid flags: a custom
    V-curve lambda grid, and a fixed-from-imported-sgrid forward run
    (export with window --sgrid, re-consume with smooth --sgrid)."""
    import duckdb

    from modape_spark.cli import main

    raw = str(tmp_path / "raw")
    t_opt = str(tmp_path / "t_opt")
    t_rng = str(tmp_path / "t_rng")
    t_fix = str(tmp_path / "t_fix")
    sg = str(tmp_path / "sg")
    assert main(["collect", "--n-rows", "40", "--out", raw]) == 0
    assert main(["smooth", "--raw", raw, "--out", t_opt,
                 "--tempint", "10", "--buckets", "4"]) == 0
    assert main(["smooth", "--raw", raw, "--out", t_rng,
                 "--srange", "0", "3", "0.2",
                 "--tempint", "10", "--buckets", "4"]) == 0
    assert main(["window", "--tiers", t_opt, "--sgrid", "--out", sg]) == 0
    assert main(["smooth", "--raw", raw, "--out", t_fix, "--sgrid", sg,
                 "--tempint", "10", "--buckets", "4"]) == 0
    con = duckdb.connect()
    q = "select count(*), sum(covered::int) from parquet_scan('{}/bucket=*/*.parquet')"
    n_opt, cov_opt = con.execute(q.format(t_opt)).fetchone()
    n_fix, cov_fix = con.execute(q.format(t_fix)).fetchone()
    n_rng, _ = con.execute(q.format(t_rng)).fetchone()
    assert n_opt == n_fix == n_rng == 40
    assert cov_opt == cov_fix   # same coverage gate either path
    # fixed-from-sgrid reproduces the optimizing smoothed sums within the
    # float32-sgrid rounding tolerance (tests/test_entry.py contract)
    sums = con.execute(f"""
        select a.doc_id,
               list_sum(a.smoothed) as sa, list_sum(b.smoothed) as sb
        from parquet_scan('{t_opt}/bucket=*/*.parquet') a
        join parquet_scan('{t_fix}/bucket=*/*.parquet') b using (doc_id)
        where a.covered
    """).fetchall()
    assert sums and all(abs(sa - sb) <= 2 for _, sa, sb in sums)


def test_cli_usage_errors_and_compact_smoothed_range(tmp_path):
    """Round-5 hardening: empty --srange and begin>end are usage errors
    (exit 2), an incomplete --sgrid fails loudly instead of dropping
    rows, and `window --compact` now supports the smoothed tier's raw
    date axis (equal to the plain path)."""
    import duckdb

    from modape_spark.cli import main

    raw = str(tmp_path / "raw")
    tiers = str(tmp_path / "tiers")
    split = str(tmp_path / "split")
    e1, e2, sg = (str(tmp_path / p) for p in ("e1", "e2", "sg"))
    assert main(["collect", "--n-rows", "30", "--out", raw]) == 0
    # empty --srange: arity error, not a silent default-optimizing run
    assert main(["smooth", "--raw", raw, "--out", tiers, "--srange"]) == 2
    assert main(["smooth", "--raw", raw, "--out", tiers,
                 "--svalue", "1.0", "--tempint", "10", "--buckets", "4"]) == 0
    # begin after end: usage error, not a traceback
    assert main(["window", "--tiers", tiers, "--tier", "dekad",
                 "--begin-date", "2003005", "--end-date", "2002186",
                 "--out", e1]) == 2
    # compact smoothed-tier date range == plain
    assert main(["split", "--tiers", tiers, "--out", split,
                 "--select", "smoothed", "--compact"]) == 0
    assert main(["window", "--tiers", f"{split}/smoothed",
                 "--tier", "smoothed", "--begin-date", "2002185",
                 "--end-date", "2002225", "--out", e1, "--compact"]) == 0
    assert main(["window", "--tiers", tiers, "--tier", "smoothed",
                 "--begin-date", "2002185", "--end-date", "2002225",
                 "--out", e2]) == 0
    con = duckdb.connect()
    a = dict(((d, dt), v) for d, dt, v in con.execute(
        f"select doc_id, date, value from parquet_scan('{e1}/date=*/*.parquet', hive_partitioning=1)").fetchall())
    b = dict(((d, dt), v) for d, dt, v in con.execute(
        f"select doc_id, date, value from parquet_scan('{e2}/date=*/*.parquet', hive_partitioning=1)").fetchall())
    assert a == b and len(a) == 30 * 6
    # incomplete sgrid: loud failure, not silent row drops
    assert main(["window", "--tiers", tiers, "--sgrid", "--out", sg]) == 0
    sg_part = str(tmp_path / "sg_part.parquet")
    con.execute(f"copy (select * from parquet_scan('{sg}/*.parquet') limit 10) "
                f"to '{sg_part}' (format parquet)")
    t_fix = str(tmp_path / "t_fix")
    assert main(["smooth", "--raw", raw, "--out", t_fix,
                 "--sgrid", sg_part, "--tempint", "10",
                 "--buckets", "4"]) == 2


def test_cli_update_compact_tiers(tmp_path):
    """collect -> smooth -> split --compact -> windowed smooth (tail) ->
    update: the in-place nupdate write against the long-retention layout,
    end-to-end through the argparse surface.  The updated compact table
    must decode to exactly the plain-path merge_tier_tail result, and a
    compact-store tail (no plain arrays to splice) must exit 2."""
    from modape_spark.cli import main
    from modape_spark.incremental import merge_tier_tail
    from modape_spark.session import get_spark
    from modape_spark.tiers import read_tier_compact

    raw, comb = str(tmp_path / "raw"), str(tmp_path / "comb")
    split, tail = str(tmp_path / "split"), str(tmp_path / "tail")
    assert main(["collect", "--n-rows", "40", "--out", raw]) == 0
    assert main(["smooth", "--raw", raw, "--out", comb,
                 "--svalue", "1.0", "--tempint", "10", "--buckets", "4"]) == 0
    assert main(["split", "--tiers", comb, "--out", split,
                 "--select", "dekad", "--compact"]) == 0
    assert main(["smooth", "--raw", raw, "--out", tail,
                 "--svalue", "1.0", "--tempint", "10", "--buckets", "4",
                 "--nsmooth", "16", "--nupdate", "2"]) == 0
    assert main(["update", "--tiers", split, "--tail", tail,
                 "--nupdate", "2", "--select", "dekad"]) == 0

    spark = get_spark(app_name="cli-update-check", cores=4)
    got = {r["doc_id"]: list(r["dekad"])
           for r in read_tier_compact(spark, f"{split}/dekad",
                                      "dekad").collect()}
    want_df = merge_tier_tail(
        spark.read.parquet(comb).select("doc_id", "dekad"),
        spark.read.parquet(tail).select("doc_id", "dekad", "dekad_total"),
        "dekad", nupdate=2, total_col="dekad_total")
    want = {r["doc_id"]: list(r["dekad"]) for r in want_df.collect()}
    assert got == want and len(got) == 40

    # a compact-store tail has no plain arrays to splice: usage error
    ctail = str(tmp_path / "ctail_split")
    assert main(["split", "--tiers", comb, "--out", ctail,
                 "--select", "dekad", "--compact"]) == 0
    assert main(["update", "--tiers", split, "--tail", f"{ctail}/dekad",
                 "--nupdate", "2", "--select", "dekad"]) == 2
