"""Driver-contract rehearsal: every queries() entry runs, and every
oracle_sql() entry matches the Spark result (row count + column names +
order-insensitive values), exactly like the driver's CORRECTNESS check."""

from __future__ import annotations

import math
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    return v


def _rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) >= 1
    assert len(df.columns) >= 2


def test_all_queries_run(spark):
    qs = entry_mod.queries()
    assert len(qs) >= 15
    for name, fn in qs.items():
        df = fn(spark, SF_DIR)
        assert df.columns, name
        df.limit(1).collect()


ORACLE_NAMES = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, duck, name):
    qs = entry_mod.queries()
    sql = entry_mod.oracle_sql()[name]
    sdf = qs[name](spark, SF_DIR)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(sql)
    dcols = [d[0].lower() for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    sset = _rows_to_set(scols, srows)
    dset = _rows_to_set(dcols, drows)
    mism = [i for i, (a, b) in enumerate(zip(sset, dset)) if a != b]
    assert not mism, f"{name}: first mismatches {[(sset[i], dset[i]) for i in mism[:3]]}"


def test_compact_readback_counters(spark):
    """The C bit-reader read path self-verifies: every reconstructed
    array and every prefix-decoded slice equals the plain tier."""
    r = entry_mod.queries()["tier_compact_readback"](spark, SF_DIR).collect()[0]
    assert r["n_rows"] > 0
    assert r["n_rows"] == r["n_array_exact"] == r["n_slice_exact"]


def test_sgrid_forward_parity_tolerance(spark):
    """Fixed-from-sgrid forward run reproduces the optimizing smooth up
    to the float32 precision of the stored sgrid (reference
    smooth.py:166 stores sgrid as float32): a lambda 1e-7 off can flip
    an np.rint half-boundary by ONE integer step on rare rows, never
    more."""
    rows = entry_mod.queries()["tier_sgrid_forward"](spark, SF_DIR).collect()
    assert rows
    deltas = [abs(r["checksum_delta"]) for r in rows]
    mism = [d for d in deltas if d]
    assert max(deltas, default=0) <= 2
    assert len(mism) <= max(1, len(rows) // 200)  # <= 0.5% of rows


def test_grid_shape_golden(spark):
    """Pin the calendar golden numbers for the fixture lengths (derived
    from the reference DateHelper semantics: epoch 2002185, rtres 8,
    dekad days 5/15/25, pentad days 3/8/13/18/23/28)."""
    rows = entry_mod.queries()["tier_grid_shape"](spark, SF_DIR).collect()
    by_len = {r["n_tok"]: (r["dekad_total"], r["pentad_total"], r["n_daily"],
                           r["dekad_first"], r["dekad_last"]) for r in rows}
    assert by_len[742] == (581, 1161, 5893, "2002186", "2018227")
    for n, exp in ((16, (13, 25, 129, "2002186", "2002309")),
                   (64, (51, 100, 510, "2002186", "2003329")),
                   (128, (101, 200, 1017, "2002186", "2005105"))):
        if n in by_len:
            assert by_len[n] == exp, n


def test_retention_compact_lifecycle_counters(spark):
    """trim -> windowed rollup -> compact write -> C decode must compose
    losslessly AND equal an untrimmed run of the same windowed config."""
    r = entry_mod.queries()["retention_compact_lifecycle"](spark, SF_DIR) \
        .collect()[0]
    assert r["n_rows"] > 0
    assert r["n_rows"] == r["n_compact_exact"] == r["n_full_equal"]
