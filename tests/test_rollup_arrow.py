"""Arrow kernel boundary: process_rollup_arrow vs the pandas oracle.

The Spark hot path is mapInArrow (tiers.py); these tests exercise the
RecordBatch conversion logic directly — including a SLICED batch, whose
ListArray keeps sliced offsets over an unsliced child array — without a
SparkSession, so the boundary is pinned even when the Spark suite is
skipped."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from modape_spark.constants import STRES_DEKAD, STRES_PENTAD
from modape_spark.fixtures import gen_tokens_block, row_lengths, row_sources
from modape_spark.rollup import SmoothConfig
from modape_spark.tiers import process_rollup_arrow, process_rollup_pdf

CFG_ALL = SmoothConfig(soptimize=True, p=0.90,
                       tempint=(STRES_DEKAD, STRES_PENTAD))
CFG_WINDOW = SmoothConfig(soptimize=True, p=0.90, tempint=(STRES_DEKAD,),
                          nsmooth=16, nupdate=2)


def _fixture_pdf(n_rows: int = 300) -> pd.DataFrame:
    ids = np.arange(n_rows, dtype=np.int64)
    lens = row_lengths(ids)
    tok = np.empty(ids.size, dtype=object)
    for n in np.unique(lens):
        sel = np.where(lens == n)[0]
        blk = gen_tokens_block(ids[sel], int(n))
        for j, r in enumerate(sel):
            tok[r] = blk[j]
    return pd.DataFrame({
        "doc_id": [f"doc{i:012d}" for i in ids],
        "tokens": tok,
        "n_tok": lens.astype(np.int32),
        "source": row_sources(ids),
    })


def _to_batch(pdf: pd.DataFrame) -> pa.RecordBatch:
    schema = pa.schema([
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ])
    return pa.RecordBatch.from_pandas(pdf, schema=schema,
                                      preserve_index=False)


def _assert_batches_equal(got: pa.RecordBatch, pdf_out: pd.DataFrame):
    assert got.schema.names == list(pdf_out.columns)
    gpd = got.to_pandas()
    for c in pdf_out.columns:
        a, b = pdf_out[c].to_numpy(), gpd[c].to_numpy()
        if pdf_out[c].dtype == object:
            for x, y in zip(a, b):
                if x is None:
                    assert y is None, c
                elif isinstance(x, bytes):
                    assert x == y, c
                else:
                    assert np.array_equal(np.asarray(x), np.asarray(y)), c
        else:
            assert np.array_equal(a, b, equal_nan=(a.dtype.kind == "f")), c


@pytest.mark.parametrize("cfg", [CFG_ALL, CFG_WINDOW],
                         ids=["all-tiers", "windowed"])
@pytest.mark.parametrize("compress", [True, False], ids=["dod", "plain"])
def test_arrow_path_matches_pandas_oracle(cfg, compress):
    pdf = _fixture_pdf()
    want = process_rollup_pdf(pdf, cfg, compress)
    got = process_rollup_arrow(_to_batch(pdf), cfg, compress)
    _assert_batches_equal(got, want)


def test_arrow_path_on_sliced_batch():
    """A sliced RecordBatch carries a ListArray whose offsets are sliced
    but whose child values array is NOT — the reconstruction must honor
    that (pyarrow slice semantics, tiers.process_rollup_arrow)."""
    pdf = _fixture_pdf(260)
    batch = _to_batch(pdf)
    lo, ln = 37, 180
    sliced = batch.slice(lo, ln)
    la = sliced.column(1)
    # precondition for the test to mean anything: offsets no longer 0-based
    assert la.offsets.to_numpy(zero_copy_only=False)[0] > 0
    want = process_rollup_pdf(pdf.iloc[lo:lo + ln].reset_index(drop=True),
                              CFG_ALL, True)
    got = process_rollup_arrow(sliced, CFG_ALL, True)
    _assert_batches_equal(got, want)


def test_arrow_path_null_tokens_raises():
    pdf = _fixture_pdf(40)
    schema = pa.schema([
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ])
    tok = pdf["tokens"].tolist()
    tok[7] = None
    batch = pa.RecordBatch.from_arrays(
        [pa.array(pdf["doc_id"]), pa.array(tok, type=pa.list_(pa.int32())),
         pa.array(pdf["n_tok"], type=pa.int32()), pa.array(pdf["source"])],
        schema=schema)
    # contract: fail loudly, never emit garbage for a null row
    with pytest.raises(ValueError, match="null tokens"):
        process_rollup_arrow(batch, CFG_ALL, True)


def test_arrow_path_sgrid_passthrough():
    """Fixed-from-sgrid forward runs feed a sopt_log10 column; the arrow
    path must consume it exactly like the pandas oracle."""
    pdf = _fixture_pdf(120)
    first = process_rollup_pdf(pdf, SmoothConfig(soptimize=True,
                                                 tempint=()), False)
    pdf2 = pdf.assign(sopt_log10=first["sopt_log10"].to_numpy())
    schema = pa.schema([
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
        ("sopt_log10", pa.float32()),
    ])
    batch = pa.RecordBatch.from_pandas(pdf2, schema=schema,
                                       preserve_index=False)
    cfg = SmoothConfig(soptimize=False, svalue=None, tempint=())
    want = process_rollup_pdf(pdf2, cfg, False)
    got = process_rollup_arrow(batch, cfg, False)
    _assert_batches_equal(got, want)
