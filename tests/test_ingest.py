"""S2 nodata-LUT reclass operator tests (io.py:436-452 semantics)."""

from __future__ import annotations

import pytest

from modape_spark.sources.ingest import ingest_reclass, reclass_expr


def test_reclass_normalizes_all_sentinels(spark):
    df = spark.createDataFrame(
        [("a", [5, -3000, 32767, 0, 10000, 10001, -1, -32768])],
        "doc_id string, tokens array<int>",
    )
    out = ingest_reclass(df, (0, 10000), (-32768, 32767, -3000)).collect()[0]
    # in-range passthrough; below/above range and every alternate sentinel
    # all become min(nodata_values) = -32768
    assert out["tokens"] == [5, -32768, -32768, 0, 10000, -32768, -32768, -32768]


def test_reclass_rejects_nodata_inside_range():
    with pytest.raises(ValueError, match="Invalid Data / NoData"):
        reclass_expr("tokens", (0, 10000), (500,))


def test_reclass_requires_nodata():
    with pytest.raises(ValueError, match="at least one"):
        reclass_expr("tokens", (0, 10000), ())


def test_reclass_is_pure_catalyst(spark):
    """No UDF / python stage: the plan is a single projected scan."""
    df = spark.createDataFrame([("a", [1, 2])], "doc_id string, tokens array<int>")
    plan = ingest_reclass(df, (0, 10), (-1,))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_reclass_for_product(spark):
    from modape_spark.sources.ingest import reclass_for_product

    df = spark.createDataFrame(
        [("a", [5, -15000, -13000, 10001, -10000])],
        "doc_id string, tokens array<int>",
    )
    out = reclass_for_product(df, "VNP13A2_NDVI").collect()[0]
    assert out["tokens"] == [5, -15000, -15000, -15000, -10000]
    with pytest.raises(KeyError, match="unknown product"):
        reclass_for_product(df, "NOPE")
