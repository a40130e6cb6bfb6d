"""Ingest-time normalization: the reference's nodata-LUT reclass (S2).

The reference builds a GDAL VRT LookupTable that maps every out-of-range
and alternate-nodata raw value onto ONE canonical nodata sentinel before
anything downstream sees the data (/root/reference/modape/modis/
io.py:436-452: entries below/above ``ValueRange`` and each listed
``NoDataValue`` all reclass to ``min(NoDataValue)``).

Spark-first analogue: a single ``transform(tokens, t -> CASE ...)``
Catalyst expression over the token arrays — per-element, codegen'd, no
UDF, no shuffle; at 10^12 sequences it is a pure map stage fused into the
ingest scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def reclass_expr(col: str, value_range: tuple[int, int],
                 nodata_values: Sequence[int]) -> Column:
    """Element-wise LUT reclass of an array<int> column.

    Values inside ``value_range`` pass through; everything else — below
    range, above range, or any alternate nodata sentinel — becomes the
    canonical ``min(nodata_values)`` (io.py:436-452 semantics)."""
    vmin, vmax = int(value_range[0]), int(value_range[1])
    if not nodata_values:
        raise ValueError("at least one nodata value required")
    canonical = min(int(v) for v in nodata_values)
    if vmin <= canonical <= vmax:
        raise ValueError(
            f"Invalid Data / NoData configuration: canonical nodata "
            f"{canonical} inside value range [{vmin}, {vmax}] "
            f"(io.py:431-434 assertion)"
        )
    return F.expr(
        f"transform({col}, t -> case when t >= {vmin} and t <= {vmax} "
        f"then t else {canonical} end)"
    )


def ingest_reclass(df: DataFrame, value_range: tuple[int, int],
                   nodata_values: Sequence[int],
                   col: str = "tokens") -> DataFrame:
    """Normalize multi-sentinel raw sequences at ingest: one canonical
    nodata, values clamped out-of-range -> nodata (NOT clipped — the
    reference clips only at export, P3)."""
    return df.withColumn(col, reclass_expr(col, value_range, nodata_values))


def reclass_for_product(df: DataFrame, product_sds: str,
                        col: str = "tokens") -> DataFrame:
    """Reclass using the product's published encoding (constants.PRODUCT_SDS,
    mirroring the reference's PRODUCT_SDS_DICT lookup at collect time)."""
    from ..constants import PRODUCT_SDS

    try:
        enc = PRODUCT_SDS[product_sds]
    except KeyError:
        raise KeyError(
            f"unknown product subdataset {product_sds!r}; known: "
            f"{sorted(PRODUCT_SDS)}"
        ) from None
    return ingest_reclass(df, enc["value_range"], enc["nodata_values"], col)
