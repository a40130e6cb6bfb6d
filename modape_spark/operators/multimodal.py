"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The image/audio decode libraries are not available in this container, so the
DECODE step is a deterministic fake clearly marked as such
(``fake_decode_meta``) — but everything Spark-side is real and tested:
binary columns, Arrow batch shape through ``mapInPandas``, schema, and the
partition-local feature-extract pattern a real decoder would drop into.

``q_multimodal_meta`` fabricates a binary blob per document (utf-8 bytes of
the text — a stand-in for image bytes), then runs the extract UDF.  The
blob-level metadata (byte length, header hash) has a DuckDB oracle; the
fake-decoded fields (width/height/n_frames) are deterministic functions of
the header hash, also oracle-checkable — so even the stubbed path is
correctness-gated.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import table

META_SCHEMA = (
    "doc_id long, n_bytes int, header_hash long, width int, height int, n_frames int"
)


def fake_decode_meta(header_hash: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """STUB decoder: deterministic dims from the payload header.

    A real deployment replaces this with PIL/ffmpeg frame probing; the
    Spark-side contract (vectorized in, columnar out) is identical.
    """
    width = (header_hash % 1920 + 16).astype(np.int32)
    height = (header_hash % 1080 + 16).astype(np.int32)
    n_frames = (header_hash % 240 + 1).astype(np.int32)
    return width, height, n_frames


def real_decode_stub(payload: bytes) -> None:
    """Marker for the unavailable decode dependency."""
    raise NotImplementedError("image/audio decode libs not present in this container")


def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        blobs = pdf["payload"]
        n_bytes = blobs.str.len().astype("int32")
        # header hash: first 8 bytes as big-endian uint -> int64 (mod 2^31 to
        # stay oracle-friendly)
        hh = np.array(
            [int.from_bytes(bytes(b[:8]).ljust(8, b"\0"), "big") % 2147483647
             for b in blobs],
            dtype=np.int64,
        )
        w, h, fr = fake_decode_meta(hh)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "n_bytes": n_bytes.to_numpy(),
                "header_hash": hh,
                "width": w,
                "height": h,
                "n_frames": fr,
            }
        )


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    blobs = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return blobs.mapInPandas(_extract, META_SCHEMA).orderBy("doc_id")


# Oracle: the blob is utf-8 of text; header = first 8 bytes zero-padded.
ORACLE_MULTIMODAL = """
    with h as (
        select doc_id,
               strlen(text) as n_bytes,
               list_reduce(
                   list_prepend(0::bigint,
                       list_transform(generate_series(1, 8),
                           i -> coalesce(ascii(text[i:i]), 0)::bigint)),
                   (acc, b) -> (acc * 256 + b) % 2147483647
               ) as header_hash
        from documents
    )
    select doc_id, n_bytes, header_hash,
           (header_hash % 1920 + 16)::int as width,
           (header_hash % 1080 + 16)::int as height,
           (header_hash % 240 + 1)::int as n_frames
    from h
    order by doc_id
"""


QUERIES = {"multimodal_meta": q_multimodal_meta}
ORACLES = {"multimodal_meta": ORACLE_MULTIMODAL}
