"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The decode step is REAL: a minimal grayscale PNG codec on stdlib zlib
(``encode_png_gray`` / ``decode_png_gray``) — signature, IHDR/IDAT/IEND
chunking with CRC32 verification, and all five PNG scanline filters
(None/Sub/Up/Average/Paeth, RFC 2083 §6).  No external image libraries.

``q_multimodal_png`` synthesizes a deterministic grayscale image per
document (pixel values a closed-form function of doc_id), round-trips it
through encode -> zlib -> decode -> unfilter inside ``mapInPandas``, and
emits stats computed from the DECODED pixels.  Because the pixels are a
closed-form function of doc_id, the DuckDB oracle recomputes the expected
width/height/pixel-sums directly in SQL — so a wrong decoder (bad filter
math, bad chunk parse, CRC skip) fails the oracle hash, not just a
self-test.

Scale shape: one column in, columnar stats out, per-partition Arrow
batches, embarrassingly parallel, no shuffle.  The encoder cycles filter
types per row so every decode branch executes on every image.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .common import table

PNG_SIG = b"\x89PNG\r\n\x1a\n"

META_SCHEMA = (
    "doc_id long, width int, height int, n_px long, px_sum long, "
    "px_corner int, px_mean_x100 long"
)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data)))


def _paeth(left: np.ndarray, up: np.ndarray, ul: np.ndarray) -> np.ndarray:
    """Paeth predictor (RFC 2083 §6.6), vectorized across a scanline."""
    a, b, c = left.astype(np.int32), up.astype(np.int32), ul.astype(np.int32)
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png_gray(px: np.ndarray) -> bytes:
    """Minimal 8-bit grayscale PNG encoder (colour type 0, no interlace).

    Cycles the five scanline filters row-by-row so the decoder's every
    unfilter branch is exercised by every image."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    h, w = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w, dtype=np.uint8)
    for y in range(h):
        row = px[y]
        left = np.concatenate(([0], row[:-1])).astype(np.uint8)
        ul = np.concatenate(([0], prev[:-1])).astype(np.uint8)
        ftype = y % 5
        if ftype == 0:
            filt = row
        elif ftype == 1:
            filt = row - left          # uint8 wraparound == mod 256
        elif ftype == 2:
            filt = row - prev
        elif ftype == 3:
            filt = row - ((left.astype(np.int32) + prev) // 2).astype(np.uint8)
        else:
            filt = row - _paeth(left, prev, ul)
        raw.append(ftype)
        raw.extend(filt.tobytes())
        prev = row
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def decode_png_gray(data: bytes) -> np.ndarray:
    """Minimal 8-bit grayscale PNG decoder: chunk walk with CRC32
    verification, zlib inflate, and full unfilter (all five types)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, width, height, idat = 8, None, None, bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(typ + body) != crc:
            raise ValueError(f"CRC mismatch in {typ!r}")
        if typ == b"IHDR":
            width, height, depth, ctype = struct.unpack(">IIBB", body[:10])
            if depth != 8 or ctype != 0:
                raise ValueError("only 8-bit grayscale supported")
        elif typ == b"IDAT":
            idat.extend(body)
        elif typ == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width + 1
    if len(raw) != stride * height:
        raise ValueError("bad IDAT length")
    px = np.zeros((height, width), dtype=np.uint8)
    prev = np.zeros(width, dtype=np.uint8)
    for y in range(height):
        ftype = raw[y * stride]
        filt = np.frombuffer(raw, dtype=np.uint8,
                             count=width, offset=y * stride + 1)
        if ftype == 0:
            row = filt.copy()
        elif ftype == 1:   # Sub: recon[x] = filt[x] + recon[x-1] -> cumsum
            row = (np.cumsum(filt.astype(np.uint64)) % 256).astype(np.uint8)
        elif ftype == 2:   # Up
            row = filt + prev
        elif ftype == 3:   # Average: intra-row dependency, scalar scan
            row = np.zeros(width, dtype=np.uint8)
            left = 0
            for x in range(width):
                row[x] = (int(filt[x]) + (left + int(prev[x])) // 2) % 256
                left = int(row[x])
        elif ftype == 4:   # Paeth: intra-row dependency, scalar scan
            row = np.zeros(width, dtype=np.uint8)
            for x in range(width):
                a = int(row[x - 1]) if x else 0
                b = int(prev[x])
                c = int(prev[x - 1]) if x else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (int(filt[x]) + pred) % 256
        else:
            raise ValueError(f"unknown filter {ftype}")
        px[y] = row
        prev = row
    return px


def synth_pixels(doc_id: int) -> np.ndarray:
    """Deterministic grayscale image per doc: closed-form in doc_id so the
    SQL oracle can recompute every decoded stat without a decoder."""
    w = doc_id % 97 + 16
    h = doc_id % 61 + 16
    y = np.arange(h, dtype=np.int64)[:, None]
    x = np.arange(w, dtype=np.int64)[None, :]
    return ((doc_id * 31 + y * 7 + x * 13) % 256).astype(np.uint8)


def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids = pdf["doc_id"].to_numpy()
        out = {k: [] for k in ("width", "height", "n_px", "px_sum",
                               "px_corner")}
        for d in ids:
            blob = encode_png_gray(synth_pixels(int(d)))   # the "stored" bytes
            px = decode_png_gray(blob)                     # the REAL decode
            h, w = px.shape
            out["width"].append(w)
            out["height"].append(h)
            out["n_px"].append(h * w)
            out["px_sum"].append(int(px.sum(dtype=np.int64)))
            out["px_corner"].append(int(px[h - 1, w - 1]))
        res = pd.DataFrame({"doc_id": ids, **out})
        res["px_mean_x100"] = res["px_sum"] * 100 // res["n_px"]
        yield res


def q_multimodal_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(_extract, META_SCHEMA).orderBy("doc_id")


# Oracle: pixels are (doc_id*31 + y*7 + x*13) % 256 over an
# (doc_id%61+16) x (doc_id%97+16) grid; expected decoded stats recomputed
# via correlated generate_series — if the PNG decoder mangles any filter
# branch, px_sum/px_corner hash-mismatch here.
ORACLE_MULTIMODAL = """
    with dims as (
        select doc_id,
               (doc_id % 97 + 16) as w,
               (doc_id % 61 + 16) as h
        from documents
    )
    select d.doc_id,
           cast(d.w as int) as width,
           cast(d.h as int) as height,
           cast(d.w * d.h as bigint) as n_px,
           cast(sum((d.doc_id * 31 + yy.y * 7 + xx.x * 13) % 256) as bigint)
               as px_sum,
           cast((d.doc_id * 31 + (d.h - 1) * 7 + (d.w - 1) * 13) % 256 as int)
               as px_corner,
           cast(sum((d.doc_id * 31 + yy.y * 7 + xx.x * 13) % 256) * 100
                // (d.w * d.h) as bigint) as px_mean_x100
    from dims d
    join generate_series(0, 75) yy(y) on yy.y < d.h
    join generate_series(0, 111) xx(x) on xx.x < d.w
    group by d.doc_id, d.w, d.h
    order by d.doc_id
"""


QUERIES = {"multimodal_meta": q_multimodal_png}
ORACLES = {"multimodal_meta": ORACLE_MULTIMODAL}
