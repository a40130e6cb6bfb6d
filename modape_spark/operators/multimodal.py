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
from ..plans.partitioning import ordered_result

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
    from ..ckernel import png_unfilter_c

    px_c = png_unfilter_c(raw, height, width)
    if px_c is not None:
        return px_c
    # pure-Python unfilter fallback (no gcc): identical byte semantics,
    # asserted against the C path in tests/test_multimodal.py
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
    # ordered_result: a final orderBy would range-SAMPLE by executing the
    # whole PNG-decode pipeline a second time (plans/partitioning.py)
    return ordered_result(docs.mapInPandas(_extract, META_SCHEMA), "doc_id")


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


# ---------------------------------------------------------------------------
# Audio modality: real RIFF/WAVE codec (stdlib struct only)
# ---------------------------------------------------------------------------

AUDIO_SCHEMA = ("doc_id long, sr int, n_samples int, sum_s long, "
                "sum_abs long, peak int, zero_cross int")


def synth_pcm(doc_id: int) -> tuple[np.ndarray, int]:
    """Deterministic 16-bit PCM per doc: closed-form in doc_id so the SQL
    oracle recomputes every decoded stat without a decoder.
    s[i] = ((a*i + b) % 2003) - 1001,  a = 37 + doc%11, b = doc%101."""
    n = 400 + (doc_id % 7) * 50
    a = 37 + (doc_id % 11)
    b = doc_id % 101
    i = np.arange(n, dtype=np.int64)
    s = ((a * i + b) % 2003) - 1001
    sr = 8000 + (doc_id % 3) * 4000
    return s.astype(np.int16), sr


def encode_wav(pcm: np.ndarray, sr: int) -> bytes:
    """Canonical RIFF/WAVE container: fmt chunk (PCM mono 16-bit) + a
    deliberate non-audio LIST chunk BEFORE data, so the decoder must walk
    chunks by their length fields rather than assume fixed offsets."""
    data = pcm.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
    junk = b"INFOISFT" + b"modape\x00\x00"
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"LIST" + struct.pack("<I", len(junk)) + junk
              + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(blob: bytes) -> tuple[int, np.ndarray]:
    """Chunk-walking WAV parser: validates RIFF/WAVE framing, PCM mono
    16-bit format, skips unknown chunks (incl. odd-length padding per the
    RIFF spec), returns (sample_rate, int16 samples)."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    riff_len = struct.unpack("<I", blob[4:8])[0]
    if riff_len + 8 != len(blob):
        raise ValueError("RIFF length mismatch")
    pos, sr, bits, ch, fmt_code, data = 12, None, None, None, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos:pos + 4]
        clen = struct.unpack("<I", blob[pos + 4:pos + 8])[0]
        if pos + 8 + clen > len(blob):
            # an inner length overrunning the blob must never silently
            # truncate a chunk (a corrupt data chunk would otherwise yield
            # fewer samples without error)
            raise ValueError(f"chunk {cid!r} length {clen} overruns payload")
        body = blob[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("fmt chunk shorter than PCM header")
            fmt_code, ch, sr, _, _, bits = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # RIFF pads odd chunks
    if fmt_code != 1 or ch != 1 or bits != 16:
        raise ValueError(f"unsupported WAV format ({fmt_code},{ch},{bits})")
    if sr is None or data is None:
        raise ValueError("missing fmt /data chunk")
    return int(sr), np.frombuffer(data, dtype="<i2")


def _extract_audio(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids = pdf["doc_id"].to_numpy()
        rows = {k: [] for k in ("sr", "n_samples", "sum_s", "sum_abs",
                                "peak", "zero_cross")}
        for d in ids:
            pcm, sr0 = synth_pcm(int(d))
            blob = encode_wav(pcm, sr0)              # the "stored" bytes
            sr, s = decode_wav(blob)                 # the REAL decode
            s64 = s.astype(np.int64)
            rows["sr"].append(sr)
            rows["n_samples"].append(s.size)
            rows["sum_s"].append(int(s64.sum()))
            rows["sum_abs"].append(int(np.abs(s64).sum()))
            rows["peak"].append(int(np.abs(s64).max()))
            rows["zero_cross"].append(int((s64[:-1] * s64[1:] < 0).sum()))
        yield pd.DataFrame({"doc_id": ids, **rows})


def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id")
    return ordered_result(
        docs.mapInPandas(_extract_audio, AUDIO_SCHEMA), "doc_id")


# samples are ((a*i+b) % 2003) - 1001 with a = 37 + doc%11, b = doc%101,
# n = 400 + (doc%7)*50 — every decoded stat recomputed closed-form; a
# decoder that misparses the chunk walk or byte order hash-mismatches.
ORACLE_AUDIO = """
    with p as (
        select doc_id,
               (400 + (doc_id % 7) * 50) as n,
               (37 + (doc_id % 11)) as a,
               (doc_id % 101) as b
        from documents
    )
    select p.doc_id,
           cast(8000 + (p.doc_id % 3) * 4000 as int) as sr,
           cast(p.n as int) as n_samples,
           cast(sum((p.a * ii.i + p.b) % 2003 - 1001) as bigint) as sum_s,
           cast(sum(abs((p.a * ii.i + p.b) % 2003 - 1001)) as bigint)
               as sum_abs,
           cast(max(abs((p.a * ii.i + p.b) % 2003 - 1001)) as int) as peak,
           cast(sum(case when ii.i >= 1
                          and ((p.a * (ii.i - 1) + p.b) % 2003 - 1001)
                            * ((p.a * ii.i + p.b) % 2003 - 1001) < 0
                         then 1 else 0 end) as int) as zero_cross
    from p
    join generate_series(0, 749) ii(i) on ii.i < p.n
    group by p.doc_id, p.n
    order by p.doc_id
"""


# ---------------------------------------------------------------------------
# Video modality: frame container + every-kth frame sampling
# ---------------------------------------------------------------------------

FRAMES_SCHEMA = "doc_id long, frame_ix int, px_sum long, px_corner int"
FRAME_STEP = 3


def synth_frame(doc_id: int, f: int, w: int, h: int) -> np.ndarray:
    y = np.arange(h, dtype=np.int64)[:, None]
    x = np.arange(w, dtype=np.int64)[None, :]
    return ((doc_id * 17 + f * 29 + y * 7 + x * 13) % 256).astype(np.uint8)


def encode_frames(doc_id: int) -> bytes:
    """Toy frame container: magic + (n_frames, w, h) header, then one
    length-prefixed raw grayscale payload per frame, plus a trailing
    length-prefixed metadata record the sampler must skip by length."""
    n_frames = 4 + doc_id % 5
    w = 16 + doc_id % 9
    h = 12 + doc_id % 7
    out = [b"FRMS", struct.pack("<HHH", n_frames, w, h)]
    for f in range(n_frames):
        payload = synth_frame(doc_id, f, w, h).tobytes()
        out.append(struct.pack("<I", len(payload)))
        out.append(payload)
    meta = b"META" + struct.pack("<q", doc_id)
    out.append(struct.pack("<I", len(meta)))
    out.append(meta)
    return b"".join(out)


def sample_frames(blob: bytes, step: int) -> tuple[int, int, list]:
    """Walk the container by length fields and DECODE only every
    ``step``-th frame — the frame-sampling access pattern (skipped frames
    are seeked over, never materialized)."""
    if blob[:4] != b"FRMS":
        raise ValueError("not a FRMS container")
    n_frames, w, h = struct.unpack("<HHH", blob[4:10])
    pos, out = 10, []
    for f in range(n_frames):
        plen = struct.unpack("<I", blob[pos:pos + 4])[0]
        if f % step == 0:
            px = np.frombuffer(blob[pos + 4:pos + 4 + plen],
                               dtype=np.uint8).reshape(h, w)
            out.append((f, px))
        pos += 4 + plen
    return w, h, out


def _extract_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        doc_ids, fix, sums, corners = [], [], [], []
        for d in pdf["doc_id"].to_numpy():
            blob = encode_frames(int(d))
            w, h, frames = sample_frames(blob, FRAME_STEP)
            for f, px in frames:
                doc_ids.append(int(d))
                fix.append(f)
                sums.append(int(px.sum(dtype=np.int64)))
                corners.append(int(px[h - 1, w - 1]))
        yield pd.DataFrame({"doc_id": doc_ids, "frame_ix": fix,
                            "px_sum": sums, "px_corner": corners})


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id")
    return ordered_result(docs.mapInPandas(_extract_frames, FRAMES_SCHEMA),
                          "doc_id", "frame_ix")


ORACLE_FRAMES = """
    with p as (
        select doc_id,
               (4 + doc_id % 5) as n_frames,
               (16 + doc_id % 9) as w,
               (12 + doc_id % 7) as h
        from documents
    )
    select p.doc_id,
           cast(ff.f as int) as frame_ix,
           cast(sum((p.doc_id * 17 + ff.f * 29 + yy.y * 7 + xx.x * 13)
                    % 256) as bigint) as px_sum,
           cast((p.doc_id * 17 + ff.f * 29 + (p.h - 1) * 7
                 + (p.w - 1) * 13) % 256 as int) as px_corner
    from p
    join generate_series(0, 8) ff(f) on ff.f < p.n_frames and ff.f % 3 = 0
    join generate_series(0, 18) yy(y) on yy.y < p.h
    join generate_series(0, 24) xx(x) on xx.x < p.w
    group by p.doc_id, ff.f, p.w, p.h
    order by p.doc_id, frame_ix
"""


# ---------------------------------------------------------------------------
# Cross-modal dedup: modality payload hashes joined to the documents
# exact-dedup path
# ---------------------------------------------------------------------------

XMODAL_SCHEMA = ("doc_id long, audio_md5 string, frames_md5 string, "
                 "sr int, fw int, fh int")


def _extract_xmodal(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-doc modality content hashes through the REAL codecs: md5 of the
    encoded WAV payload bytes, and md5 of the concatenated SAMPLED frame
    payloads (content hash of what the sampler decodes — deliberately
    excludes the container's trailing metadata record, which embeds
    doc_id and would make every payload trivially unique)."""
    import hashlib

    for pdf in batches:
        ids = pdf["doc_id"].to_numpy()
        rows = {k: [] for k in ("audio_md5", "frames_md5", "sr", "fw", "fh")}
        for d in ids:
            pcm, sr0 = synth_pcm(int(d))
            blob = encode_wav(pcm, sr0)
            sr, _ = decode_wav(blob)                 # decoded, not assumed
            fblob = encode_frames(int(d))
            w, h, frames = sample_frames(fblob, FRAME_STEP)
            rows["audio_md5"].append(hashlib.md5(blob).hexdigest())
            rows["frames_md5"].append(
                hashlib.md5(b"".join(px.tobytes() for _, px in frames))
                .hexdigest())
            rows["sr"].append(sr)
            rows["fw"].append(w)
            rows["fh"].append(h)
        yield pd.DataFrame({"doc_id": ids, **rows})


def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal dedup gate: for every text-duplicate candidate pair
    (the documents exact-dedup content key), check whether the pair's
    AUDIO payloads and sampled VIDEO-FRAME content are also identical —
    the "same text, same media?" join a multimodal training-data dedup
    pipeline runs before collapsing a pair.

    Equality is by content hash from the real encode->decode codecs.
    Because the synthetic payloads are closed-form in doc_id, hash
    equality has an exact arithmetic characterization the DuckDB oracle
    recomputes without any codec — a hash pipeline that produced false
    positives OR false negatives anywhere mismatches.

    Scale shape: the pair list is the (small) dedup-candidate output;
    the feature relation is one embarrassingly-parallel codec pass over
    the corpus, joined twice on doc_id (broadcast at this SF; a plain
    hash join keyed on doc_id at 10^12 rows)."""
    from pyspark.sql import functions as F

    from .common import register_views, table

    register_views(spark, sf_dir, ("documents",))
    pairs = spark.sql("""
        with keyed as (
            select doc_id,
                   md5(concat_ws(' ', slice(split(lower(text), ' '), 1, 8)))
                       as content_key
            from documents
        )
        select a.doc_id as doc_a, b.doc_id as doc_b
        from keyed a join keyed b
          on a.content_key = b.content_key and a.doc_id < b.doc_id
    """)
    feats = (table(spark, sf_dir, "documents").select("doc_id")
             .mapInPandas(_extract_xmodal, XMODAL_SCHEMA))
    fa = feats.select(*[F.col(c).alias(f"{c}_a") for c in feats.columns])
    fb = feats.select(*[F.col(c).alias(f"{c}_b") for c in feats.columns])
    out = (
        pairs
        .join(fa, pairs.doc_a == fa.doc_id_a)
        .join(fb, pairs.doc_b == fb.doc_id_b)
        .select(
            "doc_a", "doc_b",
            (F.col("sr_a") == F.col("sr_b")).cast("int").alias("sr_match"),
            ((F.col("fw_a") == F.col("fw_b"))
             & (F.col("fh_a") == F.col("fh_b"))).cast("int")
            .alias("dims_match"),
            (F.col("audio_md5_a") == F.col("audio_md5_b")).cast("int")
            .alias("audio_match"),
            ((F.col("fw_a") == F.col("fw_b"))
             & (F.col("fh_a") == F.col("fh_b"))
             & (F.col("frames_md5_a") == F.col("frames_md5_b"))).cast("int")
            .alias("frames_match")))
    return ordered_result(out, "doc_a", "doc_b")


# closed-form equality characterization: the WAV payload is a pure
# function of (doc%7, doc%11, doc%101, doc%3); sampled frame content of
# (doc%9, doc%7) dims, doc%256 pixel phase (17 is invertible mod 256) and
# the sampled-frame set ({0,3} iff doc%5 < 3 else {0,3,6}).
ORACLE_XMODAL_DEDUP = """
    with keyed as (
        select doc_id,
               md5(array_to_string(string_split(lower(text), ' ')[1:8], ' '))
                   as content_key
        from documents
    ),
    pairs as (
        select a.doc_id as doc_a, b.doc_id as doc_b
        from keyed a join keyed b
          on a.content_key = b.content_key and a.doc_id < b.doc_id
    )
    select doc_a, doc_b,
           cast(doc_a % 3 = doc_b % 3 as int) as sr_match,
           cast(doc_a % 9 = doc_b % 9 and doc_a % 7 = doc_b % 7 as int)
               as dims_match,
           cast(doc_a % 7 = doc_b % 7 and doc_a % 11 = doc_b % 11
                and doc_a % 101 = doc_b % 101 and doc_a % 3 = doc_b % 3
                as int) as audio_match,
           cast(doc_a % 9 = doc_b % 9 and doc_a % 7 = doc_b % 7
                and doc_a % 256 = doc_b % 256
                and (doc_a % 5 < 3) = (doc_b % 5 < 3) as int) as frames_match
    from pairs
    order by doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# Image resize: REAL decode -> 2x2 box downsample (the thumbnail /
# feature-pyramid access pattern).  Floor-average per output pixel keeps
# every value integer-exact, so the oracle recomputes the resized stats
# closed-form from the pixel function — any decode OR downsample indexing
# bug (row/col swap, off-by-one on the odd edge crop) hash-mismatches.
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = ("doc_id long, out_w int, out_h int, r_sum bigint, "
                 "r_corner int")


def resize_box2(px: np.ndarray) -> np.ndarray:
    """2x2 box downsample, floor average; odd trailing row/col cropped
    (the standard pyramid-level contract)."""
    h2, w2 = px.shape[0] // 2, px.shape[1] // 2
    blocks = px[: h2 * 2, : w2 * 2].astype(np.int64)
    return (blocks.reshape(h2, 2, w2, 2).sum(axis=(1, 3)) // 4)


def _extract_resized(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids = pdf["doc_id"].to_numpy()
        out = {k: [] for k in ("out_w", "out_h", "r_sum", "r_corner")}
        for d in ids:
            blob = encode_png_gray(synth_pixels(int(d)))
            small = resize_box2(decode_png_gray(blob))   # REAL decode path
            h2, w2 = small.shape
            out["out_w"].append(w2)
            out["out_h"].append(h2)
            out["r_sum"].append(int(small.sum(dtype=np.int64)))
            out["r_corner"].append(int(small[h2 - 1, w2 - 1]))
        yield pd.DataFrame({"doc_id": ids, **out})


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id")
    return ordered_result(
        docs.mapInPandas(_extract_resized, RESIZE_SCHEMA), "doc_id")


def _px(y: str, x: str) -> str:
    return f"(d.doc_id * 31 + ({y}) * 7 + ({x}) * 13) % 256"


ORACLE_RESIZE = f"""
    with dims as (
        select doc_id,
               (doc_id % 97 + 16) // 2 as w2,
               (doc_id % 61 + 16) // 2 as h2
        from documents
    )
    select d.doc_id,
           cast(d.w2 as int) as out_w,
           cast(d.h2 as int) as out_h,
           cast(sum(({_px('2*yy.y', '2*xx.x')} + {_px('2*yy.y', '2*xx.x+1')}
                     + {_px('2*yy.y+1', '2*xx.x')}
                     + {_px('2*yy.y+1', '2*xx.x+1')}) // 4) as bigint)
               as r_sum,
           cast(({_px('2*d.h2-2', '2*d.w2-2')} + {_px('2*d.h2-2', '2*d.w2-1')}
                 + {_px('2*d.h2-1', '2*d.w2-2')}
                 + {_px('2*d.h2-1', '2*d.w2-1')}) // 4 as int) as r_corner
    from dims d
    join generate_series(0, 37) yy(y) on yy.y < d.h2
    join generate_series(0, 55) xx(x) on xx.x < d.w2
    group by d.doc_id, d.w2, d.h2
    order by d.doc_id
"""


QUERIES = {
    "multimodal_meta": q_multimodal_png,
    "multimodal_resize": q_multimodal_resize,
    "multimodal_audio": q_multimodal_audio,
    "multimodal_frames": q_multimodal_frames,
    "multimodal_dedup": q_multimodal_dedup,
}
ORACLES = {
    "multimodal_meta": ORACLE_MULTIMODAL,
    "multimodal_resize": ORACLE_RESIZE,
    "multimodal_audio": ORACLE_AUDIO,
    "multimodal_frames": ORACLE_FRAMES,
    "multimodal_dedup": ORACLE_XMODAL_DEDUP,
}
