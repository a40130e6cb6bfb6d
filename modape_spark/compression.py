"""Gorilla-style payload compression for rolled-up points.

Two codecs, both self-describing per row and both encoded with fully
vectorized numpy bit-packing (no Python-level per-token loops — per-row
numpy calls only, which is the hot-path contract of BASELINE.json):

- ``encode_dod``/``decode_dod``: delta-of-delta for integer token arrays
  (Gorilla timestamp scheme, Pelkonen et al., "Gorilla: A Fast, Scalable,
  In-Memory Time Series Database", VLDB 2015, §4.1): buckets
  '0' | '10'+7b | '110'+9b | '1110'+12b | '11110'+36b(zigzag).
- ``encode_gorilla``/``decode_gorilla``: XOR scheme for float64 arrays
  (ibid. §4.1.2), simplified to two control modes: '0' for zero XOR, else
  '1' + 6b leading-zero count + 6b significant-bit length + bits.  We never
  emit the "reuse previous window" mode (it is inherently sequential and
  would serialize the encoder); decoders remain compatible since every
  block restates its window.

Decoders are sequential bit readers (read path / round-trip tests only —
not on the materialization hot path).

The round-trip invariant ``decode(encode(x)) == x`` (exact) is the
north_rule token-equality contract; see tests/test_compression.py.
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_dod", "encode_dod_rows", "decode_dod", "decode_dod_fast",
           "decode_dod_rows", "decode_dod_value_at", "decode_dod_values_at",
           "encode_gorilla", "decode_gorilla"]

_MAGIC_DOD = 0xD0
_MAGIC_GOR = 0x60


def _pack_ragged(codes_hi: np.ndarray, codes_lo: np.ndarray,
                 lengths: np.ndarray) -> np.ndarray:
    """Concatenate per-element variable-length big-endian bitfields.

    codes_hi/lo: uint64 halves of each element's code (code occupies the
    LOWEST ``lengths`` bits of the 128-bit (hi,lo) pair).
    Returns uint8 array of the packed stream (zero-padded to a byte).
    """
    m = lengths.size
    if m == 0:
        return np.zeros(0, dtype=np.uint8)
    field = np.empty((m, 16), dtype=np.uint8)
    field[:, :8] = codes_hi.astype(">u8").view(np.uint8).reshape(m, 8)
    field[:, 8:] = codes_lo.astype(">u8").view(np.uint8).reshape(m, 8)
    bits = np.unpackbits(field, axis=1)  # (m, 128), MSB-first
    total = int(lengths.sum())
    reps = lengths.astype(np.int64)
    rows = np.repeat(np.arange(m, dtype=np.int64), reps)
    offs = np.repeat(np.cumsum(reps) - reps, reps)
    within = np.arange(total, dtype=np.int64) - offs
    cols = 128 - np.repeat(reps, reps) + within
    stream = bits[rows, cols]
    return np.packbits(stream)


def _zigzag(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.int64)
    return ((x << 1) ^ (x >> 63)).astype(np.uint64)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def encode_dod(values: np.ndarray) -> bytes:
    """Delta-of-delta encode one int array. Header: magic u8, n u32be,
    first value i64be."""
    v = np.asarray(values, dtype=np.int64)
    n = v.size
    head = bytes([_MAGIC_DOD]) + np.array([n], dtype=">u4").tobytes()
    if n == 0:
        return head
    head += np.array([v[0]], dtype=">i8").tobytes()
    if n == 1:
        return head
    d = np.diff(v)
    dod = np.empty(n - 1, dtype=np.int64)
    dod[0] = d[0]
    dod[1:] = d[1:] - d[:-1]
    if np.abs(dod).max(initial=0) >= (1 << 34):
        raise ValueError("delta-of-delta out of 36-bit zigzag range")

    absd = dod
    b0 = absd == 0
    b1 = ~b0 & (absd >= -63) & (absd <= 64)
    b2 = ~b0 & ~b1 & (absd >= -255) & (absd <= 256)
    b3 = ~b0 & ~b1 & ~b2 & (absd >= -2047) & (absd <= 2048)
    b4 = ~(b0 | b1 | b2 | b3)

    lengths = np.select([b0, b1, b2, b3], [1, 9, 12, 16], default=41).astype(np.int64)
    lo = np.zeros(n - 1, dtype=np.uint64)
    # '0'
    lo[b0] = 0
    # '10' + 7 bits (dod+63)
    lo[b1] = (np.uint64(0b10) << np.uint64(7)) | (dod[b1] + 63).astype(np.uint64)
    # '110' + 9 bits (dod+255)
    lo[b2] = (np.uint64(0b110) << np.uint64(9)) | (dod[b2] + 255).astype(np.uint64)
    # '1110' + 12 bits (dod+2047)
    lo[b3] = (np.uint64(0b1110) << np.uint64(12)) | (dod[b3] + 2047).astype(np.uint64)
    # '11110' + 36 bits zigzag
    lo[b4] = (np.uint64(0b11110) << np.uint64(36)) | _zigzag(dod[b4])
    hi = np.zeros(n - 1, dtype=np.uint64)
    return head + _pack_ragged(hi, lo, lengths).tobytes()


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, nbits: int) -> int:
        out = 0
        p = self.pos
        for _ in range(nbits):
            byte = self.data[p >> 3]
            out = (out << 1) | ((byte >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return out


def encode_dod_rows(M: np.ndarray) -> list[bytes]:
    """Encode every row of a same-length integer block through the
    compiled C bit writer (ckernel.dod_encode_rows) — byte-identical to
    ``encode_dod`` per row (tests/test_compression.py asserts equality).

    This is the materialization hot path: profiled at sf0.1, per-row
    numpy packing was 49% of the whole kernel UDF (3 encodes per row x
    ~15 small-array numpy dispatches each); one C call per Arrow batch
    removes all of it.  Falls back to the numpy encoder when the C
    library is unavailable."""
    import ctypes

    from .ckernel import get_lib

    M = np.ascontiguousarray(np.asarray(M), dtype=np.int64)
    if M.ndim != 2:
        raise ValueError("encode_dod_rows expects a 2-D (rows, n) block")
    R, n = M.shape
    lib = get_lib()
    if lib is None or n <= 1 or R == 0:
        return [encode_dod(row) for row in M]
    stride = ((n - 1) * 41 + 7) // 8  # worst case: all 41-bit codes
    out = np.empty(R * stride, dtype=np.uint8)
    lens = np.empty(R, dtype=np.int64)
    rc = lib.dod_encode_rows(
        M.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        int(R), int(n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        int(stride),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)))
    if rc != 0:
        raise ValueError("delta-of-delta out of 36-bit zigzag range")
    head_n = bytes([_MAGIC_DOD]) + np.array([n], dtype=">u4").tobytes()
    firsts = M[:, 0].astype(">i8").tobytes()
    ob = out.tobytes()
    return [
        head_n + firsts[8 * r:8 * r + 8]
        + ob[r * stride:r * stride + int(lens[r])]
        for r in range(R)
    ]


def decode_dod_rows(data: np.ndarray, boffs: np.ndarray
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Decode R concatenated DoD payloads in ONE C call (the read-side
    mirror of encode_dod_rows): ``data`` is the concatenated payload
    bytes (uint8), ``boffs`` the R+1 byte offsets — exactly the Arrow
    BinaryArray buffer layout, so the compact-tier reader feeds this
    zero-copy.  Returns (values int64, offsets int64[R+1]).  Bit-exact
    with decode_dod per row; falls back to it when the C library is
    unavailable."""
    import ctypes

    from .ckernel import get_lib

    data = np.ascontiguousarray(data, dtype=np.uint8)
    boffs = np.ascontiguousarray(boffs, dtype=np.int64)
    R = boffs.size - 1
    starts = boffs[:-1]
    if R == 0:
        return np.empty(0, dtype=np.int64), np.zeros(1, dtype=np.int64)
    if np.any(boffs[1:] - starts < 5):
        raise ValueError("dod payload shorter than header")
    if np.any(data[starts] != _MAGIC_DOD):
        raise ValueError("not a dod payload")
    # vectorized header parse: n = big-endian u4 at bytes 1..4
    ns = ((data[starts + 1].astype(np.int64) << 24)
          | (data[starts + 2].astype(np.int64) << 16)
          | (data[starts + 3].astype(np.int64) << 8)
          | data[starts + 4].astype(np.int64))
    ooffs = np.zeros(R + 1, dtype=np.int64)
    np.cumsum(ns, out=ooffs[1:])
    lib = get_lib()
    if lib is None:
        vals = np.empty(int(ooffs[-1]), dtype=np.int64)
        for r in range(R):
            vals[ooffs[r]:ooffs[r + 1]] = decode_dod(
                data[boffs[r]:boffs[r + 1]].tobytes())
        return vals, ooffs
    out = np.empty(int(ooffs[-1]), dtype=np.int64)
    rc = lib.dod_decode_rows(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        boffs.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        ooffs.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        int(R),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)))
    if rc != 0:
        raise ValueError(
            f"dod stream overrun (corrupt payload at row {-rc - 1})")
    return out, ooffs


def decode_dod(buf: bytes) -> np.ndarray:
    assert buf[0] == _MAGIC_DOD, "not a dod payload"
    n = int(np.frombuffer(buf[1:5], dtype=">u4")[0])
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    out[0] = int(np.frombuffer(buf[5:13], dtype=">i8")[0])
    r = _BitReader(buf[13:])
    prev = out[0]
    prev_d = 0
    for i in range(1, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            r.read(1)  # trailing 0 of the '11110' escape prefix
            dod = _unzigzag(r.read(36))
        prev_d += dod
        prev += prev_d
        out[i] = prev
    return out


def decode_dod_fast(buf: bytes) -> np.ndarray:
    """DoD decode through the compiled C bit reader (ckernel.py) — the
    read path of the compact tier tables, ~100x the pure-python reader.
    Bit-exact with decode_dod (tests/test_compression.py); falls back to
    the python reader when the C library is unavailable."""
    import ctypes

    from .ckernel import get_lib

    lib = get_lib()
    if lib is None:
        return decode_dod(buf)
    assert buf[0] == _MAGIC_DOD, "not a dod payload"
    n = int(np.frombuffer(buf[1:5], dtype=">u4")[0])
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    first = int(np.frombuffer(buf[5:13], dtype=">i8")[0])
    if n == 1:
        out[0] = first
        return out
    stream = np.frombuffer(buf, dtype=np.uint8, offset=13)
    rc = lib.dod_decode_stream(
        stream.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        int(stream.size), ctypes.c_longlong(first),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), int(n))
    if rc != 0:
        raise ValueError("dod stream overrun (corrupt payload)")
    return out


def decode_dod_prefix(buf: bytes, k: int) -> np.ndarray:
    """Decode only the first ``k`` values of a DoD payload (the stream is
    sequential, so a position-``k`` export reads k codes, not the whole
    row — at 10^12 rows that is the difference between touching the
    retention tail and replaying history)."""
    import ctypes

    from .ckernel import get_lib

    assert buf[0] == _MAGIC_DOD, "not a dod payload"
    n = int(np.frombuffer(buf[1:5], dtype=">u4")[0])
    k = min(int(k), n)
    out = np.empty(k, dtype=np.int64)
    if k == 0:
        return out
    first = int(np.frombuffer(buf[5:13], dtype=">i8")[0])
    if k == 1:
        out[0] = first
        return out
    lib = get_lib()
    if lib is None:
        return decode_dod(buf)[:k]
    stream = np.frombuffer(buf, dtype=np.uint8, offset=13)
    rc = lib.dod_decode_stream(
        stream.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        int(stream.size), ctypes.c_longlong(first),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), int(k))
    if rc != 0:
        raise ValueError("dod stream overrun (corrupt payload)")
    return out


def decode_dod_value_at(data: np.ndarray, boffs: np.ndarray, k: int
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Value #``k`` (1-based) of each of R concatenated payloads in one
    C call, never materializing the prefixes — the batched form of
    decode_dod_prefix for the per-date compact export.  Returns
    (values int64[R], valid bool[R]); valid[r] is False when the stored
    array is shorter than k (NULL export contract).

    Thin wrapper over the vector form (decode_dod_values_at with a
    constant position vector) so exactly ONE decode walk exists — a
    decoder fix can never reach the scalar path and miss the vector
    path or vice versa."""
    if k < 1:
        raise ValueError("position is 1-based")
    boffs = np.ascontiguousarray(boffs, dtype=np.int64)
    return decode_dod_values_at(
        data, boffs, np.full(max(boffs.size - 1, 0), int(k),
                             dtype=np.int64))


def decode_dod_values_at(data: np.ndarray, boffs: np.ndarray,
                         ks: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-row-position batched decode: value #``ks[r]`` (1-based) of
    payload r, in one C call.  ``ks[r] < 1`` marks a row whose grid lacks
    the wanted date — NULL, no decode.  This is the vector form of
    decode_dod_value_at that lets a calendar-date export over a
    mixed-length table run as ONE scan (the position is a function of
    n_tok, already a column).  Returns (values int64[R], valid bool[R])."""
    import ctypes

    from .ckernel import get_lib

    data = np.ascontiguousarray(data, dtype=np.uint8)
    boffs = np.ascontiguousarray(boffs, dtype=np.int64)
    ks = np.ascontiguousarray(ks, dtype=np.int64)
    R = boffs.size - 1
    if ks.size != R:
        raise ValueError("ks must have one position per payload")
    vals = np.zeros(R, dtype=np.int64)
    valid = np.zeros(R, dtype=np.uint8)
    if R == 0:
        return vals, valid.astype(bool)
    lib = get_lib()
    if lib is None:
        for r in range(R):
            k = int(ks[r])
            if k < 1:
                continue
            pre = decode_dod_prefix(
                data[boffs[r]:boffs[r + 1]].tobytes(), k)
            if pre.size >= k:
                vals[r] = pre[k - 1]
                valid[r] = 1
        return vals, valid.astype(bool)
    rc = lib.dod_value_at_rows_vec(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        boffs.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        int(R),
        ks.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    if rc != 0:
        raise ValueError(
            f"dod stream overrun (corrupt payload at row {-rc - 1})")
    return vals, valid.astype(bool)


def encode_gorilla(values: np.ndarray) -> bytes:
    """XOR-encode one float64 array. Header: magic u8, n u32be,
    first value f64be."""
    v = np.ascontiguousarray(values, dtype=np.float64)
    n = v.size
    head = bytes([_MAGIC_GOR]) + np.array([n], dtype=">u4").tobytes()
    if n == 0:
        return head
    head += np.array([v[0]], dtype=">f8").tobytes()
    if n == 1:
        return head
    bits = v.view(np.uint64)
    x = bits[1:] ^ bits[:-1]

    zero = x == 0
    # leading/trailing zero counts via byte decomposition + LUT
    bytes_be = x.astype(">u8").view(np.uint8).reshape(-1, 8)
    nz = bytes_be != 0
    first_nz = np.argmax(nz, axis=1)
    last_nz = 7 - np.argmax(nz[:, ::-1], axis=1)
    lut_lz = np.array([8 if b == 0 else 8 - int(b).bit_length() for b in range(256)], dtype=np.int64)
    lut_tz = np.array([8 if b == 0 else (int(b) & -int(b)).bit_length() - 1 for b in range(256)], dtype=np.int64)
    lz = first_nz * 8 + lut_lz[bytes_be[np.arange(x.size), first_nz]]
    tz = (7 - last_nz) * 8 + lut_tz[bytes_be[np.arange(x.size), last_nz]]
    lz = np.where(zero, 0, np.minimum(lz, 63))  # 6-bit field
    tz = np.where(zero, 0, tz)
    sig = np.where(zero, 0, 64 - lz - tz)       # significant bit count, 1..64

    lengths = np.where(zero, 1, 13 + sig).astype(np.int64)
    payload = np.where(zero, np.uint64(0), x >> tz.astype(np.uint64))
    # code = '1' + lz(6) + (sig-1)(6) + payload(sig)   [sig stored minus one]
    siglen_field = np.where(zero, 0, sig - 1).astype(np.uint64)
    ctrl = (np.uint64(1) << np.uint64(12)) | (lz.astype(np.uint64) << np.uint64(6)) | siglen_field
    total_lo_bits = 13 + sig  # may exceed 64 -> use 128-bit field
    shifted_ctrl_hi = np.zeros(x.size, dtype=np.uint64)
    shifted_ctrl_lo = np.zeros(x.size, dtype=np.uint64)
    nzm = ~zero
    sh = sig[nzm].astype(np.uint64)
    c = ctrl[nzm]
    p = payload[nzm]
    # place ctrl above payload within the 128-bit (hi,lo) pair:
    # value = (ctrl << sig) | payload; sig <= 64 so ctrl may spill into hi.
    lo = np.empty_like(p)
    hi = np.empty_like(p)
    small = sh < 64
    lo[small] = (c[small] << sh[small]) | p[small]
    hi[small] = c[small] >> (np.uint64(64) - sh[small])
    lo[~small] = p[~small]  # sig == 64: payload fills lo, ctrl sits in hi
    hi[~small] = c[~small]
    shifted_ctrl_lo[nzm] = lo
    shifted_ctrl_hi[nzm] = hi
    return head + _pack_ragged(shifted_ctrl_hi, shifted_ctrl_lo, lengths).tobytes()


def decode_gorilla(buf: bytes) -> np.ndarray:
    assert buf[0] == _MAGIC_GOR, "not a gorilla payload"
    n = int(np.frombuffer(buf[1:5], dtype=">u4")[0])
    out = np.empty(n, dtype=np.float64)
    if n == 0:
        return out
    out[0] = float(np.frombuffer(buf[5:13], dtype=">f8")[0])
    r = _BitReader(buf[13:])
    prev = int(np.float64(out[0]).view(np.uint64))
    for i in range(1, n):
        if r.read(1) == 0:
            x = 0
        else:
            lz = r.read(6)
            sig = r.read(6) + 1
            tz = 64 - lz - sig
            x = r.read(sig) << tz
        prev ^= x
        out[i] = np.uint64(prev).view(np.float64)
    return out
