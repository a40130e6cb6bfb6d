"""Round-trip invariants for the rolled-up-point codecs (north_rule:
reconstructed token arrays equal the original EXACTLY)."""

from __future__ import annotations

import numpy as np
import pytest

from modape_spark.compression import (
    decode_dod,
    decode_gorilla,
    encode_dod,
    encode_gorilla,
)
from modape_spark.fixtures import gen_tokens_block


@pytest.mark.parametrize("n", [0, 1, 2, 3, 16, 742])
def test_dod_roundtrip_lengths(n):
    rng = np.random.default_rng(7)
    v = rng.integers(-3000, 10000, size=n)
    assert np.array_equal(decode_dod(encode_dod(v)), v)


def test_dod_roundtrip_fixture_tokens():
    ids = np.arange(50, dtype=np.int64)
    block = gen_tokens_block(ids, 742)
    for row in block:
        out = decode_dod(encode_dod(row))
        assert np.array_equal(out, row.astype(np.int64))


def test_dod_compresses_smooth_series():
    t = np.arange(742)
    smooth = np.rint(4000 + 3000 * np.sin(2 * np.pi * t / 46)).astype(np.int64)
    enc = encode_dod(smooth)
    assert len(enc) < smooth.size * 4 * 0.5  # beats raw int32 by >2x
    assert np.array_equal(decode_dod(enc), smooth)


def test_dod_extreme_buckets():
    v = np.array([0, 1, 65, -64, 300, -250, 2100, -2000, 10**9, -(10**9), 0, 0])
    assert np.array_equal(decode_dod(encode_dod(v)), v)


def test_dod_out_of_range_raises():
    v = np.array([0, 2**40, 0])
    with pytest.raises(ValueError):
        encode_dod(v)


@pytest.mark.parametrize("n", [0, 1, 2, 5, 100])
def test_gorilla_roundtrip_random(n):
    rng = np.random.default_rng(11)
    v = rng.normal(0, 1000, n)
    out = decode_gorilla(encode_gorilla(v))
    assert v.tobytes() == out.tobytes()  # bit-exact incl. -0.0 / NaN patterns


def test_gorilla_roundtrip_special_values():
    v = np.array([0.0, -0.0, 1.5, 1.5, np.inf, -np.inf, np.nan, 3.14, 2.0**-1030])
    out = decode_gorilla(encode_gorilla(v))
    assert v.tobytes() == out.tobytes()


def test_gorilla_constant_series_tiny():
    v = np.full(1000, 123.456)
    enc = encode_gorilla(v)
    assert len(enc) < 160  # ~1 bit per repeat
    assert np.array_equal(decode_gorilla(enc), v)


def test_gorilla_smooth_series_compresses():
    t = np.arange(742)
    v = np.rint(4000 + 3000 * np.sin(2 * np.pi * t / 46.0))
    enc = encode_gorilla(v)
    assert len(enc) < v.size * 8
    out = decode_gorilla(enc)
    assert v.tobytes() == out.tobytes()


def test_decode_dod_fast_bit_exact():
    """The C bit reader must agree with the python reference reader on
    every bucket (0 / 7b / 9b / 12b / 36b-zigzag) and edge shapes."""
    import numpy as np

    from modape_spark.compression import decode_dod, decode_dod_fast, encode_dod

    rng = np.random.default_rng(42)
    cases = [
        np.array([], dtype=np.int64),
        np.array([7], dtype=np.int64),
        np.array([7, 7], dtype=np.int64),
        np.arange(1000, dtype=np.int64) * 3,          # constant delta -> '0'
        rng.integers(-64, 65, 300).cumsum(),          # 7-bit bucket
        rng.integers(-2048, 2049, 300).cumsum(),      # 12-bit bucket
        rng.integers(-(1 << 30), 1 << 30, 50).cumsum(),  # 36-bit zigzag
        np.array([0, 1 << 32, -(1 << 32), 0], dtype=np.int64),  # 36b path
    ]
    for v in cases:
        b = encode_dod(v)
        assert np.array_equal(decode_dod(b), v)
        assert np.array_equal(decode_dod_fast(b), v)


def test_decode_dod_fast_truncated_payload_raises():
    """Corrupt/truncated payloads must fail loudly (-1 from the bounded C
    reader -> ValueError), never read past the buffer or return garbage."""
    import numpy as np
    import pytest

    from modape_spark.compression import decode_dod_fast, encode_dod

    rng = np.random.default_rng(3)
    v = rng.integers(-(1 << 30), 1 << 30, 64).cumsum()
    b = encode_dod(v)
    for cut in (14, len(b) // 2, len(b) - 1):  # keep the 13-byte header
        with pytest.raises(ValueError, match="overrun"):
            decode_dod_fast(b[:cut])


def test_encode_dod_rows_byte_identical():
    """The C batch encoder must emit BYTE-identical payloads to the
    numpy reference encoder across every bucket, including the 36-bit
    zigzag escape and the padding byte."""
    import numpy as np

    from modape_spark.ckernel import get_lib
    from modape_spark.compression import decode_dod, encode_dod, encode_dod_rows

    assert get_lib() is not None, "C kernel must be available in this image"
    rng = np.random.default_rng(11)
    blocks = [
        np.tile(np.arange(50, dtype=np.int64) * 3, (4, 1)),      # all '0'
        rng.integers(-64, 65, (8, 300)).cumsum(axis=1),          # 7-bit
        rng.integers(-300, 300, (8, 200)).cumsum(axis=1),        # 9/12-bit
        rng.integers(-(1 << 25), 1 << 25, (5, 40)).cumsum(axis=1),  # 36b
        np.array([[7, -3]], dtype=np.int64),                     # n=2
        rng.integers(-2048, 2049, (3, 742)).cumsum(axis=1),      # fixture n
    ]
    for M in blocks:
        got = encode_dod_rows(M)
        want = [encode_dod(row) for row in M]
        assert got == want
        for blob, row in zip(got, M):
            assert np.array_equal(decode_dod(blob), row)


def test_encode_dod_rows_range_check():
    import numpy as np
    import pytest

    from modape_spark.compression import encode_dod_rows

    M = np.zeros((2, 4), dtype=np.int64)
    M[1, 2] = 1 << 40  # dod way out of the 36-bit zigzag range
    with pytest.raises(ValueError, match="36-bit"):
        encode_dod_rows(M)


def test_decode_dod_rows_matches_per_row_decode():
    """One C call over concatenated payloads (the Arrow BinaryArray
    layout) must reproduce decode_dod per row, including offset slices
    that do not start at zero."""
    import numpy as np

    from modape_spark.compression import decode_dod, decode_dod_rows, encode_dod

    rng = np.random.default_rng(23)
    rows = [rng.integers(-5000, 5000, n).cumsum() for n in (1, 2, 17, 300, 742)]
    rows.append(np.array([42], dtype=np.int64))
    blobs = [encode_dod(r.astype(np.int64)) for r in rows]
    data = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    boffs = np.zeros(len(blobs) + 1, dtype=np.int64)
    np.cumsum([len(b) for b in blobs], out=boffs[1:])
    vals, ooffs = decode_dod_rows(data, boffs)
    for r, row in enumerate(rows):
        assert np.array_equal(vals[ooffs[r]:ooffs[r + 1]], row)
    # a window over the middle payloads (sliced-BinaryArray shape):
    # byte offsets are absolute into the same data buffer
    vals2, ooffs2 = decode_dod_rows(data, boffs[2:5])
    for j, r in enumerate((2, 3)):
        assert np.array_equal(vals2[ooffs2[j]:ooffs2[j + 1]], rows[r])


def test_decode_dod_rows_reports_corrupt_row():
    import numpy as np
    import pytest

    from modape_spark.compression import decode_dod_rows, encode_dod

    good = encode_dod(np.arange(50, dtype=np.int64) * 7)
    bad = good[:-3]  # truncated bitstream
    data = np.frombuffer(good + bad + good, dtype=np.uint8)
    boffs = np.array([0, len(good), len(good) + len(bad),
                      2 * len(good) + len(bad)], dtype=np.int64)
    with pytest.raises(ValueError, match="row 1"):
        decode_dod_rows(data, boffs)
    with pytest.raises(ValueError, match="not a dod"):
        decode_dod_rows(data[1:], boffs[:2])


def test_decode_dod_value_at_matches_prefix():
    import numpy as np
    import pytest

    from modape_spark.compression import (
        decode_dod_prefix,
        decode_dod_value_at,
        encode_dod,
    )

    rng = np.random.default_rng(31)
    rows = [rng.integers(-3000, 3000, n).cumsum() for n in (1, 2, 5, 60, 742)]
    blobs = [encode_dod(r.astype(np.int64)) for r in rows]
    data = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    boffs = np.zeros(len(blobs) + 1, dtype=np.int64)
    np.cumsum([len(b) for b in blobs], out=boffs[1:])
    for k in (1, 2, 5, 60, 200, 742, 1000):
        vals, valid = decode_dod_value_at(data, boffs, k)
        for r, row in enumerate(rows):
            if row.size >= k:
                assert valid[r] and vals[r] == row[k - 1], (k, r)
            else:
                assert not valid[r], (k, r)
    with pytest.raises(ValueError, match="1-based"):
        decode_dod_value_at(data, boffs, 0)


def test_decode_dod_values_at_vector_matches_scalar():
    """The per-row-position vector decode (C dod_value_at_rows_vec)
    equals the scalar positional decode at every row, marks ks<1 and
    past-the-array rows invalid, and the pure-python fallback agrees."""
    import numpy as np

    from modape_spark import ckernel
    from modape_spark.compression import (
        decode_dod_value_at,
        decode_dod_values_at,
        encode_dod,
    )

    rng = np.random.default_rng(7)
    rows = [rng.integers(-3000, 10000, size=n).astype(np.int64)
            for n in (1, 4, 17, 64, 30)]
    payloads = [encode_dod(r) for r in rows]
    data = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    boffs = np.zeros(len(payloads) + 1, dtype=np.int64)
    np.cumsum([len(p) for p in payloads], out=boffs[1:])

    ks = np.array([1, 5, 17, 0, 64], dtype=np.int64)  # 0 => NULL row
    vals, valid = decode_dod_values_at(data, boffs, ks)
    for r, k in enumerate(ks):
        if k < 1 or k > rows[r].size:
            assert not valid[r], r
        else:
            assert valid[r] and vals[r] == rows[r][k - 1], r
    # cross-check vs the scalar reader at a shared position
    v2, ok2 = decode_dod_value_at(data, boffs, 4)
    vv, okv = decode_dod_values_at(data, boffs, np.full(5, 4, dtype=np.int64))
    assert np.array_equal(ok2, okv) and np.array_equal(v2[ok2], vv[okv])

    # pure-python fallback bit-parity
    saved = ckernel.get_lib
    try:
        ckernel.get_lib = lambda: None
        pv, pok = decode_dod_values_at(data, boffs, ks)
    finally:
        ckernel.get_lib = saved
    assert np.array_equal(pok, valid) and np.array_equal(pv[pok], vals[valid])
